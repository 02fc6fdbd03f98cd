"""Offline protobuf shim for the transformWithStateInPandas runtime.

This container has no installable ``google.protobuf`` wheel, but the
google-cloud-sdk ships a vendored pure-python protobuf (4.23.2) under
``lib/third_party/cloudsdk/google/protobuf``.  Spark 4's TWS Python
state-server protocol needs exactly two things from it: the message
runtime (works as-is) and the ``runtime_version`` guard module (added
in protobuf 5.27; pyspark's generated ``StateMessage_pb2`` imports it
only to validate protoc/runtime version pairing — a no-op stub is
semantically safe for a pinned, offline environment).

:func:`activate` wires both, for THIS process (sys.path + stub) and
for future subprocesses (PYTHONPATH + ``.proto_shim/sitecustomize.py``,
which re-applies the stub at interpreter startup — Spark's python
workers and the TWS driver-side worker are fresh interpreters spawned
by the JVM, so they need the env-var route).  Call it BEFORE building
the SparkSession: the JVM inherits the driver's environment at launch
and passes it to every worker it spawns.
"""

from __future__ import annotations

import os
import sys
import types
from pathlib import Path

_SDK = Path("/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk")
_SHIM = Path(__file__).resolve().parents[2] / ".proto_shim"


def _stub_runtime_version() -> None:
    try:
        from google.protobuf import runtime_version  # noqa: F401

        return
    except ImportError:
        pass
    import google.protobuf as gp

    m = types.ModuleType("google.protobuf.runtime_version")

    class Domain:  # mirror of protobuf 5.x runtime_version.Domain
        GOOGLE_INTERNAL = 1
        PUBLIC = 2

    m.Domain = Domain
    m.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    sys.modules["google.protobuf.runtime_version"] = m
    gp.runtime_version = m


def activate() -> bool:
    """Make ``google.protobuf`` importable here and in subprocesses.

    Returns True iff the import works afterwards.  Idempotent; safe to
    call when a real protobuf is installed (then it only applies the
    ``runtime_version`` stub if that submodule is missing).
    """
    try:
        import google.protobuf  # noqa: F401

        _stub_runtime_version()
        return True
    except ImportError:
        pass
    if not (_SDK / "google" / "protobuf" / "__init__.py").exists():
        return False
    _SHIM.mkdir(exist_ok=True)
    for name, target in (("cloudsdk", _SDK), ("google", _SDK / "google")):
        link = _SHIM / name
        if not link.exists():
            link.symlink_to(target)
    p = str(_SHIM)
    if p not in sys.path:
        sys.path.insert(0, p)
    env = os.environ.get("PYTHONPATH", "")
    if p not in env.split(os.pathsep):
        os.environ["PYTHONPATH"] = p + (os.pathsep + env if env else "")
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False
    _stub_runtime_version()
    return True
