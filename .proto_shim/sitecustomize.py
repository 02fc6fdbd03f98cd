"""Shim loader: expose the google-cloud-sdk vendored pure-python
protobuf (4.23.2) as `google.protobuf`, and stub the `runtime_version`
guard module (added in protobuf 5.27; pyspark's generated pb2 files
import it only to validate versions).  Used solely to unblock the
transformWithStateInPandas runtime in this offline container."""
import sys
import types

try:
    from google.protobuf import runtime_version  # noqa: F401
except ImportError:
    try:
        import google.protobuf as _gp
    except ImportError:
        _gp = None
    if _gp is not None:
        _m = types.ModuleType("google.protobuf.runtime_version")

        class Domain:  # mirror of protobuf 5.x runtime_version.Domain
            GOOGLE_INTERNAL = 1
            PUBLIC = 2

        _m.Domain = Domain
        _m.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        sys.modules["google.protobuf.runtime_version"] = _m
        _gp.runtime_version = _m
