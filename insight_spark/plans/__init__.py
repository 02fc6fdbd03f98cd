"""Plan introspection utilities: the 100 TB plan lint as a library."""

from insight_spark.plans.audit import (
    Finding,
    is_unpartitioned,
    physical_plan,
    scale_audit,
    window_specs,
)

__all__ = [
    "Finding",
    "is_unpartitioned",
    "physical_plan",
    "scale_audit",
    "window_specs",
]
