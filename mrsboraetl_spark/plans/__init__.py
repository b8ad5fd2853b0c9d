"""The five reference pipeline stages as DataFrame plan builders.

Each stage is a pure function: (source DataFrames, options) -> target
DataFrame.  Materialization (parquet/Delta write, MERGE) is the engine
runner's job — keeping plan construction lazy lets Catalyst fuse the whole
stage into a handful of shuffles.
"""

from mrsboraetl_spark.plans.flat_lab_obs import (
    build_flat_lab_obs,
    incremental_flat_lab_obs,
)
from mrsboraetl_spark.plans.flat_latest_hiv_summary import (
    build_flat_latest_hiv_summary,
)
from mrsboraetl_spark.plans.flat_obs import build_flat_obs, incremental_flat_obs
from mrsboraetl_spark.plans.flat_orders import (
    build_flat_orders,
    incremental_flat_orders,
)
from mrsboraetl_spark.plans.flat_visit_summary import (
    build_flat_visit_summary,
    incremental_flat_visit_summary,
)

__all__ = [
    "build_flat_obs", "incremental_flat_obs",
    "build_flat_orders", "incremental_flat_orders",
    "build_flat_lab_obs", "incremental_flat_lab_obs",
    "build_flat_visit_summary", "incremental_flat_visit_summary",
    "build_flat_latest_hiv_summary",
]
