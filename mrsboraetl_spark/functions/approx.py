"""Approximate aggregates for 100 TB interactive analytics.

Exact COUNT(DISTINCT) and exact percentiles are the two aggregations
whose shuffle cost explodes first at scale (both need all distinct
values / all rows per group on one reducer).  Spark ships mergeable
sketches for each — HyperLogLog++ and a variant of Greenwald-Khanna —
which keep the aggregation one map-side-combinable shuffle of
constant-size state.  These wrappers pin the accuracy knobs and
document the contracts the engine relies on; tests/test_approx.py
verifies the error bounds against exact answers on driver data.

No DuckDB-oracle registry entries: sketch internals differ across
engines, so cross-engine hashes can never match — the correctness story
is the measured error bound, not equality.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# relative standard deviation for HLL++; 0.01 costs ~ 6KB of state per
# group and keeps observed error well under 2% on uniform ids
DEFAULT_RSD = 0.01

# percentile_approx accuracy: error <= 1/accuracy of the rank, i.e.
# 10000 bounds the rank error at 0.01% of rows per group
DEFAULT_ACCURACY = 10_000


def approx_distinct(col: str | Column, rsd: float = DEFAULT_RSD) -> Column:
    """HyperLogLog++ distinct count: mergeable constant-size state, so the
    plan keeps partial aggregation (map-side combine) where exact
    countDistinct forces a two-phase expand."""
    return F.approx_count_distinct(col, rsd=rsd)


def approx_quantiles(
    col: str | Column,
    probabilities: list[float],
    accuracy: int = DEFAULT_ACCURACY,
) -> Column:
    """Approximate quantiles (array, one per probability) via Spark's
    mergeable percentile sketch."""
    return F.percentile_approx(
        col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )
