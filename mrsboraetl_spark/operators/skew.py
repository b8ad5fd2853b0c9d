"""Skew-aware aggregation: two-stage salted partial/final aggregate.

A groupBy on a skewed key funnels the hot key's rows through one reducer;
AQE's skew-join splitting does not help aggregations.  The classic fix is
salting: scatter each key over ``n_salts`` sub-keys, partially aggregate on
(key, salt) — map-side combine now spreads the hot key across n_salts
reducers — then finish on the key alone.  The second shuffle moves only
|keys| x n_salts pre-aggregated rows, which is negligible.

Works for algebraic aggregates (sum/count/min/max — anything with an
associative merge).  The salt is deterministic (hash of a row-id column),
so reruns produce identical plans and results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# op name -> (partial agg fn, final merge fn).
# "count" is COUNT(col) — null-skipping, like SQL; "count_star" is COUNT(*)
# (the input_col is ignored).  They differ whenever the counted column is
# nullable, so pick the one whose SQL spelling you mean.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "count_star": (lambda _c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_src: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (skewed) left side by the hash of
    ``salt_src``, replicate every right row across all ``n_salts`` salt
    values, and join on keys + salt.  A hot key's left rows then spread
    over n_salts reducers instead of funnelling through one.

    Semantics-preserving for inner/left joins: each left row carries
    exactly one salt and meets exactly one copy of each matching right
    row.  Cost: the right side shuffles n_salts times larger — use when
    the right side is too big to broadcast but far smaller than the
    skewed left (the classic fact-to-mid-size-dim shape).  AQE's skew
    handling covers sort-merge joins after the fact; this shapes the
    plan up front and also works where AQE cannot split (e.g. under
    bucketed/pre-partitioned requirements).
    """
    if how not in ("inner", "left", "left_semi", "left_anti", "leftsemi",
                   "leftanti", "left_outer"):
        # right/full would emit each unmatched right row n_salts times
        raise ValueError(
            f"salted_join preserves semantics only for left-preserving "
            f"joins, got how={how!r}"
        )
    salt = F.pmod(F.xxhash64(salt_src), F.lit(n_salts)).alias("_salt")
    salted_left = left.withColumn("_salt", salt)
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return salted_left.join(
        replicated_right, [*on, "_salt"], how
    ).drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    salt_src: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregate: ``aggs`` is (input_col, op, output_alias) with
    op in {sum, count, min, max}.  ``salt_src`` is any column whose hash
    spreads rows of one key (a row id, an event timestamp...)."""
    salt_col = F.pmod(F.xxhash64(salt_src), F.lit(n_salts)).alias("_salt")
    partial = df.select(*keys, salt_col, *[c for c, _, _ in aggs]).groupBy(
        *keys, "_salt"
    )
    partial_exprs = []
    final_exprs = []
    for col, op, alias in aggs:
        p_fn, f_fn = _ALGEBRAIC[op]
        partial_exprs.append(p_fn(col).alias(f"_p_{alias}"))
        final_exprs.append(f_fn(f"_p_{alias}").alias(alias))
    return partial.agg(*partial_exprs).groupBy(*keys).agg(*final_exprs)
