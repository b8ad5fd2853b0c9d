"""Mergeable distinct-count sketches for corpus profiling.

Profiling a 100 TB corpus ("distinct shingles per source", "vocabulary
size per language") needs cardinality estimates whose state is bounded
and mergeable across partitions/days.  Two paths:

* ``approx_distinct`` — Spark's built-in HyperLogLog++
  (approx_count_distinct): the production path, constant state,
  map-side partial merge.  Non-deterministic across engines, so its
  test is a tolerance check against the exact count (tests/test_llmdata).
* ``kmv_distinct`` — a K-Minimum-Values sketch built from md5: keep the
  k smallest hash values per group; estimate D ≈ (k-1) / h_(k), with
  h_(k) the k-th smallest hash normalized to [0,1).  md5 makes it fully
  deterministic, so unlike HLL it is hash-check ORACLE-ABLE in DuckDB —
  the same estimator to the same digits on both engines.

KMV scale shape: the only wide operation is one distinct on
(group, hash) followed by a key-partitioned window that keeps k rows
per group.  The distinct's shuffle volume is the map-side-deduplicated
per-partition vocabulary, not the corpus (Spark plans distinct as a
partial-then-final hash aggregate), and the window sorts within group
partitions only; no global sort, no collect.  (A custom bounded-heap
aggregator would save the sort at the cost of leaving codegen; the
sort-based spelling is the idiomatic Spark trade.)

Reference scope note: extension layer (SURVEY.md §8) — the reference
ETL has no sketching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: fits a signed long exactly, and uniform enough
# for the estimator.  16**15 as a float divisor normalizes to [0, 1).
_HEX_CHARS = 15
_HEX_SCALE = float(16 ** _HEX_CHARS)


def _hash_frac(col) -> "F.Column":
    """md5-derived uniform fraction in [0, 1): first 15 hex chars as an
    integer over 16^15.  Same spelling in the DuckDB oracle via
    cast('0x' || substr(md5(v), 1, 15) as bigint)."""
    return (
        F.conv(F.substring(F.md5(col), 1, _HEX_CHARS), 16, 10).cast("long")
        / F.lit(_HEX_SCALE)
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """(group_col, est_distinct) — KMV cardinality estimate per group.

    Groups with fewer than k distinct values are counted EXACTLY (the
    sketch holds all of them); otherwise est = (k-1) / h_(k), rounded to
    4 digits so float association order can't flip the oracle hash.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # Null filter on the RAW value, not on h (r13, guide §1.2): h is
    # null iff the value is null (md5/conv/cast of a non-null string are
    # never null), but filtering on h made Catalyst evaluate the whole
    # md5+conv expression once in the Filter and AGAIN in the Project —
    # Filter and Project do not share subexpressions across operators —
    # doubling the per-occurrence hashing, the dominant per-row cost.
    hashed = (
        df.select(F.col(group_col), F.col(value_col).cast("string").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .select(F.col(group_col), _hash_frac(F.col("_v")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    mins = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return (
        mins.groupBy(group_col)
        .agg(F.count("*").alias("n_kept"), F.max("h").alias("h_k"))
        .select(
            group_col,
            F.round(
                F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
                .otherwise((k - 1) / F.col("h_k")),
                4,
            ).alias("est_distinct"),
        )
    )


def kmv_oracle_sql(
    table_expr: str, group_col: str, value_expr: str, k: int = 64
) -> str:
    """The DuckDB spelling of kmv_distinct — same hash, same estimator,
    same rounding — for oracle-parity tests."""
    return f"""
    WITH hashed AS (
      SELECT DISTINCT {group_col} AS g,
             cast('0x' || substr(md5(cast({value_expr} AS VARCHAR)), 1,
                                 {_HEX_CHARS}) AS BIGINT)
               / {_HEX_SCALE!r} AS h
      FROM {table_expr}
      WHERE {value_expr} IS NOT NULL
    ), ranked AS (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM hashed
    ), mins AS (
      SELECT g, count(*) AS n_kept, max(h) AS h_k
      FROM ranked WHERE rn <= {k} GROUP BY g
    )
    SELECT g AS {group_col},
           round(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                      ELSE ({k} - 1) / h_k END, 4) AS est_distinct
    FROM mins
    """


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """(group_cols..., sketch) — the KMV state itself: the ascending
    array of the <= k smallest hash fractions per group.

    This is the MERGEABLE form: compute per shard/day/partition-group,
    store alongside the data, and combine later with
    :func:`kmv_merge_estimate` — the merged estimate equals the direct
    estimate over the union EXACTLY (md5 is deterministic, and the k
    smallest of a union are a subset of the per-shard k smallest).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # Same raw-value null filter as kmv_distinct (r13): avoids the
    # Filter+Project double evaluation of the md5+conv hash expression.
    hashed = (
        df.select(
            *[F.col(c) for c in group_cols],
            F.col(value_col).cast("string").alias("_v"),
        )
        .filter(F.col("_v").isNotNull())
        .select(
            *[F.col(c) for c in group_cols],
            _hash_frac(F.col("_v")).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    mins = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return mins.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("h")).alias("sketch")
    )


def kmv_merge_estimate(
    sketches: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """(group_col, est_distinct) from a table of per-shard KMV sketches
    (the output of :func:`kmv_sketch` over (group, shard) keys).

    Merge = k smallest distinct hash values across the shards' sketches;
    the estimator and rounding are identical to :func:`kmv_distinct`, so
    merged-over-shards equals direct-over-union exactly (pytest-pinned).
    Shuffle shape: the exploded sketch rows are (group, h) pairs bounded
    by k * n_shards per group — sketch-sized, never corpus-sized.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    exploded = (
        sketches.select(F.col(group_col), F.explode("sketch").alias("h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    mins = exploded.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return (
        mins.groupBy(group_col)
        .agg(F.count("*").alias("n_kept"), F.max("h").alias("h_k"))
        .select(
            group_col,
            F.round(
                F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
                .otherwise((k - 1) / F.col("h_k")),
                4,
            ).alias("est_distinct"),
        )
    )


def approx_distinct(
    df: DataFrame, group_col: str, value_col: str, rsd: float = 0.05
) -> DataFrame:
    """(group_col, est_distinct) via Spark's HLL++ — the constant-state
    production path (map-side mergeable, no per-group k-row state)."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd).alias("est_distinct")
    )
