"""Global total-order position WITHOUT the single-partition window.

``row_number() OVER (ORDER BY k)`` is the textbook spelling of "give every
row its position in a global order" — and on Spark it collapses the whole
dataset into ONE partition (Catalyst warns: "No Partition Defined for
Window operation"), which is exactly the plan that cannot run at 100 TB.
The scalable spelling is the classic two-phase rank: split the key space
into ordered buckets, count rows per bucket (tiny relation), prefix-sum
the counts into bucket offsets, then add the WITHIN-bucket row_number
(window partitioned by bucket — fully parallel).

Two bucketing strategies, chosen by ``bucket_of``:

* **Deterministic bucket (preferred)** — the caller supplies a pure,
  order-monotone function of the key (e.g. a fixed-length prefix of an
  md5 hex key).  Both the count branch and the numbering branch derive
  the bucket from the DATA, so they agree by construction: no sampling,
  no materialization, nothing to keep consistent.  Measured at 20M rows
  on local[32]: ~5-8s vs ~25s for the single-partition window and ~28s
  for the sampled-range alternative below.

* **Sampled range (fallback, arbitrary keys)** — Spark's
  ``repartitionByRange`` + ``spark_partition_id()``.  The range
  partitioner SAMPLES with a lineage-dependent seed, and Catalyst's
  column pruning makes the two branches' exchanges non-identical (no
  ReusedExchange), so without pinning, the branches can disagree on
  partition boundaries and mis-join the offsets — measured, not
  hypothetical.  A ``localCheckpoint`` therefore pins the partitioning;
  its materialization is the dominant cost at scale (~20s of 28s at 20M
  rows).  On a cluster, checkpoint to shared storage or write a stage
  table instead.  Prefer a deterministic bucket whenever the key's
  distribution is known.

Main use: deterministic epoch shuffling for training-data export.
``epoch_shuffle`` orders by ``md5(seed || id)`` — a seeded pseudo-random
permutation that is a pure function of (seed, id), so it is reproducible
across runs, clusters, and partition counts, unlike ``df.orderBy(rand())``
— and md5 keys are uniform hex strings, so a 2-hex-char prefix gives 256
well-balanced deterministic buckets.  Writing the result partitioned by
``pos`` ranges yields globally shuffled, stably numbered training shards;
a new seed is a new epoch order.

Determinism note: positions are well-defined only when the order key is
unique (md5 over unique ids is).  Equal keys land in one bucket, but
their relative order within the tie is not defined.  Bucketed path:
NULL order keys are dropped (a NULL bucket joins nothing) — use the
range fallback if NULL keys must be numbered.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_prefix_bucket(width: int = 2) -> Callable[[Column], Column]:
    """Bucketing function for md5-hex order keys: the first ``width`` hex
    chars — 16**width contiguous, uniformly filled key ranges."""
    return lambda c: F.substring(c, 1, width)


def _positions_over_buckets(
    keyed: DataFrame,
    bucket: Column,
    order_col: str,
    pos_col: str,
    weight_col: str | None = None,
    prefix_col: str = "prefix",
) -> DataFrame:
    """Shared tail: per-bucket counts -> prefix-sum offsets (a window over
    one row per bucket — single-partition but deliberately tiny) ->
    broadcast offsets back -> within-bucket row_number (parallel).

    With ``weight_col``, additionally emits ``prefix_col``: the total
    weight of all rows STRICTLY BEFORE this row in the global order —
    the same two-phase trick run on the weight sums (bucket weight
    offsets + a within-bucket running sum sharing the row_number
    window's sort), which is how you compute a 100 TB weighted prefix
    sum without a single-partition window."""
    rp = keyed.withColumn("_bkt", bucket)
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("_wsum"))
    counts = rp.groupBy("_bkt").agg(*aggs)
    w_off = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off_cols = [
        "_bkt",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
    ]
    if weight_col is not None:
        off_cols.append(
            F.coalesce(F.sum("_wsum").over(w_off), F.lit(0)).alias("_woff")
        )
    offsets = counts.select(*off_cols)
    w_in = Window.partitionBy("_bkt").orderBy(order_col)
    out = rp.join(F.broadcast(offsets), "_bkt").withColumn(
        pos_col,
        (F.col("_off") + F.row_number().over(w_in) - 1).cast("bigint"),
    )
    if weight_col is not None:
        w_run = w_in.rowsBetween(Window.unboundedPreceding, -1)
        out = out.withColumn(
            prefix_col,
            (
                F.col("_woff")
                + F.coalesce(F.sum(weight_col).over(w_run), F.lit(0))
            ).cast("bigint"),
        ).drop("_woff")
    return out.drop("_bkt", "_off")


def global_position(
    df: DataFrame,
    order_col: str,
    pos_col: str = "pos",
    n_partitions: int | None = None,
    bucket_of: Callable[[Column], Column] | None = None,
    weight_col: str | None = None,
    prefix_col: str = "prefix",
) -> DataFrame:
    """Add ``pos_col``: the row's 0-based position in the global
    ascending order of ``order_col`` (unique keys ⇒ deterministic).
    With ``weight_col``, also add ``prefix_col``: the exclusive global
    running total of that weight in the same order.

    ``bucket_of``: order-monotone pure function of the key (same bucket
    ordering as key ordering) — enables the deterministic, sampling-free
    plan.  Without it, falls back to sampled range partitioning pinned
    by a localCheckpoint (see module docstring for why)."""
    if bucket_of is not None:
        return _positions_over_buckets(
            df,
            bucket_of(F.col(order_col)),
            order_col,
            pos_col,
            weight_col,
            prefix_col,
        )
    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    rp = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    return _positions_over_buckets(
        rp.withColumnRenamed("_pid", "_rpid"),
        F.col("_rpid"),
        order_col,
        pos_col,
        weight_col,
        prefix_col,
    ).drop("_rpid")


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str,
    pos_col: str = "pos",
    bucket_width: int = 2,
    weight_col: str | None = None,
    prefix_col: str = "prefix",
) -> DataFrame:
    """Deterministic seeded permutation for training-data export:
    ``pos_col`` numbers rows by ``md5(seed:id)`` order.  Same (seed, id)
    ⇒ same position, on any cluster at any partition count.  Uses the
    deterministic md5-prefix bucketing (16**bucket_width buckets).
    ``weight_col`` adds the exclusive running weight total in epoch
    order (see global_position) — the hook token-balanced sharding
    hangs off."""
    keyed = df.withColumn(
        "_ekey",
        F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))),
    )
    return global_position(
        keyed,
        "_ekey",
        pos_col=pos_col,
        bucket_of=md5_prefix_bucket(bucket_width),
        weight_col=weight_col,
        prefix_col=prefix_col,
    ).drop("_ekey")
