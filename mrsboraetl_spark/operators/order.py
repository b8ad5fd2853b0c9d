"""Global total-order position WITHOUT the single-partition window.

``row_number() OVER (ORDER BY k)`` is the textbook spelling of "give every
row its position in a global order" — and on Spark it collapses the whole
dataset into ONE partition (Catalyst warns: "No Partition Defined for
Window operation"), which is exactly the plan that cannot run at 100 TB.
The scalable spelling is the classic two-phase rank:

1. range-partition the data by the order key (one range-exchange — the
   same shuffle a global sort pays, and the ONLY data-sized shuffle here);
2. count rows per range partition (tiny relation: one row per partition);
3. prefix-sum those counts into per-partition offsets (a window over
   ``n_partitions`` rows — single-partition but trivially small);
4. broadcast the offsets back and add the WITHIN-partition row_number
   (window partitioned by partition id — fully parallel).

Main use: deterministic epoch shuffling for training-data export.
``epoch_shuffle`` orders by ``md5(seed || id)`` — a seeded pseudo-random
permutation that is a pure function of (seed, id), so it is reproducible
across runs, clusters, and partition counts, unlike ``df.orderBy(rand())``.
Writing the result partitioned by ``pos`` ranges yields globally shuffled,
stably numbered training shards; a new seed is a new epoch order.

Determinism note: positions are well-defined only when the order key is
unique (md5 over unique ids is).  Ties straddle nothing — the range
partitioner sends equal keys to one partition — but their relative order
within the tie is not defined.

The partition-id bookkeeping materializes the range-partitioned frame once
(``localCheckpoint``) so the count branch and the numbering branch see the
SAME physical partitioning — without it, adaptive re-planning could give
the two branches different partition ids and mis-join the offsets.  On a
cluster checkpoint to shared storage (or write a stage table) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_position(
    df: DataFrame,
    order_col: str,
    pos_col: str = "pos",
    n_partitions: int | None = None,
) -> DataFrame:
    """Add ``pos_col``: the row's 0-based position in the global
    ascending order of ``order_col`` (unique keys ⇒ deterministic)."""
    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    rp = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = rp.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # Prefix-sum over one row per partition: single-partition window on a
    # deliberately tiny relation (n rows), not on the data.
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_pid").orderBy(order_col)
    return (
        rp.join(F.broadcast(offsets), "_pid")
        .withColumn(
            pos_col,
            (F.col("_off") + F.row_number().over(w_in) - 1).cast("bigint"),
        )
        .drop("_pid", "_off")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str,
    pos_col: str = "pos",
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic seeded permutation for training-data export:
    ``pos_col`` numbers rows by ``md5(seed:id)`` order.  Same (seed, id)
    ⇒ same position, on any cluster at any partition count."""
    keyed = df.withColumn(
        "_ekey",
        F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))),
    )
    return global_position(
        keyed, "_ekey", pos_col=pos_col, n_partitions=n_partitions
    ).drop("_ekey")
