"""Bucketed table layout: pre-shuffled, co-located joins.

At 100 TB the dominant recurring cost of the incremental protocol is
re-shuffling the big flat tables on their PK for every anti-join/merge.
Hash-bucketing the stored table on that key does the shuffle ONCE at
write time: any later equi-join or aggregation on the bucket key reads
co-located buckets and plans with no Exchange on the bucketed side(s)
— `tests/test_bucketing.py` asserts exactly that.

Spark constraints encoded here:

* bucketing requires a catalog table (``saveAsTable``); passing ``path``
  keeps it an external table so the data lives in the caller's directory,
  not a hidden warehouse;
* both sides of a join must have the same bucket count (or a multiple,
  with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) for the
  shuffle to be elided on both;
* ``sortBy`` the bucket key so every bucket file is also sorted — the
  same row-group pruning the engine's PK-clustered writes give parquet,
  plus sort-merge joins skip their sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: Sequence[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *keys
    )
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table WITH its bucket spec (spark.read.parquet on
    the same path would lose it — bucketing metadata lives in the
    catalog, not the files)."""
    return spark.table(table_name)
