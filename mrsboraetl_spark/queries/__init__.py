"""Operator-level query registry — the correctness gate.

Every operator family from SURVEY.md §2 (plus the large-scale training-data
operators) registers here as a named (Spark builder, DuckDB oracle SQL) pair.
The driver runs both at sf=0.01 and compares row-count + schema +
order-insensitive value-hash; ``tests/test_oracle_parity.py`` replicates that
check locally at sf=0.001.

Conventions that keep the comparison byte-stable:
* every computed column is aliased identically in Spark and SQL;
* double aggregates are rounded (both sides, same digits) so floating-point
  association order can't flip a hash;
* blobs/strings are rendered with the same regex formulas on both engines;
* session timezone is UTC (see session.py) so timestamps agree with DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = Q(fn, oracle)
        return fn
    return deco


def ensure_nanos_readable(spark: SparkSession) -> None:
    """Make Parquet TIMESTAMP(NANOS) columns readable on ANY session.

    The driver tables carry TIMESTAMP(NANOS) (events.ts), which Spark's
    vectorized reader rejects with PARQUET_TYPE_ILLEGAL unless
    spark.sql.legacy.parquet.nanosAsLong is on.  Our own session factory
    (session.py) sets it at build time, but queries() must also run under a
    caller-provided SparkSession, so set it at runtime too — it is a
    runtime-settable SQL conf.

    Oracle parity also assumes UTC rendering of dates/timestamps (DuckDB
    is timezone-naive): on a non-UTC host a caller-provided session would
    shift every date_trunc/day-derived column, so pin the session timezone
    here as well — equally runtime-settable.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a driver table; normalize timestamp columns so downstream
    queries always see plain TIMESTAMP (LTZ, session tz pinned UTC):

    * TIMESTAMP(NANOS) arrives as long under
      spark.sql.legacy.parquet.nanosAsLong — convert via timestamp_micros,
      truncating to microseconds exactly like DuckDB does;
    * TIMESTAMP(MICROS) without timezone arrives as TIMESTAMP_NTZ, which
      withWatermark and epoch casts reject — cast to TIMESTAMP.  With the
      session tz pinned UTC the wall-clock values are unchanged, so DuckDB
      (timezone-naive) parity holds either way."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ensure_nanos_readable(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        for field in df.schema.fields:
            if field.name == "ts" and isinstance(field.dataType, T.LongType):
                # integer division: a double /1000 rounds in the last micros
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


# Importing the submodules populates REGISTRY.  Order matters: the driver
# evaluates at most 50 entries in registration order, so the slow streaming
# trio registers LAST (streaming_q) and everything batch comes first.
from mrsboraetl_spark.queries import relational  # noqa: E402,F401
from mrsboraetl_spark.queries import pipeline  # noqa: E402,F401
from mrsboraetl_spark.queries import llmdata  # noqa: E402,F401
from mrsboraetl_spark.queries import streaming_q  # noqa: E402,F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle}
