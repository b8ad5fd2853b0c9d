"""Skew operators: the salted join must be result-identical to the plain
join (inner and left), and its plan must actually partition on
(keys + salt)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from mrsboraetl_spark.operators.skew import salted_join
from mrsboraetl_spark.queries import table


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_salted_join_equals_plain_join(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    users = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    for how in ("inner", "left"):
        plain = ev.join(users, ["user_id"], how)
        salted = salted_join(
            ev, users, ["user_id"], salt_src="event_id", n_salts=8, how=how
        )
        assert _rows(salted.select(*sorted(salted.columns))) == _rows(
            plain.select(*sorted(plain.columns))
        ), how


def test_salted_join_partitions_on_salt(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_id", "user_id")
    users = table(spark, sf_dir, "events").select("user_id").distinct()
    df = salted_join(ev, users, ["user_id"], salt_src="event_id", n_salts=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "_salt" in plan
    assert "CartesianProduct" not in plan


def test_salted_join_rejects_right_preserving_joins(spark, sf_dir):
    import pytest

    ev = table(spark, sf_dir, "events").select("event_id", "user_id")
    users = table(spark, sf_dir, "events").select("user_id").distinct()
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="left-preserving"):
            salted_join(ev, users, ["user_id"], salt_src="event_id", how=how)


def test_shj_skewed_build_side_survives_and_splits(spark):
    """Pin the safety story for the session's preferSortMergeJoin=false
    flip (session.py): a shuffled-hash join whose BUILD side is heavily
    skewed (one key = 50% of its rows) must complete with correct
    results, and AQE's skew-join handling must actually split the
    oversized build partition — the mechanism that bounds the
    per-partition hash map where SMJ would have spilled (VERDICT r13
    item 3 risk; guide §3.1/§2.5).

    Skew thresholds are lowered so the split fires at test size;
    the factor/threshold MECHANISM is identical at 256 MB scale.
    """
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        # Broadcast suppressed (the 100 TB case: build side too big to
        # broadcast); skew thresholds scaled down to the test's bytes.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32k",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        # Build side (smaller relation -> SHJ builds it): key 0 owns half.
        build = spark.range(0, 60000).select(
            F.when(F.col("id") < 30000, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.lpad(F.col("id").cast("string"), 64, "x").alias("payload"),
        )
        stream = spark.range(0, 600000).select(
            (F.col("id") % 60000).alias("k")
        )
        # sum(length(payload)) keeps the fat column alive through column
        # pruning so the build shuffle actually carries skewed bytes.
        df = (
            stream.join(build, "k")
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("payload")).alias("b"),
            )
        )
        rows = df.collect()
        # key 0: 10 stream x 30000 build; keys 30000..59999: 10 x 1 each.
        assert rows[0]["n"] == 10 * 30000 + 30000 * 10
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "ShuffledHashJoin(skew=true)" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
