"""Interval join: the binned equi-join must agree with the brute-force
theta join on random timelines, stay theta-join-free in the plan, and
preserve unmatched points in left mode."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mrsboraetl_spark.operators.rangejoin import interval_join

POINT = st.fixed_dictionaries(
    {"key": st.integers(0, 3), "ts": st.integers(0, 500)}
)
IVL = st.fixed_dictionaries(
    {
        "key": st.integers(0, 3),
        "start": st.integers(0, 500),
        "length": st.integers(-20, 120),  # negative => degenerate interval
        "tag": st.integers(0, 10**6),
    }
)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(POINT, min_size=1, max_size=30),
    ivls=st.lists(IVL, min_size=0, max_size=30),
)
def test_interval_join_matches_theta_join(spark, points, ivls):
    left = spark.createDataFrame(
        [(i, p["key"], p["ts"]) for i, p in enumerate(points)],
        "pid long, key long, ts long",
    )
    rows = [
        (r["key"], r["start"], r["start"] + r["length"], r["tag"])
        for r in ivls
    ]
    right = (
        spark.createDataFrame(rows, "key long, start long, end long, tag long")
        if rows
        else spark.createDataFrame([], "key long, start long, end long, tag long")
    )
    got = {
        (r.pid, r.tag)
        for r in interval_join(
            left, right, on=["key"], point="ts", start="start", end="end",
            bin_width=50,
        ).collect()
    }
    want = {
        (i, r["key"], r["start"], r["start"] + r["length"], r["tag"])
        for i, p in enumerate(points)
        for r in ivls
        if r["key"] == p["key"]
        and r["start"] <= p["ts"] <= r["start"] + r["length"]
    }
    assert got == {(i, tag) for i, _, _, _, tag in want}


def test_interval_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 999)], "pid long, key long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 5, 15, 7)], "key long, start long, end long, tag long"
    )
    out = interval_join(
        left, right, on=["key"], point="ts", start="start", end="end",
        bin_width=50, how="left",
    ).collect()
    by_pid = {r.pid: r for r in out}
    assert len(out) == 2
    assert by_pid[1].tag == 7
    assert by_pid[2].tag is None


def test_interval_join_plan_has_no_nested_loop(spark):
    left = spark.range(100).select(
        F.col("id").alias("pid"), (F.col("id") % 5).alias("key"),
        (F.col("id") * 3).alias("ts"),
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("key"), (F.col("id") * 7).alias("start"),
        (F.col("id") * 7 + 20).alias("end"),
    )
    df = interval_join(
        left, right, on=["key"], point="ts", start="start", end="end",
        bin_width=60,
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
