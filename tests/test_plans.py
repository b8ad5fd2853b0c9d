"""Plan-quality regression guards: the physical plans the engine depends on
at scale must not silently degrade (lost pushdown, broadcast falling back
to sort-merge, an accidental cartesian product)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from mrsboraetl_spark.queries import REGISTRY


def _plan(spark, name, sf_dir):
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan
    # column pruning: the scan must not read all 16 lineitem columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert read_schema.count(":") <= 8, read_schema


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, "join_multi_dims", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_has_no_theta_join(spark, sf_dir):
    plan = _plan(spark, "asof_join_latest_order", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the as-of core is a window over the union, not a join of L against R
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_salted_aggregate_is_two_stage(spark, sf_dir):
    plan = _plan(spark, "salted_skew_aggregate", sf_dir)
    # partial on (key, salt) + final on key, each with its own
    # partial/final pair -> at least 4 HashAggregate nodes
    assert plan.count("HashAggregate") >= 4
