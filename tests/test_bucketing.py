"""Bucketed layout: a join of two tables bucketed on the join key must
plan WITHOUT any shuffle Exchange, and results must match the plain
join."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from mrsboraetl_spark.sources.bucketing import read_bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    write_bucketed(
        orders, "b_orders", ["o_custkey"], 8, path=str(tmp_path / "b_orders")
    )
    write_bucketed(
        cust, "b_cust", ["c_custkey"], 8, path=str(tmp_path / "b_cust")
    )
    yield orders, cust
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    bo = read_bucketed(spark, "b_orders")
    bc = read_bucketed(spark, "b_cust")
    # disable broadcast so the join would otherwise need a full shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        shuffles = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
        assert not shuffles, plan
        # and the answer is still the answer
        orders, cust = bucketed_pair
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_pair):
    bo = read_bucketed(spark, "b_orders")
    agg = bo.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("t"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        agg.explain("formatted")
    plan = buf.getvalue()
    shuffles = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert not shuffles, plan
