"""Approximate aggregates: the error-bound contract IS the correctness
story (sketches can't hash-match a DuckDB oracle), so measure it."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrsboraetl_spark.functions.approx import approx_distinct, approx_quantiles


def test_approx_distinct_within_bound(spark, sf_dir_mid):
    o = spark.read.parquet(f"{sf_dir_mid}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey").alias("n")).first().n
    approx = o.select(approx_distinct("o_custkey").alias("n")).first().n
    assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_approx_distinct_grouped_within_bound(spark, sf_dir_mid):
    o = spark.read.parquet(f"{sf_dir_mid}/orders.parquet")
    exact = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus")
        .agg(approx_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05, (k, approx[k], n)


def test_approx_quantiles_within_rank_bound(spark, sf_dir_mid):
    li = spark.read.parquet(f"{sf_dir_mid}/lineitem.parquet")
    probs = [0.5, 0.95, 0.99]
    got = li.select(
        approx_quantiles("l_extendedprice", probs).alias("q")
    ).first().q
    n = li.count()
    vals = [
        r.l_extendedprice
        for r in li.select("l_extendedprice").orderBy("l_extendedprice").collect()
    ]
    for p, g in zip(probs, got):
        # rank of the returned value must be within 1% of the target rank
        import bisect

        lo = bisect.bisect_left(vals, g)
        hi = bisect.bisect_right(vals, g)
        target = p * n
        assert lo - 0.01 * n <= target <= hi + 0.01 * n, (p, g, lo, hi, n)
