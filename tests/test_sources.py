"""Source readers: CSV/JSON round-trips with explicit schemas must
reproduce the parquet-read rows bit-for-bit (same logical table through
any interchange format)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mrsboraetl_spark.sources.readers import read_csv_table, read_json_table


def _sample(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(500)
    )


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    path = str(tmp_path / "orders_csv")
    src.write.option("header", "true").csv(path)
    schema = T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ])
    back = read_csv_table(spark, path, schema=schema)
    assert _rows(back) == _rows(src)


def test_json_roundtrip(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    path = str(tmp_path / "orders_json")
    src.write.json(path)
    back = read_json_table(spark, path, schema=src.schema)
    assert _rows(back) == _rows(src)


def test_csv_permissive_keeps_good_rows(spark, tmp_path):
    """A malformed row must not fail the scan; good rows survive."""
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\nnot_an_int,3\n4,5\n")
    schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
    ])
    df = read_csv_table(spark, str(p), schema=schema)
    good = df.filter(F.col("a").isNotNull()).collect()
    assert {(r.a, r.b) for r in good} == {(1, 2), (4, 5)}
