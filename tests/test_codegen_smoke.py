"""The suite runs interpreted (conftest turns codegen off for speed on
tiny fixtures), so a codegen-only miscompile in the wide generated
methods — the 28-ladder decode, blob packing, minhash folds — would pass
pytest and only surface in bench/oracle CLI runs.  This module re-enables
whole-stage codegen with CODEGEN_ONLY factory mode (no interpreted
fallback) on the shared session and hash-checks the widest-expression
queries against their DuckDB oracles."""

from __future__ import annotations

import duckdb
import pytest

from mrsboraetl_spark.queries import REGISTRY, oracle_sql
from tests.oracle_check import TABLES, compare

CODEGEN_HEAVY = [
    "obs_blob_pack",        # array_sort(collect_list(struct)) + regex render
    "decode_case_ladder",   # CASE ladder
    "dedup_minhash_lsh",    # md5 + affine rehash fold
    "scalar_expr_layer",    # widest scalar projection
]


@pytest.fixture(scope="module")
def codegen_spark(spark):
    old_ws = spark.conf.get("spark.sql.codegen.wholeStage")
    old_fm = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    yield spark
    spark.conf.set("spark.sql.codegen.wholeStage", old_ws)
    spark.conf.set("spark.sql.codegen.factoryMode", old_fm)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", CODEGEN_HEAVY)
def test_codegen_parity(codegen_spark, sf_dir, duck, name):
    sdf = REGISTRY[name].fn(codegen_spark, sf_dir)
    err = compare(name, sdf, oracle_sql()[name], duck)
    assert err is None, f"{name}: {err}"
