"""JDBC source round-trip (S1) against embedded Derby — the production
read path (partitioned scan + pushed-down predicate) with a real database,
no external server required."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mrsboraetl_spark.sources.readers import read_jdbc_table

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def jdbc_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db};create=true"
    src = spark.range(0, 1000).select(
        F.col("id").alias("obs_id"),
        (F.col("id") % 50).alias("person_id"),
        (F.col("id") % 7).cast("int").alias("voided"),
    )
    src.write.format("jdbc").option("url", url).option(
        "dbtable", "obs"
    ).option("driver", DRIVER).mode("overwrite").save()
    return url


def test_jdbc_full_scan(spark, jdbc_url):
    df = read_jdbc_table(
        spark, jdbc_url, "obs", properties={"driver": DRIVER}
    )
    assert df.count() == 1000
    assert set(df.columns) == {"obs_id", "person_id", "voided"}


def test_jdbc_pushed_predicate(spark, jdbc_url):
    """The predicate lands inside the generated subquery — evaluated by the
    database, exactly like the reference's watermark scans (F3)."""
    df = read_jdbc_table(
        spark, jdbc_url, "obs", predicate='"voided" = 0',
        properties={"driver": DRIVER},
    )
    assert df.count() == 1000 // 7 + 1


def test_jdbc_partitioned_read(spark, jdbc_url):
    """Range-partitioned scan: N parallel connections, each a bounded slice."""
    df = read_jdbc_table(
        spark, jdbc_url, "obs",
        partition_column='"obs_id"', num_partitions=4,
        lower_bound=0, upper_bound=1000,
        properties={"driver": DRIVER},
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    assert df.agg(F.sum("obs_id")).first()[0] == 999 * 1000 // 2


# ------------------------------------------- MySQL dialect (no server)


def test_mysql_pushdown_subquery_shape():
    """The generated dbtable subquery for the reference's watermark scan,
    spelled in MySQL's dialect: backticked identifiers, single-quoted
    timestamp literal — all constructs valid under default sql_mode."""
    from mrsboraetl_spark.sources.readers import jdbc_pushdown_subquery

    sql = jdbc_pushdown_subquery(
        "openmrs.obs",
        "`voided` = 0 and `date_created` > '2024-06-01 00:00:00'",
        dialect="mysql",
    )
    assert sql == (
        "(select * from openmrs.obs where `voided` = 0 and "
        "`date_created` > '2024-06-01 00:00:00') t"
    )
    # No predicate: the bare table name passes through untouched.
    assert jdbc_pushdown_subquery("openmrs.obs", dialect="mysql") == "openmrs.obs"


def test_mysql_dialect_rejects_ansi_quoted_identifiers():
    """Under MySQL's default sql_mode a double-quoted token is a STRING
    LITERAL: the Derby-style predicate '"voided" = 0' would silently
    become the constant 'voided' = 0 (true for every row — the
    watermark filter stops filtering).  Silent corruption, so reject."""
    import pytest as _pytest

    from mrsboraetl_spark.sources.readers import jdbc_pushdown_subquery

    with _pytest.raises(ValueError, match="backticks"):
        jdbc_pushdown_subquery("obs", '"voided" = 0', dialect="mysql")
    # The same predicate stays legal under the ANSI/Derby default.
    assert '"voided"' in jdbc_pushdown_subquery("obs", '"voided" = 0')
    # Double quotes INSIDE a single-quoted literal are just characters —
    # a valid MySQL predicate must pass (review finding r6).
    ok = jdbc_pushdown_subquery(
        "obs",
        "note_text <> 'said \"stop\"' and `voided` = 0",
        dialect="mysql",
    )
    assert '"stop"' in ok
    # An escaped '' inside the literal doesn't end it early.
    ok2 = jdbc_pushdown_subquery(
        "obs", "t <> 'it''s \"quoted\"'", dialect="mysql"
    )
    assert "it''s" in ok2


def test_mysql_guard_handles_backslash_escaped_quotes():
    """MySQL's default sql_mode escapes quotes as BOTH '' and \\'.
    A predicate using \\' must not confuse the literal stripper: the
    unsound case (a real double-quoted identifier hiding behind a
    mispaired literal) must still be rejected, and the valid case
    (double quotes inside a backslash-escaped literal) must pass."""
    import pytest as _pytest

    from mrsboraetl_spark.sources.readers import jdbc_pushdown_subquery

    # Unsound before the fix: mispairing made "col" vanish into a
    # phantom literal and the constant comparison slipped through.
    with _pytest.raises(ValueError, match="backticks"):
        jdbc_pushdown_subquery(
            "obs", "a = 'it\\'s' and \"col\" = 'x'", dialect="mysql"
        )
    # Over-strict before the fix: fully valid MySQL predicate.
    ok = jdbc_pushdown_subquery(
        "obs", "a = 'don\\'t say \"hi\"'", dialect="mysql"
    )
    assert '"hi"' in ok


def test_jdbc_pushdown_max_signal(spark, jdbc_url):
    """r8 (VERDICT r7 item 4): the change-signal MAX is pushed down as
    a one-row dbtable subquery — the source database answers from its
    indexes instead of shipping the table through the JDBC pipe."""
    from mrsboraetl_spark.sources.footer_stats import jdbc_column_maxes

    got = jdbc_column_maxes(
        spark, jdbc_url, "obs", ("obs_id", "person_id"),
        properties={"driver": DRIVER},
    )
    assert got == {"obs_id": 999, "person_id": 49}
