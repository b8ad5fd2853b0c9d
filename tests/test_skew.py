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
