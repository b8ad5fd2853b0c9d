"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle, compare row count + column names +
order-insensitive values.

Usage: python tests/oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    import numpy as np

    if isinstance(v, np.ndarray):
        return tuple(normalize(x) for x in v.tolist())
    if isinstance(v, np.generic):
        return normalize(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def compare(name, sdf, sql, con):
    import pandas as pd  # noqa: F401

    spark_pdf = sdf.toPandas()
    duck_pdf = con.sql(sql).df()
    s_cols = sorted(spark_pdf.columns)
    d_cols = sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return f"SCHEMA MISMATCH spark={s_cols} duck={d_cols}"
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWCOUNT MISMATCH spark={len(spark_pdf)} duck={len(duck_pdf)}"
    s_rows = sorted(
        (tuple(normalize(v) for v in row) for row in spark_pdf[s_cols].itertuples(index=False)),
        key=repr,
    )
    d_rows = sorted(
        (tuple(normalize(v) for v in row) for row in duck_pdf[d_cols].itertuples(index=False)),
        key=repr,
    )
    if s_rows != d_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ][:3]
        return f"VALUE MISMATCH sample={diffs}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from mrsboraetl_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = dict(e.queries()), dict(e.oracle_sql())
    # Also sweep the UNREGISTERED oracle-checked operators (kept out of
    # the 50-entry driver cap but held to the same hash standard), so one
    # command covers the whole oracle surface.
    from mrsboraetl_spark.queries import llmdata, relational, streaming_q

    for mod in (relational, llmdata, streaming_q):
        for name, sql in mod.UNREGISTERED_ORACLES.items():
            if name not in qs:
                qs[name] = getattr(mod, name)
                oracles[name] = sql

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = dt.datetime.now()
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                err = compare(name, sdf, oracles[name], con)
            else:
                n = sdf.count()
                err = None if n >= 0 else "NEGATIVE COUNT?"
                err_note = f"(rows-only: {n})"
        except Exception as ex:  # noqa: BLE001
            err = f"EXCEPTION {type(ex).__name__}: {str(ex)[:300]}"
        took = (dt.datetime.now() - t0).total_seconds()
        if err:
            failures.append(name)
            print(f"FAIL {name} [{took:.1f}s] {err}")
        else:
            note = "" if name in oracles else "(rows-only)"
            print(f"ok   {name} [{took:.1f}s] {note}")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
