"""As-of join — the classic time-series operator Spark lacks natively.

For each left row, attach the payload of the latest right row with the same
key and ``right_ts <= left_ts``.  The naive spelling is a theta join
(``l.key = r.key AND r.ts <= l.ts`` + max-per-group) whose intermediate is
O(|L| x matches) — quadratic on active keys.  The engine uses the scalable
union+window form instead:

1. tag right rows (carrying payload) and left rows (payload = NULL);
2. one window per key ordered by (ts, right-before-left on ties):
   ``last(payload, ignorenulls=True)`` over rows unbounded-preceding;
3. keep the left rows, now carrying the as-of payload.

Cost: ONE shuffle of |L|+|R| on the key — no theta join, no per-key
collect, linear state.  Exactly the plan you want at 100 TB, and the same
trick extends to as-of-backward (flip the ordering) or tolerance bands
(filter on ts delta afterwards).

Ties: right rows sort before left rows at equal ts (<= semantics); when
MULTIPLE right rows may share (key, ts), pass ``right_tiebreak`` — extra
right-side columns appended ascending to the window order, so the LAST
right row under the tiebreak wins (e.g. a unique id column makes "the
max-id row at that timestamp" win, exactly what pre-aggregating to
``max_by(payload, id)`` per (key, ts) produced — without the aggregation's
extra exchange over the right table; r13, guide §2.4).  Without a
tiebreak the winner among exact (key, ts) duplicates is undefined
(DuckDB's native ASOF JOIN leaves it undefined too).  NULL payload values
on matched right rows are skipped by ``ignorenulls`` (the previous
non-null wins) — pack payloads in a struct if NULL-vs-no-match must be
distinguished.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    right_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every left row + payload of the latest right row at
    or before its timestamp (NULLs when no right row precedes it).

    Payload columns travel under internal ``_p_`` names so a payload name
    may legally collide with a left column (the natural call shape:
    refreshing a stale copy the left already carries); a colliding payload
    surfaces with an ``_asof`` suffix in the output instead of clobbering
    the left column.  ``right_tiebreak``: see the module docstring — makes
    (key, ts)-duplicate right rows resolve deterministically (last under
    the ascending tiebreak wins) without pre-aggregating the right side.
    """
    on = list(on)
    tiebreak = list(right_tiebreak)
    lcols = left.columns
    tagged_r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"_tb_{i}") for i, c in enumerate(tiebreak)],
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on],
    )
    tagged_l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_tb_{i}")
          for i, c in enumerate(tiebreak)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}")
          for c in payload_cols],
        *[F.col(c) for c in lcols if c not in on],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("_ts").asc(),
            F.col("_is_right").desc(),
            *[F.col(f"_tb_{i}").asc() for i in range(len(tiebreak))],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = tagged_r.unionByName(tagged_l).select(
        "*",
        *[
            F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in payload_cols
        ],
    )
    left_keep = [c for c in lcols if c not in on]
    out_name = {
        c: (f"{c}_asof" if c in set(on) | set(left_keep) else c)
        for c in payload_cols
    }
    return (
        matched.filter(F.col("_is_right") == 0)
        .select(
            *on,
            *[F.col(c) for c in left_keep],
            *[F.col(f"_asof_{c}").alias(out_name[c]) for c in payload_cols],
        )
    )
