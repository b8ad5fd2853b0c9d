"""Latest-row-per-group — the deterministic replacement for MySQL's "loose"
GROUP BY (SURVEY §2.4 A9, flat_latest_hiv_summary_v1.0.sql:21-37).

MySQL lets bare columns ride along under GROUP BY with *arbitrary* row
semantics; the reference's intent is "the latest row per patient".  Spark's
analyzer rightly rejects the loose form, so the engine implements the intent:
``row_number() over (partition by keys order by ord desc) = 1`` for the
row-anchored columns, optionally combined with true per-group aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """One row per ``keys``: the first row under ``order_by`` (pass desc()
    columns for "latest").  ``tiebreak`` columns make the choice total when
    the ordering alone has ties — determinism the MySQL original lacks
    (quirk 8).
    """
    ordering = list(order_by) + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def latest_struct(
    order_desc: Sequence[Column],
    payload: Sequence[Column],
) -> Column:
    """The AGGREGATE form of latest-per-group for TOTAL orderings: a
    ``max(struct(...))`` whose leading fields are the ordering columns
    (descending semantics — pass ``-col`` / an inverted encoding for an
    ascending tiebreak) and whose trailing fields carry the row's payload.

    Legal iff the ordering columns totally order each group (e.g. they
    end in a unique id) and are non-null: struct comparison is
    lexicographic, so the payload fields can never be reached by the
    comparison and the max struct IS the row_number()=1 row of
    :func:`latest_per_group`.

    Why it exists (r13, guide §2.3 "aggregate before you shuffle"): the
    window form ships its surviving rows to the group's reducer, re-sorts
    them by (key, ordering), ranks, and filters; ``max(struct)`` is a
    declarative aggregate with map-side PARTIAL aggregation — one struct
    per (group x map task) crosses the exchange and the whole
    Window/rank/filter machinery (and, for snapshot callers, the
    snapshot⋈aggregates join) disappears.  Struct buffers are not
    hash-aggregable, so Spark plans it as a SortAggregate — the sorts are
    by the bare group key over partially-aggregated rows, cheaper than
    the window's (key, ordering) sorts over data rows.  Pinned equal to
    the window form on arbitrary generated data
    (tests/test_properties.py).

    Unpack payload fields positionally: ``agg(latest_struct(...)
    .alias("_t")`` then ``F.col("_t._p0")`` etc.
    """
    fields = [c.alias(f"_o{i}") for i, c in enumerate(order_desc)]
    fields += [c.alias(f"_p{i}") for i, c in enumerate(payload)]
    return F.max(F.struct(*fields))


def latest_snapshot_with_aggs(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    bare_cols: Sequence[str],
    agg_exprs: Sequence[Column],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """A9 in full: latest row's ``bare_cols`` + true ``agg_exprs`` per group,
    joined on the keys — one shuffle each side, co-partitioned on ``keys``.
    """
    latest = latest_per_group(
        df, keys, [F.col(order_col).desc()], tiebreak
    ).select(*keys, order_col, *bare_cols)
    aggs = df.groupBy(*keys).agg(*agg_exprs)
    return latest.join(aggs, list(keys))
