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
