"""Streaming joins.

* ``enrich_with_static`` — stream-static: every micro-batch equi-joins
  the (broadcast) dimension snapshot; no state, no watermark needed.
  The dimension is re-resolved per batch, so a slowly-changing dim picks
  up updates between batches.
* ``interval_self_join`` — stream-stream with event-time bounds: both
  sides carry watermarks and the join condition bounds the time skew, so
  Spark can size the join state and evict rows once the watermark passes
  their reach.  WITHOUT the time bound the state grows forever — the
  bound is not an optimization, it is what makes the join runnable.

At scale the stream-stream state is partitioned by the join key in the
state store, the same layout as a batch shuffle join, but persistent
across micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_static(
    stream: DataFrame, dim: DataFrame, on: list[str]
) -> DataFrame:
    """Stream-static equi-join; the static side broadcasts per batch."""
    return stream.join(F.broadcast(dim), on)


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    within: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Join right events to left events of the same key with
    ``left_ts <= right_ts <= left_ts + within`` (e.g. purchases following
    a signup).  Both sides MUST be streaming DataFrames with event-time
    columns (distinct column names — rename before calling); ``within``
    and ``watermark`` are interval strings."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[left_key] == rw[right_key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond)
