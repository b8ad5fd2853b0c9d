"""Structured-Streaming queries (SURVEY.md §2.9 I5), registered LAST.

These are the slowest registry entries (each spins up a micro-batch run),
so they sit at the end of the registration order: if the driver ever
truncates or times out partway through the registry, the cheap batch
operators still all get evaluated first.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mrsboraetl_spark.queries import register


@register(
    "streaming_tumbling_daily",
    """
    SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_tumbling_daily(spark, sf_dir):
    """I5/Structured Streaming: 1-day tumbling-window aggregation driven as a
    real stream (readStream over the parquet dir, drained through a file
    sink).  Oracle = the batch equivalent — streaming and batch must agree
    on complete data."""
    from mrsboraetl_spark.streaming import drain_to_batch, stream_events

    stream = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("day"), "event_type", "n", "sum_value"
        )
    )
    return drain_to_batch(stream, "complete")


# Demoted r7 (VERDICT r6 item 3; I5 keeps three driver rows via
# tumbling/session_window/stateful); oracle-checked under pytest like
# relational/llmdata's UNREGISTERED_ORACLES.
UNREGISTERED_ORACLES: dict[str, str] = {
    "streaming_dedup_count": """
    SELECT event_type, count(DISTINCT event_id) AS n
    FROM events GROUP BY event_type
    """,
}


def streaming_dedup_count(spark, sf_dir):
    """Streaming stateful exact dedup: dropDuplicates on the event key holds
    seen-key state in the state store (the streaming form of dedup_exact),
    then a complete-mode count per type.  Demoted r7 (VERDICT r6 item 3)."""
    from mrsboraetl_spark.streaming import drain_to_batch, stream_events

    stream = (
        stream_events(spark, sf_dir)
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    return drain_to_batch(stream, "complete")


UNREGISTERED_ORACLES["streaming_session_window"] = """
    WITH seq AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                    OR epoch(ts) - epoch(prev_ts) >= 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM seq
    ), sess AS (
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), per AS (
      SELECT user_id, sid, count(*) AS n FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n) AS BIGINT) AS n_events,
           max(n) AS max_session_events
    FROM per GROUP BY user_id
    """


def streaming_session_window(spark, sf_dir):
    """Native session_window streaming aggregation (30-min inactivity gap),
    drained in complete mode, rolled up per user.  Oracle = lag-based gap
    sessionization; Spark closes a session when the gap is >= the timeout
    (window end is exclusive at last_ts + gap), so the oracle's split
    predicate is >= 1800s — NOT the strict > the batch sessionize_events
    entry uses (see tests/test_streaming.py boundary caveat).  Demoted
    r8 (VERDICT r7 item 5) to free a slot for
    profile_source_percentiles: I5 keeps two driver rows
    (streaming_tumbling_daily, streaming_stateful_user_stats);
    oracle-checked via UNREGISTERED_ORACLES."""
    from mrsboraetl_spark.streaming import drain_to_batch, stream_events

    stream = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "10 days")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    sessions = drain_to_batch(stream, "complete")
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("max_session_events"),
    )


@register(
    "streaming_stateful_user_stats",
    """
    SELECT user_id, count(*) AS n_events, max(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def streaming_stateful_user_stats(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running (count, max) state across micro-batches, drained to its final
    value per key.  The update-mode stream may emit a row per key per batch;
    both tracked quantities are monotone, so the final state is the max."""
    from mrsboraetl_spark.streaming import drain_to_batch, stream_events
    from mrsboraetl_spark.streaming.stateful import running_user_stats

    out = drain_to_batch(running_user_stats(stream_events(spark, sf_dir)))
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("max_value").alias("max_value"),
    )
