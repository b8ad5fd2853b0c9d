"""Pipeline-shaped queries: the reference's flattening/incremental protocol
re-expressed on the driver's `events` stream table (SURVEY.md §2.9, §3).

These are the same plan shapes the five OpenMRS stages use (see plans/),
exercised on driver-provided data so the DuckDB oracle can hash-check them.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mrsboraetl_spark.config import SYNTHETIC_ENCOUNTER_OFFSET
from mrsboraetl_spark.functions.obsmap import (
    blob_entry,
    packed_blob,
    render_numeric,
)
from mrsboraetl_spark.queries import register, table
from mrsboraetl_spark.queries.relational import _RENDER

_CUT = "2024-01-15 00:00:00"


@register(
    "flat_events_blob",
    f"""
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           min(event_id) + {SYNTHETIC_ENCOUNTER_OFFSET} AS synthetic_id,
           string_agg(
             '!!' || event_type || '=' || {_RENDER.format(x="value")} || '!!',
             ' ## ' ORDER BY event_type, value
           ) AS obs,
           string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)
             AS event_ids,
           count(*) AS n_events,
           max(ts) AS max_ts
    FROM events
    GROUP BY user_id, CAST(ts AS DATE)
    """,
)
def flat_events_blob(spark, sf_dir):
    """The flagship flat_lab_obs-shaped flattening on `events`: per
    (user_id, day) group — synthetic key min(id)+1e8
    (flat_lab_obs_v1.0.sql:105), ordered obs blob (A2), deterministic
    lineage blob (A4, sorted where MySQL left it nondeterministic)."""
    ev = table(spark, sf_dir, "events")
    # r13 (guide §2.3): the blob entry is a pure function of the
    # (event_type, value) sort key — render it post-shuffle from the
    # sorted key struct instead of carrying the rendered string through
    # the collect buffer and the exchange (see ordered_collect.entry_of).
    entry_of = lambda x: blob_entry(  # noqa: E731
        x["_k0"], render_numeric(x["_k1"])
    )
    return (
        ev.groupBy("user_id", F.to_date("ts").cast("string").alias("day"))
        .agg(
            (F.min("event_id") + SYNTHETIC_ENCOUNTER_OFFSET).alias("synthetic_id"),
            packed_blob(
                None,
                [F.col("event_type"), F.col("value")],
                entry_of=entry_of,
            ).alias("obs"),
            F.array_join(
                F.array_sort(F.collect_list(F.col("event_id"))).cast(
                    "array<string>"
                ),
                ",",
            ).alias("event_ids"),
            F.count("*").alias("n_events"),
            F.max("ts").alias("max_ts"),
        )
    )


@register(
    "latest_event_snapshot",
    """
    WITH latest AS (
      SELECT user_id, event_type AS latest_type, value AS latest_value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id
        ) AS rn FROM events
      ) WHERE rn = 1
    ), aggs AS (
      SELECT user_id, round(max(value), 2) AS max_value, count(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT l.user_id, latest_type, latest_value, max_value, n_events
    FROM latest l JOIN aggs a ON l.user_id = a.user_id
    """,
)
def latest_event_snapshot(spark, sf_dir):
    """A9 in full (flat_latest_hiv_summary shape): latest row's bare columns
    + true MAX aggregates over the same groups.

    r13: one groupBy carries BOTH — the latest row via the aggregate form
    (operators/latest.latest_struct; event_id unique and ts non-null at
    every SF, the asc tiebreak encoded as max(-event_id)) and the true
    aggregates as siblings.  The window pass, its rank filter, AND the
    snapshot⋈aggregates join all disappear; the single aggregate gets
    map-side partial aggregation.  0.237 -> 0.202s min-of-5 interleaved
    at sf0.1; exceptAll-equal both ways."""
    from mrsboraetl_spark.operators.latest import latest_struct

    ev = table(spark, sf_dir, "events")
    top = latest_struct(
        [F.col("ts"), -F.col("event_id")],
        [F.col("event_type"), F.col("value")],
    ).alias("_t")
    return ev.groupBy("user_id").agg(
        top,
        F.round(F.max("value"), 2).alias("max_value"),
        F.count("*").alias("n_events"),
    ).select(
        "user_id",
        F.col("_t._p0").alias("latest_type"),
        F.col("_t._p1").alias("latest_value"),
        "max_value", "n_events",
    )


@register(
    "incremental_upsert_equiv",
    """
    SELECT user_id, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def incremental_upsert_equiv(spark, sf_dir):
    """I1-I4 protocol end-to-end on `events`: phase 1 aggregates rows with
    ts <= watermark; phase 2 detects changed keys (ts > wm), retracts and
    recomputes *whole groups* from base data (I3 delete+reaggregate), then
    REPLACE-INTO-merges.  Result must equal the one-shot aggregation — the
    oracle is exactly that one-shot SQL."""
    from mrsboraetl_spark.operators.upsert import replace_into

    ev = table(spark, sf_dir, "events")
    wm = F.lit(_CUT).cast("timestamp")

    def agg(df):
        return df.groupBy("user_id").agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
        )

    phase1 = agg(ev.filter(F.col("ts") <= wm))
    changed_keys = ev.filter(F.col("ts") > wm).select("user_id").distinct()
    recomputed = agg(ev.join(changed_keys, "user_id", "left_semi"))
    # new_keys=changed_keys (r13, guide §2.4): recomputed's key set IS
    # changed_keys (every changed key owns at least its own ts > wm
    # event, so the semi-join drops none), and passing it spares the
    # anti-join from re-running the scan+semi-join+aggregate subtree a
    # second time just to list the delta's keys — plan: 8 exchanges ->
    # 6, events scanned 4x -> 3x.  Result identical (oracle-verified
    # sf0.001/0.01/0.1; key-set contract pinned in
    # test_properties.test_replace_into_with_precomputed_keys).
    return replace_into(
        phase1, recomputed, ["user_id"], new_keys=changed_keys
    )


@register(
    "sessionize_events",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def sessionize_events(spark, sf_dir):
    """Sessionization (gap > 30 min) via lag + cumulative flag — the batch
    equivalent of a session window; W2's LAG put to real use."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events")
    )


@register(
    "salted_skew_aggregate",
    """
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
           round(max(value), 2) AS max_value
    FROM events GROUP BY event_type
    """,
)
def salted_skew_aggregate(spark, sf_dir):
    """Skew-safe two-stage aggregation (operators/skew.py): the handful of
    event_type keys would funnel everything through a few reducers; salting
    spreads each key over 16 sub-keys first.  Result must equal the plain
    one-stage GROUP BY (the oracle)."""
    from mrsboraetl_spark.operators.skew import salted_aggregate

    ev = table(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        aggs=[
            ("event_id", "count_star", "n"),  # oracle says COUNT(*)
            ("value", "sum", "sum_raw"),
            ("value", "max", "max_raw"),
        ],
        salt_src="event_id",
        n_salts=16,
    )
    return out.select(
        "event_type", "n",
        F.round("sum_raw", 2).alias("sum_value"),
        F.round("max_raw", 2).alias("max_value"),
    )


@register(
    "asof_join_latest_order",
    """
    WITH r AS (
      SELECT o_custkey, o_orderdate,
             max(o_orderkey) AS o_orderkey,
             max_by(o_totalprice, o_orderkey) AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts, r.o_orderkey, r.o_totalprice
    FROM events e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
)
def asof_join_latest_order(spark, sf_dir):
    """As-of join (operators/asof.py): each event gets the customer's latest
    order at or before the event time — one shuffle union+window, no theta
    join.  The oracle pre-aggregates orders to one row per (key, ts) with
    max/max_by(·, o_orderkey) purely to make ties deterministic; since
    o_orderkey is unique (PK, verified at every SF), ordering right rows
    by o_orderkey inside the as-of window picks exactly that row — so the
    raw orders table rides the union directly and the aggregation's
    exchange over orders disappears (r13, guide §2.4: 2 Exchanges + 2
    HashAggregates -> 1 Exchange; strictly fewer shuffled bytes at any
    scale).  Interleaved same-JVM A/B at sf0.1: 0.836 -> 0.437s min-of-4
    (0.52x); exceptAll-equal both ways; oracle-green at all SFs."""
    from mrsboraetl_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate", "o_orderkey", "o_totalprice",
    )
    return asof_join(
        ev.select("event_id", "user_id", "ts"),
        orders,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        right_tiebreak=["o_orderkey"],
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")


@register(
    "grouping_sets_status_nation",
    """
    SELECT n_name, o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (o_orderstatus), ())
    """,
)
def grouping_sets_status_nation(spark, sf_dir):
    """A10 extension: GROUPING SETS partial aggregates in one pass (Spark
    plans a single shuffle with an Expand, not three scans)."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = orders.join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return joined.groupingSets(
        [["n_name"], ["o_orderstatus"], []], "n_name", "o_orderstatus"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "visit_summary_equiv",
    f"""
    WITH daily AS (
      SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             min(event_id) + {SYNTHETIC_ENCOUNTER_OFFSET} AS synthetic_id,
             string_agg(
               '!!' || event_type || '=' || {_RENDER.format(x="value")} || '!!',
               ' ## ' ORDER BY event_type, value
             ) AS obs,
             count(*) AS n_events,
             max(ts) AS max_ts,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p,
             max(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS has_e,
             max(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS has_s
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), latest AS (
      SELECT user_id, event_type AS latest_type,
             round(value, 2) AS latest_value
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn FROM events
      ) WHERE rn = 1
    )
    SELECT d.user_id, d.day, d.synthetic_id, d.obs, d.n_events, d.max_ts,
           CASE WHEN has_p = 1 THEN 'PURCHASE'
                WHEN has_e = 1 THEN 'ERROR'
                WHEN has_s = 1 THEN 'SIGNUP'
                ELSE 'BROWSE' END AS visit_type,
           l.latest_type, l.latest_value
    FROM daily d JOIN latest l ON d.user_id = l.user_id
    """,
)
def visit_summary_equiv(spark, sf_dir):
    """The flagship pipeline shape end-to-end on driver data: the
    flat_visit_summary plan (decode ladder + A2 blob + W3 latest join,
    plans/flat_visit_summary.py) re-expressed over `events` so the whole
    composition gets one driver-hash-checked row.  Per (user, day): the
    synthetic encounter id (min id + offset), the ordered obs blob, a
    first-match presence-decode of the day's events, and the user's
    overall latest event."""
    ev = table(spark, sf_dir, "events")
    # ONE user_id exchange feeds both branches (r13, guide §2.4 "two
    # operations keyed the same way can share one exchange"):
    # HashPartitioning(user_id) satisfies the daily aggregate's
    # ClusteredDistribution(user_id, day) AND the latest window's
    # PARTITION BY user_id, and the two branches' identical
    # scan+repartition subtrees collapse into a single shuffle via
    # ReuseExchange.  Before: events scanned twice and shuffled twice
    # (one Exchange per branch); after: one scan, one Exchange, and the
    # final join is already co-partitioned on user_id.  Group contents
    # are partitioning-independent (the blob is array_sort'ed, the
    # window ordering is total), so results are identical.
    ev = ev.repartition("user_id")
    # r13 (guide §2.3): blob entries rendered post-shuffle from the sort
    # keys (see flat_events_blob / ordered_collect.entry_of).
    entry_of = lambda x: blob_entry(  # noqa: E731
        x["_k0"], render_numeric(x["_k1"])
    )

    def has(t):
        return F.max(F.when(F.col("event_type") == t, 1).otherwise(0))

    # r13 single pass (guide §1.2 "remove unnecessary passes"): the
    # oracle's `latest` CTE is row_number() OVER (PARTITION BY user_id
    # ORDER BY ts DESC, event_id DESC) = 1.  event_id is unique and ts
    # non-null (verified at every SF), so struct(ts, event_id) totally
    # orders each user's rows and that row is exactly
    # max(struct(ts, event_id, ...)) — the trailing payload fields can
    # never be reached by the lexicographic comparison.  Folding that max
    # into the daily aggregate and resolving the per-user winner with a
    # window over the DAILY rows (already hash-partitioned by user_id —
    # no new exchange) deletes the second full pass over raw events
    # (sort + row_number + filter) AND the daily⋈latest join.  Inner-join
    # semantics are preserved: every daily row's user has >= 1 event, so
    # the join never dropped rows.  exceptAll-equal both ways at sf0.1;
    # oracle-green at all three SFs.
    daily = ev.groupBy(
        "user_id", F.to_date("ts").cast("string").alias("day")
    ).agg(
        (F.min("event_id") + SYNTHETIC_ENCOUNTER_OFFSET).alias("synthetic_id"),
        packed_blob(
            None, [F.col("event_type"), F.col("value")], entry_of=entry_of
        ).alias("obs"),
        F.count("*").alias("n_events"),
        F.max("ts").alias("max_ts"),
        has("purchase").alias("has_p"),
        has("error").alias("has_e"),
        has("signup").alias("has_s"),
        F.max(
            F.struct(
                F.col("ts").alias("_ts"),
                F.col("event_id").alias("_eid"),
                F.col("event_type").alias("_lt"),
                F.col("value").alias("_lv"),
            )
        ).alias("_lk"),
    )
    visit_type = (
        F.when(F.col("has_p") == 1, "PURCHASE")
        .when(F.col("has_e") == 1, "ERROR")
        .when(F.col("has_s") == 1, "SIGNUP")
        .otherwise("BROWSE")
    )
    lk = F.max("_lk").over(Window.partitionBy("user_id"))
    return daily.select(
        "user_id", "day", "synthetic_id", "obs", "n_events", "max_ts",
        visit_type.alias("visit_type"),
        lk["_lt"].alias("latest_type"),
        F.round(lk["_lv"], 2).alias("latest_value"),
    )


# Streaming queries live in queries/streaming_q.py, imported LAST by
# queries/__init__.py so the slow micro-batch entries close the registry.
