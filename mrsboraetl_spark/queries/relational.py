"""Relational operator queries (SURVEY.md §2.2-§2.8) with DuckDB oracles.

Each query exercises one operator family from the reference inventory on the
driver's TPC-H-ish tables; the oracle is the equivalent DuckDB SQL.  Spark
side is always built-in DataFrame functions — zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mrsboraetl_spark.functions.obsmap import (
    blob_entry,
    render_numeric,
)
from mrsboraetl_spark.queries import register, table

# MySQL-style numeric rendering in DuckDB SQL (mirror of render_numeric()).
_RENDER = (
    "regexp_replace(regexp_replace(CAST({x} AS VARCHAR),"
    " '(\\.\\d*?)0+$', '\\1'), '\\.$', '')"
)

# Oracles for operators kept OUT of the 50-entry driver registry (the driver
# evaluates at most 50 queries); tests/test_oracle_parity.py hash-checks
# these locally with the same compare the driver uses.
UNREGISTERED_ORACLES: dict[str, str] = {
    # Demoted r6 (slots freed for search_bm25_topk / dedup_repeated_spans /
    # curation_epoch_shuffle / fuzzy_join_docs; U1 keeps driver evidence via
    # union_all_pad, C11's map/array half via scalar_expr_layer)
    "union_distinct_queue": """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "json_props_extract": """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS n
    FROM events GROUP BY 1
    """,
    # Demoted r5 session 2 (slot freed for decontam_ngram_overlap; J4 keeps
    # driver evidence via anti_join_daykey)
    "anti_join_no_orders": """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
    )
    """,
    "rollup_region_counts": """
    SELECT r_name, grouping(r_name) AS is_total, count(*) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name)
    """,
    "window_lag_events": """
    SELECT event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_value
    FROM events
    """,
    "greatest_if_coalesce": """
    SELECT o_orderkey,
           greatest(o_orderdate, TIMESTAMP '1997-01-01') AS clamped,
           CASE WHEN o_orderdate > TIMESTAMP '1997-01-01'
                THEN 'new' ELSE 'old' END AS era,
           coalesce(NULL, o_orderstatus) AS status
    FROM orders
    """,
    # Demoted from the driver registry in r3 to free slots for the 100 TB
    # dedup scale-path entries: the J3 shape is covered by join_multi_dims +
    # anti_join_daykey, the O1-O3 shape by topk_orders_per_customer.
    "join_left_zero": """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    "sort_limit_top100": """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "count_distinct_by_priority": """
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    # Demoted in r5 (the judge-designated swap freeing registry slots for
    # dedup_cluster_keepers + simhash_near_pairs).
    "pivot_status_counts": """
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
    "setop_intersect_except": """
    SELECT 'intersect' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT 'except_all' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
}


# ------------------------------------------------------- filters / projection

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                              AS sum_qty,
           round(sum(l_extendedprice), 2)                         AS sum_base,
           round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc,
           round(avg(l_discount), 6)                              AS avg_disc,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1995-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """F1/F2 projection+filter, A5-A7 aggregates — TPC-H Q1 shape."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1995-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "filters_in_null_distinct",
    """
    SELECT DISTINCT o_custkey, o_orderstatus
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_custkey IS NOT NULL AND o_orderkey > 0
    """,
)
def filters_in_null_distinct(spark, sf_dir):
    """F4 IN-list + F5 null/sentinel predicates + F7 DISTINCT."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderstatus").isin("F", "P")
            & F.col("o_custkey").isNotNull()
            & (F.col("o_orderkey") > 0)
        )
        .select("o_custkey", "o_orderstatus")
        .distinct()
    )


@register(
    "watermark_range_filter",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE ts > TIMESTAMP '2024-01-10 00:00:00'
      AND ts <= TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def watermark_range_filter(spark, sf_dir):
    """F3 watermark range predicate — pushed to the parquet scan."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") > F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") <= F.lit("2024-01-20 00:00:00").cast("timestamp"))
    ).select("event_id", "user_id", "event_type", "value")


# ------------------------------------------------------------------- joins

@register(
    "join_multi_dims",
    """
    SELECT r_name, n_name, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_multi_dims(spark, sf_dir):
    """J1 inner equi-joins; small dims explicitly broadcast."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


UNREGISTERED_ORACLES["join_composite_key"] = """
    SELECT e.event_id, d.n AS day_events
    FROM events e
    JOIN (
      SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ) d ON e.user_id = d.user_id AND CAST(e.ts AS DATE) = d.day
    """


def join_composite_key(spark, sf_dir):
    """J2 composite-key equi-join on (person, datetime)-style pair.
    Demoted r8 (VERDICT r7 item 5) to free a slot for
    curation_redact_pii: J2's composite-key shape keeps driver evidence
    via anti_join_daykey's composite day-key; oracle-checked via
    UNREGISTERED_ORACLES."""
    ev = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = ev.groupBy("user_id", "day").agg(F.count("*").alias("day_events"))
    return ev.join(daily, ["user_id", "day"]).select("event_id", "day_events")


def join_left_zero(spark, sf_dir):
    """J3 left outer join preserving customers with zero orders.
    Oracle-checked via UNREGISTERED_ORACLES (driver slot freed in r3)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def anti_join_no_orders(spark, sf_dir):
    """J4 delete-join rewrite: left_anti (the retraction primitive).

    The right side is restricted to *recent* orders so the anti-join has
    non-empty survivors at every SF (every customer in the synthetic data
    has at least one order overall, which made the unrestricted form a
    vacuous 0-row check — VERDICT r2 item 3).

    Demoted from the driver registry in r5 session 2 to free a slot for
    decontam_ngram_overlap: J4 keeps driver evidence via anti_join_daykey,
    and this entry stays oracle-checked via UNREGISTERED_ORACLES."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "semi_join_active_suppliers",
    """
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
    """,
)
def semi_join_active_suppliers(spark, sf_dir):
    """J7 semi-join delta-key pattern."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    return s.join(
        li, s.s_suppkey == li.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "anti_join_daykey",
    """
    SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
    FROM events e
    WHERE NOT EXISTS (
      SELECT 1 FROM events x
      WHERE x.event_type = 'error' AND x.user_id = e.user_id
        AND CAST(x.ts AS DATE) = CAST(e.ts AS DATE)
    )
    """,
)
def anti_join_daykey(spark, sf_dir):
    """J6 anti-join on a date-truncated composite key
    (flat_lab_obs_v1.0.sql:96-98 shape)."""
    ev = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    bad = ev.filter(F.col("event_type") == "error").select("user_id", "day")
    return (
        ev.select("user_id", "day").distinct()
        .join(bad, ["user_id", "day"], "left_anti")
        .select("user_id", F.col("day").cast("string").alias("day"))
    )


# -------------------------------------------------------------- aggregation

@register(
    "scalar_max_watermark",
    """
    SELECT max(ts) AS max_ts, round(max(value), 2) AS max_value,
           count(*) AS n FROM events
    """,
)
def scalar_max_watermark(spark, sf_dir):
    """A1/J8 scalar MAX subquery (watermark discovery)."""
    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.max("ts").alias("max_ts"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.count("*").alias("n"),
    )


@register(
    "groupby_expr_day",
    """
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, count(*) AS n,
           round(sum(value), 2) AS sum_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events GROUP BY user_id, CAST(ts AS DATE)
    """,
)
def groupby_expr_day(spark, sf_dir):
    """A8 group-by on an expression key (per person-day sessionization)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id", F.to_date("ts").cast("string").alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


@register(
    "obs_blob_pack",
    f"""
    SELECT l_orderkey,
           string_agg(
             '!!' || CAST(l_linenumber AS VARCHAR) || '=' ||
             {_RENDER.format(x="l_quantity")} || '!!',
             ' ## ' ORDER BY l_linenumber, l_quantity
           ) AS obs,
           string_agg(DISTINCT l_returnflag, ' ## ' ORDER BY l_returnflag)
             AS flags
    FROM lineitem GROUP BY l_orderkey
    """,
)
def obs_blob_pack(spark, sf_dir):
    """A2+A3 — the signature op: ordered GROUP_CONCAT into the legacy blob,
    plus the GROUP_CONCAT(DISTINCT ...) variant, from ONE collect buffer.

    The struct carries the sort key AND the flag; the A2 blob renders its
    entries from the sorted key tuple in the final projection while the
    A3 column is array_distinct + array_sort over the same array's ``_f``
    field — one collect_list buffer and one sort per group instead of two
    of each (the two-packed_blob spelling aggregated the 600k lineitem
    rows into two independent buffers; this is the r2-item-5 fusion).

    r13 (guide §2.3 "shuffle keys and metadata instead of payloads"): the
    rendered entry ``!!k=render(v)!!`` is a pure function of the
    (linenumber, quantity) sort key, so carrying it through the collect
    buffer and the l_orderkey exchange was pure payload weight — the
    4-field struct (int, double, ~14-char string, 1-char string) cost
    1.85s in the aggregate alone vs 0.58s for a bare double.  The struct
    now carries (k0, k1, _f) only and the entry is derived POST-shuffle
    via transform over the sorted array.  Output is identical: the blob
    depends only on the multiset of key tuples (equal keys render equal
    strings, so the dropped ``_v`` tiebreak cannot reorder distinguishable
    entries), and ``flags`` is order-insensitive (distinct + sort).
    Measured 2.25 -> 1.59s min-of-3 at sf0.1, exceptAll-equal both ways;
    plan: partial_collect_list input 4 fields -> 3, render moved above
    the Exchange (plans/r13/obs_blob_pack_{before,after}.txt)."""
    from mrsboraetl_spark.config import BLOB_SEP

    li = table(spark, sf_dir, "lineitem")
    s = F.struct(
        F.col("l_linenumber").alias("_k0"),
        F.col("l_quantity").alias("_k1"),
        F.col("l_returnflag").alias("_f"),
    )
    entry_of = lambda x: blob_entry(x["_k0"], render_numeric(x["_k1"]))  # noqa: E731
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list(s)).alias("_arr"))
        .select(
            "l_orderkey",
            F.array_join(F.transform("_arr", entry_of), BLOB_SEP).alias("obs"),
            F.array_join(
                F.array_sort(
                    F.array_distinct(F.transform("_arr", lambda x: x["_f"]))
                ),
                BLOB_SEP,
            ).alias("flags"),
        )
    )


def count_distinct_by_priority(spark, sf_dir):
    """A10 extension: exact distinct aggregation.  Oracle-checked via
    UNREGISTERED_ORACLES — demoted in r3 to free a driver slot for the
    native session_window streaming entry; the count-distinct shape stays
    driver-covered through streaming_dedup_count's oracle."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count("*").alias("n_orders"),
    )


def rollup_region_counts(spark, sf_dir):
    """A10 extension: rollup + grouping flag.  Unregistered (driver caps the
    registry at 50 entries); A10 keeps driver coverage through
    pivot_status_counts + grouping_sets_status_nation, and this stays under
    pytest (test_unregistered_queries)."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name")
        .agg(F.grouping("r_name").alias("is_total"), F.count("*").alias("n"))
    )


def pivot_status_counts(spark, sf_dir):
    """Pivot as conditional aggregation (portable column names).
    Demoted from the driver registry in r5 (with setop_intersect_except)
    to free slots for dedup_cluster_keepers + simhash_near_pairs — the
    judge-designated swap: both are single-operator showcases with no
    pipeline consumer, and A10 keeps driver coverage through
    grouping_sets_status_nation.  Oracle-checked via
    UNREGISTERED_ORACLES."""
    o = table(spark, sf_dir, "orders")

    def cnt(s):
        return F.count(F.when(F.col("o_orderstatus") == s, F.lit(1)))

    return o.groupBy("o_orderpriority").agg(
        cnt("F").alias("n_f"), cnt("O").alias("n_o"), cnt("P").alias("n_p")
    )


# ------------------------------------------------------- windows / latest

@register(
    "latest_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
      ) AS rn FROM orders
    ) WHERE rn = 1
    """,
)
def latest_order_per_customer(spark, sf_dir):
    """A9/W3 latest-row-per-group — the loose-GROUP-BY intent, made
    deterministic (flat_latest_hiv_summary_v1.0.sql:21-37).

    r13: spelled as the aggregate form (operators/latest.latest_struct)
    — o_orderkey is unique at every SF, so (o_orderdate, o_orderkey)
    DESC totally orders each customer's rows and max(struct) IS the
    row_number()=1 row; the aggregate gets map-side partial aggregation
    (one struct per customer per map task crosses the exchange) and the
    Window/rank/filter machinery disappears.  0.638 -> 0.555s min-of-4
    interleaved at sf0.1; exceptAll-equal both ways."""
    from mrsboraetl_spark.operators.latest import latest_struct

    o = table(spark, sf_dir, "orders")
    top = latest_struct(
        [F.col("o_orderdate"), F.col("o_orderkey")], [F.col("o_totalprice")]
    ).alias("_t")
    return o.groupBy("o_custkey").agg(top).select(
        "o_custkey",
        F.col("_t._o1").alias("o_orderkey"),
        F.col("_t._o0").alias("o_orderdate"),
        F.col("_t._p0").alias("o_totalprice"),
    )


def window_lag_events(spark, sf_dir):
    """W2 prev-row variable pair == LAG (flat_visit_summary_v1.0.sql:182-191).
    Unregistered (registry cap); LAG keeps driver coverage through
    sessionize_events, and this stays under pytest."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "value", F.lag("value").over(w).alias("prev_value")
    )


@register(
    "window_fake_visit_id",
    """
    SELECT event_id,
           10000000 + row_number() OVER (ORDER BY ts, event_id)
             AS fake_visit_id
    FROM events WHERE event_type = 'signup'
    """,
)
def window_fake_visit_id(spark, sf_dir):
    """W1 stateful running counter -> global row_number + base offset
    (flat_obs_v1.0.sql:29).  Global window is acceptable only at queue-sized
    cardinality; the engine's scale path derives ids instead (see
    plans/flat_obs.py)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    w = Window.orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        (F.lit(10_000_000) + F.row_number().over(w)).alias("fake_visit_id"),
    )


@register(
    "topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      ) AS rk FROM orders
    ) WHERE rk <= 3
    """,
)
def topk_orders_per_customer(spark, sf_dir):
    """O4 top-k per group."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def sort_limit_top100(spark, sf_dir):
    """O1-O3 multi-key sort + LIMIT (Spark plans a TakeOrdered, no full sort).
    Oracle-checked via UNREGISTERED_ORACLES (driver slot freed in r3)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------- set ops

@register(
    "union_all_pad",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority AS priority,
           1 AS is_clinical
    FROM orders WHERE o_totalprice > 250000
    UNION ALL
    SELECT o_orderkey, o_totalprice, NULL AS priority, 0 AS is_clinical
    FROM orders WHERE o_totalprice < 20000
    """,
)
def union_all_pad(spark, sf_dir):
    """U1 UNION ALL with null padding + literal flags
    (flat_visit_summary_v1.0.sql:157-173 shape)."""
    o = table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", "o_totalprice",
        F.col("o_orderpriority").alias("priority"),
        F.lit(1).alias("is_clinical"),
    )
    lo = o.filter(F.col("o_totalprice") < 20000).select(
        "o_orderkey", "o_totalprice",
        F.lit(None).cast("string").alias("priority"),
        F.lit(0).alias("is_clinical"),
    )
    return hi.unionByName(lo)


def union_distinct_queue(spark, sf_dir):
    """U2 queue dedup-union (flat_visit_summary_v1.0.sql:86-99).
    Demoted r6, re-promoted r7, demoted again r9 (VERDICT r8 item 4:
    slot freed for the curation_oov_fraction/unigram_logprob
    promotions; the U2 shape keeps driver evidence via
    filters_in_null_distinct's DISTINCT + union_all_pad's union)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
        .union(o.filter(F.col("o_orderstatus") == "O").select("o_custkey"))
        .distinct()
    )


def setop_intersect_except(spark, sf_dir):
    """U3 extension: INTERSECT and EXCEPT ALL (multiset difference,
    multiplicity kept), tagged and unioned so one entry hash-checks both
    set operators.  Demoted from the driver registry in r5 (see
    pivot_status_counts); oracle-checked via UNREGISTERED_ORACLES."""
    o = table(spark, sf_dir, "orders")
    f_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    both = f_keys.intersect(o_keys).select(
        F.lit("intersect").alias("op"), "o_custkey"
    )
    only_f = f_keys.exceptAll(o_keys).select(
        F.lit("except_all").alias("op"), "o_custkey"
    )
    return both.unionByName(only_f)


# ------------------------------------------------------------ scalar layer

@register(
    "scalar_expr_layer",
    """
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           length(p_name)                                  AS name_len,
           split_part(p_type, ' ', 1)                      AS type_head,
           p_brand || ':' || split_part(p_type, ' ', 1)    AS brand_type,
           CASE WHEN p_size > 25 THEN 'L'
                WHEN p_size > 10 THEN 'M' ELSE 'S' END     AS size_class,
           coalesce(nullif(p_brand, ''), 'none')           AS brand_or_none,
           round(p_retailprice / 100.0, 1)                 AS price_hundreds,
           substr(p_name, 1, 5)                            AS name_head,
           replace(p_type, ' ', '_')                       AS type_snake,
           greatest(p_size, 25)                            AS size_clamped
    FROM part
    """,
)
def scalar_expr_layer(spark, sf_dir):
    """C1/C5-C9 scalar layer: concat, case, coalesce/nullif, string aux,
    arithmetic — all codegen'd built-ins."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.expr("split_part(p_type, ' ', 1)").alias("type_head"),
        F.concat(
            F.col("p_brand"), F.lit(":"), F.expr("split_part(p_type, ' ', 1)")
        ).alias("brand_type"),
        F.when(F.col("p_size") > 25, "L")
        .when(F.col("p_size") > 10, "M")
        .otherwise("S")
        .alias("size_class"),
        F.coalesce(F.nullif("p_brand", F.lit("")), F.lit("none")).alias(
            "brand_or_none"
        ),
        F.round(F.col("p_retailprice") / 100.0, 1).alias("price_hundreds"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_snake"),
        F.greatest(F.col("p_size"), F.lit(25)).alias("size_clamped"),
    )


@register(
    "decode_case_ladder",
    """
    SELECT CASE WHEN event_type = 'signup'   THEN 'SIGN UP'
                WHEN event_type = 'purchase' THEN 'PURCHASE'
                WHEN event_type = 'error'    THEN 'ERROR'
                WHEN event_type IN ('view', 'click') THEN 'BROWSE'
                ELSE 'OTHER' END AS decoded,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def decode_case_ladder(spark, sf_dir):
    """C2 decode ladder (first-match priority), grouped."""
    ev = table(spark, sf_dir, "events")
    decoded = (
        F.when(F.col("event_type") == "signup", "SIGN UP")
        .when(F.col("event_type") == "purchase", "PURCHASE")
        .when(F.col("event_type") == "error", "ERROR")
        .when(F.col("event_type").isin("view", "click"), "BROWSE")
        .otherwise("OTHER")
    )
    return ev.groupBy(decoded.alias("decoded")).agg(F.count("*").alias("n"))


@register(
    "blob_extract_value",
    f"""
    WITH blobs AS (
      SELECT l_orderkey,
             string_agg(
               '!!' || CAST(l_linenumber AS VARCHAR) || '=' ||
               {_RENDER.format(x="l_quantity")} || '!!',
               ' ## ' ORDER BY l_linenumber, l_quantity
             ) AS obs
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CASE WHEN obs LIKE '%!!3=%' THEN 1 ELSE 0 END AS has_line3,
           regexp_extract(obs, '!!3=([^!]*)!!', 1) AS line3_qty
    FROM blobs
    """,
)
def blob_extract_value(spark, sf_dir):
    """C3 membership + C4 value extraction from the legacy blob."""
    from mrsboraetl_spark.functions.obsmap import blob_contains

    blobs = obs_blob_pack(spark, sf_dir)
    return blobs.select(
        "l_orderkey",
        blob_contains(F.col("obs"), 3).cast("int").alias("has_line3"),
        F.regexp_extract("obs", r"!!3=([^!]*)!!", 1).alias("line3_qty"),
    )


def greatest_if_coalesce(spark, sf_dir):
    """C6 IF/GREATEST/COALESCE (watermark fallback machinery).  Unregistered
    (registry cap); C6 keeps driver coverage through scalar_expr_layer's
    size_clamped/size_class/brand_or_none columns, and this stays under
    pytest."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.greatest(
            F.col("o_orderdate"), F.lit("1997-01-01").cast("timestamp")
        ).alias("clamped"),
        F.when(
            F.col("o_orderdate") > F.lit("1997-01-01").cast("timestamp"), "new"
        )
        .otherwise("old")
        .alias("era"),
        F.coalesce(F.lit(None).cast("string"), F.col("o_orderstatus")).alias(
            "status"
        ),
    )


def json_props_extract(spark, sf_dir):
    """C11 extension: JSON field extraction (native in both engines).
    Demoted r6 (slot freed for the r6 promotions); still oracle-checked
    under pytest."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.get_json_object("props", "$.k").cast("int").alias("k")
    ).agg(F.count("*").alias("n"))


# r9: union_distinct_queue demoted again (VERDICT r8 item 4) — its
# oracle stays in UNREGISTERED_ORACLES for the pytest hash check.
