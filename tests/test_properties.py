"""Property tests (SURVEY §5.3): blob/map codec round-trip and upsert
algebra under adversarial values — separator collisions ('!!', ' ## ', '='
inside text values), unicode, numeric edge renderings.

Each hypothesis example is a full batch of rows through ONE Spark job
(per-row examples would pay session/job overhead thousands of times), so
max_examples stays small while row-level variety stays high.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

NASTY_TEXT = st.one_of(
    st.text(min_size=1, max_size=12),
    st.sampled_from(["!!", " ## ", "=", "!!7=x!!", "a ## b", "x=y", "é☃"]),
)

OBS_ROW = st.fixed_dictionaries(
    {
        "concept_id": st.integers(1, 50),
        "value_coded": st.one_of(st.none(), st.integers(1, 9999)),
        "value_numeric": st.one_of(
            st.none(),
            st.floats(
                allow_nan=False, allow_infinity=False, min_value=-1e6,
                max_value=1e6,
            ),
        ),
        "value_text": st.one_of(st.none(), NASTY_TEXT),
    }
)


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(OBS_ROW, min_size=1, max_size=60))
def test_blob_render_roundtrips_map(spark, rows):
    """render_legacy_blob(obs_map) must equal the directly-packed blob for
    ANY values, including ones containing the blob's own delimiters."""
    from mrsboraetl_spark.functions.obsmap import (
        blob_entry, obs_map_from_entries, packed_blob, render_legacy_blob,
        typed_value,
    )

    df = spark.createDataFrame(
        [
            (i % 7, r["concept_id"], r["value_coded"], r["value_numeric"],
             r["value_text"])
            for i, r in enumerate(rows)
        ],
        "gid int, concept_id int, value_coded int, value_numeric double, "
        "value_text string",
    )
    value = F.coalesce(
        F.col("value_coded").cast("string"),
        F.col("value_numeric").cast("string"),
        F.col("value_text"),
    )
    order = [F.col("concept_id"), F.col("value_coded")]
    agg = df.groupBy("gid").agg(
        obs_map_from_entries(F.col("concept_id"), value, order).alias("m"),
        packed_blob(blob_entry(F.col("concept_id"), value), order).alias("blob"),
    )
    bad = agg.filter(render_legacy_blob(F.col("m")) != F.col("blob")).count()
    assert bad == 0


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 100)),
                  min_size=0, max_size=30),
    delta=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 100)),
                   min_size=1, max_size=30),
)
def test_replace_into_idempotent(spark, base, delta):
    """replace_into(replace_into(t, d), d) == replace_into(t, d), and new
    rows always win on PK collision."""
    from mrsboraetl_spark.operators.upsert import dedupe_latest, replace_into

    t = spark.createDataFrame(base or [(999, -1)], "pk int, v int")
    d = dedupe_latest(
        spark.createDataFrame(delta, "pk int, v int"), ["pk"], "v"
    )
    once = replace_into(t, d, ["pk"]).localCheckpoint()
    twice = replace_into(once, d, ["pk"]).localCheckpoint()
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # every delta PK carries the delta's value in the result
    got = {r["pk"]: r["v"] for r in once.collect()}
    want = {r["pk"]: r["v"] for r in d.collect()}
    for pk, v in want.items():
        assert got[pk] == v


ASOF_LEFT = st.fixed_dictionaries(
    {"key": st.integers(0, 4), "lts": st.integers(0, 100)}
)
ASOF_RIGHT = st.fixed_dictionaries(
    {"key": st.integers(0, 4), "rts": st.integers(0, 100),
     "payload": st.integers(-999, 999)}
)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=st.lists(ASOF_LEFT, min_size=1, max_size=40),
    rrows=st.lists(ASOF_RIGHT, min_size=0, max_size=40),
)
def test_asof_join_matches_brute_force(spark, lrows, rrows):
    """The union+window as-of join must agree with the per-row brute-force
    definition (latest right row with rts <= lts per key; max payload
    breaks (key, rts) duplicates after the documented pre-aggregation)
    for ANY generated timeline, including empty right sides, duplicate
    timestamps, and keys with no match."""
    from mrsboraetl_spark.operators.asof import asof_join

    # documented contract: pre-aggregate the right side to one row per
    # (key, rts) so ties are well-defined
    dedup_r: dict[tuple[int, int], int] = {}
    for r in rrows:
        k = (r["key"], r["rts"])
        dedup_r[k] = max(dedup_r.get(k, -10**9), r["payload"])

    left = spark.createDataFrame(
        [(i, r["key"], r["lts"]) for i, r in enumerate(lrows)],
        "row_id long, key long, lts long",
    )
    right = spark.createDataFrame(
        [(k, t, p) for (k, t), p in dedup_r.items()] or [(0, -1, 0)][:0],
        "key long, rts long, payload long",
    ) if dedup_r else spark.createDataFrame([], "key long, rts long, payload long")

    got = {
        r.row_id: r.payload
        for r in asof_join(
            left, right, on=["key"], left_ts="lts", right_ts="rts",
            payload_cols=["payload"],
        ).collect()
    }

    for i, lr in enumerate(lrows):
        cands = [
            (t, p) for (k, t), p in dedup_r.items()
            if k == lr["key"] and t <= lr["lts"]
        ]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, lr, cands)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=st.lists(ASOF_LEFT, min_size=1, max_size=40),
    rrows=st.lists(ASOF_RIGHT, min_size=0, max_size=40),
)
def test_asof_right_tiebreak_equals_preaggregated_right(spark, lrows, rrows):
    """r13 pin: asof_join(right_tiebreak=[uid]) over the RAW right side
    (duplicate (key, rts) rows included) equals the documented
    pre-aggregate-then-join spelling with max_by(payload, uid) — i.e. the
    max-uid row at each (key, rts) wins — for ANY generated timeline.
    The tiebreak is what lets callers skip the right side's aggregation
    exchange."""
    from mrsboraetl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(i, r["key"], r["lts"]) for i, r in enumerate(lrows)],
        "row_id long, key long, lts long",
    )
    raw = [
        (i, r["key"], r["rts"], r["payload"]) for i, r in enumerate(rrows)
    ]
    right = spark.createDataFrame(
        raw, "uid long, key long, rts long, payload long"
    ) if raw else spark.createDataFrame(
        [], "uid long, key long, rts long, payload long"
    )

    got = {
        r.row_id: (r.uid, r.payload)
        for r in asof_join(
            left, right, on=["key"], left_ts="lts", right_ts="rts",
            payload_cols=["uid", "payload"], right_tiebreak=["uid"],
        ).collect()
    }

    # brute force: per (key, rts) the max-uid row wins, then latest rts
    dedup: dict[tuple[int, int], tuple[int, int]] = {}
    for uid, k, t, p in raw:
        cur = dedup.get((k, t))
        if cur is None or uid > cur[0]:
            dedup[(k, t)] = (uid, p)
    for i, lr in enumerate(lrows):
        cands = [
            (t, up) for (k, t), up in dedup.items()
            if k == lr["key"] and t <= lr["lts"]
        ]
        want = max(cands)[1] if cands else (None, None)
        assert got[i] == want, (i, lr, cands)


LATEST_ROW = st.fixed_dictionaries(
    {"key": st.integers(0, 3), "ts": st.integers(0, 20),
     "val": st.integers(-999, 999)}
)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(LATEST_ROW, min_size=1, max_size=40))
def test_latest_struct_equals_window_form(spark, rows):
    """r13 pin: the aggregate form (latest_struct: max(struct) with the
    asc tiebreak encoded by negation) equals the window form
    (latest_per_group, order ts DESC tiebreak uid ASC) for ANY generated
    data with a unique tiebreak — duplicate timestamps, duplicate
    payloads, single-row groups."""
    from mrsboraetl_spark.operators.latest import (
        latest_per_group,
        latest_struct,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, r["key"], r["ts"], r["val"]) for i, r in enumerate(rows)],
        "uid long, key long, ts long, val long",
    )
    win = {
        (r.key, r.uid, r.ts, r.val)
        for r in latest_per_group(
            df, ["key"], [F.col("ts").desc()], tiebreak=["uid"]
        ).collect()
    }
    agg = {
        (r.key, r.uid, r.ts, r.val)
        for r in df.groupBy("key")
        .agg(
            latest_struct(
                [F.col("ts"), -F.col("uid")], [F.col("val")]
            ).alias("_t")
        )
        .select(
            "key",
            (-F.col("_t._o1")).alias("uid"),
            F.col("_t._o0").alias("ts"),
            F.col("_t._p0").alias("val"),
        )
        .collect()
    }
    assert win == agg and win


def test_numeric_rendering_matches_mysql_examples(spark):
    """Spot contract for render_numeric (C1): MySQL-style no trailing
    zeros / no trailing dot."""
    from mrsboraetl_spark.functions.obsmap import render_numeric

    cases = [(72.0, "72"), (72.5, "72.5"), (0.5, "0.5"), (-3.10, "-3.1"),
             (100.0, "100"), (0.0, "0")]
    df = spark.createDataFrame([(v,) for v, _ in cases], "x double")
    got = [r[0] for r in df.select(render_numeric(F.col("x"))).collect()]
    assert got == [want for _, want in cases]


RENDER_FLOAT = st.one_of(
    # the full plain-decimal contract window, both signs, log-uniform-ish
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-9.9e14, max_value=9.9e14),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=1e-4, max_value=1.0),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1.0, max_value=-1e-4),
    st.sampled_from([
        0.0, -0.0, 1e-4, -1e-4, 9999999.0, 1e7, 1.5e7, 123456789.25,
        12345678.9, 99999999.99, 7.25e10, 4.0e13, 123456789012345.6,
        1.000001e7, 0.00012345, -0.0005, 2.0 ** 40, 2.0 ** -10,
    ]),
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(RENDER_FLOAT, min_size=1, max_size=200))
def test_render_numeric_matches_duckdb_over_float_grid(spark, xs):
    """VERDICT r2 item 8: byte-parity of the blob numeric renderer across
    engines over an adversarial float grid (negatives, E-notation
    thresholds at 1e7 and 1e-4, shortest-repr 16-17 digit mantissas).

    Contract window |x| in [1e-4, 9.9e14] plus 0: inside it MySQL and
    DuckDB both print plain shortest decimal while Spark's cast switches
    to Java E-notation at 1e7 — render_numeric must expand those back
    bit-identically.  Each hypothesis example is one batch through one
    Spark job; rows whose magnitude leaves the window are filtered (both
    engines go scientific there, with engine-specific formats)."""
    import duckdb

    from mrsboraetl_spark.functions.obsmap import render_numeric

    xs = [x for x in xs if x == 0 or 1e-4 <= abs(x) <= 9.9e14]
    if not xs:
        return
    df = spark.createDataFrame([(v,) for v in xs], "x double")
    got = [r[0] for r in df.select(render_numeric(F.col("x"))).collect()]
    render = ("regexp_replace(regexp_replace(CAST(x AS VARCHAR),"
              " '(\\.\\d*?)0+$', '\\1'), '\\.$', '')")
    con = duckdb.connect()
    # hand the doubles over bit-exactly (pandas -> duckdb), the same way
    # the driver's compare does via parquet: duckdb's VARCHAR->DOUBLE
    # literal parse is NOT correctly rounded at 17-digit mantissas, which
    # would test the parser, not the renderer
    import pandas as pd

    frame = pd.DataFrame({"x": pd.Series(xs, dtype="float64")})
    con.register("vals", frame)
    want = [r[0] for r in con.sql(f"select {render} from vals").fetchall()]
    assert got == want, [
        (v, g, w) for v, g, w in zip(xs, got, want) if g != w
    ][:5]


WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1, max_size=6,
)
DOC_TEXT = st.lists(WORD, min_size=1, max_size=80).map(" ".join)


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.tuples(st.integers(0, 4), st.text("abcdef", min_size=1, max_size=6)),
        min_size=1, max_size=300,
    ),
    n_shards=st.integers(1, 5),
    k=st.integers(2, 16),
)
def test_kmv_merge_equals_direct_property(spark, values, n_shards, k):
    """For ANY (group, value) multiset, ANY shard assignment, and ANY k:
    per-shard KMV sketches merged give exactly the direct estimate —
    the mergeability contract of the sketch."""
    from mrsboraetl_spark.operators.sketch import (
        kmv_distinct,
        kmv_merge_estimate,
        kmv_sketch,
    )

    rows = [
        (g, v, i % n_shards) for i, (g, v) in enumerate(values)
    ]
    df = spark.createDataFrame(rows, "g int, v string, shard int")
    direct = {
        r.g: r.est_distinct
        for r in kmv_distinct(df, "g", "v", k=k).collect()
    }
    merged = {
        r.g: r.est_distinct
        for r in kmv_merge_estimate(
            kmv_sketch(df, ["g", "shard"], "v", k=k), "g", k=k
        ).collect()
    }
    assert merged == direct


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text("ab \n", min_size=1, max_size=40), min_size=1, max_size=60
    ),
    budget=st.integers(1, 20),
    n_streams=st.integers(1, 4),
)
def test_pack_sequences_tiling_property(spark, texts, budget, n_streams):
    """For ANY documents and ANY (budget, lanes): within each lane the
    docs tile the token axis exactly (no gaps, no overlap) and offsets
    stay inside the budget."""
    from mrsboraetl_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    rows = pack_sequences(
        df, "id", "t", budget=budget, n_streams=n_streams
    ).collect()
    assert len(rows) == len(texts)
    lanes: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.tok_offset < budget
        lanes.setdefault(r.stream, []).append(r)
    for rs in lanes.values():
        rs.sort(key=lambda r: r.seq_idx * budget + r.tok_offset)
        pos = 0
        for r in rs:
            assert r.seq_idx * budget + r.tok_offset == pos
            pos += r.n_tokens


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(DOC_TEXT, min_size=1, max_size=20),
    geometry=st.tuples(
        st.integers(min_value=2, max_value=24),   # chunk_tokens
        st.integers(min_value=0, max_value=23),   # overlap (< chunk_tokens)
    ).filter(lambda t: t[1] < t[0]),
)
def test_chunk_documents_reconstruction_property(spark, texts, geometry):
    """For ANY texts (unicode words incl. digits) and any valid
    (chunk_tokens, overlap) geometry: dropping each chunk's leading
    overlap and concatenating in order reproduces the whitespace-
    normalized document; every chunk except the last is exactly the
    budget; chunk_idx is dense from 0."""
    import re

    from mrsboraetl_spark.operators.curation import chunk_documents

    chunk_tokens, overlap = geometry
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    out = (
        chunk_documents(df, "id", "t", chunk_tokens, overlap)
        .toPandas()
        .sort_values(["id", "chunk_idx"])
    )
    for i, text in enumerate(texts):
        g = out[out["id"] == i]
        assert list(g["chunk_idx"]) == list(range(len(g)))
        toks: list = []
        for _, r in g.iterrows():
            ct = r["chunk_text"].split(" ")
            assert len(ct) == r["n_chunk_tokens"]
            toks.extend(ct[overlap:] if r["chunk_idx"] > 0 else ct)
        want = re.sub(r"\s+", " ", text).strip().split(" ")
        assert toks == want, (i, chunk_tokens, overlap)
        assert (g[g["chunk_idx"] != g["chunk_idx"].max()]["n_chunk_tokens"]
                == chunk_tokens).all()


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text("xy z\t", min_size=0, max_size=60), min_size=1, max_size=30
    ),
    span_tokens=st.integers(1, 8),
)
def test_span_reassembly_identity_property(spark, texts, span_tokens):
    """For ANY documents and ANY span size: with an unreachable
    frequency threshold nothing is deleted, so remove_repeated_spans
    must reproduce each document's whitespace-normalized self — the
    carve/reassemble round-trip is lossless, including short docs,
    empty docs, and trailing partial windows."""
    import re

    from mrsboraetl_spark.operators.spans import (
        doc_spans,
        remove_repeated_spans,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    out = {
        r.id: r.clean_text
        for r in remove_repeated_spans(
            df, "id", "t", span_tokens=span_tokens, max_freq=10**9
        ).collect()
    }
    assert len(out) == len(texts)
    for i, t in enumerate(texts):
        assert out[i] == " ".join(re.split(r"\s+", t.strip())).strip()
    # and the span rows themselves tile each doc: pos dense from 0
    spans = doc_spans(df, "id", "t", span_tokens).collect()
    per_doc: dict[int, list] = {}
    for r in spans:
        per_doc.setdefault(r.id, []).append(r.pos)
    for i in per_doc:
        assert sorted(per_doc[i]) == list(range(len(per_doc[i])))


def test_memo_md5_always_returns_the_true_hash():
    """Property: whatever the access pattern does to the two-generation
    memo's internal state (promotions, generation swaps, evictions at a
    tiny cap), every lookup must return exactly md5(key)[:8] — the memo
    may only ever trade speed, never correctness."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mrsboraetl_spark.operators.dedup import _memo_md5

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="abc", min_size=0, max_size=3), max_size=120
        )
    )
    def run(keys):
        lookup = _memo_md5(cap=4)  # tiny cap: constant generation churn
        for k in keys:
            want = int(hashlib.md5(k.encode("utf-8")).hexdigest()[:8], 16)
            assert lookup(k) == want

    run()


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(RENDER_FLOAT, min_size=1, max_size=200))
def test_render_numeric_fast_path_equals_regex_spelling(spark, xs):
    """r13 obsmap fast path: byte-equality of the contains('E') gate and
    the endswith('.0') strip with the old regex spelling, over the same
    adversarial grid the DuckDB parity test uses PLUS NaN/inf (the gate
    must not confuse 'Infinity'/'NaN' with E-notation).

    Three pins, each over every double in the batch:
    * gate:   contains('E')          == rlike('E-?\\d+$')   on cast(x)
    * strip:  the regexp_replace pair leaves render_numeric's output
              unchanged (the fast path already stripped everything the
              regexes would);
    * suffix: no render_numeric output ends with '.0' or '.'.
    """
    from mrsboraetl_spark.functions.obsmap import render_numeric

    xs = xs + [float("nan"), float("inf"), float("-inf")]
    df = spark.createDataFrame([(v,) for v in xs], "x double")
    s = F.col("x").cast("string")
    rendered = render_numeric(F.col("x"))
    re_stripped = F.regexp_replace(
        F.regexp_replace(rendered, r"(\.\d*?)0+$", r"$1"), r"\.$", ""
    )
    rows = df.select(
        s.contains("E").alias("new_gate"),
        s.rlike(r"E-?\d+$").alias("old_gate"),
        rendered.alias("out"),
        re_stripped.alias("restrip"),
    ).collect()
    for r in rows:
        assert bool(r["new_gate"]) == bool(r["old_gate"]), r
        assert r["out"] == r["restrip"], r
        assert not r["out"].endswith(".0") and not r["out"].endswith("."), r


def test_replace_into_with_precomputed_keys(spark):
    """r13 upsert contract: when ``new_keys[pk]`` equals ``new_rows``' key
    set, replace_into(..., new_keys=...) returns exactly the same rows as
    the derived-keys spelling — and the incremental_upsert_equiv shape
    (keys from the delta filter, rows from the semi-joined aggregate)
    satisfies that contract by construction."""
    from mrsboraetl_spark.operators.upsert import replace_into

    target = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "pk int, v int"
    )
    new_rows = spark.createDataFrame([(2, 99), (4, 40)], "pk int, v int")
    keys = new_rows.select("pk").distinct()
    derived = replace_into(target, new_rows, ["pk"])
    precomp = replace_into(target, new_rows, ["pk"], new_keys=keys)
    assert sorted(map(tuple, derived.collect())) == sorted(
        map(tuple, precomp.collect())
    ) == [(1, 10), (2, 99), (3, 30), (4, 40)]

    # the incremental_upsert_equiv construction: every changed key owns at
    # least one delta event, so the semi-joined aggregate emits a row for
    # every key in changed_keys — the sets coincide.
    ev = spark.createDataFrame(
        [(1, 5, 1.0), (1, 15, 2.0), (2, 18, 3.0)], "user_id int, ts int, v double"
    )
    wm = 10
    changed = ev.filter(F.col("ts") > wm).select("user_id").distinct()
    recomputed = (
        ev.join(changed, "user_id", "left_semi")
        .groupBy("user_id").agg(F.sum("v").alias("s"))
    )
    assert sorted(r["user_id"] for r in changed.collect()) == sorted(
        r["user_id"] for r in recomputed.select("user_id").collect()
    )


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # group
            st.integers(min_value=0, max_value=5),      # key (k0)
            st.one_of(RENDER_FLOAT, st.none()),         # value (k1)
        ),
        min_size=1, max_size=120,
    )
)
def test_packed_blob_entry_of_equals_in_struct_entry(spark, rows):
    """r13 pin (guide §2.3): rendering blob entries POST-shuffle from the
    sort-key struct (entry_of) yields byte-identical blobs to carrying the
    rendered entry through the collect buffer — including NULL values
    (NULL entry dropped by array_join under both spellings), duplicate
    keys, and the distinct=True variant."""
    from mrsboraetl_spark.functions.obsmap import (
        blob_entry,
        packed_blob,
        render_numeric,
    )

    df = spark.createDataFrame(rows, "g int, k int, v double")
    order = [F.col("k"), F.col("v")]
    entry = blob_entry(F.col("k"), render_numeric(F.col("v")))
    entry_of = lambda x: blob_entry(x["_k0"], render_numeric(x["_k1"]))  # noqa: E731
    for distinct in (False, True):
        old = df.groupBy("g").agg(
            packed_blob(entry, order, distinct).alias("obs")
        )
        new = df.groupBy("g").agg(
            packed_blob(None, order, distinct, entry_of=entry_of).alias("obs")
        )
        got_old = {r["g"]: r["obs"] for r in old.collect()}
        got_new = {r["g"]: r["obs"] for r in new.collect()}
        assert got_old == got_new
