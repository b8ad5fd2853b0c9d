"""Unit + plan tests for the round-5 session-4 operators: repeated-span
boilerplate removal (operators/spans.py), PII redaction
(operators/redact.py), and the two-phase global position / epoch shuffle
(operators/order.py).  Oracle parity for all three is covered by
tests/test_oracle_parity.py (UNREGISTERED sweep); these tests pin the
SEMANTIC edges and the physical-plan shapes the operators exist for."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from mrsboraetl_spark.operators.order import (
    epoch_shuffle,
    global_position,
    md5_prefix_bucket,
)
from mrsboraetl_spark.operators.redact import redact_pii
from mrsboraetl_spark.operators.spans import (
    doc_spans,
    over_frequent_spans,
    remove_repeated_spans,
)


def _fmt(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_spans_windows_and_trailing_partial(spark):
    df = _docs(spark, [(1, "a b c d e")])
    got = {
        (r.pos, r.span)
        for r in doc_spans(df, "doc_id", "text", span_tokens=2).collect()
    }
    assert got == {(0, "a b"), (1, "c d"), (2, "e")}


def test_spans_empty_text_yields_one_empty_span(spark):
    df = _docs(spark, [(1, "")])
    got = doc_spans(df, "doc_id", "text", span_tokens=3).collect()
    assert [(r.pos, r.span) for r in got] == [(0, "")]


def test_remove_repeated_spans_cuts_boilerplate_keeps_order(spark):
    # "x y" is the boilerplate span: present in 3 docs -> over-frequent
    # at max_freq=2; unique spans survive in document order.
    df = _docs(
        spark,
        [
            (1, "x y a b"),
            (2, "x y c d"),
            (3, "p q x y e f"),
        ],
    )
    out = {
        r.id: (r.clean_text, r.n_kept)
        for r in remove_repeated_spans(
            df, "doc_id", "text", span_tokens=2, max_freq=2
        ).collect()
    }
    assert out == {
        1: ("a b", 1),
        2: ("c d", 1),
        3: ("p q e f", 2),
    }


def test_pure_boilerplate_document_vanishes(spark):
    df = _docs(spark, [(i, "x y") for i in range(1, 5)])
    assert (
        remove_repeated_spans(
            df, "doc_id", "text", span_tokens=2, max_freq=2
        ).count()
        == 0
    )


def test_over_frequent_counts_occurrences_not_docs(spark):
    # One document repeating the span 3 times crosses max_freq=2 alone.
    df = _docs(spark, [(1, "x y x y x y"), (2, "a b")])
    bad = {r.span for r in over_frequent_spans(
        doc_spans(df, "doc_id", "text", 2), max_freq=2
    ).collect()}
    assert bad == {"x y"}


def test_remove_repeated_spans_plan_broadcasts_bad_set(spark, sf_dir):
    from mrsboraetl_spark.queries import table

    docs = table(spark, sf_dir, "documents")
    plan = _fmt(remove_repeated_spans(docs, "doc_id", "text", 10, 2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the deletion is a broadcast left-anti equi-join on the span key
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# --------------------------------------------------------------- redact


def test_redact_classes_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@site.io from 10.0.0.1 token=abc123"),
            (2, "clean text with no secrets at all"),
        ],
        "id int, text string",
    )
    rows = {r.id: r for r in redact_pii(df, "id", "text").collect()}
    assert rows[1].clean_text == "mail me at <EMAIL> from <IP> <SECRET>"
    assert (rows[1].n_email, rows[1].n_ipv4, rows[1].n_secret) == (1, 1, 1)
    assert rows[2].clean_text == "clean text with no secrets at all"
    assert (rows[2].n_email, rows[2].n_ipv4, rows[2].n_secret) == (0, 0, 0)


def test_redact_is_case_insensitive(spark):
    # PII does not respect case: mixed/upper-case emails and credential
    # assignments must scrub exactly like their lower-case forms.
    df = spark.createDataFrame(
        [
            (1, "John.Doe@Example.COM wrote API_KEY=x then Token=abc"),
            (2, "PASSWORD=Hunter2 from SECRET=s"),
        ],
        "id int, text string",
    )
    rows = {r.id: r for r in redact_pii(df, "id", "text").collect()}
    assert rows[1].clean_text == "<EMAIL> wrote <SECRET> then <SECRET>"
    assert (rows[1].n_email, rows[1].n_secret) == (1, 2)
    assert rows[2].clean_text == "<SECRET> from <SECRET>"
    assert rows[2].n_secret == 2


def test_redact_sequential_fold_no_double_count(spark):
    # The email's host ("10.0.0.1.dev") would ALSO match the ipv4 pattern,
    # but the fold replaces the email first, so ipv4 sees <EMAIL> and
    # counts zero — the order-defined semantics the oracle mirrors.
    df = spark.createDataFrame(
        [(1, "u@10.0.0.1.dev ping")], "id int, text string"
    )
    r = redact_pii(df, "id", "text").collect()[0]
    assert r.clean_text == "<EMAIL> ping"
    assert (r.n_email, r.n_ipv4, r.n_secret) == (1, 0, 0)


def test_redact_plan_is_scan_project_only(spark, sf_dir):
    from mrsboraetl_spark.queries import table

    docs = table(spark, sf_dir, "documents")
    plan = _fmt(redact_pii(docs, "doc_id", "text"))
    assert "Exchange" not in plan  # zero shuffles: pure map work


# ---------------------------------------------------------------- order


def test_global_position_is_the_sorted_rank(spark):
    df = spark.createDataFrame(
        [(k,) for k in ["d", "a", "c", "b", "e"]], "k string"
    )
    got = {
        r.k: r.pos
        for r in global_position(df, "k", n_partitions=3).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 4}


def test_global_position_partition_count_invariant(spark):
    rows = [(f"id{i:04d}",) for i in range(211)]
    df = spark.createDataFrame(rows, "k string")
    a = {r.k: r.pos for r in global_position(df, "k", n_partitions=2).collect()}
    b = {r.k: r.pos for r in global_position(df, "k", n_partitions=7).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(211))


def test_bucketed_position_matches_range_fallback(spark):
    """The deterministic md5-prefix bucket plan and the sampled-range
    fallback must produce the identical global ranking."""
    df = spark.createDataFrame(
        [(f"doc{i}",) for i in range(300)], "id string"
    ).select(F.md5(F.col("id")).alias("k"))
    det = {
        r.k: r.pos
        for r in global_position(
            df, "k", bucket_of=md5_prefix_bucket(1)
        ).collect()
    }
    rng = {r.k: r.pos for r in global_position(df, "k", n_partitions=5).collect()}
    assert det == rng
    assert sorted(det.values()) == list(range(300))


def test_epoch_shuffle_is_seeded_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id int")
    e1 = {r.doc_id: r.pos for r in epoch_shuffle(df, "doc_id", "s1").collect()}
    e1b = {r.doc_id: r.pos for r in epoch_shuffle(df, "doc_id", "s1").collect()}
    e2 = {r.doc_id: r.pos for r in epoch_shuffle(df, "doc_id", "s2").collect()}
    assert e1 == e1b  # reproducible
    assert sorted(e1.values()) == list(range(100))  # a permutation
    assert sorted(e2.values()) == list(range(100))
    assert e1 != e2  # a different epoch order


def test_global_position_plan_has_no_global_window(spark):
    """The point of the operator: the data-sized window must be
    partitioned by the bucket (parallel), never a single-partition
    global window.  The only unpartitioned window allowed is the offset
    prefix-sum over the one-row-per-bucket count relation."""
    df = spark.range(0, 1000).withColumn("k", F.md5(F.col("id").cast("string")))
    for kwargs in (
        {"bucket_of": md5_prefix_bucket(2)},
        {"n_partitions": 8},
    ):
        plan = _fmt(global_position(df, "k", **kwargs))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # the data-sized row_number window is partitioned by _bkt (the
        # spec's first argument is the partition list)
        assert "row_number() windowspecdefinition(_bkt" in plan, plan


def test_redaction_is_streamable(spark, tmp_path):
    """redacted_text is a stateless projection, so it runs unchanged in
    Structured Streaming — batch and stream outputs match row-for-row."""
    from mrsboraetl_spark.operators.redact import redacted_text

    rows = [
        (1, "mail a@b.io now"),
        (2, "from 10.0.0.1 ok"),
        (3, "token=zzz done"),
        (4, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    src = str(tmp_path / "src")
    df.repartition(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select("id", redacted_text("text").alias("clean_text"))
    )
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.id: r.clean_text for r in spark.read.parquet(out).collect()}
    want = {
        r.id: r.clean_text
        for r in df.select(
            "id", redacted_text("text").alias("clean_text")
        ).collect()
    }
    assert got == want
    assert got[1] == "mail <EMAIL> now" and got[3] == "<SECRET> done"
