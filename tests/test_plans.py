"""Plan-quality regression guards: the physical plans the engine depends on
at scale must not silently degrade (lost pushdown, broadcast falling back
to sort-merge, an accidental cartesian product)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from mrsboraetl_spark.queries import REGISTRY


def _plan(spark, name, sf_dir):
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan
    # column pruning: the scan must not read all 16 lineitem columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert read_schema.count(":") <= 8, read_schema


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, "join_multi_dims", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_has_no_theta_join(spark, sf_dir):
    plan = _plan(spark, "asof_join_latest_order", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the as-of core is a window over the union, not a join of L against R
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_salted_aggregate_is_two_stage(spark, sf_dir):
    plan = _plan(spark, "salted_skew_aggregate", sf_dir)
    # partial on (key, salt) + final on key, each with its own
    # partial/final pair -> at least 4 HashAggregate nodes
    assert plan.count("HashAggregate") >= 4


def test_visit_summary_equiv_plan(spark, sf_dir):
    """The flagship composition must stay a pure shuffle-join plan: no
    cartesian/nested-loop node, both sides meeting on the user_id key."""
    plan = _plan(spark, "visit_summary_equiv", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # decode ladder + blob pack collapse into the aggregate projection —
    # no extra shuffle beyond groupBy(user,day) and window(user); the
    # latest side broadcasts into the join.  (formatted explain lists each
    # node in tree AND details, so count the details lines only)
    import re

    shuffles = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(shuffles) <= 3, plan


def test_ivf_probe_is_equi_join(spark, sf_dir):
    """IVF's probe must be an equi-join on the cell id (broadcast of the
    tiny probe side is fine), never a cross join of queries x corpus."""
    plan = _plan(spark, "ann_ivf_topk", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_jaccard_caps_hot_shingles(spark, sf_dir):
    """The doc-frequency cap must survive in the plan: the inverted index
    is filtered through the doc_freq aggregate before the self-join.
    (dedup_ngram_jaccard demoted from the registry r7 — the plan guard
    stays; resolved from its module.)"""
    from mrsboraetl_spark.queries import llmdata

    df = llmdata.dedup_ngram_jaccard(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "doc_freq" in plan
    assert "CartesianProduct" not in plan


# Documented brute-force baselines: the ONLY registry entries allowed a
# non-equi join in their plan.  Everything else planning a cartesian or
# nested-loop node is a scale regression.
BRUTE_FORCE_OK = {
    "dedup_embedding_cosine",   # n^2/2 baseline (LSH is the scale path)
    "ann_brute_force_topk",     # exactness baseline (broadcast queries)
}
# streaming queries execute on build (drain); exclude from the static sweep
SKIP = {
    "streaming_tumbling_daily",
    "streaming_stateful_user_stats",
}


def test_no_registry_query_plans_a_nested_loop(spark, sf_dir):
    bad = {}
    for name in REGISTRY:
        if name in BRUTE_FORCE_OK | SKIP:
            continue
        plan = _plan(spark, name, sf_dir)
        hits = [
            node
            for node in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if node in plan
        ]
        if hits:
            bad[name] = hits
    assert not bad, bad


def test_unregistered_scale_ops_plan_no_nested_loop(spark, sf_dir):
    """simhash_near_pairs and the connected-components round are banded /
    key-partitioned equi-joins — the same cartesian guard the registry
    sweep enforces, for the unregistered scale operators."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from mrsboraetl_spark.operators.dedup import simhash_near_pairs
    from mrsboraetl_spark.queries import table

    docs = table(spark, sf_dir, "documents")

    def fmt(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    plans = {"simhash_near_pairs": fmt(
        simhash_near_pairs(docs, "doc_id", "text", 32, 2, 1)
    )}
    # r7-demoted registry entries keep their cartesian guard here
    from mrsboraetl_spark.queries import llmdata

    for demoted in (
        "dedup_simhash", "dedup_ngram_jaccard", "dedup_exact_then_near",
        "dedup_embedding_lsh",
    ):
        plans[demoted] = fmt(getattr(llmdata, demoted)(spark, sf_dir))
    # incremental LSH index probe: must stay a (band, bk) equi-join
    import tempfile

    from mrsboraetl_spark.operators.lsh_index import LshBandIndex

    idx = LshBandIndex(tempfile.mkdtemp(prefix="lshidx_plan_"))
    plans["lsh_index_ingest"] = fmt(
        idx.ingest(docs.limit(50), "doc_id", "text", max_band_freq=100)
    )
    # IVF-PQ: cell equi-join probe + id equi-join refinement, never a scan
    from mrsboraetl_spark.operators.similarity import ivf_pq_topk

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    plans["ivf_pq_topk"] = fmt(
        ivf_pq_topk(emb, q, k=3, train_cells=False, codebooks="seed")
    )
    # one propagation round of connected_components, plan-only
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    sym = edges.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).union(
        edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    plans["cc_round"] = fmt(
        sym.join(labels.select(F.col("node").alias("v"), "label"), "v")
        .groupBy("u")
        .agg(F.min("label").alias("nbr_label"))
    )
    # r5 session 2: decontamination / BM25 / KMV sketch / sequence packing.
    # BM25 in particular must stay a term-keyed broadcast HASH join — its
    # constant-key spelling constant-folds into a BroadcastNestedLoopJoin.
    from mrsboraetl_spark.queries import llmdata as L

    for name in (
        # decontam_ngram_overlap is registered -> covered by the registry sweep
        "search_bm25_topk",
        "sketch_kmv_distinct",
        "curation_pack_sequences",
        "curation_oov_fraction",
        "curation_token_budget_mix",
        "profile_source_percentiles",
        # r5 session 4: spans / redaction / epoch order / unigram LM /
        # oversampling — unigram_logprob in particular must keep its
        # scalar total OUT of the plan (ln(S) enters as a literal; a
        # 1-row scalar join would plan a BroadcastNestedLoopJoin).
        "dedup_repeated_spans",
        "curation_redact_pii",
        "curation_epoch_shuffle",
        "curation_unigram_logprob",
        "curation_oversample_mix",
        "decontam_attribution_pairs",
        "fuzzy_join_docs",
    ):
        plans[name] = fmt(getattr(L, name)(spark, sf_dir))
    bad = {
        name: [
            n for n in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if n in plan
        ]
        for name, plan in plans.items()
    }
    bad = {k: v for k, v in bad.items() if v}
    assert not bad, bad
