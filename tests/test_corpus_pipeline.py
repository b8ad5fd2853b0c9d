"""Composed corpus-curation pipeline: row accounting, stage agreement,
and determinism of curate_corpus (each stage is oracle-checked on its
own; these tests pin the COMPOSITION)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrsboraetl_spark.operators.corpus import CurationConfig, curate_corpus
from mrsboraetl_spark.queries import table


def _run(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 23 == 0)
    train = docs.filter(F.col("doc_id") % 23 != 0)
    cfg = CurationConfig(min_tokens=15)
    kept, audit, packed = curate_corpus(train, eval_df, cfg=cfg)
    return train, kept, audit, packed


def test_audit_partitions_every_doc_exactly_once(spark, sf_dir):
    train, kept, audit, _ = _run(spark, sf_dir)
    n = train.count()
    assert audit.count() == n
    assert audit.select("id").distinct().count() == n
    counts = {
        r.disposition: r.c
        for r in audit.groupBy("disposition").agg(F.count("*").alias("c")).collect()
    }
    assert counts.get("kept", 0) == kept.count()
    assert sum(counts.values()) == n
    # every stage actually fires on this corpus — no vacuous composition
    for stage in ("quality", "contaminated", "duplicate", "kept"):
        assert counts.get(stage, 0) > 0, counts


def test_stages_agree_with_standalone_operators(spark, sf_dir):
    from mrsboraetl_spark.operators.curation import quality_filter
    from mrsboraetl_spark.operators.decontam import contamination_counts

    train, kept, audit, _ = _run(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 23 == 0)

    q_fail = {
        r.id
        for r in quality_filter(train, "doc_id", "text", min_tokens=15)
        .filter(~F.col("keep"))
        .collect()
    }
    got_q = {
        r.id for r in audit.filter(F.col("disposition") == "quality").collect()
    }
    assert got_q == q_fail

    # contaminated dispositions are quality-survivors flagged by decontam
    survivors = train.join(
        spark.createDataFrame([(i,) for i in q_fail], "doc_id long"),
        "doc_id",
        "left_anti",
    ) if q_fail else train
    contaminated = {
        r.doc_id
        for r in contamination_counts(survivors, eval_df, n=4).collect()
    }
    got_c = {
        r.id
        for r in audit.filter(F.col("disposition") == "contaminated").collect()
    }
    assert got_c == contaminated

    # kept docs carry a split and packing covers exactly the train split
    splits = {r.split for r in kept.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


def test_packed_covers_exactly_the_train_split(spark, sf_dir):
    _, kept, _, packed = _run(spark, sf_dir)
    train_ids = {
        r.doc_id for r in kept.filter(F.col("split") == "train").collect()
    }
    packed_ids = {r.id for r in packed.collect()}
    assert packed_ids == train_ids


def test_pipeline_is_deterministic(spark, sf_dir):
    _, _, audit1, _ = _run(spark, sf_dir)
    _, _, audit2, _ = _run(spark, sf_dir)
    a = {(r.id, r.disposition) for r in audit1.collect()}
    b = {(r.id, r.disposition) for r in audit2.collect()}
    assert a == b


def test_no_eval_set_skips_decontamination(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    kept, audit, _ = curate_corpus(
        docs, None, cfg=CurationConfig(min_tokens=15)
    )
    assert audit.filter(F.col("disposition") == "contaminated").count() == 0
    assert kept.count() == audit.filter(
        F.col("disposition") == "kept"
    ).count()
