"""Multimodal plumbing: the mapInPandas pipelines must hold their schema
contracts — fixed-size resize output, bounded frame fan-out — and be
deterministic run to run."""

from __future__ import annotations

from mrsboraetl_spark.operators.multimodal import (
    decode_features_stub,
    frame_sample_stub,
    resize_stub,
    with_binary_payload,
)
from mrsboraetl_spark.queries import table


def _docs(spark, sf_dir):
    return with_binary_payload(
        table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    )


def test_decode_stub_schema_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = sorted(map(tuple, decode_features_stub(docs).collect()))
    b = sorted(map(tuple, decode_features_stub(docs).collect()))
    assert a == b and len(a) == 100


def test_resize_fixed_size_payloads(spark, sf_dir):
    out = resize_stub(_docs(spark, sf_dir), width=16, height=8).collect()
    assert len(out) == 100
    assert all(len(r.payload) == 16 * 8 for r in out)
    assert all(r.width == 16 and r.height == 8 for r in out)


def test_frame_sample_fan_out(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = frame_sample_stub(docs, every_n_bytes=64, max_frames=4).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {r.doc_id for r in docs.select("doc_id").collect()}
    for frames in by_doc.values():
        assert 1 <= len(frames) <= 4
        idxs = sorted(f.frame_idx for f in frames)
        assert idxs == list(range(len(frames)))  # dense, zero-based
        assert all(f.pts_ms == f.frame_idx * 40 for f in frames)
