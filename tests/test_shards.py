"""Training-shard export (sources/shards.py): determinism, balance,
global-order reconstruction, manifest commit semantics."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mrsboraetl_spark.sources.shards import (
    MANIFEST,
    read_manifest,
    read_training_shards,
    write_training_shards,
)


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="shards_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _corpus(spark, n=103):
    return spark.createDataFrame(
        [(i, f"doc text {i}") for i in range(n)], "doc_id int, text string"
    )


def test_shards_balanced_and_complete(spark, outdir):
    m = write_training_shards(_corpus(spark), "doc_id", outdir, 4, "s1")
    assert m["rows"] == 103 and m["n_shards"] == 4
    # pos % n round-robin: sizes differ by at most 1
    assert max(m["shard_rows"]) - min(m["shard_rows"]) <= 1
    back = read_training_shards(spark, outdir)
    assert back.count() == 103
    assert back.select("doc_id").distinct().count() == 103


def test_shards_reconstruct_global_permutation(spark, outdir):
    write_training_shards(_corpus(spark), "doc_id", outdir, 4, "s1")
    back = read_training_shards(spark, outdir).orderBy("pos").collect()
    # pos is the full 0..n-1 permutation, and shard K holds pos ≡ K (mod 4)
    assert [r.pos for r in back] == list(range(103))
    assert all(r.pos % 4 == r.shard for r in back)


def test_shards_deterministic_across_exports(spark, outdir):
    a = os.path.join(outdir, "a")
    b = os.path.join(outdir, "b")
    write_training_shards(_corpus(spark), "doc_id", a, 3, "seedX")
    write_training_shards(_corpus(spark), "doc_id", b, 3, "seedX")
    ra = {(r.doc_id, r.pos, r.shard) for r in read_training_shards(spark, a).collect()}
    rb = {(r.doc_id, r.pos, r.shard) for r in read_training_shards(spark, b).collect()}
    assert ra == rb
    c = os.path.join(outdir, "c")
    write_training_shards(_corpus(spark), "doc_id", c, 3, "seedY")
    rc = {(r.doc_id, r.pos) for r in read_training_shards(spark, c).collect()}
    assert rc != {(d, p) for d, p, _ in ra}  # new seed, new permutation


def test_shard_subset_read_and_validation(spark, outdir):
    write_training_shards(_corpus(spark), "doc_id", outdir, 4, "s1")
    sub = read_training_shards(spark, outdir, shards=[0, 2])
    m = read_manifest(outdir)
    assert sub.count() == m["shard_rows"][0] + m["shard_rows"][2]
    with pytest.raises(ValueError):
        read_training_shards(spark, outdir, shards=[9])


def test_missing_manifest_means_uncommitted(spark, outdir):
    write_training_shards(_corpus(spark), "doc_id", outdir, 2, "s1")
    os.remove(os.path.join(outdir, MANIFEST))
    with pytest.raises(FileNotFoundError):
        read_training_shards(spark, outdir)


def test_one_file_per_shard(spark, outdir):
    write_training_shards(_corpus(spark), "doc_id", outdir, 4, "s1")
    for k in range(4):
        files = [
            f
            for f in os.listdir(os.path.join(outdir, f"shard={k}"))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, files


def test_weighted_shards_balance_tokens_not_rows(spark, outdir):
    """Doc i carries weight i+1 (heavily skewed); weighted sharding must
    cut shards at equal cumulative weight (within one document), while
    row counts differ widely — and concatenating shards in order
    reconstructs the permutation."""
    docs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_id int, n_tok int"
    )
    m = write_training_shards(
        docs, "doc_id", outdir, 4, "w1", weight_col="n_tok"
    )
    total = sum(m["shard_weight"])
    assert total == sum(range(1, 201))
    ideal = total / 4
    max_doc = 200
    for w in m["shard_weight"]:
        assert abs(w - ideal) <= max_doc, m["shard_weight"]
    # row counts are NOT balanced (weights are skewed) — that's the point
    assert max(m["shard_rows"]) - min(m["shard_rows"]) > 1
    back = read_training_shards(spark, outdir).orderBy("pos").collect()
    assert [r.pos for r in back] == list(range(200))
    # shards are contiguous pos ranges in shard order
    boundaries = [r.shard for r in back]
    assert boundaries == sorted(boundaries)


def test_global_prefix_sum_is_exact(spark):
    from mrsboraetl_spark.operators.order import (
        global_position,
        md5_prefix_bucket,
    )

    df = spark.createDataFrame(
        [(f"k{i:03d}", i % 7 + 1) for i in range(150)], "k string, w int"
    )
    rows = global_position(
        df, "k", bucket_of=md5_prefix_bucket(1), weight_col="w"
    ).collect()
    ordered = sorted(rows, key=lambda r: r.pos)
    running = 0
    for r in ordered:
        assert r.prefix == running, (r.k, r.prefix, running)
        running += r.w


def test_jsonl_shards_round_trip(spark, outdir):
    m = write_training_shards(
        _corpus(spark), "doc_id", outdir, 3, "s1", data_format="json"
    )
    assert m["format"] == "json"
    files = os.listdir(os.path.join(outdir, "shard=0"))
    assert any(f.endswith(".json") for f in files), files
    back = read_training_shards(spark, outdir).orderBy("pos").collect()
    assert [r.pos for r in back] == list(range(103))
    # same permutation as a parquet export with the same seed
    p2 = os.path.join(outdir, "pq")
    write_training_shards(_corpus(spark), "doc_id", p2, 3, "s1")
    want = {
        (r.doc_id, r.pos)
        for r in read_training_shards(spark, p2).collect()
    }
    assert {(r.doc_id, r.pos) for r in back} == want
