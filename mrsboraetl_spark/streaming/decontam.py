"""Streaming corpus maintenance: decontamination and profiling drivers
over a document stream via foreachBatch — the continuous-ingest
spellings of operators/decontam.decontaminate and
operators/stats_index.StatsIndex.

Unlike the streaming LSH index, decontamination is STATELESS per batch:
a document's verdict depends only on its own grams and the static eval
set, so the union of clean micro-batches equals the batch operator's
output on the full corpus for ANY arrival order or batch split
(pytest-pinned).  The eval gram set is computed once at query start and
re-broadcast per batch (Spark re-plans the foreachBatch body each
trigger; the gram DataFrame is reused, its scan cached by the OS page
cache — at cluster scale you would materialize it to parquet first,
which ``eval_grams_path`` supports).

Delivery: the parquet append in the sink replays with the micro-batch
on failure; ``_done`` batch markers give the same best-effort
idempotence as streaming/dedup.py (and the same documented
exactly-once alternative: streaming/versioned_sink.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from mrsboraetl_spark.operators.decontam import decontaminate, token_ngrams


def materialize_eval_grams(
    spark: SparkSession,
    eval_df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Compute the eval corpus's distinct gram set ONCE and store it as
    parquet; returns the re-read DataFrame.  At 100 TB this is the
    difference between hashing the benchmark suite once vs once per
    micro-batch."""
    (
        token_ngrams(eval_df, id_col, text_col, n)
        .select("gram")
        .distinct()
        .write.mode("overwrite")
        .parquet(path)
    )
    return spark.read.parquet(path)


def streaming_profile(
    docs_stream: DataFrame,
    index,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuously fold a document stream into a
    ``operators/stats_index.StatsIndex`` via foreachBatch — because the
    index's batch-split equivalence is exact, the state after the
    stream drains equals a one-shot profile of everything ingested,
    regardless of micro-batch boundaries (pytest-pinned).  Replay
    idempotence via the same ``_done`` markers as the other streaming
    drivers."""
    markers = os.path.join(index.path, "_done")
    os.makedirs(markers, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(markers, str(batch_id))
        if os.path.exists(marker):
            return
        index.ingest(batch_df, id_col, text_col)
        with open(marker, "w") as f:
            f.write("done")

    return (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def streaming_decontaminate(
    docs_stream: DataFrame,
    eval_df: DataFrame,
    clean_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    markers_dir: str | None = None,
):
    """Start (and return) the streaming query: drop every micro-batch
    document sharing a token n-gram with ``eval_df`` and append the
    survivors to ``clean_path``.

    ``eval_df`` may be the raw eval corpus or the output of
    :func:`materialize_eval_grams` re-wrapped by the caller — here it is
    passed through operators/decontam.decontaminate, which handles the
    gram generation and broadcast probe."""
    markers = markers_dir or checkpoint_dir + "_done"
    os.makedirs(markers, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(markers, str(batch_id))
        if os.path.exists(marker):
            return
        clean = decontaminate(batch_df, eval_df, id_col, text_col, n)
        clean.write.mode("append").parquet(clean_path)
        with open(marker, "w") as f:
            f.write("done")

    return (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
