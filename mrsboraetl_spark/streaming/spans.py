"""Streaming boilerplate removal: a document stream drains into the
persistent span-frequency index (operators/span_index.py) via
foreachBatch, emitting each micro-batch cleaned against the frequencies
known at its ingest.

Semantics inherit from the index (module docstring there): ingest-time
cleaning deletes a SUBSET of what the batch operator would (frequencies
only grow), and a post-stream ``index.clean_corpus(...)`` pass equals
the batch operator exactly.  Delivery is at-least-once with the same
best-effort ``_done`` markers as streaming/dedup.py — a replayed batch
whose marker exists is skipped; a crash between the counts append and
the marker duplicates that batch's counts (making cleaning strictly
MORE aggressive, never less — a safe failure direction for boilerplate
removal; exactly-once alternative for state tables:
streaming/versioned_sink.py)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from mrsboraetl_spark.operators.span_index import SpanFrequencyIndex


def streaming_clean_spans(
    docs_stream: DataFrame,
    index: SpanFrequencyIndex,
    id_col: str,
    text_col: str,
    cleaned_path: str,
    checkpoint_dir: str,
    max_freq: int = 2,
):
    """Start (and return) the streaming query: ingest each micro-batch
    into ``index`` and append its ingest-time-cleaned rows to
    ``cleaned_path``."""
    markers = os.path.join(index.path, "_done")
    os.makedirs(markers, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(markers, str(batch_id))
        if os.path.exists(marker):
            return
        cleaned = index.ingest_and_clean(
            batch_df, id_col, text_col, max_freq=max_freq
        )
        cleaned.write.mode("append").parquet(cleaned_path)
        with open(marker, "w") as f:
            f.write("done")

    return (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
