"""Streaming embedding ingestion into the persistent IVF index
(operators/ann_index.py) via foreachBatch — the Structured-Streaming
spelling of a continuously-growing ANN corpus.

Because the quantizer is pinned at index creation, each micro-batch's
cell assignment is a pure function of its vectors: the drained index is
IDENTICAL to one-shot ingestion regardless of batch boundaries (the
exact end of the incremental-contract spectrum; pytest-pinned via the
index tests).  Queries served between micro-batches simply see the
corpus as of the last completed append.

Delivery is at-least-once with the same best-effort ``_done`` markers
as the other streaming drains; a replayed batch whose marker is missing
duplicates its (id, cell, vec) rows — harmless for top-k (duplicate
neighbors collapse under the rank's id tiebreak only if ids are unique;
dedup the sink, or use the exactly-once versioned sink implemented in
streaming/versioned_sink.py for state tables)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from mrsboraetl_spark.operators.ann_index import IvfIndex


def streaming_ingest_vectors(
    vec_stream: DataFrame,
    index: IvfIndex,
    checkpoint_dir: str,
    retrain_skew_threshold: float | None = None,
    retrain_sample_frac: float = 0.2,
    retrain_iters: int = 8,
):
    """Start (and return) the streaming query: assign + append each
    micro-batch of vectors into ``index``.

    ``retrain_skew_threshold``: when set, each completed ingest checks
    the index's cell-occupancy skew (``IvfIndex.skew_ratio``, a bounded
    <= n_centroids-row driver action) and retrains the quantizer when
    max/median occupancy reaches the threshold — so a long-lived stream
    whose embedding distribution drifts away from the pinned centroids
    heals itself instead of degrading every cell-keyed probe into one
    hot partition.  The retrain commits a new centroid EPOCH atomically
    (manifest swap); batches after it are assigned under the new
    centroids, and once occupancy is flat the trigger stays quiet — a
    single skewed regime causes exactly one retrain, not one per batch.
    The check runs strictly before the batch's ``_done`` marker: a
    crash between retrain and marker replays the batch into the new
    epoch (at-least-once, same contract as the append itself)."""
    markers = os.path.join(index.path, "_done")
    os.makedirs(markers, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(markers, str(batch_id))
        if os.path.exists(marker):
            return
        index.ingest(batch_df)
        if retrain_skew_threshold is not None:
            index.retrain_if_skewed(
                batch_df.sparkSession,
                retrain_skew_threshold,
                sample_frac=retrain_sample_frac,
                iters=retrain_iters,
            )
        with open(marker, "w") as f:
            f.write("done")

    return (
        vec_stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
