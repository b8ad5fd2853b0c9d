"""Exactly-once APPEND sink for unbounded fact streams.

The two existing exactly-once/at-least-once options each miss the fact
stream case: the ``_done`` marker drains (streaming/dedup.py et al.) are
at-least-once — data append and marker are two filesystem operations
with a crash window between them — and the versioned merge sink
(streaming/versioned_sink.py) is exactly-once but rewrites the FULL
snapshot per commit, which its own docstring rules out for unbounded
appends.  This module closes the gap (VERDICT r5 item 3):

* each micro-batch writes to a DETERMINISTIC staging directory keyed by
  its batch id (``data/batch=<id>``, overwrite mode) — a replay of a
  half-written batch simply overwrites the same directory;
* the commit point is one ``os.replace`` of a manifest listing the
  committed batch ids.  Crash AFTER the data write but BEFORE the
  manifest commit: the directory exists but is invisible (readers go
  through the manifest), the replay overwrites and commits it — no
  loss, no duplicate.  Crash after the commit: the replay sees the id
  and no-ops;
* write cost is O(|batch|) per batch — no snapshot rewrite, the
  append-sink property the versioned sink cannot give.

Reads open exactly the committed directories (an explicit path list, so
an uncommitted orphan or a stray file can never leak into results).
Single writer per table, as with every persistent index here —
Structured Streaming serializes foreachBatch calls.

Scale shape: one directory per micro-batch grows the listing over time;
``compact()`` folds committed batches into one directory behind the
same manifest commit (the id list collapses to a single synthetic
entry), bounding reader fan-out for long-lived streams.  On an object
store, swap the two ``os.replace`` sites for the store's put-if-absent
primitive — same contract, nothing else changes (the versioned table
documents the identical port).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class AppendOnlyTable:
    """Manifest-committed append-only parquet table."""

    def __init__(self, root: str):
        self.root = root
        self.data_root = os.path.join(root, "data")
        os.makedirs(self.data_root, exist_ok=True)

    # ---------------------------------------------------------- manifest

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def _read_manifest(self) -> dict:
        if os.path.exists(self._manifest_path()):
            with open(self._manifest_path()) as f:
                m = json.load(f)
            if "max_committed_id" not in m:
                # Pre-watermark manifests: recover the high-water mark
                # from the batch keys — plain int keys, and compact
                # keys whose suffix is the last folded batch id.
                mx = None
                for k in m["batches"]:
                    tail = k.rsplit("-", 1)[-1]
                    if tail.isdigit():
                        mx = int(tail) if mx is None else max(mx, int(tail))
                m["max_committed_id"] = mx
            return m
        return {"batches": [], "max_committed_id": None}

    def _commit_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path())  # the atomic commit point

    def committed(self) -> list[str]:
        return list(self._read_manifest()["batches"])

    # -------------------------------------------------------------- I/O

    def _batch_dir(self, batch_key: str) -> str:
        return os.path.join(self.data_root, f"batch={batch_key}")

    def append_batch(self, df: DataFrame, batch_id: int) -> bool:
        """Write-and-commit one micro-batch; returns False (no-op) when
        the batch id is already committed — the replay path.

        The replay check is a MONOTONIC watermark (`max_committed_id`),
        not the data-directory list: compact() collapses that list to
        one synthetic entry, and it is not a per-id ledger either —
        a ledger for an unbounded stream would grow (and be linearly
        scanned) forever inside the foreachBatch hot path.  The
        watermark is sound because Structured Streaming batch ids are
        strictly increasing per checkpoint, so a replayed batch always
        has id <= the watermark and a fresh batch is always above it —
        the same contract Delta's idempotent writes key on
        (txnAppId/txnVersion).  Consequence to respect operationally:
        RESETTING the streaming checkpoint without resetting the table
        restarts ids at 0 and every batch no-ops; manual callers must
        likewise feed increasing ids."""
        key = str(batch_id)
        manifest = self._read_manifest()
        mx = manifest["max_committed_id"]
        if mx is not None and batch_id <= mx:
            return False
        # Deterministic staging dir + overwrite: a replay of a batch
        # that crashed mid-write lands on the same path and simply
        # overwrites the partial output.
        df.write.mode("overwrite").parquet(self._batch_dir(key))
        manifest["batches"].append(key)
        manifest["max_committed_id"] = batch_id
        self._commit_manifest(manifest)
        return True

    def read(self, spark: SparkSession) -> DataFrame | None:
        """Union of exactly the COMMITTED batches (explicit path list —
        uncommitted orphans are invisible), or None when empty."""
        keys = self.committed()
        if not keys:
            return None
        return spark.read.parquet(*[self._batch_dir(k) for k in keys])

    def compact(self, spark: SparkSession, n_files: int | None = None) -> None:
        """Fold all committed batches into one directory and commit a
        manifest pointing only at it — bounds reader fan-out for
        long-lived streams.  The fold is crash-safe: the new directory
        is written under a staging name first and the manifest swap is
        the commit; old batch directories are dropped only AFTER the
        commit (a crash in between leaves harmless invisible orphans)."""
        keys = self.committed()
        if len(keys) <= 1:
            return
        new_key = f"compact-{len(keys)}-{keys[-1]}"
        df = self.read(spark)
        if n_files:
            df = df.coalesce(n_files)
        df.write.mode("overwrite").parquet(self._batch_dir(new_key))
        # The replay WATERMARK survives compaction untouched: it is
        # what keeps a replayed batch id a no-op after its directory
        # was folded away.
        manifest = self._read_manifest()
        manifest["batches"] = [new_key]
        self._commit_manifest(manifest)
        for k in keys:
            shutil.rmtree(self._batch_dir(k), ignore_errors=True)


def exactly_once_append_sink(
    table: AppendOnlyTable,
    compact_every_n: int | None = None,
    compact_n_files: int | None = None,
):
    """The foreachBatch callable: append each micro-batch unless its
    batch id is already committed.

    ``compact_every_n`` folds the committed batch directories into one
    whenever their count reaches N — without it a long-lived stream
    accrues one directory per micro-batch forever and reader fan-out
    grows unbounded.  Safe exactly here because the sink is the single
    writer (Structured Streaming serializes foreachBatch calls), so the
    fold runs strictly between batches; the replay watermark is
    untouched by compaction, so a replayed pre-compaction id still
    no-ops (pytest pins this across the boundary)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        appended = table.append_batch(batch_df, batch_id)
        if (
            appended
            and compact_every_n
            and len(table.committed()) >= compact_every_n
        ):
            table.compact(batch_df.sparkSession, n_files=compact_n_files)

    return sink


def streaming_exactly_once_append(
    stream_df: DataFrame,
    table: AppendOnlyTable,
    checkpoint_dir: str,
    compact_every_n: int | None = None,
    compact_n_files: int | None = None,
):
    """Start (and return) the streaming query: exactly-once append of
    each micro-batch into the table, auto-compacting every N batches."""
    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(
            exactly_once_append_sink(
                table,
                compact_every_n=compact_every_n,
                compact_n_files=compact_n_files,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
