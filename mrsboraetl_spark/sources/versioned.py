"""Versioned parquet tables: atomic commits, snapshot reads, time travel.

The reference's REPLACE INTO mutates its target in place; the engine's
PipelineRunner swaps directories.  Both give the LATEST state only.  A
transaction-log layout (what Delta/Iceberg do) adds, on plain parquet +
a JSON manifest, the three properties a 100 TB deployment actually
needs from its sink:

* **atomic commit** — data files land under an immutable ``v{N}/``
  directory first; the commit IS the ``os.replace`` of the manifest
  (POSIX-atomic).  A crash mid-write leaves an orphan data directory
  and an untouched manifest: readers never see a partial table.
* **snapshot isolation** — a reader that resolved version N keeps
  reading ``v{N}/`` unaffected by later commits (old versions are never
  rewritten, only eventually vacuumed).
* **time travel** — ``read(spark, version=K)`` / ``history()`` for
  audits and incremental-vs-rebuild diffing.

``merge`` is REPLACE INTO with history: read latest, apply the upsert
algebra (operators/upsert.replace_into), commit as a new version.  On a
real cluster the manifest lives in an object store with a
put-if-absent/rename primitive — the same contract os.replace gives
locally; swap `_commit_manifest` for that primitive and nothing else
changes.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_latest.json"


class VersionedTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ manifest

    def _manifest_path(self) -> str:
        return os.path.join(self.root, _MANIFEST)

    def _read_manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"version": -1, "history": []}

    def _commit_manifest(self, manifest: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path())  # the atomic commit point

    # -------------------------------------------------------------- public

    def version(self) -> int:
        """Latest committed version, -1 if never committed."""
        return self._read_manifest()["version"]

    def history(self) -> list[dict]:
        return self._read_manifest()["history"]

    def commit(self, df: DataFrame, note: str = "") -> int:
        """Write ``df`` as the next version; atomic at the manifest swap.

        Data lands in a unique staging dir first and is renamed into
        ``v{next_v}`` only once fully written.  A crash mid-write therefore
        leaves an unreferenced staging dir, never a partial ``v{N}`` that
        would make every later commit's errorifexists write raise forever.
        An existing ``v{next_v}`` is provably an orphan from a crashed
        commit (the manifest still points at ``next_v - 1``), so it is
        removed; the final ``os.rename`` keeps the put-if-absent contract
        against a concurrent writer.
        """
        import shutil
        import uuid

        manifest = self._read_manifest()
        next_v = manifest["version"] + 1
        data_dir = os.path.join(self.root, f"v{next_v}")
        staging = os.path.join(
            self.root, f".v{next_v}-staging-{uuid.uuid4().hex}"
        )
        try:
            df.write.mode("errorifexists").parquet(staging)
            n_rows = df.sparkSession.read.parquet(staging).count()
            if os.path.exists(data_dir):
                shutil.rmtree(data_dir)  # un-manifested orphan — never committed
            os.rename(staging, data_dir)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        manifest["version"] = next_v
        manifest["history"] = [
            *manifest["history"], {"version": next_v, "rows": n_rows,
                                   "note": note},
        ]
        self._commit_manifest(manifest)
        return next_v

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = self.version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"{self.root}: no committed version")
        if version is not None and version > self.version():
            raise ValueError(f"version {version} > latest {self.version()}")
        return spark.read.parquet(os.path.join(self.root, f"v{v}"))

    def merge(
        self, spark: SparkSession, delta: DataFrame, keys: Sequence[str],
        note: str = "merge",
        evolve_schema: bool = False,
    ) -> int:
        """REPLACE-INTO merge as a new version (upsert with history).
        First merge on an empty table commits the delta as v0.
        ``evolve_schema=True`` lets the delta add columns (existing rows
        read NULL for them) — and because every version is an immutable
        full snapshot, time travel still returns each version under the
        schema it was written with."""
        from mrsboraetl_spark.operators.upsert import replace_into

        base = self.read(spark) if self.version() >= 0 else None
        return self.commit(
            replace_into(base, delta, list(keys), evolve_schema=evolve_schema),
            note=note,
        )

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop data dirs of versions older than the last ``keep_last``.
        Returns dropped versions.  (Local-dir equivalent of Delta VACUUM;
        snapshot readers of dropped versions lose them — same contract.)"""
        import shutil

        latest = self.version()
        dropped = []
        for v in range(0, max(latest - keep_last + 1, 0)):
            d = os.path.join(self.root, f"v{v}")
            if os.path.exists(d):
                shutil.rmtree(d)
                dropped.append(v)
        return dropped
