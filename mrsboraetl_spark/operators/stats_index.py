"""Persistent incremental corpus-stats index: per-group profiling
(row/token counts + KMV distinct sketches) for a CONTINUOUSLY-INGESTING
corpus, without re-scanning what is already profiled.

The profiling queries (sketch_kmv_distinct, profile_source_percentiles)
scan the whole corpus per run — right for one-shot jobs, wrong for a
pipeline ingesting daily slices into a 100 TB corpus.  ``StatsIndex``
keeps mergeable per-group state on storage between runs:

* counts are plain sums (trivially mergeable);
* distinct values use the KMV sketch from ``operators/sketch.py``, whose
  merge is EXACT: the union's k smallest hashes are a subset of the
  per-batch k smallest, so any ingest split yields bit-identical
  estimates to a one-shot profile of the full corpus (pytest-pinned —
  the same batch-split-equivalence standard the LSH band index meets
  for pairs).

Per-ingest cost is O(|batch|) plus a sketch-table merge whose size is
(groups x k) — never O(|corpus|).  State promotion uses the engine's
rename-aside swap, so readers never observe a partial state directory
and a crash leaves the previous state at ``.old``.  Single writer at a
time, like the band index (front with a VersionedTable for
multi-writer setups).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrsboraetl_spark.operators._swap import rescue_orphan
from mrsboraetl_spark.operators.sketch import _hash_frac

_STATE = "state.parquet"
_META = "_meta.json"


class StatsIndex:
    def __init__(self, path: str, group_col: str = "source", k: int = 64):
        if k < 2:
            raise ValueError(f"k must be >= 2, got {k}")
        self.path = path
        self.group_col = group_col
        self.k = k
        os.makedirs(path, exist_ok=True)
        # An ingest() crash between its two os.replace calls leaves the
        # committed state only at '.old' — restore it (the in-flight
        # batch was never committed; its '.tmp' is overwritten next run).
        rescue_orphan(self._state_path())
        meta_path = os.path.join(path, _META)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if meta != self._meta():
                raise ValueError(
                    f"index at {path} was built with {meta}, "
                    f"got {self._meta()}"
                )
        else:
            with open(meta_path, "w") as f:
                json.dump(self._meta(), f)

    def _meta(self) -> dict:
        return {"group_col": self.group_col, "k": self.k}

    def _state_path(self) -> str:
        return os.path.join(self.path, _STATE)

    def _batch_state(
        self, docs: DataFrame, id_col: str, text_col: str
    ) -> DataFrame:
        """Per-group mergeable state for one batch: n_docs, n_tokens,
        and the ascending <=k minimum token-hash fractions."""
        g = self.group_col
        toks = docs.select(
            F.col(g),
            F.size(
                F.split(
                    F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")),
                    " ",
                )
            ).alias("_nt"),
        )
        counts = toks.groupBy(g).agg(
            F.count("*").alias("n_docs"), F.sum("_nt").alias("n_tokens")
        )
        hashed = (
            docs.select(
                F.col(g),
                F.explode(
                    F.filter(
                        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                        lambda t: t != "",
                    )
                ).alias("tok"),
            )
            .select(F.col(g), _hash_frac(F.col("tok")).alias("h"))
            .filter(F.col("h").isNotNull())
            .distinct()
        )
        from pyspark.sql import Window

        w = Window.partitionBy(g).orderBy("h")
        mins = hashed.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= self.k
        )
        sk = mins.groupBy(g).agg(
            F.array_sort(F.collect_list("h")).alias("sketch")
        )
        return counts.join(sk, g, "left")

    @staticmethod
    def _merge(a: DataFrame, b: DataFrame, g: str, k: int) -> DataFrame:
        """Fold two state tables: sum counts, union+trim sketches."""
        both = a.unionByName(b)
        return both.groupBy(g).agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.flatten(
                            F.collect_list(
                                F.coalesce(
                                    F.col("sketch"),
                                    F.expr("array()").cast("array<double>"),
                                )
                            )
                        )
                    )
                ),
                1,
                k,
            ).alias("sketch"),
        )

    def ingest(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        """Fold one batch into the persisted state (rename-aside swap)."""
        spark = docs.sparkSession
        batch = self._batch_state(docs, id_col, text_col)
        state_path = self._state_path()
        if os.path.exists(state_path):
            merged = self._merge(
                spark.read.parquet(state_path), batch, self.group_col, self.k
            )
        else:
            merged = batch
        tmp, old = state_path + ".tmp", state_path + ".old"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(state_path):
            os.replace(state_path, old)
        os.replace(tmp, state_path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def stats(self, spark: SparkSession) -> DataFrame:
        """(group, n_docs, n_tokens, est_distinct_tokens) from the
        persisted state — groups with fewer than k sketch entries are
        exact, exactly like kmv_distinct."""
        st = spark.read.parquet(self._state_path())
        n_kept = F.size("sketch")
        h_k = F.element_at("sketch", n_kept)
        return st.select(
            self.group_col,
            "n_docs",
            "n_tokens",
            F.round(
                F.when(n_kept < self.k, n_kept.cast("double")).otherwise(
                    (self.k - 1) / h_k
                ),
                4,
            ).alias("est_distinct_tokens"),
        )
