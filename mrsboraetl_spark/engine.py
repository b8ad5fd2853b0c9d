"""Pipeline runner: the five flat stages in dependency order over parquet.

The reference runs six scripts by hand in a fixed order (README.md:4-9,
Procedure.txt:1-6): flat_log, flat_obs, flat_orders, flat_lab_obs,
flat_visit_summary, flat_latest_hiv_summary.  The engine form is a driver
loop: for each stage, resolve the watermark (I1), build the incremental (or
full-rebuild) plan, write the target atomically, log the run.

Storage is format-agnostic parquet-by-default: each target lives at
``<root>/<table>.parquet``.  The default layout rewrites the target whole
behind one atomic swap; under ``partitioned=True`` a sync rewrites ONLY
the ``p_month`` directories its delta touches (the plans report an
affected-month superset via their ``out`` side-channel), so write I/O
scales with the delta, not the target — the reference's ``REPLACE INTO``
cost model.  The upsert algebra in operators/upsert.py computes the
merged state; a Delta MERGE writer can slot in without touching the
plans.  Writes go to a temp dir then move — the source parquet is
re-read lazily, so writing over the path being read would corrupt it.

Modes (flat_visit_summary_v1.0.sql:6 @query_type):
* ``rebuild`` — recompute every target from the sources;
* ``sync``   — incremental: each stage processes only keys changed since
  its watermark; cascade propagation (I4) keys visit_summary off
  flat_obs.max_date_created exactly like the reference (:93-99).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrsboraetl_spark.config import TABLE_VERSIONS
from mrsboraetl_spark.plans.flat_lab_obs import (
    build_flat_lab_obs,
    incremental_flat_lab_obs,
)
from mrsboraetl_spark.plans.flat_latest_hiv_summary import (
    build_flat_latest_hiv_summary,
)
from mrsboraetl_spark.plans.flat_obs import build_flat_obs, incremental_flat_obs
from mrsboraetl_spark.plans.flat_orders import (
    build_flat_orders,
    incremental_flat_orders,
)
from mrsboraetl_spark.plans.flat_visit_summary import (
    build_flat_visit_summary,
    incremental_flat_visit_summary,
)
from mrsboraetl_spark.sources.watermark import WatermarkStore


class PipelineRunner:
    """Run the five-stage pipeline against a dict of source DataFrames
    (keys: obs, encounter, orders, person) into a parquet directory."""

    def __init__(
        self,
        spark: SparkSession,
        storage_root: str,
        versioned: bool = False,
        partitioned: bool = False,
    ):
        """``versioned=True`` stores every target as a VersionedTable
        (sources/versioned.py): each run commits a new immutable version
        behind an atomic manifest swap — snapshot isolation for
        concurrent readers plus time travel over past sync states — at
        the cost of keeping old versions until ``vacuum``.  The default
        swap layout keeps only the latest state.

        ``partitioned=True`` lays the large targets out hive-style under
        ``p_month=YYYY-MM`` directories (derived from the encounter
        datetime) so date-range consumers get PARTITION PRUNING — at
        100 TB a month-window query then opens ~1/N of the files instead
        of relying on row-group stats alone.  Within each month
        directory files stay clustered+sorted on the PK (the shuffle key
        is (p_month, pk), so no task writes into more than one month
        directory).  ``read_target`` drops the synthetic ``p_month`` so
        the incremental plans see the exact stage schema; date-range
        consumers read the path directly with a ``p_month`` filter."""
        self.spark = spark
        self.root = storage_root
        self.versioned = versioned
        self.partitioned = partitioned
        if versioned and partitioned:
            raise ValueError(
                "versioned and partitioned layouts are mutually exclusive "
                "(the manifest writer commits unpartitioned snapshots)"
            )
        os.makedirs(storage_root, exist_ok=True)
        self.watermarks = WatermarkStore(
            spark, os.path.join(storage_root, "flat_log.parquet")
        )

    # ------------------------------------------------------------ storage

    def _path(self, table: str) -> str:
        return os.path.join(self.root, f"{table}.parquet")

    def _versioned(self, table: str):
        from mrsboraetl_spark.sources.versioned import VersionedTable

        return VersionedTable(os.path.join(self.root, f"{table}.v"))

    def read_target(self, table: str) -> DataFrame | None:
        if self.versioned:
            vt = self._versioned(table)
            return None if vt.version() < 0 else vt.read(self.spark)
        path = self._path(table)
        old = path + ".old"
        if not os.path.exists(path) and os.path.exists(old):
            # _write crashed inside its demote->promote window (old moved
            # aside, tmp not yet promoted): recover the previous table so
            # the next run is an incremental, not a silent cold rebuild.
            os.replace(old, path)
        if not os.path.exists(path):
            return None
        if self.partitioned and os.path.exists(path):
            # Rescue months orphaned by a _write_months crash: the swap
            # demotes p_month=M to _old.M (underscore prefix => invisible
            # to Spark's partition discovery) before promoting the new
            # directory.  A crash in that window leaves the month only at
            # _old.M — restore it.  The watermark is logged strictly
            # after a fully-successful write, so a restored-then-stale
            # month is simply re-synced by the next run (idempotent
            # delete+reaggregate), never silently lost.
            for entry in os.listdir(path):
                if entry.startswith(self._OLD_PREFIX):
                    dst = os.path.join(
                        path,
                        f"{self.PARTITION_COL}="
                        + entry[len(self._OLD_PREFIX):],
                    )
                    if not os.path.exists(dst):
                        os.replace(os.path.join(path, entry), dst)
                    else:
                        # dst present => that month's swap COMPLETED
                        # (demote happens strictly before promote); the
                        # leftover demoted copy is a crash artifact from
                        # the post-promote cleanup window — drop it so
                        # it can't linger forever on never-rewritten
                        # months.
                        shutil.rmtree(
                            os.path.join(path, entry), ignore_errors=True
                        )
        df = self.spark.read.parquet(path)
        if self.partitioned and self.PARTITION_COL in df.columns:
            # Incremental plans expect the exact stage schema; the
            # synthetic partition column is a storage-layout detail.
            # Date-range consumers should read the path directly and
            # filter on p_month to get partition pruning.
            df = df.drop(self.PARTITION_COL)
        return df

    # PK per target: writes are repartitioned + sorted on it, so parquet
    # row-group min/max statistics prune key probes (the engine's stand-in
    # for the reference's InnoDB PK index, flat_obs_v1.0.sql:50) and the
    # next incremental's anti-join reads co-clustered files.
    _CLUSTER_BY = {
        "flat_obs": ["encounter_id"],
        "flat_orders": ["encounter_id"],
        "flat_lab_obs": ["encounter_id"],
        "flat_visit_summary": ["encounter_id"],
        "flat_latest_hiv_summary": ["person_id"],
    }

    # Hive partition column per large target (partitioned=True): month of
    # the row's clinical datetime.  Month granularity keeps directory
    # cardinality bounded (years of data -> tens of partitions) while
    # matching the dominant consumer predicate (date-range reports).
    # flat_latest_hiv_summary stays unpartitioned: a small latest-state
    # per-patient table with no date-range access pattern.
    _PARTITION_SRC = {
        "flat_obs": "encounter_datetime",
        "flat_orders": "encounter_datetime",
        "flat_lab_obs": "test_datetime",
        "flat_visit_summary": "encounter_datetime",
    }
    PARTITION_COL = "p_month"
    # Demoted month directories during a partial swap: the underscore
    # prefix keeps them invisible to Spark's partition discovery (hidden
    # path rule), unlike a 'p_month=M.old' name, which discovery would
    # read back as a phantom partition VALUE 'M.old'.
    _OLD_PREFIX = "_old."
    # Delta-scoped writes stop paying off when the delta touches most of
    # the target anyway: past this fraction of month directories the
    # single-pass full rewrite (one job, one atomic swap) wins over
    # per-directory swaps, so fall back.
    _DELTA_WRITE_MAX_FRACTION = 0.5

    def read_target_months(
        self, table: str, months: list[str]
    ) -> DataFrame:
        """The target restricted to the given storage months, with the
        month predicate applied ON THE PHYSICAL PARTITION COLUMN so
        Spark's planning-time partition pruning opens only those
        directories — the read-side complement of the delta-scoped
        write (at 100 TB this is what makes a sync O(delta months) end
        to end instead of an O(target) scan feeding an O(delta)
        write)."""
        df = self.spark.read.parquet(self._path(table))
        return df.filter(
            F.col(self.PARTITION_COL).isin(months)
        ).drop(self.PARTITION_COL)

    def _write(self, df: DataFrame, table: str) -> None:
        """Full write: cluster, stage, atomic whole-table swap."""
        pk = self._CLUSTER_BY.get(table)
        part_src = self._PARTITION_SRC.get(table) if self.partitioned else None
        if part_src:
            from mrsboraetl_spark.schemas import p_month_of

            df = df.withColumn(self.PARTITION_COL, p_month_of(part_src))
            # Shuffle on (month, pk): every task's rows land in a single
            # month directory (no file fan-out across partitions) and stay
            # sorted on the PK inside it for row-group stats.
            df = df.repartition(self.PARTITION_COL, *pk).sortWithinPartitions(
                *pk
            )
        elif pk:
            df = df.repartition(*pk).sortWithinPartitions(*pk)
        if self.versioned:
            self._versioned(table).commit(df, note=table)
            return
        path, tmp = self._path(table), self._path(table) + ".tmp"
        old = path + ".old"
        writer = df.write.mode("overwrite")
        if part_src:
            writer = writer.partitionBy(self.PARTITION_COL)
        writer.parquet(tmp)
        # Promote via rename-aside: demote old -> promote tmp -> drop old.
        # A crash between the two os.replace calls leaves nothing at `path`
        # but the previous table intact at `.old`; read_target recovers it.
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.replace(path, old)
        os.replace(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def _write_delta(
        self, df: DataFrame, table: str, months: list[str]
    ) -> None:
        """Delta-scoped write: ``df`` is the merged state of the
        affected months only; cluster it and swap just those
        directories (see _write_months for the crash contract)."""
        from mrsboraetl_spark.schemas import p_month_of

        pk = self._CLUSTER_BY[table]
        part_src = self._PARTITION_SRC[table]
        delta = (
            df.withColumn(self.PARTITION_COL, p_month_of(part_src))
            # The plans' superset contract puts every merged row in an
            # affected month; the filter pins the staged write to the
            # exact swap set (rows outside it could never be promoted).
            .filter(F.col(self.PARTITION_COL).isin(months))
            .repartition(self.PARTITION_COL, *pk)
            .sortWithinPartitions(*pk)
        )
        self._write_months(delta, self._path(table), months)

    def _write_months(
        self, df: DataFrame, path: str, months: list[str]
    ) -> None:
        """Rewrite ONLY the given ``p_month`` directories of an existing
        partitioned target from ``df`` (already filtered to those months,
        month-partitioned and PK-sorted by _write).

        An empty ``months`` list means the sync changed nothing: skip
        the write entirely (zero write I/O for a no-op sync).  Months
        staged with no surviving rows have their directory deleted.
        Each directory swap is individually crash-safe (demote to
        _old.M -> promote staged -> drop _old.M; read_target restores
        an orphaned _old.M); the sequence as a whole is converged by
        the next sync, since the watermark only advances after every
        swap completed."""
        if not months:
            return
        tmp = path + ".delta-tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        (
            df.write.mode("overwrite")
            .partitionBy(self.PARTITION_COL)
            .parquet(tmp)
        )
        for m in months:
            src = os.path.join(tmp, f"{self.PARTITION_COL}={m}")
            dst = os.path.join(path, f"{self.PARTITION_COL}={m}")
            old = os.path.join(path, self._OLD_PREFIX + m)
            if os.path.exists(old):
                shutil.rmtree(old)
            if os.path.exists(dst):
                os.replace(dst, old)
            if os.path.exists(src):
                os.replace(src, dst)
            if os.path.exists(old):
                shutil.rmtree(old)
        shutil.rmtree(tmp)

    # -------------------------------------------------------------- runs

    @staticmethod
    def _max_ts(df: DataFrame, col: str = "date_created"):
        row = df.agg(F.max(col).alias("m")).first()
        return row["m"] if row else None

    def run(self, sources: dict[str, DataFrame], mode: str = "sync") -> None:
        """Run all stages in dependency order."""
        assert mode in ("sync", "rebuild")
        obs, enc = sources["obs"], sources["encounter"]
        orders, person = sources["orders"], sources["person"]

        # Snapshot the source data watermarks BEFORE any stage runs, like
        # the reference's @last_date_created (flat_obs_v1.0.sql:25-27):
        # against a live source, a row arriving mid-stage must NOT be
        # covered by the logged watermark or the next sync skips it forever.
        # One scan per source table, shared by every stage that needs it.
        max_obs = self._max_ts(obs)
        max_enc = self._max_ts(enc)
        max_orders = self._max_ts(orders)

        self._stage(
            "flat_obs",
            lambda target, wm, out: build_flat_obs(obs, enc, person)
            if mode == "rebuild" or target is None
            else incremental_flat_obs(target, obs, enc, person, wm, out=out),
            # greatest of encounter/obs max date_created — the reference's
            # @last_date_created (flat_obs_v1.0.sql:26-28); obs-only would
            # perpetually re-queue encounters edited after the last obs.
            data_wm=max(filter(None, [max_obs, max_enc]), default=None),
        )
        self._stage(
            "flat_orders",
            lambda target, wm, out: build_flat_orders(orders, enc, person)
            if mode == "rebuild" or target is None
            else incremental_flat_orders(
                target, orders, enc, person, wm, out=out
            ),
            data_wm=max_orders,
        )
        self._stage(
            "flat_lab_obs",
            lambda target, wm, out: build_flat_lab_obs(obs)
            if mode == "rebuild" or target is None
            else incremental_flat_lab_obs(target, obs, wm, out=out),
            # greatest of encounter/obs max (flat_lab_obs_v1.0.sql:37-39)
            data_wm=max(filter(None, [max_obs, max_enc]), default=None),
        )

        flat_obs = self.read_target("flat_obs")
        flat_lab = self.read_target("flat_lab_obs")
        vs_wm_snapshot = self._max_ts(flat_obs, "max_date_created")
        self._stage(
            "flat_visit_summary",
            lambda target, wm, out: build_flat_visit_summary(
                flat_obs, flat_lab, person
            )
            if mode == "rebuild" or target is None
            else incremental_flat_visit_summary(
                target, flat_obs, flat_lab, person, enc, wm,
                obs_for_retractions=obs, out=out,
            ),
            # cascade (I4): keyed off upstream flat_obs.max_date_created
            # (flat_visit_summary_v1.0.sql:16,93-99)
            data_wm=vs_wm_snapshot,
        )

        # Latest snapshot: always a full overwrite of a small per-patient
        # table (fixes quirk 8's duplicate-on-rerun INSERT).
        started = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        vs = self.read_target("flat_visit_summary")
        self._write(build_flat_latest_hiv_summary(vs), "flat_latest_hiv_summary")
        self.watermarks.log_run(
            TABLE_VERSIONS["flat_latest_hiv_summary"], started,
            self._max_ts(vs, "max_date_created"),
        )

    def _stage(self, table: str, plan, data_wm) -> None:
        """One pipeline stage.  Under the partitioned layout an
        incremental sync runs in TWO phases so both its read and its
        write scale with the delta, not the target:

        1. build the plan against the full target; its ``out``
           side-channel yields the affected-month superset (one
           column-pruned key/datetime probe of the target — the only
           full-target touch left in a sync);
        2. if the delta is month-local, RE-RUN the plan against the
           month-pruned target (planning-time partition pruning: only
           affected directories are even opened — rows elsewhere are
           neither retracted nor rewritten, so excluding them is
           exact) and swap just those directories.  An empty month set
           means a no-op sync: nothing is read beyond the probe,
           nothing is written.  Falls back to the full single-phase
           write when the delta spans most months (or the layout is
           unpartitioned/versioned/cold-start)."""
        started = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        version = TABLE_VERSIONS[table]
        target = self.read_target(table)
        wm = self.watermarks.last_update(version, fallback=target)
        part_src = self._PARTITION_SRC.get(table) if self.partitioned else None
        out: dict = {}
        if part_src and target is not None:
            # Only the two-phase delta path re-runs the plan; request
            # the recompute pin solely when that second pass can happen
            # (other layouts would pay the eager materialization — and
            # lose lineage replay on a real cluster — for nothing).
            out["pin_recomputed"] = True
        merged = plan(target, wm, out)
        months_df = out.get("affected_months")
        if part_src and months_df is not None and target is not None:
            # Bounded driver action: distinct storage months (tens of
            # rows for years of data — the watermark-store precedent).
            months = sorted(r["p_month"] for r in months_df.collect())
            existing = {
                d.split("=", 1)[1]
                for d in os.listdir(self._path(table))
                if d.startswith(self.PARTITION_COL + "=")
            }
            universe = existing | set(months)
            if not universe or len(months) <= (
                self._DELTA_WRITE_MAX_FRACTION * len(universe)
            ):
                if months:
                    pruned = self.read_target_months(table, months)
                    # Same out dict: the plan reuses its pinned
                    # recompute instead of re-running every source
                    # filter/join/reaggregation job a second time.
                    self._write_delta(
                        plan(pruned, wm, out), table, months
                    )
                self.watermarks.log_run(version, started, data_wm)
                return
        self._write(merged, table)
        self.watermarks.log_run(version, started, data_wm)
