"""Bounded target probes for the incremental plans' affected-month
derivation.

Under the partitioned layout, a sync's phase-1 plan must locate the
storage months of the TARGET rows it will retract (old locations of
changed keys, rows of voided persons).  The naive probe is a
column-pruned scan of the whole target — correct, but O(target) read
per sync where the reference's PK index makes the same lookup
O(delta * log n) (flat_obs_v1.0.sql:46-50).

``month_probe`` closes that gap: when the engine offers a
``probe_reader`` (PipelineRunner keeps per-month [min, max] key bounds,
recorded at write time — the partitioned-layout lift of
VersionedTable.merge_delta's per-file accounting,
sources/versioned.py:236-252), the probe reads ONLY the month
directories whose recorded key range can contain a probe key; planning-
time partition pruning means the other directories are never opened.
The bounds are maintained as strict supersets across crash windows
(widen-before-swap), so a pruned probe can return extra months but
never miss one — the correctness contract the affected-month superset
needs.  Without a reader (unpartitioned layout, pre-bounds table,
cold start) the probe falls back to the full column-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def month_probe(
    target: DataFrame,
    out: dict | None,
    keys_df: DataFrame,
    key_col: str,
    cols: list[str],
) -> DataFrame:
    """The target projected to ``cols``, restricted (when the engine
    offers key-bounds pruning) to the storage months whose recorded
    [min, max] ``key_col`` range intersects ``keys_df`` — a guaranteed
    superset of the months containing any probed key."""
    reader = (out or {}).get("probe_reader")
    if reader is not None:
        pruned = reader(keys_df, key_col)
        if pruned is not None:
            return pruned.select(*cols)
    return target.select(*cols)


def recently_voided(person: DataFrame, wm) -> DataFrame:
    """Voided persons that can still have un-purged target rows: those
    voided since the watermark (plus undatable NULL-date_voided rows,
    always probed).  Persons voided before the watermark had their
    target months located and purged by the first sync that saw them —
    the purge itself (anti_delete on ALL voided persons) is unchanged;
    only the month-location probe is scoped, so a steady-state sync
    with no fresh voids probes nothing at all.  Sources without a
    date_voided column fall back to the full voided set (conservative:
    extra probe read, never a missed month)."""
    vp = person.filter(F.col("voided") == 1)
    if "date_voided" not in person.columns:
        return vp.select("person_id")
    return vp.filter(
        F.col("date_voided").isNull() | (F.col("date_voided") > wm)
    ).select("person_id")
