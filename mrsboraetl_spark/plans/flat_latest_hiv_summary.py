"""flat_latest_hiv_summary: one latest-snapshot row per patient.

Reference: flat_latest_hiv_summary_v1.0.sql (:21-37) — a MySQL "loose"
GROUP BY person_id selecting bare uuid/encounter_type/location_id/weight/
height/who_stage/tb_status alongside MAX(encounter_datetime,
enrollment_date, hiv_start_date, currentregmen, arvs_adherence); the
trailing ``ORDER BY encounter_datetime desc`` does not pick which row the
bare columns come from (SURVEY §2.4 A9, quirk 8).

The engine implements the evident intent deterministically: the bare
columns come from the patient's latest visit row (row_number over
encounter_datetime desc, encounter_id as tiebreak), the MAX columns are
true per-group aggregates, joined on person_id
(operators/latest.latest_snapshot_with_aggs).  The reference's plain
INSERT also duplicates rows on rerun (no PK, quirk 8); the engine's runner
overwrites the target instead.

Scale: one window shuffle + one aggregate shuffle, both partitioned on
person_id; AQE coalesces the join since both sides share the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrsboraetl_spark.operators.latest import latest_snapshot_with_aggs


def build_flat_latest_hiv_summary(flat_visit_summary: DataFrame) -> DataFrame:
    snap = latest_snapshot_with_aggs(
        flat_visit_summary,
        keys=["person_id"],
        order_col="encounter_datetime",
        bare_cols=[
            "uuid", "encounter_type", "location_id", "weight", "height",
            "who_stage", "tb_status",
        ],
        agg_exprs=[
            F.max("encounter_datetime").alias("latest_encounter_datetime"),
            F.max("enrollment_date").alias("enrollment_date"),
            F.max("hiv_start_date").alias("hiv_start_date"),
            F.max("currentregmen").alias("currentregmen"),
            F.max("arvs_adherence").alias("arvs_adherence"),
        ],
        tiebreak=["encounter_id"],
    )
    return snap.select(
        "person_id", "uuid",
        F.col("latest_encounter_datetime").alias("encounter_datetime"),
        "encounter_type", "location_id", "enrollment_date", "hiv_start_date",
        "weight", "height", "currentregmen", "arvs_adherence", "who_stage",
        "tb_status",
    )
