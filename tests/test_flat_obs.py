from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mrsboraetl_spark.config import SYNTHETIC_ENCOUNTER_OFFSET
from mrsboraetl_spark.plans.flat_obs import build_flat_obs, incremental_flat_obs
from tests.fixtures import WATERMARK, make_sources, to_spark


@pytest.fixture(scope="module")
def sources(spark):
    dfs = to_spark(spark, make_sources())
    for df in dfs.values():
        df.cache().count()
    return dfs


def test_one_row_per_encounter(sources):
    flat = build_flat_obs(sources["obs"], sources["encounter"])
    assert flat.count() == flat.select("encounter_id").distinct().count()


def test_blob_is_sorted_and_bounded(sources):
    flat = build_flat_obs(sources["obs"], sources["encounter"])
    row = (
        flat.filter(F.col("obs").contains(" ## "))
        .orderBy("encounter_id")
        .first()
    )
    entries = row["obs"].split(" ## ")
    keys = [int(e.split("=", 1)[0].strip("!")) for e in entries]
    assert keys == sorted(keys)
    assert all(e.startswith("!!") and e.endswith("!!") for e in entries)


def test_numeric_rendering_strips_trailing_zero(sources):
    flat = build_flat_obs(sources["obs"], sources["encounter"])
    row = flat.filter(F.col("encounter_id") == 1).first()
    # fixture row: concept 6743 = 72.0 -> rendered "72" (MySQL-style)
    assert "!!6743=72!!" in row["obs"]
    # all-null-value concept 9999 contributes no blob entry
    assert "9999=" not in row["obs"]


def test_obs_map_matches_blob(sources):
    flat = build_flat_obs(sources["obs"], sources["encounter"])
    from mrsboraetl_spark.functions.obsmap import render_legacy_blob

    mismatches = flat.filter(
        render_legacy_blob(F.col("obs_map")) != F.col("obs")
    ).count()
    assert mismatches == 0


def test_encounterless_obs_get_synthetic_ids(sources):
    flat = build_flat_obs(sources["obs"], sources["encounter"])
    synth = flat.filter(F.col("encounter_id") >= SYNTHETIC_ENCOUNTER_OFFSET)
    assert synth.count() > 0
    assert synth.filter(F.col("encounter_type").isNotNull()).count() == 0
    # one row per (person_id, obs_datetime) group
    assert (
        synth.count()
        == synth.select("person_id", "encounter_datetime").distinct().count()
    )


def test_voided_obs_excluded(sources, spark):
    voided = sources["obs"].filter(F.col("voided") == 1)
    assert voided.count() > 0
    flat = build_flat_obs(sources["obs"], sources["encounter"])
    # spot-check: an encounter whose only obs are voided must not appear
    only_voided_enc = (
        sources["obs"].groupBy("encounter_id")
        .agg(F.min("voided").alias("all_voided"))
        .filter(F.col("all_voided") == 1)
    )
    assert flat.join(only_voided_enc, "encounter_id", "left_semi").count() == 0


def test_incremental_equals_rebuild(sources):
    """Cold start at epoch, then incremental from WATERMARK — final state
    must equal a full rebuild over current base data (I3 semantics)."""
    obs, enc, person = sources["obs"], sources["encounter"], sources["person"]

    # phase 1: everything created before the watermark.  localCheckpoint
    # stands in for the table write a real run does between syncs — without
    # it the phase-2 plan nests phase 1's whole DAG and analysis blows up.
    old_obs = obs.filter(F.col("date_created") <= F.lit(WATERMARK))
    t1 = incremental_flat_obs(
        None, old_obs, enc, person, "1900-01-01"
    ).localCheckpoint()

    # phase 2: full source arrives; incremental catches up from WATERMARK
    t2 = incremental_flat_obs(t1, obs, enc, person, WATERMARK).localCheckpoint()

    expected = incremental_flat_obs(None, obs, enc, person, "1900-01-01")
    sym_diff = t2.select("encounter_id", "obs").exceptAll(
        expected.select("encounter_id", "obs")
    ).unionAll(
        expected.select("encounter_id", "obs").exceptAll(
            t2.select("encounter_id", "obs")
        )
    )
    assert sym_diff.count() == 0


def test_incremental_idempotent(sources):
    obs, enc, person = sources["obs"], sources["encounter"], sources["person"]
    t1 = incremental_flat_obs(None, obs, enc, person, "1900-01-01").localCheckpoint()
    t2 = incremental_flat_obs(t1, obs, enc, person, WATERMARK).localCheckpoint()
    assert t2.count() == t1.count()
    assert (
        t2.select("encounter_id", "obs").exceptAll(
            t1.select("encounter_id", "obs")
        ).count()
        == 0
    )
