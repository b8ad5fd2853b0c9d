from __future__ import annotations

import pytest

from mrsboraetl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Fixture data is hundreds of rows; Janino compilation + JIT of the huge
    # generated methods (28-ladder decode, blob packing) costs far more than
    # interpreted evaluation at this size — the full suite went from
    # >590s (timeout) to minutes with codegen off.  Codegen paths are
    # exercised by tests/oracle_check.py and bench.py, which run at real
    # scale factors with the production session config.
    s = get_spark(
        app_name="mrsboraetl_tests",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.codegen.wholeStage": "false",
            "spark.sql.codegen.factoryMode": "NO_CODEGEN",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir_mid():
    return "/root/testdata/sf0.01"


# --- r14 fast tier (VERDICT r13 item 1) -------------------------------
# The driver's verify runs `python -m pytest tests/ -x -q` under a time
# budget the full suite (~60-90 min: end-to-end crash/race/retention
# pipeline probes) no longer fits — VERIFY_r13 was cut off at ~30% with
# zero failures.  pytest.ini therefore deselects `slow`-marked tests by
# default; run EVERYTHING with `python -m pytest tests/ -m "" -q`
# (a trailing -m overrides the addopts one), which is what the builder's
# own round-verification runs use.
#
# Membership is the measured r14 full-suite durations (--durations=0,
# committed criterion: call time > 15s), EXCEPT that every test file
# keeps at least one representative in the fast tier so the default
# collection still exercises every operator family end-to-end at least
# once (the three all-slow files each keep their fastest probe:
# latest-merge versioned layout, manifest corrupt-ref read, file-level
# sidecar tracking).  Fast tier measured ~280 tests / well under the
# budget; the slow tier is the 69 heavyweight probes below.
_SLOW_TESTS = {
    "test_ann_index.py::test_retrain_flattens_skew_and_keeps_contracts",
    "test_ann_index.py::test_streaming_skew_triggers_exactly_one_retrain",
    "test_corpus_pipeline.py::test_curate_and_export_end_to_end",
    "test_corpus_pipeline.py::test_priority_keeper_policy_in_composed_pipeline",
    "test_file_level_writes.py::test_file_level_interrupted_swap_keeps_contract",
    "test_file_level_writes.py::test_file_level_sync_rewrites_only_touched_files",
    "test_file_level_writes.py::test_lab_file_level_sync_rewrites_only_touched_files",
    "test_file_level_writes.py::test_person_retighten_cadence",
    "test_file_level_writes.py::test_phase2_reads_only_touched_files_plus_fallback_months",
    "test_file_level_writes.py::test_sidecar_file_entries_after_file_level_sync",
    "test_jdbc_pipeline.py::test_jdbc_incremental_append_lands",
    "test_jdbc_pipeline.py::test_jdbc_snapshot_auto_default",
    "test_jdbc_pipeline.py::test_jdbc_undated_void_caught_by_pushdown_fingerprint",
    "test_jdbc_pipeline.py::test_jdbc_watermark_scoped_staging_is_o_delta",
    "test_latest_merge.py::test_latest_merge_catchup_fraction_falls_back",
    "test_latest_merge.py::test_latest_merge_deletes_fully_voided_person",
    "test_latest_merge.py::test_latest_merge_manifest_reuses_files",
    "test_latest_merge.py::test_latest_merge_runs_and_matches_full_build",
    "test_latest_merge.py::test_latest_person_void_falls_back_to_full_build",
    "test_latest_merge.py::test_latest_table_honors_keep_snapshots",
    "test_latest_merge.py::test_merge_path_watermark_equals_full_path_value",
    "test_llmdata.py::test_ivf_pq_codes_and_norefine_shape",
    "test_llmdata.py::test_ivf_pq_recall",
    "test_manifest_layout.py::test_commit_during_plan_phase_raises_then_converges",
    "test_manifest_layout.py::test_concurrent_flip_raises_and_preserves_winner",
    "test_manifest_layout.py::test_concurrent_flip_retries_and_both_land",
    "test_manifest_layout.py::test_gc_protects_live_refs_when_history_missing",
    "test_manifest_layout.py::test_manifest_crash_at_flip_keeps_contract",
    "test_manifest_layout.py::test_manifest_crash_orphan_epoch_not_time_travelable",
    "test_manifest_layout.py::test_manifest_crash_with_preexisting_unbounded_month_stays_conservative",
    "test_manifest_layout.py::test_manifest_file_level_sync_carries_by_reference",
    "test_manifest_layout.py::test_manifest_gc_and_probe_pruning",
    "test_manifest_layout.py::test_manifest_incremental_matches_rebuild_and_dir_mode",
    "test_manifest_layout.py::test_manifest_migration_sweeps_legacy_hive_dirs",
    "test_manifest_layout.py::test_manifest_raw_path_read_sees_no_data",
    "test_manifest_layout.py::test_manifest_snapshot_retention_and_time_travel",
    "test_manifest_layout.py::test_manifest_split_crash_retention_and_time_travel",
    "test_manifest_layout.py::test_manifest_split_reads_identical_and_carries_refs",
    "test_manifest_layout.py::test_pipeline_snapshot_gives_cross_table_consistent_reads",
    "test_manifest_layout.py::test_pipeline_snapshot_records_own_commits_not_live_pointers",
    "test_manifest_layout.py::test_two_full_runs_race_end_to_end_and_converge",
    "test_manifest_layout.py::test_unreadable_snapshot_heals_under_cas",
    "test_oracle_parity.py::test_no_nonscalar_output_columns",
    "test_partitioned.py::test_partitioned_month_swap_crash_is_rescued",
    "test_partitioned.py::test_stale_demoted_month_dir_is_cleaned",
    "test_partitioned.py::test_sync_covers_encounter_repointed_across_person_and_month",
    "test_partitioned.py::test_sync_rewrites_only_affected_months",
    "test_partitioned_bounds.py::test_sync_probe_reads_scale_with_delta",
    "test_pipeline.py::test_crash_before_latest_write_reconciles_next_sync",
    "test_pipeline.py::test_incremental_sync_catches_up",
    "test_pipeline.py::test_masked_column_advance_defeats_skip",
    "test_pipeline.py::test_noop_sync_skips_every_stage",
    "test_pipeline.py::test_skip_recovers_demoted_old_table",
    "test_pipeline.py::test_sync_purges_voided_person",
    "test_pipeline.py::test_undated_person_void_defeats_skip",
    "test_plans.py::test_no_registry_query_plans_a_nested_loop",
    "test_properties.py::test_kmv_merge_equals_direct_property",
    "test_properties.py::test_packed_blob_entry_of_equals_in_struct_entry",
    "test_properties.py::test_replace_into_idempotent",
    "test_sources.py::test_engine_path_sources_equal_dataframe_sources",
    "test_sources.py::test_partitioned_engine_with_path_sources_noop_sync",
    "test_span_index.py::test_lsh_index_compact_crash_orphan_is_rescued",
    "test_span_index.py::test_simhash_index_batch_split_equals_batch_operator",
    "test_streaming.py::test_append_mode_finalizes_once_and_drops_late",
    "test_streaming.py::test_streaming_pipeline_sync_equals_batch_rebuild",
    "test_streaming.py::test_streaming_pipeline_sync_manifest_mode_crash_and_gc",
    "test_versioned.py::test_concurrent_merge_retries_and_both_land",
    "test_versioned.py::test_history_compaction_bounds_manifest",
    "test_versioned.py::test_pipeline_versioned_layout_matches_default",
    "test_ann_index.py::test_batch_split_assignment_is_exact",
    "test_ann_index.py::test_ivf_cell_join_hot_cell_cap",
    "test_corpus_pipeline.py::test_audit_partitions_every_doc_exactly_once",
    "test_corpus_pipeline.py::test_monster_doc_capped_not_dropped",
    "test_corpus_pipeline.py::test_optin_redact_and_span_stages",
    "test_corpus_pipeline.py::test_optin_stages_default_off_matches_previous_behavior",
    "test_corpus_pipeline.py::test_packed_covers_exactly_the_train_split",
    "test_corpus_pipeline.py::test_pipeline_is_deterministic",
    "test_corpus_pipeline.py::test_stages_agree_with_standalone_operators",
    "test_jdbc_pipeline.py::test_jdbc_pipeline_matches_parquet_pipeline",
    "test_jdbc_pipeline.py::test_jdbc_snapshot_staging_single_pipe_crossing",
    "test_jdbc_pipeline.py::test_stale_src_snapshot_dirs_swept_at_run_start",
    "test_layout.py::test_compact_with_zorder_restores_clustering",
    "test_oracle_parity.py::test_oracle_parity[dedup_cluster_keepers]",
    "test_partitioned.py::test_partitioned_layout_matches_default",
    "test_partitioned_bounds.py::test_bounds_sidecar_exact_after_rebuild",
    "test_pipeline.py::test_sync_rerun_is_idempotent",
    "test_plans.py::test_ngram_jaccard_caps_hot_shingles",
    "test_plans.py::test_unregistered_scale_ops_plan_no_nested_loop",
    "test_properties.py::test_chunk_documents_reconstruction_property",
    "test_properties.py::test_pack_sequences_tiling_property",
    "test_properties.py::test_span_reassembly_identity_property",
    "test_rangejoin.py::test_interval_join_matches_theta_join",
    "test_span_index.py::test_streaming_driver_is_index_generic",
    "test_versioned.py::test_merge_delta_manifest_stats_prune_the_probe",
    "test_versioned.py::test_merge_delta_vacuum_keeps_shared_files",
    "test_versioned.py::test_streaming_exactly_once_merge",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = f"{item.fspath.basename}::{item.name}"
        if key in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
