"""Hive-partitioned target layout (PipelineRunner(partitioned=True)):
month directories, equivalence with the swap layout, and — the point —
partition pruning for date-range consumers."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mrsboraetl_spark.engine import PipelineRunner
from tests.fixtures import make_sources, to_spark


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    dfs = to_spark(spark, make_sources(n_persons=20, seed=5))
    tmp = tmp_path_factory.mktemp("partlayout")
    plain = PipelineRunner(spark, str(tmp / "plain"))
    plain.run(dfs, mode="rebuild")
    part = PipelineRunner(spark, str(tmp / "part"), partitioned=True)
    part.run(dfs, mode="rebuild")
    part.run(dfs, mode="sync")  # incremental must survive the layout
    return dict(plain=plain, part=part)


def test_partitioned_layout_matches_default(layouts):
    for table in ("flat_obs", "flat_visit_summary", "flat_latest_hiv_summary"):
        a = layouts["plain"].read_target(table).toPandas()
        b = layouts["part"].read_target(table).toPandas()
        assert sorted(a.columns) == sorted(b.columns), table
        cols = sorted(c for c in a.columns if c != "obs_map")
        sa = sorted(map(tuple, a[cols].astype(str).itertuples(index=False)))
        sb = sorted(map(tuple, b[cols].astype(str).itertuples(index=False)))
        assert sa == sb, table


def test_month_directories_on_disk(layouts):
    path = layouts["part"]._path("flat_obs")
    subdirs = [d for d in os.listdir(path) if d.startswith("p_month=")]
    assert len(subdirs) >= 2, subdirs  # fixture spans multiple months


def test_partition_pruning_on_month_filter(spark, layouts):
    """A month-filtered read must open only that month's files and show
    the filter as a PartitionFilter (pruning at planning time), not a
    row-level PushedFilter."""
    path = layouts["part"]._path("flat_obs")
    full = spark.read.parquet(path)
    months = [r["p_month"] for r in full.select("p_month").distinct().collect()]
    one = sorted(months)[0]
    pruned = full.filter(F.col("p_month") == one)
    # Planning-time pruning: the month predicate must land in the scan's
    # PartitionFilters (directory pruning), not as a row-level data filter.
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "p_month" in pf, plan
    # And the pruned read equals reading that month's directory directly.
    sub = spark.read.parquet(f"{path}/p_month={one}")
    assert pruned.count() == sub.count() > 0


def test_partitioned_versioned_mutually_exclusive(spark, tmp_path):
    with pytest.raises(ValueError, match="mutually exclusive"):
        PipelineRunner(
            spark, str(tmp_path / "x"), versioned=True, partitioned=True
        )
