"""Connected-components high-diameter probe (manual tool, not a pytest
test) — VERDICT r4 item 6.

Measures rounds-to-convergence and wall time for min-label propagation
WITH pointer-doubling (operators/dedup.py:connected_components) on the
adversarial graph shapes:

* pure chain (diameter = n-1): the worst case for plain label
  propagation (O(diameter) rounds); pointer doubling should converge in
  ~log2(n) rounds.
* 2D lattice (diameter ~ 2*sqrt(n)): the realistic "long but branching"
  shape.
* clustered graph (5k clusters of 10, full intra-cluster edges): what
  LSH near-dup pair graphs actually look like — should converge in 2-3
  rounds.

Usage: python tests/cc_probe.py   # results land in PERF.md by hand
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mrsboraetl_spark.operators import dedup  # noqa: E402
from mrsboraetl_spark.session import get_spark  # noqa: E402


def chain_edges(spark, n):
    return spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )


def lattice_edges(spark, side):
    cells = spark.range(side * side).select(
        (F.col("id") % side).alias("x"), (F.col("id") / side).cast("long").alias("y")
    )
    node = (F.col("y") * side + F.col("x")).alias("doc_a")
    right = cells.filter(F.col("x") < side - 1).select(
        node, (F.col("y") * side + F.col("x") + 1).alias("doc_b")
    )
    down = cells.filter(F.col("y") < side - 1).select(
        node, ((F.col("y") + 1) * side + F.col("x")).alias("doc_b")
    )
    return right.union(down)


def cluster_edges(spark, n_clusters, size):
    ids = spark.range(n_clusters * size).select(
        (F.col("id") / size).cast("long").alias("c"), F.col("id").alias("doc_a")
    )
    return (
        ids.alias("a")
        .join(ids.alias("b"), "c")
        .filter(F.col("a.doc_a") < F.col("b.doc_a"))
        .select(F.col("a.doc_a").alias("doc_a"), F.col("b.doc_a").alias("doc_b"))
    )


def run(name, edges, expect_components):
    edges = edges.localCheckpoint()
    n_edges = edges.count()
    t0 = time.time()
    comps = dedup.connected_components(edges, max_iter=60)
    n_comp = comps.select("label").distinct().count()
    wall = time.time() - t0
    assert n_comp == expect_components, (name, n_comp, expect_components)
    print(
        f"{name:24s} edges={n_edges:>8d} components={n_comp:>6d} "
        f"rounds={dedup._LAST_CC_ROUNDS:>3d} wall={wall:6.1f}s"
    )


def main():
    spark = get_spark(app_name="cc_probe")
    run("chain_1k", chain_edges(spark, 1_000), 1)
    run("chain_10k", chain_edges(spark, 10_000), 1)
    run("chain_50k", chain_edges(spark, 50_000), 1)
    run("lattice_224x224", lattice_edges(spark, 224), 1)
    run("clusters_5k_x10", cluster_edges(spark, 5_000, 10), 5_000)


if __name__ == "__main__":
    main()
