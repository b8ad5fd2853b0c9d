"""ANN norm-precompute scale probe (manual tool, not a pytest test) —
r12, VERDICT r11 item 7.

The r11 change replaced per-PAIR norm evaluation (``cosine()`` inline:
each side's 64-step norm aggregate re-evaluated once per candidate
pair) with per-ROW precomputed norms in the whole ANN family, argued
asymptotically and measured only at sf0.1 ("inside the noise band").
This probe turns the claim into a number at 100k vectors x 50 queries
(5M brute-force candidate pairs): wall + shuffle bytes for the CURRENT
spelling vs a faithful reconstruction of the r10 per-pair spelling, on
identical input files, for both the brute-force and IVF paths.

Results land in PERF.md by hand.

Usage: python tests/ann_norm_probe.py [n_vectors] [n_queries]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def _shuffle_bytes(spark) -> int:
    """Total shuffle-write bytes of all completed stages so far, via
    the local UI REST API (diffed around each run)."""
    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=10,
        ) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def main() -> None:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from mrsboraetl_spark.operators import similarity as S
    from mrsboraetl_spark.session import get_spark

    spark = get_spark(
        app_name="ann-norm-probe",
        extra_conf={"spark.ui.enabled": "true"},  # shuffle-byte readout
    )
    tmp = tempfile.mkdtemp(prefix="annprobe_")

    # Deterministic synthetic corpus, dim 64 (the embeddings table's
    # dim), written once so every spelling scans identical files.
    dim = 64
    vecs = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda d: F.sin(F.col("id") * d * 0.001) + F.cos(d * 0.5),
        ).cast("array<float>").alias("embedding"),
    )
    vecs.write.mode("overwrite").parquet(f"{tmp}/vecs")
    vectors = spark.read.parquet(f"{tmp}/vecs")
    queries = (
        vectors.filter(F.col("vec_id") % (n_vec // n_q) == 0)
        .limit(n_q)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    queries.write.mode("overwrite").parquet(f"{tmp}/qs")
    queries = spark.read.parquet(f"{tmp}/qs")

    def r10_brute(k=10):
        """Faithful r10 spelling: per-PAIR cosine() on the broadcast
        join — each side's norm aggregate re-evaluated per candidate."""
        sim = F.round(
            S.cosine(F.col("query_vec"), F.col("embedding")), 4
        )
        scored = (
            vectors.join(F.broadcast(queries))
            .filter(F.col("query_id") != F.col("vec_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor"),
                sim.alias("cosine"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor")
        )
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor", "cosine", "rk")
        )

    # IVF: train centroids ONCE, hand the same literals to both
    # spellings so the comparison isolates the norm arithmetic.
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = vectors.sample(0.02, seed=7).select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        )
    )
    model = KMeans(k=32, seed=7, maxIter=10).fit(train)
    centers = [
        (i, [float(x) for x in c])
        for i, c in enumerate(model.clusterCenters())
    ]

    def r10_ivf(k=10, nprobe=4):
        """Faithful r10 IVF spelling: cell assign + cell equi-join with
        per-pair cosine(), probe side broadcast un-pruned."""
        def cells_expr(col_name, n):
            return S._nearest_cells_expr(centers, col_name, n)

        cells = vectors.withColumn(
            "cell", cells_expr("embedding", 1).getItem(0)
        )
        probes = queries.withColumn(
            "cell", F.explode(cells_expr("query_vec", nprobe))
        )
        sim = F.round(
            S.cosine(F.col("query_vec"), F.col("embedding")), 4
        )
        scored = (
            cells.join(F.broadcast(probes), "cell")
            .filter(F.col("query_id") != F.col("vec_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor"),
                sim.alias("cosine"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor")
        )
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor", "cosine", "rk")
        )

    runs = {
        "brute_r11_row_norms": lambda: S.brute_force_topk(
            vectors, queries, k=10
        ),
        "brute_r10_pair_norms": r10_brute,
        "ivf_r11_row_norms": lambda: S.ivf_topk(
            vectors, queries, k=10, nprobe=4, centroids=centers
        ),
        "ivf_r10_pair_norms": r10_ivf,
    }

    # warmup every plan once (JIT), then 3 timed passes each, min
    results: dict = {}
    hashes: dict = {}
    for name, fn in runs.items():
        fn().write.format("noop").mode("overwrite").save()
    for name, fn in runs.items():
        walls = []
        sb0 = _shuffle_bytes(spark)
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 2))
        sb1 = _shuffle_bytes(spark)
        rows = fn().orderBy("query_id", "rk").collect()
        hashes[name] = hash(tuple(map(tuple, rows)))
        results[name] = {
            "wall_min3": min(walls),
            "walls": walls,
            "shuffle_bytes_3runs": (sb1 - sb0) if sb0 >= 0 else None,
        }

    # bit-identical results across spellings (the r11 claim)
    assert hashes["brute_r11_row_norms"] == hashes["brute_r10_pair_norms"]
    assert hashes["ivf_r11_row_norms"] == hashes["ivf_r10_pair_norms"]
    results["identical_results"] = True
    results["n_vectors"] = n_vec
    results["n_queries"] = n_q
    results["speedup_brute"] = round(
        results["brute_r10_pair_norms"]["wall_min3"]
        / results["brute_r11_row_norms"]["wall_min3"],
        2,
    )
    results["speedup_ivf"] = round(
        results["ivf_r10_pair_norms"]["wall_min3"]
        / results["ivf_r11_row_norms"]["wall_min3"],
        2,
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
