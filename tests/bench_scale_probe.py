"""Headline-query scaling probe past the sf0.1 overhead floor (manual
tool, not a pytest test) — VERDICT r13 item 4.

Every bench query at sf0.1 finishes in 0.3-2.5s, which is dominated by
fixed job-submission overhead, so the driver's 8-vs-32-core ratios carry
no signal about whether the r13/r14 plan shapes actually parallelize.
This probe builds a deterministic ~sf1-equivalent input for the four
hottest shapes and times them through the noop sink at whatever
$SPARK_GRAFT_CPUS says — run it once at 32 and once at 8 and compare.

Inputs (generated under /tmp/scale_sf1, deterministic, no RNG):

* lineitem    — sf0.1 replicated 10x with l_orderkey shifted per replica
                (6M rows, 1.5M groups; group-size distribution preserved).
* events      — sf0.1 replicated 10x with user_id/event_id shifted
                (per-user/day structure preserved).
* embeddings  — sf0.1 replicated 10x with id shifted (distance work
                scales linearly; duplicate vectors don't change the
                kernel's per-row cost).
* documents   — 50k docs SYNTHESIZED from a hash-driven token stream
                (replicating real docs 10x verbatim would make every
                replica pair a near-duplicate and blow the candidate set
                quadratically — a 10x organic corpus does not look like
                that, so the LSH probe would measure an artifact).

Usage: SPARK_GRAFT_CPUS=32 python tests/bench_scale_probe.py
       SPARK_GRAFT_CPUS=8  python tests/bench_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

QUERIES = (
    "obs_blob_pack",
    "dedup_lsh_verified",
    "visit_summary_equiv",
    "ann_ivf_topk",
)

ROOT = "/tmp/scale_sf1"


def build_inputs(spark, src="/root/testdata/sf0.1") -> None:
    os.makedirs(ROOT, exist_ok=True)
    reps = spark.range(10).select(F.col("id").alias("_rep"))

    if not os.path.exists(f"{ROOT}/lineitem.parquet/_SUCCESS"):
        li = spark.read.parquet(f"{src}/lineitem.parquet")
        (
            li.crossJoin(reps)
            .withColumn(
                "l_orderkey",
                F.col("l_orderkey") + F.col("_rep") * F.lit(10_000_000),
            )
            .drop("_rep")
            .write.mode("overwrite")
            .parquet(f"{ROOT}/lineitem.parquet")
        )

    if not os.path.exists(f"{ROOT}/events.parquet/_SUCCESS"):
        ev = spark.read.parquet(f"{src}/events.parquet")
        (
            ev.crossJoin(reps)
            .withColumn(
                "user_id", F.col("user_id") + F.col("_rep") * F.lit(10_000_000)
            )
            .withColumn(
                "event_id",
                F.col("event_id") + F.col("_rep") * F.lit(1_000_000_000),
            )
            .drop("_rep")
            .write.mode("overwrite")
            .parquet(f"{ROOT}/events.parquet")
        )

    if not os.path.exists(f"{ROOT}/embeddings.parquet/_SUCCESS"):
        em = spark.read.parquet(f"{src}/embeddings.parquet")
        id_col = em.columns[0]
        (
            em.crossJoin(reps)
            .withColumn(
                id_col, F.col(id_col) + F.col("_rep") * F.lit(10_000_000)
            )
            .drop("_rep")
            .write.mode("overwrite")
            .parquet(f"{ROOT}/embeddings.parquet")
        )

    if not os.path.exists(f"{ROOT}/documents.parquet/_SUCCESS"):
        # ~300-char docs from a deterministic per-(doc, position) token
        # pick over a 4k-word vocabulary: organic-ish shingle entropy,
        # few accidental near-dups, zero RNG (reproducible under retry).
        n_docs, n_tok = 50_000, 50
        docs = (
            spark.range(n_docs)
            .select(F.col("id").alias("doc_id"))
            .select(
                "doc_id",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(n_tok - 1)),
                        lambda i: F.concat(
                            F.lit("w"),
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws(
                                            "_",
                                            F.col("doc_id").cast("string"),
                                            i.cast("string"),
                                        )
                                    ),
                                    1,
                                    3,
                                ),
                                16,
                                10,
                            ),
                        ),
                    ),
                ).alias("text"),
            )
        )
        docs.write.mode("overwrite").parquet(f"{ROOT}/documents.parquet")


def main() -> None:
    from mrsboraetl_spark.queries import REGISTRY
    from mrsboraetl_spark.session import get_spark

    spark = get_spark(app_name="bench_scale_probe")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    build_inputs(spark)

    out = {}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"scale_probe:{name}")
        fn(spark, ROOT).write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, ROOT).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = min(ts)
        print(f"cpus={cpus} {name:24s} min={min(ts):.3f} all={ts}", flush=True)
    print({"cpus": cpus, "queries": out})


if __name__ == "__main__":
    main()
