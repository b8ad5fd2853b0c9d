"""Bench harness: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through the noop sink so the full plan materializes
(no collect-to-driver skew in the numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Per-query min-of-3 reference times from the round-5 driver bench
# (BENCH_r05.json, sf0.1).  The guard below fails the run when any
# carried query exceeds GUARD_FACTOR x its reference — a corpus
# regeneration or plan regression is caught by the builder's own bench
# run instead of surfacing first in the driver's.  2x headroom over a
# min-of-3 is far outside observed box noise (r5 cross-round ratios ran
# 0.46-1.55x).  After an INTENTIONAL slowdown, re-baseline this table in
# the same commit; SPARK_GRAFT_NO_GUARD=1 skips the exit for ad-hoc runs.
BASELINE_R5 = {
    "q1_pricing_summary": 0.323,
    "join_multi_dims": 0.498,
    "obs_blob_pack": 1.775,
    "latest_order_per_customer": 0.37,
    "topk_orders_per_customer": 0.355,
    "groupby_expr_day": 0.405,
    "flat_events_blob": 0.822,
    "incremental_upsert_equiv": 0.633,
    "sessionize_events": 0.416,
    "asof_join_latest_order": 0.963,
    "grouping_sets_status_nation": 0.501,
    "salted_skew_aggregate": 0.376,
    "dedup_exact": 0.225,
    "dedup_minhash_lsh": 1.19,
    "dedup_lsh_verified": 1.903,
    "dedup_simhash": 0.303,
    "ann_brute_force_topk": 0.561,
    "ann_lsh_bucketed_topk": 0.484,
    "ann_ivf_topk": 1.148,
    "text_doc_metrics": 0.668,
    "visit_summary_equiv": 0.991,
    "decontam_ngram_overlap": 1.484,
}
GUARD_FACTOR = 2.0

HEADLINE = [
    "q1_pricing_summary",
    "join_multi_dims",
    "obs_blob_pack",
    "latest_order_per_customer",
    "topk_orders_per_customer",
    "groupby_expr_day",
    "flat_events_blob",
    "incremental_upsert_equiv",
    "sessionize_events",
    "asof_join_latest_order",
    "grouping_sets_status_nation",
    "salted_skew_aggregate",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "dedup_simhash",
    "ann_brute_force_topk",
    "ann_lsh_bucketed_topk",
    "ann_ivf_topk",
    "text_doc_metrics",
    "visit_summary_equiv",
    # r5 session 2 marquee addition (registered in place of
    # anti_join_no_orders): eval-set n-gram decontamination
    "decontam_ngram_overlap",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from mrsboraetl_spark.queries import REGISTRY
    from mrsboraetl_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # Warm up outside the timed region, AT THE BENCH SCALE FACTOR: parquet
    # footers, whole-stage-codegen compilation, and — the dominant effect —
    # C2 JIT of the generated hot loops.  A smaller warmup set doesn't push
    # the per-element lambda loops past the JIT compile threshold, and the
    # first timed execution then runs semi-interpreted: measured 233 vs 34
    # JVM-CPU-seconds for the identical dedup_lsh_verified plan.  On a real
    # cluster a 100 TB job amortizes JIT in its first partitions; timing it
    # per-query here would measure the JVM, not the operator.
    for name in HEADLINE:
        try:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001 - warmup is best-effort
            pass

    # Three timed passes, report the per-query MIN: steady-state operator
    # cost.  Even after warmup this box shows residual JIT-compilation
    # contention (C2 threads competing with the 32 executor threads) plus
    # neighbor noise that can inflate a single pass of an arbitrary query
    # by 5-20x; the min of three passes is robust to such stalls while
    # never flattering a plan that is actually slow every time.  ALL
    # samples are emitted alongside the min so a reader can separate box
    # noise (one inflated sample, tight min) from a real regression
    # (all three samples slow) without re-running anything.
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _pass in range(3):
        for name in HEADLINE:
            fn = REGISTRY[name].fn
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - t0, 3))

    timings = {name: min(ts) for name, ts in samples.items()}
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "samples": samples,
                "sf": sf,
            }
        )
    )

    # Regression guard — only meaningful at the baseline's scale factor.
    if sf == 0.1 and not os.environ.get("SPARK_GRAFT_NO_GUARD"):
        slow = {
            n: {"min_of_3": timings[n], "r5_baseline": BASELINE_R5[n]}
            for n in timings
            if n in BASELINE_R5
            and timings[n] > GUARD_FACTOR * BASELINE_R5[n]
        }
        if slow:
            print(
                f"BENCH GUARD: {len(slow)} queries past "
                f"{GUARD_FACTOR}x their r5 min-of-3: {json.dumps(slow)}",
                file=sys.stderr,
            )
            sys.exit(1)


if __name__ == "__main__":
    main()
