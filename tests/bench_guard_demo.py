"""Demonstration harness for the r13 re-measure bench guard (VERDICT
r12 item 1) — manual tool, not a pytest test.

The r12 round went red on a query at 2.21x its best-known that
reproduced at 1.35x minutes later: transient fleet contention inflated
the three timed passes and had subsided by the time the post-run
calibration measured the box, so the normalization could not excuse
the walls.  bench.py now re-measures ONLY the flagged queries (fresh
warmup + min-of-3 + fresh calibration) before failing, and fails only
queries slow in BOTH measurement sets.

Two scenarios, driven by wrapping ONE headline query's plan builder
(deterministic stand-ins for the two causes the guard must separate):

* ``transient`` — the first 4 executions (warmup + 3 timed passes) of
  the target query are inflated past the guard bar; every later
  execution (the re-measure) runs the real plan.  This is the r12
  signature: timed passes slow, box clean by calibration time.
  EXPECT rc=0, artifact carries a ``remeasure`` block with the query
  in ``cleared`` (the pre-r13 guard, which had no re-measure, exits 1
  on the same data — its decision point is the first measurement set,
  which this scenario keeps above the bar).
* ``regression`` — EVERY execution pays the inflation: a genuinely
  slowed plan.  EXPECT rc=1 with the query in ``still_slow`` — both
  measurement sets over the bar, exactly the two-consistent-slow-sets
  evidence a true regression should leave.

Usage: python tests/bench_guard_demo.py transient|regression
Prints the bench artifact (stdout) + guard lines (stderr), exits with
bench's own exit code so the driver-style assertion is just `echo $?`.
Results land in PERF.md by hand.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from mrsboraetl_spark.queries import REGISTRY  # noqa: E402

TARGET = "obs_blob_pack"  # the r12 flagged query itself


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "transient"
    assert mode in ("transient", "regression"), mode
    real = REGISTRY[TARGET].fn
    # inflate well past GUARD_FACTOR x best-known so the first
    # measurement set trips the guard deterministically
    pad = 2.5 * bench.GUARD_FACTOR * bench.BASELINE[TARGET]
    calls = {"n": 0}

    def wrapped(spark, sf_dir):
        calls["n"] += 1
        # warmup (1) + three timed passes (2-4) inflated; the
        # re-measure's own warmup + passes (5+) run clean in
        # ``transient``; ``regression`` inflates every execution
        if mode == "regression" or calls["n"] <= 4:
            time.sleep(pad)
        return real(spark, sf_dir)

    REGISTRY[TARGET].fn = wrapped
    print(
        f"DEMO: {mode} — {TARGET} inflated by {pad:.1f}s on "
        + ("every execution" if mode == "regression" else
           "executions 1-4 only (re-measure runs clean)"),
        file=sys.stderr,
    )
    bench.main()


if __name__ == "__main__":
    main()
