"""Full-registry sweep at a given SF through the noop sink (manual tool):
every registered query must complete — the 10x-scale smoke on top of the
sf0.01 correctness gate.  Usage: python tests/registry_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from mrsboraetl_spark.queries import REGISTRY  # noqa: E402
from mrsboraetl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="registry_sweep")
    total0 = time.time()
    failed = []
    for name, entry in REGISTRY.items():
        t0 = time.time()
        try:
            entry.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"ok   {name} [{time.time() - t0:.1f}s]", flush=True)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: {e}", flush=True)
    print(f"\n{len(REGISTRY) - len(failed)}/{len(REGISTRY)} ok "
          f"in {time.time() - total0:.0f}s; failed: {failed}")


if __name__ == "__main__":
    main()
