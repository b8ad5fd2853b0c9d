"""Kernel memo-cache eviction probe (manual tool, not a pytest test) —
VERDICT r5 item 8.

The Arrow kernels memoize md5(shingle) per task.  The old policy cleared
the WHOLE dict at the cap; with a distinct-key population sitting just
above the cap that causes a rehash storm.  A FIFO half-evict (the first
idea) is no better: under scan-like access the oldest-inserted keys are
exactly the ones coming back next.  The shipped policy is the
TWO-GENERATION memo (`dedup._memo_md5`): hot/cold dict pair, hot becomes
cold at cap/2, cold hits re-promote — a key is only re-hashed after a
full generation untouched.

Two access patterns, populations straddling a small cap:
* cycle    — round-robin over the population (worst case for everyone;
             above cap every policy misses ~100%, the floor).
* hot+tail — 90% of lookups over a hot set of cap/4 keys, 10% streaming
             a cold tail (the templated-corpus shape the memo exists
             for).  This is where clear/FIFO storm and two-gen stays
             flat.

Usage: python tests/kernel_cache_probe.py   # results land in PERF.md
"""

from __future__ import annotations

import hashlib
import itertools
import sys
import time

sys.path.insert(0, "/root/repo")

from mrsboraetl_spark.operators.dedup import _memo_md5  # noqa: E402

CAP = 100_000
N_LOOKUPS = 2_000_000


def _md5(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def make_clear(cap: int):
    cache: dict[str, int] = {}
    misses = [0]

    def lookup(s: str) -> int:
        v = cache.get(s)
        if v is None:
            misses[0] += 1
            if len(cache) > cap:
                cache.clear()
            v = _md5(s)
            cache[s] = v
        return v

    return lookup, misses


def make_fifo(cap: int):
    cache: dict[str, int] = {}
    misses = [0]

    def lookup(s: str) -> int:
        v = cache.get(s)
        if v is None:
            misses[0] += 1
            if len(cache) > cap:
                for k in list(itertools.islice(iter(cache), len(cache) // 2)):
                    del cache[k]
            v = _md5(s)
            cache[s] = v
        return v

    return lookup, misses


def make_twogen(cap: int):
    lookup = _memo_md5(cap)
    return lookup, None  # miss count not instrumented; wall is the signal


POLICIES = {"clear": make_clear, "fifo½": make_fifo, "2-gen": make_twogen}


def keys_cycle(pop: int):
    keys = [f"shingle-{i:08d}" for i in range(pop)]
    return itertools.cycle(keys)


def keys_hot_tail(pop_hot: int):
    hot = [f"hot-{i:08d}" for i in range(pop_hot)]
    hot_it = itertools.cycle(hot)
    counter = itertools.count()

    def gen():
        i = 0
        while True:
            i += 1
            if i % 10 == 0:
                yield f"tail-{next(counter):010d}"  # never repeats
            else:
                yield next(hot_it)

    return gen()


def run(it, lookup) -> float:
    t0 = time.monotonic()
    for _ in range(N_LOOKUPS):
        lookup(next(it))
    return time.monotonic() - t0


if __name__ == "__main__":
    print(f"cap={CAP} lookups={N_LOOKUPS}")
    print("-- cycle (scan floor) --")
    for frac in (0.5, 1.05, 4.0):
        pop = int(CAP * frac)
        for name, mk in POLICIES.items():
            lookup, _ = mk(CAP)
            wall = run(keys_cycle(pop), lookup)
            print(
                f"pop={pop:>7} ({frac:>4}x cap) {name:>5} "
                f"wall={wall:6.2f}s rate={N_LOOKUPS / wall / 1e6:5.2f}M/s"
            )
    print("-- hot+tail (templated corpus; hot=cap/4, 10% cold stream) --")
    for name, mk in POLICIES.items():
        lookup, _ = mk(CAP)
        wall = run(keys_hot_tail(CAP // 4), lookup)
        print(
            f"{name:>5} wall={wall:6.2f}s "
            f"rate={N_LOOKUPS / wall / 1e6:5.2f}M/s"
        )
