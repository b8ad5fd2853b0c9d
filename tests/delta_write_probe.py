"""Delta-scoped sync write-amplification probe (manual tool, not a
pytest test) — VERDICT r5 item 1's done-criterion.

At a given person count, rebuilds the partitioned pipeline, then syncs a
SMALL delta (new obs on a handful of existing encounters, all in
whatever months those encounters live in) twice:

* delta-scoped writer (the default): only affected p_month directories
  rewritten;
* full-rewrite fallback forced (_DELTA_WRITE_MAX_FRACTION = -1): the
  old behavior, whole target rewritten per stage.

"Write bytes" = sum of sizes of files under the storage root whose
mtime is after the sync started — actual disk write volume, not shuffle
bytes.  The claim under test: delta-scoped sync writes scale with the
DELTA (~the affected months' size), full-rewrite writes scale with the
TARGET.

Usage: python tests/delta_write_probe.py [n_persons]   # default 50000
Results land in PERF.md by hand.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402


def tree_bytes_after(root: str, t0: float) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            if st.st_mtime >= t0:
                total += st.st_size
    return total


def tree_bytes(root: str) -> int:
    return tree_bytes_after(root, 0.0)


def run_probe(n: int) -> None:
    from mrsboraetl_spark.engine import PipelineRunner
    from mrsboraetl_spark.session import get_spark
    from tests.fixtures import make_sources, to_spark

    spark = get_spark(app_name="delta_write_probe")
    pdfs = make_sources(n_persons=n, seed=7)
    obs_pdf, enc_pdf = pdfs["obs"].copy(), pdfs["encounter"].copy()
    wm = obs_pdf["date_created"].max()
    # Clamp date_changed stragglers so the delta is ONLY the new obs
    # (see test_sync_rewrites_only_affected_months for why).
    late = enc_pdf["date_changed"].notna() & (enc_pdf["date_changed"] > wm)
    enc_pdf.loc[late, "date_changed"] = wm
    pdfs = dict(pdfs, obs=obs_pdf, encounter=enc_pdf)

    # Delta: one new obs on each of up to 20 existing encounters, all in
    # the SAME month and from at most 2 persons — a LOCALIZED delta (the
    # realistic shape: a sync batch clusters around "now").  Scattering
    # the delta across most months trips the full-rewrite fallback by
    # design, which is the other half of the policy, not the claim under
    # test here.  The visit-summary stage recomputes each queued
    # person's WHOLE history, so the person count (not the encounter
    # count) governs its affected-month spread.
    month = enc_pdf["encounter_datetime"].dt.strftime("%Y-%m")
    modal = month.mode().iloc[0]
    enc_in_month = enc_pdf[month == modal]
    persons = enc_in_month["patient_id"].drop_duplicates().head(2)
    enc_ids = set(
        enc_in_month[enc_in_month["patient_id"].isin(persons)]["encounter_id"]
    )
    cands = (
        obs_pdf[
            (obs_pdf["voided"] == 0)
            & obs_pdf["encounter_id"].isin(enc_ids)
        ]
        .drop_duplicates("encounter_id")
        .head(20)
    )
    new_rows = []
    next_id = int(obs_pdf["obs_id"].max()) + 1
    for _, cand in cands.iterrows():
        r = cand.to_dict()
        r.update(
            obs_id=next_id, concept_id=5089, value_coded=None,
            value_numeric=42.5, date_created=wm + dt.timedelta(days=1),
        )
        new_rows.append(r)
        next_id += 1
    pdfs2 = dict(
        pdfs,
        obs=pd.concat([obs_pdf, pd.DataFrame(new_rows)], ignore_index=True),
    )

    dfs = to_spark(spark, pdfs)
    dfs2 = to_spark(spark, pdfs2)
    for d in (dfs, dfs2):
        for df in d.values():
            df.cache().count()

    results = {"n_persons": n, "n_delta_obs": len(new_rows)}
    for mode in ("delta_scoped", "full_rewrite"):
        root = tempfile.mkdtemp(prefix=f"dwp_{mode}_")
        runner = PipelineRunner(spark, root, partitioned=True)
        if mode == "full_rewrite":
            runner._DELTA_WRITE_MAX_FRACTION = -1  # force the fallback
        t0 = time.time()
        runner.run(dfs, mode="rebuild")
        rebuild_s = time.time() - t0
        target_bytes = tree_bytes(root)
        t0 = time.time()
        time.sleep(0.05)  # mtime resolution guard
        t_sync = time.time()
        runner.run(dfs2, mode="sync")
        sync_s = time.time() - t0
        results[mode] = {
            "rebuild_sec": round(rebuild_s, 1),
            "target_mb": round(target_bytes / 1e6, 2),
            "sync_sec": round(sync_s, 1),
            "sync_write_mb": round(tree_bytes_after(root, t_sync) / 1e6, 2),
        }
    d = results["delta_scoped"]["sync_write_mb"]
    f = results["full_rewrite"]["sync_write_mb"]
    results["write_amplification_ratio"] = round(f / d, 1) if d else None
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    run_probe(int(sys.argv[1]) if len(sys.argv) > 1 else 50000)
