"""Adversarial-document skew probe (manual tool, not a pytest test) —
VERDICT r5 item 5.

repetition_metrics and unigram_logprob both explode per-token rows; a
single pathological document (one doc holding 10^6..10^7+ tokens, e.g.
a crawler artifact of repeated spam) concentrates that explode and its
first aggregation in ONE task.  The claim under test: cost is BOUNDED
BY and LINEAR IN the largest document (the docstring's cost model), not
a hang —

* repetition_metrics aggregates on (doc, token): map-side combine
  collapses the repeated tokens inside the task that owns the doc, so
  the worst task does O(doc_tokens) work and emits O(distinct) rows;
* unigram_logprob joins the token stream against corpus counts on the
  token key: the hot token's occurrences all land on one join key,
  which AQE's skew splitting spreads.

The pathological doc alternates two tokens so token AND bigram counting
are both stressed.  Each size embeds the doc in a 2000-doc normal
corpus.  Results land in PERF.md by hand.

Usage: python tests/adversarial_doc_probe.py [sizes...]   # tokens
Defaults: 1000000 4000000 16000000.

``--corpus`` instead runs the COMPOSED pipeline probe (VERDICT r6 item
4's done-criterion): a 16M-token document inside a 2000-doc corpus
through curate_corpus, once under the default max_doc_tokens=1M cap and
once with the cap opted out — the claim being that the capped run's
wall is bounded (the monster is analyzed on its 1M-token prefix, the
audit says truncated=true, the document itself survives), while the
uncapped run pays the full superlinear straggler.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000, 16_000_000]

    from pyspark.sql import functions as F

    from mrsboraetl_spark.operators.curation import (
        repetition_metrics,
        unigram_logprob,
    )
    from mrsboraetl_spark.session import get_spark

    spark = get_spark(app_name="adversarial_doc_probe")
    normal = spark.range(2000).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}x"), (F.col("id") * (j + 1) % 997))
                for j in range(40)
            ],
        ).alias("text"),
    )

    for n_tokens in sizes:
        # One doc of n_tokens alternating tokens: ~n/2 'spam', ~n/2 'ham'.
        monster_text = " ".join(
            "spam" if i % 2 == 0 else "ham" for i in range(n_tokens)
        )
        monster = spark.createDataFrame(
            [(10_000_000, monster_text)], "doc_id int, text string"
        )
        docs = normal.unionByName(monster).localCheckpoint()

        t0 = time.time()
        rep = {
            r.id: r
            for r in repetition_metrics(docs, "doc_id", "text")
            .filter(F.col("id") == 10_000_000)
            .collect()
        }
        rep_s = time.time() - t0
        r = rep[10_000_000]
        assert r.n_tokens == n_tokens and r.n_distinct == 2, r

        t0 = time.time()
        lp = (
            unigram_logprob(docs, "doc_id", "text")
            .filter(F.col("id") == 10_000_000)
            .collect()
        )
        lp_s = time.time() - t0
        assert lp[0].n_tokens == n_tokens, lp

        print(
            json.dumps(
                {
                    "monster_tokens": n_tokens,
                    "repetition_metrics_sec": round(rep_s, 1),
                    "unigram_logprob_sec": round(lp_s, 1),
                    "top_token_frac": float(r.top_token_frac),
                }
            ),
            flush=True,
        )


def corpus_cap_probe(n_tokens: int = 16_000_000) -> None:
    from pyspark.sql import functions as F

    from mrsboraetl_spark.operators.corpus import (
        CurationConfig,
        curate_corpus,
    )
    from mrsboraetl_spark.session import get_spark

    spark = get_spark(app_name="adversarial_corpus_probe")
    normal = spark.range(2000).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}x"), (F.col("id") * (j + 1) % 997))
                for j in range(40)
            ],
        ).alias("text"),
    )
    monster_text = " ".join(
        "spam" if i % 2 == 0 else "ham" for i in range(n_tokens)
    )
    monster = spark.createDataFrame(
        [(10_000_000, monster_text)], "doc_id int, text string"
    )
    docs = normal.unionByName(monster).localCheckpoint()

    for label, cfg in (
        ("capped_1m_default", CurationConfig(min_tokens=5)),
        ("uncapped", CurationConfig(min_tokens=5, max_doc_tokens=None)),
    ):
        t0 = time.time()
        kept, audit, _packed = curate_corpus(docs, None, cfg=cfg)
        rows = {
            r.id: r
            for r in audit.filter(F.col("id") == 10_000_000).collect()
        }
        n_kept = kept.count()
        wall = time.time() - t0
        r = rows[10_000_000]
        print(
            json.dumps(
                {
                    "mode": label,
                    "monster_tokens": n_tokens,
                    "wall_sec": round(wall, 1),
                    "monster_disposition": r.disposition,
                    "monster_truncated": bool(r.truncated),
                    "n_kept": n_kept,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    if "--corpus" in sys.argv:
        corpus_cap_probe()
    else:
        main()
