"""Manual scale probe for the composed curate_corpus pipeline
(manual tool, results land in PERF.md by hand):

    python tests/corpus_probe.py [n_docs] [copies] [--full]

``--full`` additionally switches on the opt-in text-transform stages
(PII redaction + repeated-span removal with span_tokens=10) and
injects a synthetic email into every 7th document so redaction does
real work.

Builds the same worst-case corpus shape as the dedup probes — n_docs
synthetic documents where every UNIQUE text appears in a `copies`-sized
near-exact cluster (the duplicate-heavy shape that makes pair
enumeration quadratic when handled naively) — plus a small eval slice,
then runs quality -> decontam -> near-dup keepers -> split -> pack and
reports wall time and the disposition breakdown.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mrsboraetl_spark.operators.corpus import (  # noqa: E402
    CurationConfig,
    curate_corpus,
)
from mrsboraetl_spark.session import get_spark  # noqa: E402

def make_corpus(spark, n_docs: int, copies: int):
    """n_docs rows; doc i's text is a deterministic sequence of 24
    md5-derived pseudo-words of its cluster id (i // copies), so each
    cluster is `copies` near-exact copies (per-copy suffix token) and
    DIFFERENT clusters share essentially no token n-grams — dedup sees
    the worst duplicate-heavy shape while decontamination stays
    cluster-scoped."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / copies).cast("long").alias("cluster"),
        F.pmod(F.col("id"), F.lit(copies)).alias("copy"),
    )
    words = [
        F.substring(
            F.md5(F.concat(F.col("cluster").cast("string"), F.lit(f":{i}"))),
            1,
            6,
        )
        for i in range(24)
    ]
    text = F.concat_ws(
        " ", *words, F.concat(F.lit("copytag"), F.col("copy").cast("string"))
    )
    return base.select(
        "doc_id", text.alias("text"), F.lit("src0").alias("source")
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    full = "--full" in sys.argv
    n_docs = int(args[0]) if args else 50_000
    copies = int(args[1]) if len(args) > 1 else 10
    spark = get_spark(app_name="corpus_probe")
    docs = make_corpus(spark, n_docs, copies)
    if full:
        docs = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" u"),
                    F.col("doc_id").cast("string"),
                    F.lit("@ex.org"),
                ),
            ).otherwise(F.col("text")),
        )
    docs = docs.localCheckpoint()
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)

    cfg = CurationConfig(min_tokens=5)
    if full:
        cfg = CurationConfig(min_tokens=5, redact=True, span_tokens=10)
    t0 = time.time()
    kept, audit, packed = curate_corpus(train, eval_df, cfg=cfg)
    import tempfile

    d = tempfile.mkdtemp(prefix="corpus_probe_")
    kept.write.mode("overwrite").parquet(d + "/kept")
    audit.write.mode("overwrite").parquet(d + "/audit")
    packed.write.mode("overwrite").parquet(d + "/packed")
    wall = time.time() - t0
    disp = {
        r.disposition: r.c
        for r in spark.read.parquet(d + "/audit")
        .groupBy("disposition")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    print(
        f"n_docs={n_docs} copies={copies} wall={wall:.1f}s "
        f"dispositions={disp}"
    )


if __name__ == "__main__":
    main()
