"""Corpus keyword search: TF-IDF / BM25 scoring and top-k retrieval.

Training-data pipelines use lexical scoring both for corpus exploration
("show me documents about X") and for quality/topicality weighting
(e.g. importance-resampling a crawl toward a target domain).  BM25 is
the standard formula; everything here is pure ``pyspark.sql.functions``
(codegen'd, no UDFs) and mirrors exactly in the DuckDB oracle.

100 TB shape: the query-term filter is applied to the exploded token
stream BEFORE any aggregation, so the per-(doc, term) tf aggregation
shuffles only rows whose token is one of the handful of query terms —
the corpus itself is never shuffled.  Document length rides along
through the explode (no corpus-wide lengths join), and the corpus
scalars (N, avgdl) are exploded onto the query-term list so every join
in the scoring path is a broadcast HASH equi-join on ``term`` — a
constant-key spelling would constant-fold into a
BroadcastNestedLoopJoin, which the plan sweep forbids.

Reference scope note: the reference ETL has no text-retrieval concept —
extension layer (SURVEY.md §8).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mrsboraetl_spark.functions.text import tokens


def _doc_terms(
    docs: DataFrame, id_col: str, text_col: str, terms: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """(per-doc length table, (doc, term, tf, dl) table filtered to terms).

    ``dl`` rides along through the explode and is folded into the tf
    aggregation (it is functionally dependent on the doc id), so scoring
    needs NO corpus-wide join back to a lengths table.

    ONE corpus pass (r13, guide §1.2/§8 "decide with small rows"): the
    previous spelling derived lengths, tf, and (via tf) df_t as three
    independent subtrees, each re-scanning the corpus and re-evaluating
    ``tokens(text)`` — the lower+split+filter over the whole document
    that IS the operator's per-row cost — so the physical plan held
    three corpus scans per score call.  The tokenize-and-filter now
    runs once into a materialized compact table of (id, dl,
    matched-terms array) — a few dozen bytes/doc (the matched array is
    empty for every non-matching doc), the decision-pass proxy pattern —
    and lengths/tf/df_t all derive from it.  Row-for-row identical:
    ``explode(filter(toks, isin))`` emits exactly the rows
    ``explode(toks).filter(isin)`` kept, and NULL text yields a NULL
    array on both paths (size -1, explode drops it).  Plan diff: 3
    parquet scans + 3 tokenize evaluations -> 1
    (plans/r13/search_bm25_topk_{before,after}.txt)."""
    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("toks")
    )
    compact = toks.select(
        F.col(id_col),
        F.size("toks").alias("dl"),
        F.filter(
            "toks", lambda t: t.isin(*terms)
        ).alias("_mt"),
    ).localCheckpoint()
    lengths = compact.select(id_col, "dl")
    tf = (
        compact.select(
            F.col(id_col), "dl", F.explode("_mt").alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    return lengths, tf


def _terms_keyed(corpus: DataFrame, terms: Sequence[str]) -> DataFrame:
    """Explode the query-term list onto a 1-row corpus-scalar aggregate:
    gives the scalars a real ``term`` join key, so every downstream join
    is a broadcast HASH join — a constant-key join would constant-fold
    into a BroadcastNestedLoopJoin."""
    return corpus.select(
        F.explode(F.array(*[F.lit(t) for t in terms])).alias("term"),
        "*",
    )


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id_col, score) for every document matching >= 1 query term.

    score = sum over matched terms of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    with the always-positive idf variant
        idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5)).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    lengths, tf = _doc_terms(docs, id_col, text_col, terms)

    # Corpus scalars (global 2-phase aggregate, 1 row), then keyed by term
    # so the broadcast side of the scoring join is a ≤|terms|-row table
    # and the join itself an ordinary broadcast hash join.
    corpus = lengths.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = tf.groupBy("term").agg(
        F.count("*").alias("df_t")
    )  # tf already has one row per (doc, term)
    consts = df_t.join(_terms_keyed(corpus, terms), "term")

    scored = (
        tf.join(F.broadcast(consts), "term")
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5)
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("part").alias("score"))


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 hits: (id_col, score, rank), rank 1-based, ties broken
    by id for a deterministic, oracle-stable ordering.

    Spelled orderBy+limit FIRST — Catalyst plans that as
    TakeOrderedAndProject (per-partition partial top-k, then a k-row
    merge), never a global sort — and only then ranks the k survivors
    (the row_number window's unpartitioned sort sees k rows, not N).
    """
    scores = bm25_scores(docs, terms, id_col, text_col, k1, b)
    top = scores.orderBy(F.desc("score"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def tfidf_scores(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classic ltc-style TF-IDF: sum of (1 + ln(tf)) * ln(N / df_t) over
    matched terms — the simpler sibling kept for parity with engines that
    expose both."""
    if not terms:
        raise ValueError("terms must be non-empty")
    lengths, tf = _doc_terms(docs, id_col, text_col, terms)
    corpus = lengths.agg(F.count("*").alias("n_docs"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    consts = df_t.join(_terms_keyed(corpus, terms), "term")
    scored = (
        tf.join(F.broadcast(consts), "term")
        .withColumn(
            "part",
            (1.0 + F.log(F.col("tf")))
            * F.log(F.col("n_docs") / F.col("df_t")),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("part").alias("score"))
