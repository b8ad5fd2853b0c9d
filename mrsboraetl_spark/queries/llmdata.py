"""Training-data-pipeline queries: dedup, similarity search, text analysis,
multimodal plumbing — the 100 TB extension layer, each hash-checked against
a DuckDB oracle on the driver's `documents` / `embeddings` tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mrsboraetl_spark.functions.text import (
    STOPWORDS,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_features,
    whitespace_token_count,
)
from mrsboraetl_spark.operators.dedup import (
    exact_dedup,
    lsh_verified_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_bits,
    token_hashes,
)
from mrsboraetl_spark.operators.multimodal import (
    decode_features_stub,
    extract_binary_meta,
    with_binary_payload,
)
from mrsboraetl_spark.operators.similarity import (
    brute_force_topk,
    cosine_pairs_above,
    lsh_bucketed_topk,
)
from mrsboraetl_spark.queries import register, table

# Shared DuckDB fragments ----------------------------------------------------

_SHINGLES = (
    "list_distinct([substr(text, CAST(i AS INT), 5)"
    " FOR i IN range(1, greatest(length(text)-4, 1)+1)])"
)
# 32-bit shingle hash + affine per-seed rehash — must mirror
# operators/dedup.shingle_hashes / minhash_signature exactly.
_SHINGLE_HASHES = (
    "list_distinct([('0x' || substr(md5(s), 1, 8))::BIGINT"
    " FOR s IN shingles])"
)
from mrsboraetl_spark.operators.dedup import MINHASH_A, MINHASH_B

_MH_A = "[" + ", ".join(str(a) for a in MINHASH_A) + "]"
_MH_B = "[" + ", ".join(str(b) for b in MINHASH_B) + "]"
_MINHASH_BANDS = """
    sh AS (
      SELECT doc_id, {shingles} AS shingles FROM documents
    ), hashed AS (
      SELECT doc_id, {shingle_hashes} AS hs FROM sh
    ), exploded AS (
      SELECT doc_id, unnest(hs) AS h FROM hashed
    ), sig AS (
      SELECT doc_id, seed,
             min((({mh_a})[CAST(seed AS INT)+1]*h
                  + ({mh_b})[CAST(seed AS INT)+1]) % 4294967311) AS mh
      FROM exploded CROSS JOIN range(0, 8) r(seed)
      GROUP BY doc_id, seed
    ), bands AS (
      SELECT doc_id, seed // 4 AS band,
             string_agg(mh::VARCHAR, '|' ORDER BY seed) AS bk
      FROM sig GROUP BY doc_id, seed // 4
    )"""
_TOKENS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
    " t -> t <> '')"
)
# Native vectorized cosine (DuckDB >= 1.0) — the list-comprehension spelling
# of the same formula ran ~1000x slower on the n^2/2 pair oracle, which would
# blow the correctness-gate time budget.
_COS = (
    "round(list_cosine_similarity("
    "CAST(va AS DOUBLE[]), CAST(vb AS DOUBLE[])), 4)"
)


def _in_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


# ------------------------------------------------------------------- dedup

@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS keeper, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy, keeper = min doc_id."""
    return exact_dedup(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dedup_minhash_lsh",
    f"""
    WITH {_MINHASH_BANDS.format(shingles=_SHINGLES, shingle_hashes=_SHINGLE_HASHES, mh_a=_MH_A, mh_b=_MH_B)}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash + banded LSH candidate pairs (shingle -> 32-bit hash ->
    8 affine minhashes -> 2 bands x 4 rows -> band-key equi-join)."""
    return minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        num_hashes=8, k=5, rows_per_band=4,
    )


_DEDUP_SIMHASH_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, list_distinct({_TOKENS}) AS ts FROM documents
    ), tok AS (
      SELECT doc_id, md5(unnest(ts)) AS h FROM toks
    ), votes AS (
      SELECT doc_id, i,
             sum(CASE WHEN substr(h, CAST(i AS INT), 1)
                      IN ('8','9','a','b','c','d','e','f')
                 THEN 1 ELSE -1 END) AS v
      FROM tok CROSS JOIN range(1, 33) r(i)
      GROUP BY doc_id, i
    )
    SELECT doc_id,
           string_agg(CASE WHEN v >= 0 THEN '1' ELSE '0' END, '' ORDER BY i)
             AS simhash
    FROM votes GROUP BY doc_id
    """


def dedup_simhash(spark, sf_dir):
    """SimHash 32-bit fingerprint (portable nibble-high-bit construction).
    Demoted r7 (VERDICT r6 item 3): simhash_near_pairs — the registered
    consumer of these fingerprints — keeps the SimHash path driver-green;
    still oracle-checked under pytest."""
    docs = table(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism
    return (
        docs.repartition(n_parts)
        .select("doc_id", token_hashes(F.col("text")).alias("hashes"))
        .select("doc_id", simhash_bits(F.col("hashes"), 32).alias("simhash"))
    )


_DEDUP_NGRAM_JACCARD_ORACLE = f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES} AS shingles FROM documents
    ), inv0 AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), keep AS (
      SELECT s FROM inv0 GROUP BY s HAVING count(*) <= 100
    ), inv AS (
      SELECT doc_id, s FROM inv0 JOIN keep USING (s)
    ), sized AS (
      SELECT doc_id, count(*) AS sz FROM inv GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_common / (sa.sz + sb.sz - n_common), 4) AS jaccard
    FROM common JOIN sized sa ON sa.doc_id = doc_a
                JOIN sized sb ON sb.doc_id = doc_b
    WHERE round(n_common / (sa.sz + sb.sz - n_common), 4) >= 0.2
    """


def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard pairs >= 0.2 via inverted shingle index, with a
    max_doc_freq=100 hot-shingle cap (mirrored in the oracle) so no single
    ubiquitous shingle can produce a quadratic join partition.  Demoted r7
    (VERDICT r6 item 3): dedup_lsh_verified keeps the Jaccard-verify shape
    driver-green; still oracle-checked under pytest."""
    return ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", k=5,
        threshold=0.2, max_doc_freq=100,
    )


@register(
    "dedup_lsh_verified",
    f"""
    WITH {_MINHASH_BANDS.format(shingles=_SHINGLES, shingle_hashes=_SHINGLE_HASHES, mh_a=_MH_A, mh_b=_MH_B)}
    , cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
    ), verified AS (
      SELECT doc_a, doc_b,
             len(list_intersect(x.hs, y.hs)) AS n_common,
             len(x.hs) AS sz_a, len(y.hs) AS sz_b
      FROM cands
      JOIN hashed x ON x.doc_id = doc_a
      JOIN hashed y ON y.doc_id = doc_b
    )
    SELECT doc_a, doc_b,
           round(n_common / (sz_a + sz_b - n_common), 4) AS jaccard
    FROM verified
    WHERE round(n_common / (sz_a + sz_b - n_common), 4) >= 0.5
    """,
)
def dedup_lsh_verified(spark, sf_dir):
    """Two-stage scale-path dedup: banded-LSH candidates + in-row Jaccard
    verification over the 32-bit shingle-hash sets (array_intersect, no
    second explode join)."""
    return lsh_verified_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        num_hashes=8, k=5, rows_per_band=4, threshold=0.5,
    )


def dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup pairs (cosine >= 0.45), brute-force baseline.
    0.45 because the driver embeddings are uniform-random (pair cosines
    concentrate near 0, max ~0.51 at sf0.01): a production-style 0.9 cut
    returns an empty — vacuously matching — result; 0.45 keeps tens of
    pairs so the hash check proves the similarity arithmetic.  Demoted
    r6 (the LSH variant dedup_embedding_lsh is the scale path and stays
    driver-green); still oracle-checked under pytest."""
    return cosine_pairs_above(table(spark, sf_dir, "embeddings"), 0.45)


_ETN_BANDS = _MINHASH_BANDS.format(
    shingles=_SHINGLES, shingle_hashes=_SHINGLE_HASHES, mh_a=_MH_A, mh_b=_MH_B
).replace("FROM documents", "FROM rdocs")


_DEDUP_EXACT_THEN_NEAR_ORACLE = f"""
    WITH reps AS (
      SELECT min(doc_id) AS keeper, count(*) AS n_copies
      FROM documents GROUP BY md5(text)
    ), rdocs AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN reps ON d.doc_id = reps.keeper
    ), {_ETN_BANDS}
    , cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
    ), verified AS (
      SELECT doc_a, doc_b,
             len(list_intersect(x.hs, y.hs)) AS n_common,
             len(x.hs) AS sz_a, len(y.hs) AS sz_b
      FROM cands
      JOIN hashed x ON x.doc_id = doc_a
      JOIN hashed y ON y.doc_id = doc_b
    )
    SELECT doc_a, doc_b,
           round(n_common / (sz_a + sz_b - n_common), 4) AS jaccard,
           ca.n_copies AS copies_a, cb.n_copies AS copies_b
    FROM verified
    JOIN reps ca ON ca.keeper = doc_a
    JOIN reps cb ON cb.keeper = doc_b
    WHERE round(n_common / (sz_a + sz_b - n_common), 4) >= 0.5
    """


def dedup_exact_then_near(spark, sf_dir):
    """THE 100 TB dedup composition: exact dedup first, near-dedup the
    cluster representatives only, pair multiplicity recoverable from the
    carried copy counts.  Pair enumeration is quadratic inside exact-dup
    clusters, so collapsing them before LSH makes near-dedup cost a
    function of DISTINCT content (measured 122s -> 14.4s on a 50k-doc
    10-copy corpus — tests/test_llmdata.py probes the cluster path).
    Demoted r7 (slot math for the VERDICT r6 item 3 promotions + U2):
    both halves of the composition stay driver-green (dedup_exact,
    dedup_lsh_verified); still oracle-checked under pytest."""
    from mrsboraetl_spark.operators.dedup import exact_then_near_pairs

    return exact_then_near_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        num_hashes=8, k=5, rows_per_band=4, threshold=0.5,
    )


_DEDUP_EMBEDDING_LSH_ORACLE = """
    WITH v AS (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
    ), b AS (
      SELECT id, t.tbl,
             array_to_string(
               [CASE WHEN vec[CAST(t.tbl*4 + i AS INT)] >= 0
                     THEN '1' ELSE '0' END
                FOR i IN range(1, 5)], '') AS bucket
      FROM v CROSS JOIN range(0, 16) t(tbl)
    ), cand AS (
      SELECT DISTINCT a.id AS id_a, c.id AS id_b
      FROM b a JOIN b c
        ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.id < c.id
    )
    SELECT id_a, id_b,
           round(list_cosine_similarity(x.vec, y.vec), 4) AS cosine
    FROM cand JOIN v x ON x.id = id_a JOIN v y ON y.id = id_b
    WHERE round(list_cosine_similarity(x.vec, y.vec), 4) >= 0.45
    """


def dedup_embedding_lsh(spark, sf_dir):
    """Scale path for embedding near-dup: SRP-LSH sign-bucket equi-joins
    (16 tables x 4 bits over the 64-dim vectors) replace the n^2/2 cross
    join; candidates verified by exact cosine.  bits=4/tables=16 measured
    14/14 recall vs the brute-force baseline at sf0.01 (uniform-random
    vectors, threshold 0.45) — the recall/fan-out trade-off is also
    pytest-bounded in tests/test_llmdata.py.  Demoted r7 (slot math for
    the VERDICT r6 item 3 promotions + U2): the embedding-cosine path
    keeps three driver rows via ann_brute_force/lsh_bucketed/ivf_topk;
    still oracle-checked under pytest."""
    from mrsboraetl_spark.operators.similarity import cosine_pairs_lsh

    return cosine_pairs_lsh(
        table(spark, sf_dir, "embeddings"), 0.45, bits=4, n_tables=16
    )


# -------------------------------------------------------- similarity search

def _query_vectors(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


_ANN_ORACLE = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor,
             {_COS.replace("va", "q.qv").replace("vb", "e.embedding")} AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE q.query_id <> e.vec_id
    )
    SELECT query_id, neighbor, cosine, rk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor
      ) AS rk FROM scored
    ) WHERE rk <= 3
"""


@register("ann_brute_force_topk", _ANN_ORACLE)
def ann_brute_force_topk(spark, sf_dir):
    """Exact cosine top-3 per query vector (broadcast queries, JVM-side
    dot products via zip_with/aggregate — no Python in the loop)."""
    return brute_force_topk(
        table(spark, sf_dir, "embeddings"), _query_vectors(spark, sf_dir), k=3
    )


@register(
    "ann_lsh_bucketed_topk",
    f"""
    WITH b AS (
      SELECT vec_id, embedding,
             list_aggregate([CASE WHEN CAST(x AS DOUBLE) >= 0 THEN '1'
                                  ELSE '0' END FOR x IN embedding[1:8]],
                            'string_agg', '') AS bucket
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
      FROM b WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, b.vec_id AS neighbor,
             {_COS.replace("va", "q.qv").replace("vb", "b.embedding")} AS cosine
      FROM b JOIN q ON b.bucket = q.qbucket
      WHERE q.query_id <> b.vec_id
    )
    SELECT query_id, neighbor, cosine, rk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor
      ) AS rk FROM scored
    ) WHERE rk <= 3
    """,
)
def ann_lsh_bucketed_topk(spark, sf_dir):
    """Approximate top-3: sign-bucket LSH candidates, ranked in-bucket —
    the scale path (equi-join on bucket instead of cross join)."""
    return lsh_bucketed_topk(
        table(spark, sf_dir, "embeddings"),
        _query_vectors(spark, sf_dir),
        k=3,
        bits=8,
    )


@register(
    "ann_ivf_topk",
    """
    WITH c AS (
      SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id < 16
    ), assign AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv),
                          c.cell
               ) AS rn
        FROM embeddings e CROSS JOIN c
      ) WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ), probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, c.cell,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_distance(q.qv, c.cv), c.cell
               ) AS rn
        FROM q CROSS JOIN c
      ) WHERE rn <= 4
    ), scored AS (
      SELECT p.query_id, a.vec_id AS neighbor,
             round(list_cosine_similarity(p.qv, CAST(a.embedding AS DOUBLE[])),
                   4) AS cosine
      FROM probes p JOIN assign a ON a.cell = p.cell
      WHERE p.query_id <> a.vec_id
    )
    SELECT query_id, neighbor, cosine, rk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor
      ) AS rk FROM scored
    ) WHERE rk <= 3
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-3 with a deterministic seed-centroid quantizer
    (cells = the 16 lowest-id vectors; a fixed rule both engines can
    express, so the full probe+rank pipeline is hash-checked).  nprobe=4.
    The k-means quantizer variant of the same operator (sample-based fit)
    is exercised in tests/test_llmdata.py with a recall-vs-brute-force
    assertion.  Measured recall@3 vs brute force on the (uniform-random)
    driver embeddings: nprobe 2/4/6 -> 0.40/0.67/0.80 — the expected
    recall-vs-fan-out curve; real embedding corpora cluster far more."""
    from mrsboraetl_spark.operators.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    centroids = [(r.vec_id, list(r.embedding)) for r in seeds]
    return ivf_topk(
        emb, _query_vectors(spark, sf_dir), k=3, nprobe=4, centroids=centroids
    )


# ------------------------------------------------------------ text analysis

# Demoted r9 (VERDICT r8 item 4: slot freed for the curation
# promotions; the text family keeps driver evidence via
# text_doc_metrics + text_winnow_fingerprint) — oracle moves to
# UNREGISTERED_ORACLES below, pytest-hash-checked.
_TEXT_LANG_ID_ORACLE = f"""
    WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
    hits AS (
      SELECT doc_id,
             len(list_filter(toks, t -> list_contains({_in_list("en")}, t))) AS h_en,
             len(list_filter(toks, t -> list_contains({_in_list("es")}, t))) AS h_es,
             len(list_filter(toks, t -> list_contains({_in_list("fr")}, t))) AS h_fr,
             len(list_filter(toks, t -> list_contains({_in_list("de")}, t))) AS h_de
      FROM t
    )
    SELECT doc_id,
           CASE WHEN h_en = greatest(h_en, h_es, h_fr, h_de)
                     AND greatest(h_en, h_es, h_fr, h_de) > 0 THEN 'en'
                WHEN h_es = greatest(h_en, h_es, h_fr, h_de)
                     AND greatest(h_en, h_es, h_fr, h_de) > 0 THEN 'es'
                WHEN h_fr = greatest(h_en, h_es, h_fr, h_de)
                     AND greatest(h_en, h_es, h_fr, h_de) > 0 THEN 'fr'
                WHEN h_de = greatest(h_en, h_es, h_fr, h_de)
                     AND greatest(h_en, h_es, h_fr, h_de) > 0 THEN 'de'
                ELSE 'und' END AS lang_pred
    FROM hits
    """


def text_lang_id(spark, sf_dir):
    """Stopword-hit language ID with fixed tie priority en>es>fr>de.
    Demoted r9 (driver cap); oracle-checked via UNREGISTERED_ORACLES.
    r13: layered spelling (functions.text.with_lang_id) — one tokenize
    per row instead of ~8; formulas and results identical."""
    from mrsboraetl_spark.functions.text import with_lang_id

    docs = table(spark, sf_dir, "documents")
    return with_lang_id(docs, "text").select("doc_id", "lang_pred")


@register(
    "text_doc_metrics",
    f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKENS} AS toks FROM documents
    ), feat AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             len(toks) AS n_tokens,
             CASE WHEN length(text) > 0 THEN round(
               (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
               / CAST(length(text) AS DOUBLE), 4) ELSE 0.0 END AS punct_ratio,
             CASE WHEN len(toks) > 0 THEN round(
               len(list_filter(toks, t -> list_contains({_in_list("en")}, t)))
               / CAST(len(toks) AS DOUBLE), 4) ELSE 0.0 END AS stop_ratio,
             CASE WHEN len(toks) > 0 THEN round(
               list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE)))
               / len(toks), 4) ELSE 0.0 END AS mean_word_len
      FROM t
    )
    SELECT doc_id, n_chars, n_tokens, punct_ratio, stop_ratio, mean_word_len,
           round(least(n_tokens / 100.0, 1.0) * 0.4 + stop_ratio * 0.4
                 + (1.0 - punct_ratio) * 0.2, 4) AS quality_score,
           len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
             AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
             AS n_bpe_tokens,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
             AS fingerprint
    FROM feat
    """,
)
def text_doc_metrics(spark, sf_dir):
    """Per-document text analysis in one pass: quality features (length,
    punctuation ratio, stopword ratio, mean word length, composite score),
    whitespace + BPE-ish-regex token counts, and the normalized-text md5
    fingerprint.  One scan; metrics computed over LAYERED projections
    (r13, guide §1.2 "per-task work"): the single-Project spelling
    (quality_features inlined) evaluated ``tokens(text)`` — a
    lower+split+filter over the whole document — once per metric that
    mentions it (~4x/row) and the stop-hit filter twice, because Project
    does not share subexpressions across output columns when the shared
    subtree sits under a CodegenFallback higher-order function.  Aliasing
    each shared non-cheap subexpression in its own Project evaluates it
    exactly once; CollapseProject keeps the split (it refuses to inline a
    non-cheap alias referenced more than once), and every formula below
    is byte-for-byte the quality_features spelling, so the DuckDB oracle
    hash is unchanged (re-verified at sf0.001/0.01/0.1 this round)."""
    from mrsboraetl_spark.functions.text import STOPWORDS, tokens

    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "text", tokens(F.col("text")).alias("_toks")
    )
    t, text = F.col("_toks"), F.col("text")
    counted = base.select(
        "doc_id",
        "text",
        F.length(text).alias("n_chars"),
        F.size(t).alias("_nt"),
        (
            F.length(text)
            - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
        ).alias("_np"),
        F.size(
            F.filter(t, lambda x: x.isin(*STOPWORDS["en"]))
        ).alias("_ns"),
        F.aggregate(
            t, F.lit(0.0).cast("double"), lambda a, x: a + F.length(x)
        ).alias("_mw"),
    )
    nt, nc = F.col("_nt"), F.col("n_chars")
    ratios = counted.select(
        "doc_id",
        "text",
        "n_chars",
        nt.alias("n_tokens"),
        F.when(nc > 0, F.round(F.col("_np").cast("double") / nc, 4))
        .otherwise(F.lit(0.0))
        .alias("punct_ratio"),
        F.when(nt > 0, F.round(F.col("_ns").cast("double") / nt, 4))
        .otherwise(F.lit(0.0))
        .alias("stop_ratio"),
        F.when(nt > 0, F.round(F.col("_mw") / nt, 4))
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
    )
    score = F.round(
        F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0)) * 0.4
        + F.col("stop_ratio") * 0.4
        + (1.0 - F.col("punct_ratio")) * 0.2,
        4,
    )
    return ratios.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "punct_ratio",
        "stop_ratio",
        "mean_word_len",
        score.alias("quality_score"),
        whitespace_token_count(F.col("text")).alias("n_ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        fingerprint(F.col("text")).alias("fingerprint"),
    )


@register(
    "text_winnowing_fingerprints",
    """
    WITH hs AS (
      SELECT doc_id,
             [('0x' || substr(md5(substr(text, CAST(i AS INT), 5)), 1, 8))::BIGINT
              FOR i IN range(1, greatest(length(text)-4, 1)+1)] AS h
      FROM documents
    ), w AS (
      SELECT doc_id,
             list_distinct(
               [list_min(h[CAST(i AS INT):CAST(i AS INT)+3])
                FOR i IN range(1, greatest(len(h)-3, 1)+1)]
             ) AS fps
      FROM hs
    )
    SELECT doc_id, unnest(fps) AS fp FROM w
    """,
)
def text_winnowing_fingerprints(spark, sf_dir):
    """Rolling-hash winnowing fingerprints (k=5, w=4): distinct minima of a
    sliding window over the ordered k-gram hash stream, via the vectorized
    Arrow kernel (bit-identical to the HOF spelling
    ordered_kgram_hashes + winnowing_from_hashes, which remains as the
    oracle-documented parity reference — see functions/text.py).

    Output is one scalar row per (doc_id, fingerprint): the driver's pandas
    canonicalizer hashes cell values and cannot sort list cells, so the
    fingerprint set is exploded on BOTH engines (Spark kernel rows / DuckDB
    unnest) — same set semantics, hashable shape."""
    from mrsboraetl_spark.functions.text import winnowing_fingerprint_rows

    docs = table(spark, sf_dir, "documents")
    return winnowing_fingerprint_rows(docs, "doc_id", "text", 5, 4)


# -------------------------------------------------------------- multimodal

@register(
    "multimodal_binary_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha_hex,
           lower(substr(hex(encode(text)), 1, 8)) AS magic
    FROM documents
    """,
)
def multimodal_binary_meta(spark, sf_dir):
    """Opaque-binary metadata path: byte length, content hash, magic prefix.
    (Payload = utf-8 bytes of text, standing in for image bytes.)"""
    docs = with_binary_payload(table(spark, sf_dir, "documents"))
    p = F.col("payload")
    return docs.select(
        "doc_id",
        F.octet_length(p).alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("sha_hex"),
        F.lower(F.substring(F.hex(p), 1, 8)).alias("magic"),
    )


def multimodal_decode_stub(spark, sf_dir):
    """Arrow-batched mapInPandas decode pipeline with a deterministic fake
    codec (real decoder slots into operators/multimodal._decode_batch).
    The fake features are chosen to be SQL-expressible, so the whole
    Python-worker path — Arrow transfer, batch iteration, schema
    enforcement — is hash-checked against DuckDB, not just row-counted.
    Demoted r6 (multimodal family keeps driver evidence via
    multimodal_binary_meta); still oracle-checked under pytest."""
    docs = with_binary_payload(table(spark, sf_dir, "documents"))
    return decode_features_stub(docs)


@register(
    "simhash_near_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, list_distinct({_TOKENS}) AS ts FROM documents
    ), tok AS (
      SELECT doc_id, md5(unnest(ts)) AS h FROM toks
    ), votes AS (
      SELECT doc_id, i,
             sum(CASE WHEN substr(h, CAST(i AS INT), 1)
                      IN ('8','9','a','b','c','d','e','f')
                 THEN 1 ELSE -1 END) AS v
      FROM tok CROSS JOIN range(1, 33) r(i)
      GROUP BY doc_id, i
    ), fp AS (
      SELECT doc_id,
             string_agg(CASE WHEN v >= 0 THEN '1' ELSE '0' END, '' ORDER BY i)
               AS sh
      FROM votes GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, sh, b.band,
             substr(sh, CAST(b.band * 16 + 1 AS INT), 16) AS bk
      FROM fp CROSS JOIN range(0, 2) b(band)
    ), cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.sh AS sh_a, b.sh AS sh_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           len([i FOR i IN range(1, 33)
                IF substr(sh_a, CAST(i AS INT), 1)
                   <> substr(sh_b, CAST(i AS INT), 1)]) AS hamming
    FROM cands
    WHERE len([i FOR i IN range(1, 33)
               IF substr(sh_a, CAST(i AS INT), 1)
                  <> substr(sh_b, CAST(i AS INT), 1)]) <= 1
    """,
)
def simhash_near_pairs(spark, sf_dir):
    """SimHash near-dup PAIRS at scale: banded pigeonhole candidates
    (Hamming <= n_bands-1 guarantees a shared 16-bit band -> equi-join,
    full recall at max_hamming=1) + exact bit-count verification.  The
    driver corpus is template-heavy (token sets nearly identical across
    docs), so even Hamming <= 1 admits ~10k pairs at 500 docs — the
    operator's selectivity is a property of the data, the banding keeps
    the join an equi-join regardless.  Completes the simhash family:
    dedup_simhash computes fingerprints, this consumes them.  Promoted
    into the registry in r5 (slot freed by the pivot/setop demotion)."""
    from mrsboraetl_spark.operators.dedup import simhash_near_pairs as op

    return op(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        num_bits=32, n_bands=2, max_hamming=1,
    )


@register(
    "dedup_cluster_keepers",
    f"""
    WITH RECURSIVE {_MINHASH_BANDS.format(shingles=_SHINGLES, shingle_hashes=_SHINGLE_HASHES, mh_a=_MH_A, mh_b=_MH_B)}
    , cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
    ), verified AS (
      SELECT doc_a, doc_b,
             len(list_intersect(x.hs, y.hs)) AS n_common,
             len(x.hs) AS sz_a, len(y.hs) AS sz_b
      FROM cands
      JOIN hashed x ON x.doc_id = doc_a
      JOIN hashed y ON y.doc_id = doc_b
    ), pairs AS (
      SELECT doc_a, doc_b FROM verified
      WHERE round(n_common / (sz_a + sz_b - n_common), 4) >= 0.5
    ), sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ), reach(node, label) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.v, r.label
      FROM reach r JOIN sym s ON s.u = r.node
      WHERE r.label < s.v
    ), comp AS (
      SELECT node, min(label) AS label FROM reach GROUP BY node
    )
    SELECT d.doc_id AS id,
           coalesce(c.label, d.doc_id) AS cluster,
           d.doc_id = coalesce(c.label, d.doc_id) AS is_keeper
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
)
def dedup_cluster_keepers(spark, sf_dir):
    """The dedup capstone: near-dup PAIRS (the same LSH+Jaccard-verify
    path dedup_lsh_verified hash-checks) -> connected components
    (min-label propagation with pointer doubling) -> one (id, cluster,
    is_keeper) DECISION row per document, singletons included.

    The oracle reproduces the iterative min-label fixpoint as a DuckDB
    ``WITH RECURSIVE`` reachability CTE: propagate each label m along
    symmetric edges while m < target id; the minimum label reached per
    node is exactly the component minimum (the UNION dedups rows, so the
    recursion terminates on the finite node x label space).  This is the
    real hash-checked oracle the r4 verdict asked for — no rows-only
    compromise."""
    from mrsboraetl_spark.operators.dedup import (
        dedup_cluster_keepers as op,
        lsh_verified_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(
        docs, "doc_id", "text", num_hashes=8, k=5, rows_per_band=4,
        threshold=0.5,
    )
    return op(docs, pairs, "doc_id")


def curation_split_assign(spark, sf_dir):
    """Deterministic hash-based train/val/test assignment (curation layer).
    The split is a pure function of (doc_id, salt) — stable under
    repartitioning and corpus growth, the property a 100 TB pipeline
    needs so re-runs never move documents across splits.  Unregistered
    (50-entry driver cap); oracle-checked via UNREGISTERED_ORACLES."""
    from mrsboraetl_spark.operators.curation import split_assign

    docs = table(spark, sf_dir, "documents")
    return split_assign(docs, "doc_id", salt="v1").select(
        "doc_id", "bucket", "split"
    )


def curation_sample_mix(spark, sf_dir):
    """Deterministic corpus mixing: per-source sampling rates decided by
    hash(id, salt) — reproducible across runs/partitionings, unlike
    df.sample.  Unregistered (driver cap); oracle-checked."""
    from mrsboraetl_spark.operators.curation import sample_by_source

    docs = table(spark, sf_dir, "documents")
    rates = {"src0": 0.3, "src1": 1.0, "src2": 0.6}
    return sample_by_source(
        docs, "doc_id", "source", rates, salt="mix1", default_rate=0.1
    ).select("doc_id", "source")


def curation_chunk_documents(spark, sf_dir):
    """Context-window chunking: fixed-token-budget windows with overlap
    (embedding/training prep).  Pure built-ins; the explode is the
    output's inherent row growth.  Unregistered (driver cap);
    oracle-checked."""
    from mrsboraetl_spark.operators.curation import chunk_documents

    docs = table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, "doc_id", "text", chunk_tokens=64, overlap=8
    ).withColumnRenamed("id", "doc_id")


def curation_quality_filter(spark, sf_dir):
    """Composed quality gate: keep verdict + ordered audit reasons per
    document (token count, repetition fractions, language whitelist).
    Unregistered (driver cap, and the reasons array would break the
    driver canonicalizer anyway); oracle-checked via
    UNREGISTERED_ORACLES with the rules spelled out in the same order."""
    from mrsboraetl_spark.operators.curation import quality_filter

    docs = table(spark, sf_dir, "documents")
    return quality_filter(docs, "doc_id", "text", langs=("en",)).withColumnRenamed(
        "id", "doc_id"
    )


def curation_repetition_metrics(spark, sf_dir):
    """Per-document token-repetition quality signals (Gopher/C4-style
    duplicate-token, top-token and top-bigram fractions).  Explode + two
    key-partitioned aggs; worst shuffle partition bounded by the largest
    single document.  Unregistered (driver cap); oracle-checked via
    UNREGISTERED_ORACLES."""
    from mrsboraetl_spark.operators.curation import repetition_metrics

    docs = table(spark, sf_dir, "documents")
    return repetition_metrics(docs, "doc_id", "text").withColumnRenamed(
        "id", "doc_id"
    )


@register(
    "decontam_ngram_overlap",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS} AS ts FROM documents
    ), gram_lists AS (
      SELECT doc_id,
             [array_to_string(
                list_slice(ts, CAST(i AS INT), CAST(i + 3 AS INT)), ' ')
              FOR i IN range(1, greatest(len(ts) - 3, 0) + 1)] AS gs
      FROM toks
    ), grams AS (
      SELECT DISTINCT doc_id, unnest(gs) AS gram FROM gram_lists
    )
    SELECT t.doc_id, count(*) AS n_hits
    FROM (SELECT doc_id, gram FROM grams WHERE doc_id % 23 <> 0) t
    JOIN (SELECT DISTINCT gram FROM grams WHERE doc_id % 23 = 0) e
      USING (gram)
    GROUP BY t.doc_id
    """,
)
def decontam_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination: (doc_id, n_hits) for every train
    document sharing >= 1 token 4-gram with the eval slice (doc_id %
    23 == 0, standing in for a held-out benchmark — parameters chosen so
    the check is non-vacuous at every test SF: ~30 contaminated docs).
    The eval gram set rides to the Python workers and the probe runs
    inside the corpus kernel (one scan + one mapInPandas, zero joins,
    zero exchanges) — the corpus itself never shuffles.
    Promoted into the driver registry in r5 session 2 (slot freed by
    demoting anti_join_no_orders, whose J4 shape anti_join_daykey still
    covers)."""
    from mrsboraetl_spark.operators.decontam import contamination_counts

    docs = table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 23 == 0)
    train = docs.filter(F.col("doc_id") % 23 != 0)
    return contamination_counts(train, eval_df, "doc_id", "text", n=4)


# BM25 constants shared by the Spark builder and the oracle spelling so
# the float literals are the SAME doubles on both engines.
_BM25_TERMS = ("window", "merge", "stream")
_BM25_K1, _BM25_B, _BM25_TOPK = 1.2, 0.75, 20


def search_bm25_topk(spark, sf_dir):
    """BM25 top-k keyword retrieval over the documents corpus.  The
    query-term filter hits the exploded token stream BEFORE any
    aggregation (only matching tokens shuffle); corpus scalars join via
    a term-keyed broadcast hash join; top-k is orderBy+limit
    (TakeOrderedAndProject), ranked after the cut.  Score rounded to 4
    digits on both engines and the ordering computed on the ROUNDED
    value so cross-engine ulp noise cannot flip ranks.  Promoted into the
    driver registry in r6."""
    from mrsboraetl_spark.operators.search import bm25_scores

    docs = table(spark, sf_dir, "documents")
    scores = bm25_scores(
        docs, _BM25_TERMS, "doc_id", "text", k1=_BM25_K1, b=_BM25_B
    ).select("doc_id", F.round("score", 4).alias("score"))
    from pyspark.sql import Window

    top = scores.orderBy(F.desc("score"), "doc_id").limit(_BM25_TOPK)
    w = Window.orderBy(F.desc("score"), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w))


def sketch_kmv_distinct(spark, sf_dir):
    """Vocabulary size per source via the deterministic K-Minimum-Values
    sketch (k=64): bounded, mergeable distinct-count state — and because
    the hash is md5, the SAME estimate to the digit on both engines, so
    unlike HLL it is hash-check oracle-able.  Promoted r7 into the
    driver registry (VERDICT r6 item 3)."""
    from mrsboraetl_spark.functions.text import tokens
    from mrsboraetl_spark.operators.sketch import kmv_distinct

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    return kmv_distinct(toks, "source", "tok", k=64)


def curation_pack_sequences(spark, sf_dir):
    """Deterministic training-order shuffle + contiguous sequence packing
    (concatenate-then-cut at a 256-token budget, 32 parallel lanes).
    One shuffle on the lane key + an in-partition window sum — no global
    sort.  Unregistered (driver cap); oracle-checked via
    UNREGISTERED_ORACLES."""
    from mrsboraetl_spark.operators.curation import pack_sequences

    docs = table(spark, sf_dir, "documents")
    return pack_sequences(
        docs, "doc_id", "text", budget=256, n_streams=32, salt="pack1"
    ).withColumnRenamed("id", "doc_id")


def curation_oov_fraction(spark, sf_dir):
    """CCNet-style out-of-vocabulary quality signal: fraction of each
    document's tokens outside the corpus top-20 vocabulary (the test
    corpus has 31 distinct tokens, so the tail 11 carry real OOV mass
    and the check is non-vacuous).  Top-V is TakeOrderedAndProject, the
    probe a broadcast hash join.  Promoted r9 (VERDICT r8 item 4)."""
    from mrsboraetl_spark.operators.curation import oov_fraction

    docs = table(spark, sf_dir, "documents")
    return oov_fraction(docs, "doc_id", "text", vocab_size=20).withColumnRenamed(
        "id", "doc_id"
    )


def curation_token_budget_mix(spark, sf_dir):
    """Budget-driven corpus mixing: src0 sampled down to a 500-token
    budget, src1 kept whole (budget above its actual count), every
    other source dropped.  The keep rule is integer-exact
    (bucket * actual < budget * buckets), so both engines agree
    bit-for-bit with no float-boundary risk.  Promoted r7 into the
    driver registry (VERDICT r6 item 3)."""
    from mrsboraetl_spark.operators.curation import sample_to_token_budget

    docs = table(spark, sf_dir, "documents")
    return sample_to_token_budget(
        docs, "doc_id", "text", "source",
        budgets={"src0": 500, "src1": 10_000_000}, salt="budget1",
    ).select("doc_id", "source")


def profile_source_percentiles(spark, sf_dir):
    """Per-source corpus profiling with EXACT percentiles: doc counts,
    mean and p50/p90 document length.  Spark's sort-based exact
    percentile aggregate matches DuckDB's quantile_cont to the ulp
    (linear interpolation on the ordered multiset) — the exact path;
    the 100 TB path is the approx_percentile sketch in
    functions/approx.py (error-bound-tested).  Unregistered (driver
    cap); oracle-checked via UNREGISTERED_ORACLES."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("p50_chars"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("p90_chars"),
    )


# Operators kept OUT of the 50-entry driver registry but oracle-checked by
# tests/test_oracle_parity.py, mirroring relational.UNREGISTERED_ORACLES.
# (simhash_near_pairs graduated to the registry in r5; the curation layer
# entries below were added in r5.)
UNREGISTERED_ORACLES: dict[str, str] = {
    # Demoted r6 (slots freed for the bm25/spans/shuffle/fuzzy-join
    # promotions): the brute-force cosine baseline (LSH variant stays
    # driver-green) and the decode stub (binary_meta stays).
    "dedup_embedding_cosine": f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_COS.replace("va", "a.embedding").replace("vb", "b.embedding")}
             AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS.replace("va", "a.embedding").replace("vb", "b.embedding")}
          >= 0.45
    """,
    "multimodal_decode_stub": """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           substr(md5(text), 1, 8) AS checksum,
           octet_length(encode(text)) % 640 AS fake_width,
           octet_length(encode(text)) % 480 AS fake_height,
           octet_length(encode(text)) // 1000 + 1 AS n_frames
    FROM documents
    """,
    "curation_token_budget_mix": """
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                              ' ')) AS nt,
             ('0x' || substr(md5(doc_id::VARCHAR || ':budget1'), 1, 8))::BIGINT
               % 1000000 AS bucket
      FROM documents
    ), totals AS (
      SELECT source, sum(nt) AS actual FROM t GROUP BY source
    )
    SELECT t.doc_id, t.source
    FROM t JOIN totals USING (source)
    WHERE CASE t.source WHEN 'src0' THEN 500
                        WHEN 'src1' THEN 10000000 END IS NOT NULL
      AND t.bucket * totals.actual
          < CASE t.source WHEN 'src0' THEN 500::BIGINT
                          WHEN 'src1' THEN 10000000::BIGINT END
            * 1000000::BIGINT
    """,
    "curation_oov_fraction": f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS t FROM documents
    ), counts AS (
      SELECT t, count(*) AS c FROM toks GROUP BY t
    ), vocab AS (
      SELECT t FROM counts ORDER BY c DESC, t LIMIT 20
    ), flagged AS (
      SELECT k.doc_id, CASE WHEN v.t IS NULL THEN 1 ELSE 0 END AS oov
      FROM toks k LEFT JOIN vocab v USING (t)
    )
    SELECT doc_id, count(*) AS n_tokens,
           round(sum(oov) / count(*), 6) AS oov_frac
    FROM flagged GROUP BY doc_id
    """,
    "profile_source_percentiles": """
    SELECT source,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
           round(quantile_cont(n_chars, 0.9), 4) AS p90_chars
    FROM documents GROUP BY source
    """,
    "search_bm25_topk": f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS} AS ts FROM documents
    ), lengths AS (
      SELECT doc_id, len(ts) AS dl FROM toks
    ), corpus AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lengths
    ), tok AS (
      SELECT doc_id, unnest(ts) AS term FROM toks
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY doc_id, term
    ), dft AS (
      SELECT term, count(*) AS df_t FROM tf GROUP BY term
    ), scored AS (
      SELECT t.doc_id,
             ((ln(1.0 + ((c.n_docs - d.df_t) + 0.5) / (d.df_t + 0.5))
               * t.tf) * {_BM25_K1 + 1.0!r})
             / (t.tf + {_BM25_K1!r}
                * ({1.0 - _BM25_B!r}
                   + (({_BM25_B!r} * l.dl) / c.avgdl))) AS part
      FROM tf t
      JOIN dft d USING (term)
      JOIN lengths l USING (doc_id)
      CROSS JOIN corpus c
    ), s AS (
      SELECT doc_id, round(sum(part), 4) AS score FROM scored
      GROUP BY doc_id
    ), ranked AS (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM s
    )
    SELECT doc_id, score, rank FROM ranked WHERE rank <= {_BM25_TOPK}
    """,
    # "sketch_kmv_distinct" is appended below the dict literal: its SQL is
    # generated by operators.sketch.kmv_oracle_sql so both engines share
    # one estimator spelling.
    "curation_pack_sequences": """
    WITH toks AS (
      SELECT doc_id,
             len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                              ' ')) AS n_tokens
      FROM documents WHERE text IS NOT NULL
    ), keyed AS (
      SELECT doc_id, n_tokens,
             ('0x' || substr(md5(doc_id::VARCHAR || ':pack1'), 1, 8))::BIGINT
               % 32 AS stream,
             md5(doc_id::VARCHAR || ':pack1') AS ord_key
      FROM toks
    ), packed AS (
      SELECT doc_id, stream, n_tokens,
             sum(n_tokens) OVER (PARTITION BY stream
                                 ORDER BY ord_key, doc_id
                                 ROWS UNBOUNDED PRECEDING)
               - n_tokens AS before
      FROM keyed
    )
    SELECT doc_id, stream, before // 256 AS seq_idx,
           before % 256 AS tok_offset, n_tokens
    FROM packed
    """,
    "curation_quality_filter": f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents WHERE text IS NOT NULL
    ), tok AS (
      SELECT doc_id, unnest(ts) AS t FROM toks
    ), tc AS (
      SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t
    ), tstats AS (
      SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
             max(c) AS top_c
      FROM tc GROUP BY doc_id
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ts)),
                                   i -> ts[i] || ' ' || ts[i + 1])) AS b
      FROM toks
    ), bc AS (
      SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b
    ), bstats AS (
      SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bg_c
      FROM bc GROUP BY doc_id
    ), rep AS (
      SELECT t.doc_id,
             t.n_tokens,
             round(1.0 - t.n_distinct / CAST(t.n_tokens AS DOUBLE), 6)
               AS dup_token_frac,
             round(t.top_c / CAST(t.n_tokens AS DOUBLE), 6)
               AS top_token_frac,
             round(coalesce(b.top_bg_c / CAST(b.n_bigrams AS DOUBLE), 0.0), 6)
               AS top_bigram_frac
      FROM tstats t LEFT JOIN bstats b ON t.doc_id = b.doc_id
    ), lt AS (SELECT doc_id, {_TOKENS} AS ltoks FROM documents),
    hits AS (
      SELECT doc_id,
             len(list_filter(ltoks, t -> list_contains({_in_list("en")}, t))) AS h_en,
             len(list_filter(ltoks, t -> list_contains({_in_list("es")}, t))) AS h_es,
             len(list_filter(ltoks, t -> list_contains({_in_list("fr")}, t))) AS h_fr,
             len(list_filter(ltoks, t -> list_contains({_in_list("de")}, t))) AS h_de
      FROM lt
    ), lang AS (
      SELECT doc_id,
             CASE WHEN h_en = greatest(h_en, h_es, h_fr, h_de)
                       AND greatest(h_en, h_es, h_fr, h_de) > 0 THEN 'en'
                  WHEN h_es = greatest(h_en, h_es, h_fr, h_de)
                       AND greatest(h_en, h_es, h_fr, h_de) > 0 THEN 'es'
                  WHEN h_fr = greatest(h_en, h_es, h_fr, h_de)
                       AND greatest(h_en, h_es, h_fr, h_de) > 0 THEN 'fr'
                  WHEN h_de = greatest(h_en, h_es, h_fr, h_de)
                       AND greatest(h_en, h_es, h_fr, h_de) > 0 THEN 'de'
                  ELSE 'und' END AS lang_pred
      FROM hits
    ), rules AS (
      SELECT d.doc_id,
             list_filter([
               CASE WHEN coalesce(r.n_tokens, 0) < 10
                    THEN 'too_short' END,
               CASE WHEN coalesce(r.dup_token_frac, 1.0) > 0.9
                    THEN 'dup_tokens' END,
               CASE WHEN coalesce(r.top_token_frac, 1.0) > 0.5
                    THEN 'top_token' END,
               CASE WHEN coalesce(r.top_bigram_frac, 1.0) > 0.5
                    THEN 'top_bigram' END,
               CASE WHEN l.lang_pred NOT IN ('en') THEN 'lang' END
             ], x -> x IS NOT NULL) AS reasons
      FROM documents d
      LEFT JOIN rep r ON d.doc_id = r.doc_id
      LEFT JOIN lang l ON d.doc_id = l.doc_id
    )
    SELECT doc_id, reasons, len(reasons) = 0 AS keep FROM rules
    """,
    "curation_sample_mix": """
    WITH b AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(doc_id::VARCHAR || ':mix1'), 1, 8))::BIGINT
               % 1000000 AS bucket
      FROM documents
    )
    SELECT doc_id, source FROM b
    WHERE bucket < CASE source
                     WHEN 'src0' THEN 300000
                     WHEN 'src1' THEN 1000000
                     WHEN 'src2' THEN 600000
                     ELSE 100000 END
    """,
    "curation_chunk_documents": """
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents WHERE text IS NOT NULL
    ), c AS (
      SELECT doc_id, ts,
             CASE WHEN len(ts) <= 64 THEN 1
                  ELSE CAST(ceil((len(ts) - 8) / 56.0) AS INT) END AS n_chunks
      FROM toks
    ), e AS (
      SELECT doc_id, ts, unnest(range(0, n_chunks)) AS chunk_idx FROM c
    )
    SELECT doc_id, chunk_idx,
           array_to_string(ts[chunk_idx * 56 + 1 : chunk_idx * 56 + 64], ' ')
             AS chunk_text,
           len(ts[chunk_idx * 56 + 1 : chunk_idx * 56 + 64])
             AS n_chunk_tokens
    FROM e
    """,
    "curation_split_assign": """
    WITH b AS (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR || ':v1'), 1, 8))::BIGINT
               % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    "curation_repetition_metrics": """
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents WHERE text IS NOT NULL
    ), tok AS (
      SELECT doc_id, unnest(ts) AS t FROM toks
    ), tc AS (
      SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t
    ), tstats AS (
      SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
             max(c) AS top_c
      FROM tc GROUP BY doc_id
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ts)),
                                   i -> ts[i] || ' ' || ts[i + 1])) AS b
      FROM toks
    ), bc AS (
      SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b
    ), bstats AS (
      SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bg_c
      FROM bc GROUP BY doc_id
    )
    SELECT t.doc_id,
           t.n_tokens,
           t.n_distinct,
           round(1.0 - t.n_distinct / CAST(t.n_tokens AS DOUBLE), 6)
             AS dup_token_frac,
           round(t.top_c / CAST(t.n_tokens AS DOUBLE), 6) AS top_token_frac,
           round(coalesce(b.top_bg_c / CAST(b.n_bigrams AS DOUBLE), 0.0), 6)
             AS top_bigram_frac
    FROM tstats t LEFT JOIN bstats b ON t.doc_id = b.doc_id
    """,
}

# r7 demotions (VERDICT r6 item 3 + slot math for the U2 re-promotion):
# same oracles, same hash check, now under pytest instead of the driver
# gate; every demoted entry's family keeps driver-green siblings (see
# each function's docstring).
UNREGISTERED_ORACLES["dedup_simhash"] = _DEDUP_SIMHASH_ORACLE
UNREGISTERED_ORACLES["dedup_ngram_jaccard"] = _DEDUP_NGRAM_JACCARD_ORACLE
UNREGISTERED_ORACLES["dedup_exact_then_near"] = _DEDUP_EXACT_THEN_NEAR_ORACLE
UNREGISTERED_ORACLES["dedup_embedding_lsh"] = _DEDUP_EMBEDDING_LSH_ORACLE

from mrsboraetl_spark.operators.sketch import kmv_oracle_sql  # noqa: E402

UNREGISTERED_ORACLES["sketch_kmv_distinct"] = kmv_oracle_sql(
    f"(SELECT source, unnest({_TOKENS}) AS tok FROM documents) AS src",
    "source",
    "tok",
    64,
)


def dedup_repeated_spans(spark, sf_dir):
    """Sub-document boilerplate removal (C4/RefinedWeb-style): delete
    10-token spans occurring > 2 times corpus-wide, reassemble documents
    in order.  Non-vacuous at every test SF (~15-18 distinct over-frequent
    spans, ~55-65 occurrences cut).  One span-key agg + broadcast
    anti-join + one doc-key ordered reassembly — see operators/spans.py
    for the 100 TB rationale.  Promoted into the driver registry in r6."""
    from mrsboraetl_spark.operators.spans import remove_repeated_spans

    docs = table(spark, sf_dir, "documents")
    return remove_repeated_spans(
        docs, "doc_id", "text", span_tokens=10, max_freq=2
    ).withColumnRenamed("id", "doc_id")


def curation_redact_pii(spark, sf_dir):
    """PII/secret redaction parity probe.  The corpus itself is clean, so
    the query deterministically injects one email, one IPv4, and one
    token=... secret derived from doc_id on BOTH engines before
    redacting — the parity check therefore proves the three pattern
    classes match and replace identically (500 of each at every SF),
    never passing vacuously.  Unregistered (driver cap); oracle-checked."""
    from mrsboraetl_spark.operators.redact import redact_pii

    docs = table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@ex.org srv 10.0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".7 token=t"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return redact_pii(injected, "doc_id", "text").withColumnRenamed(
        "id", "doc_id"
    )


def curation_epoch_shuffle(spark, sf_dir):
    """Deterministic seeded epoch permutation for training export:
    every document's 0-based position under md5('epoch1:' || doc_id)
    order, computed with the two-phase deterministic-bucket spelling
    (operators/order.py: md5-prefix buckets + offset prefix-sum) instead
    of the single-partition global window the oracle uses — same result,
    scalable plan (measured 5-8s vs 25s at 20M rows).  Promoted into the
    driver registry in r6."""
    from mrsboraetl_spark.operators.order import epoch_shuffle

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(docs, "doc_id", "epoch1").select("doc_id", "pos")


from mrsboraetl_spark.operators.redact import redact_pii_oracle_sql  # noqa: E402
from mrsboraetl_spark.operators.spans import repeated_spans_oracle_sql  # noqa: E402

UNREGISTERED_ORACLES["dedup_repeated_spans"] = (
    "SELECT id AS doc_id, clean_text, n_kept FROM ("
    + repeated_spans_oracle_sql("documents", "doc_id", 10, 2)
    + ") q"
)

UNREGISTERED_ORACLES["curation_redact_pii"] = (
    "SELECT id AS doc_id, clean_text, n_email, n_ipv4, n_secret FROM ("
    + redact_pii_oracle_sql(
        "(SELECT doc_id, text || ' contact u' || CAST(doc_id AS VARCHAR)"
        " || '@ex.org srv 10.0.' || CAST(doc_id % 200 AS VARCHAR)"
        " || '.7 token=t' || CAST(doc_id AS VARCHAR) AS text"
        " FROM documents) src"
    )
    + ") q"
)

UNREGISTERED_ORACLES["curation_epoch_shuffle"] = """
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY md5('epoch1:' || CAST(doc_id AS VARCHAR))) - 1
             AS BIGINT) AS pos
    FROM documents
"""


def curation_unigram_logprob(spark, sf_dir):
    """Per-document mean negative log-likelihood under the corpus's own
    unigram LM (CCNet-style quality signal one step past OOV): rare /
    off-distribution tokens raise the score.  One token-keyed count agg
    + one token equi-join; the corpus total enters as ln(S) via the
    algebraic split -ln(c/S) = ln(S) - ln(c) (bounded 1-row action, no
    nested-loop scalar join).  Promoted r9 (VERDICT r8 item 4)."""
    from mrsboraetl_spark.operators.curation import unigram_logprob

    docs = table(spark, sf_dir, "documents")
    # materialize_tokens: tokenize the corpus ONCE (the exploded stream
    # is consumed by both the count agg and the re-join) — the right
    # trade while the (id, token) stream fits scratch storage, which at
    # the registered test SFs it always does; a 100 TB deployment would
    # leave it off (corpus-sized checkpoint) and pay the second scan.
    return unigram_logprob(
        docs, "doc_id", "text", materialize_tokens=True
    ).withColumnRenamed("id", "doc_id")


UNREGISTERED_ORACLES["curation_unigram_logprob"] = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS t FROM documents
    ), cnt AS (
      SELECT t, count(*) AS c FROM toks GROUP BY t
    ), tot AS (
      SELECT sum(c) AS s FROM cnt
    )
    SELECT doc_id, count(*) AS n_tokens,
           round(ln(tot.s) - avg(ln(cnt.c)), 4) AS nll
    FROM toks JOIN cnt USING (t) CROSS JOIN tot
    GROUP BY doc_id, tot.s
"""


def curation_oversample_mix(spark, sf_dir):
    """Deterministic epoch/temperature mixing with rates above 1
    (2.5 epochs of src0, 1 of src1, 0.25 of src2): each document emits
    floor(rate) copies plus a fractional-hash extra, as (doc_id, source,
    copy) rows.  Pure projection + explode, integer-exact fractional
    threshold.  Unregistered (driver cap); oracle-checked."""
    from mrsboraetl_spark.operators.curation import oversample_by_source

    docs = table(spark, sf_dir, "documents")
    return oversample_by_source(
        docs, "doc_id", "source", {"src0": 2.5, "src1": 1.0, "src2": 0.25}
    ).select("doc_id", "source", "copy")


from mrsboraetl_spark.operators.curation import (  # noqa: E402
    oversample_oracle_sql,
)

UNREGISTERED_ORACLES["curation_oversample_mix"] = oversample_oracle_sql(
    "documents", "doc_id", "source", {"src0": 2.5, "src1": 1.0, "src2": 0.25}
)


def decontam_attribution_pairs(spark, sf_dir):
    """Contamination attribution: (train_id, eval_id, n_shared) for
    every train/eval document pair sharing >= 2 distinct token 4-grams
    (same eval slice as the registered decontam entry) — the "which
    benchmark item leaked, and how much" forensics view.  Matches-only
    shuffle, broadcast eval side.  Unregistered (driver cap);
    oracle-checked."""
    from mrsboraetl_spark.operators.decontam import contamination_pairs

    docs = table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 23 == 0)
    train = docs.filter(F.col("doc_id") % 23 != 0)
    return contamination_pairs(
        train, eval_df, "doc_id", "text", n=4, min_shared=2
    )


UNREGISTERED_ORACLES["decontam_attribution_pairs"] = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS} AS ts FROM documents
    ), gram_lists AS (
      SELECT doc_id,
             [array_to_string(
                list_slice(ts, CAST(i AS INT), CAST(i + 3 AS INT)), ' ')
              FOR i IN range(1, greatest(len(ts) - 3, 0) + 1)] AS gs
      FROM toks
    ), grams AS (
      SELECT DISTINCT doc_id, unnest(gs) AS gram FROM gram_lists
    )
    SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
           count(*) AS n_shared
    FROM (SELECT doc_id, gram FROM grams WHERE doc_id % 23 <> 0) t
    JOIN (SELECT doc_id, gram FROM grams WHERE doc_id % 23 = 0) e
      USING (gram)
    GROUP BY t.doc_id, e.doc_id
    HAVING count(*) >= 2
"""


def fuzzy_join_docs(spark, sf_dir):
    """Fuzzy text JOIN between two DIFFERENT relations (record linkage):
    the eval slice (doc_id % 5 == 0) joined against the train slice on
    textual similarity, banded-minhash candidates + exact in-row Jaccard
    >= 0.5.  The naive spelling is a similarity-predicate cartesian; this
    one is two band equi-joins.  Non-vacuous on the self-similar corpus
    (cross-slice near-dup cluster pairs).  Promoted into the driver
    registry in r6."""
    from mrsboraetl_spark.operators.dedup import fuzzy_text_join

    docs = table(spark, sf_dir, "documents")
    # % 5 (not a sparser slice): the hash-check is only as strong as
    # the rows it covers — this split yields ~14 cross-slice near-dup
    # pairs at the driver's sf0.01 (a % 23 split left just 1).
    left = docs.filter(F.col("doc_id") % 5 != 0)
    right = docs.filter(F.col("doc_id") % 5 == 0)
    return fuzzy_text_join(
        left, right, "doc_id", "text", "doc_id", "text",
        threshold=0.5, num_hashes=8, k=5, rows_per_band=4,
    )


UNREGISTERED_ORACLES["fuzzy_join_docs"] = f"""
    WITH {_MINHASH_BANDS.format(shingles=_SHINGLES, shingle_hashes=_SHINGLE_HASHES, mh_a=_MH_A, mh_b=_MH_B)}
    , cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM (SELECT * FROM bands WHERE doc_id % 5 <> 0) a
      JOIN (SELECT * FROM bands WHERE doc_id % 5 = 0) b
        ON a.band = b.band AND a.bk = b.bk
    ), verified AS (
      SELECT id_a, id_b,
             len(list_intersect(x.hs, y.hs)) AS n_common,
             len(x.hs) AS sz_a, len(y.hs) AS sz_b
      FROM cands
      JOIN hashed x ON x.doc_id = id_a
      JOIN hashed y ON y.doc_id = id_b
    )
    SELECT id_a, id_b,
           round(n_common / (sz_a + sz_b - n_common), 4) AS jaccard
    FROM verified
    WHERE round(n_common / (sz_a + sz_b - n_common), 4) >= 0.5
"""


# --------------------------------------------- r6 registry promotions
# (VERDICT r5 item 4.)  These four were pytest-oracle-checked since r5;
# promoting them moves the SAME oracle into the driver gate.  Slots
# freed by union_distinct_queue, json_props_extract,
# dedup_embedding_cosine, multimodal_decode_stub (each still
# oracle-checked under pytest, each family keeping a driver-green
# sibling).  Post-hoc registration (not decorators) because the oracle
# strings are composed from operator-provided SQL builders defined
# after the functions.
for _name, _fn in (
    ("search_bm25_topk", search_bm25_topk),
    ("dedup_repeated_spans", dedup_repeated_spans),
    ("curation_epoch_shuffle", curation_epoch_shuffle),
    ("fuzzy_join_docs", fuzzy_join_docs),
):
    register(_name, UNREGISTERED_ORACLES.pop(_name))(_fn)
del _name, _fn


def curation_stratified_sample(spark, sf_dir):
    """Exact quota sampling: precisely 10 documents per source, the 10
    smallest md5(id:salt) per stratum — what sampleBy (Bernoulli) can't
    promise.  Scale path = hash-threshold prefilter + window over the
    ~2n survivors per stratum (operators/curation.py).  Promoted r7
    (VERDICT r6 item 3); oracle = the naive full-window spelling."""
    from mrsboraetl_spark.operators.curation import stratified_sample_exact

    docs = table(spark, sf_dir, "documents")
    return stratified_sample_exact(
        docs, "source", "doc_id", n_per_stratum=10, salt="strat1"
    ).select("doc_id", "source")


UNREGISTERED_ORACLES["curation_stratified_sample"] = """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || ':strat1'),
                                        1, 8))::BIGINT, doc_id
             ) AS rn
      FROM documents
    ) q WHERE rn <= 10
"""


def dedup_cluster_keepers_priority(spark, sf_dir):
    """r6: priority-aware keeper selection — within each near-dup
    cluster keep the LONGEST document (n_chars, min-id tie-break), the
    keep-the-best-source policy real curation wants instead of min-id's
    accident of ingestion order.  Same LSH pairs + connected components
    as dedup_cluster_keepers; the keeper pick is one window over the
    cluster key.  Promoted r7 (VERDICT r6 item 3)."""
    from mrsboraetl_spark.operators.dedup import (
        dedup_cluster_keepers_by_priority,
        lsh_verified_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(
        docs, "doc_id", "text", num_hashes=8, k=5, rows_per_band=4,
        threshold=0.5,
    )
    return dedup_cluster_keepers_by_priority(
        docs, pairs, "doc_id", "n_chars"
    )


UNREGISTERED_ORACLES["dedup_cluster_keepers_priority"] = f"""
    WITH RECURSIVE {_MINHASH_BANDS.format(shingles=_SHINGLES, shingle_hashes=_SHINGLE_HASHES, mh_a=_MH_A, mh_b=_MH_B)}
    , cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
    ), verified AS (
      SELECT doc_a, doc_b,
             len(list_intersect(x.hs, y.hs)) AS n_common,
             len(x.hs) AS sz_a, len(y.hs) AS sz_b
      FROM cands
      JOIN hashed x ON x.doc_id = doc_a
      JOIN hashed y ON y.doc_id = doc_b
    ), pairs AS (
      SELECT doc_a, doc_b FROM verified
      WHERE round(n_common / (sz_a + sz_b - n_common), 4) >= 0.5
    ), sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ), reach(node, label) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.v, r.label
      FROM reach r JOIN sym s ON s.u = r.node
      WHERE r.label < s.v
    ), comp AS (
      SELECT node, min(label) AS label FROM reach GROUP BY node
    ), clustered AS (
      SELECT d.doc_id AS id, d.n_chars AS p,
             coalesce(c.label, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT id, cluster,
           first_value(id) OVER (
             PARTITION BY cluster ORDER BY p DESC, id ASC
           ) AS keeper_id,
           id = first_value(id) OVER (
             PARTITION BY cluster ORDER BY p DESC, id ASC
           ) AS is_keeper
    FROM clustered
"""


# --------------------------------------------- r7 registry promotions
# (VERDICT r6 item 3.)  Pytest-oracle-checked since their adding round;
# promotion moves the SAME oracle into the driver gate.  Slots freed by
# dedup_simhash, dedup_ngram_jaccard, dedup_exact_then_near,
# dedup_embedding_lsh (above) and streaming_dedup_count (streaming_q) —
# each still oracle-checked under pytest, each family keeping
# driver-green siblings.
for _name, _fn in (
    ("sketch_kmv_distinct", sketch_kmv_distinct),
    ("curation_token_budget_mix", curation_token_budget_mix),
    ("curation_stratified_sample", curation_stratified_sample),
    ("dedup_cluster_keepers_priority", dedup_cluster_keepers_priority),
):
    register(_name, UNREGISTERED_ORACLES.pop(_name))(_fn)
del _name, _fn


# --------------------------------------------- r8 registry promotions
# (VERDICT r7 item 5.)  The redaction and percentile families were the
# only first-class curation signals without driver rows; both oracles
# are non-vacuous (redaction injects 3 PII classes per doc on both
# engines; percentiles are exact, ulp-matched to quantile_cont).  Slots
# freed by join_composite_key (J2's shape driver-covered via
# anti_join_daykey) and streaming_session_window (I5 keeps two driver
# rows) — both still oracle-checked under pytest.
for _name, _fn in (
    ("curation_redact_pii", curation_redact_pii),
    ("profile_source_percentiles", profile_source_percentiles),
):
    register(_name, UNREGISTERED_ORACLES.pop(_name))(_fn)
del _name, _fn


# --------------------------------------------- r9 registry promotions
# (VERDICT r8 item 4.)  The last two oracle-checked curation signals
# without driver rows: the CCNet-style OOV fraction and the unigram-LM
# negative log-likelihood.  Slots freed by text_lang_id (text family
# keeps text_doc_metrics + text_winnow_fingerprint driver-green) and
# union_distinct_queue (U2's dedup-union shape driver-covered via
# filters_in_null_distinct + union_all_pad) — both still
# oracle-checked under pytest.
UNREGISTERED_ORACLES["text_lang_id"] = _TEXT_LANG_ID_ORACLE
for _name, _fn in (
    ("curation_oov_fraction", curation_oov_fraction),
    ("curation_unigram_logprob", curation_unigram_logprob),
):
    register(_name, UNREGISTERED_ORACLES.pop(_name))(_fn)
del _name, _fn
