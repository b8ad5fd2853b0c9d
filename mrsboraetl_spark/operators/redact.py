"""PII / secret redaction for training-data curation.

Emails, bare IPv4 addresses, and ``key=value`` credential assignments are
the classic leak classes scrubbed from web corpora before training.  The
operator is a SEQUENTIAL fold of (count, replace) steps — each pattern is
counted on, then replaced in, the text as left by the previous pattern —
so the semantics are order-defined and exactly reproducible in the ANSI
oracle spelling (nested ``regexp_replace`` with the same intermediate
stages).

Scale shape: pure ``regexp_extract_all`` / ``regexp_replace`` column
expressions — single scan, whole-stage codegen, zero shuffles, zero
Python workers.  At 100 TB this is embarrassingly parallel map work whose
cost is the regex engine itself; patterns are anchored/char-class based
(no catastrophic backtracking constructs), and every pattern is written
in the common Java-regex / RE2 dialect subset so Spark and the oracle
match byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) applied IN ORDER.  Patterns deliberately use
# only syntax with identical semantics in java.util.regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, alternation, \b ASCII
# word boundaries, the (?i) case-insensitivity flag — no backreferences,
# no lookaround.  (?i) because PII does not respect case:
# 'John.Doe@Example.COM' and 'Token=abc' must scrub the same as their
# lower-case forms.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (
        "secret",
        r"(?i)(api_key|apikey|secret|token|password)=[^\s]+",
        "<SECRET>",
    ),
)


def redacted_text(
    text_col: str,
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
):
    """Column: ``text_col`` with every pattern class replaced, as a pure
    expression — composable in place (no join, no shuffle) by pipeline
    stages that keep the rest of the row."""
    text = F.col(text_col)
    for _name, pat, repl in patterns:
        text = F.regexp_replace(text, pat, repl)
    return text


def redact_pii(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """(id, clean_text, n_<name>...): text with each pattern class
    replaced by its placeholder, plus per-class match counts (counted on
    the text as seen at that step of the fold).

    Layered projections (r13, guide §1.2): the single-Project spelling
    inlined each intermediate fold stage into every output column that
    mentioned it — with the default three patterns, stage-1 text was
    regex-replaced three separate times per row (clean_text chain +
    both later counts), 9 regex evaluations total.  Aliasing each
    stage's text in its own Project (non-cheap alias referenced twice —
    by its count and the next replace — so CollapseProject keeps the
    split) evaluates each replace and each count exactly once: 6 regex
    ops per row, identical fold semantics and outputs (oracle-checked,
    same SQL spelling below)."""
    cur = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_s")
    )
    count_names: list[str] = []
    for name, pat, repl in patterns:
        cur = cur.select(
            "id",
            *count_names,
            F.size(F.regexp_extract_all(F.col("_s"), F.lit(pat), 0))
            .cast("bigint")
            .alias(f"n_{name}"),
            F.regexp_replace(F.col("_s"), pat, repl).alias("_s"),
        )
        count_names.append(f"n_{name}")
    return cur.select(
        "id", F.col("_s").alias("clean_text"), *count_names
    )


def redact_pii_oracle_sql(
    source_sql: str,
    id_col: str = "doc_id",
    text_expr: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> str:
    """DuckDB spelling of redact_pii over ``source_sql`` (a FROM-able
    relation).  Builds the same sequential fold as chained CTEs; DuckDB's
    regexp_replace needs the explicit 'g' flag to match Spark's
    replace-all default.  Single-quoted (non-E) literals keep backslashes
    raw, so the exact pattern strings are shared with the Spark side."""
    ctes = [
        f"s0 AS (SELECT {id_col} AS id, {text_expr} AS s FROM {source_sql})"
    ]
    count_cols: list[str] = []
    for i, (name, pat, repl) in enumerate(patterns, start=1):
        lit = pat.replace("'", "''")
        carried = "".join(f", {c}" for c in count_cols)
        ctes.append(
            f"s{i} AS (SELECT id, "
            f"regexp_replace(s, '{lit}', '{repl}', 'g') AS s, "
            f"CAST(len(regexp_extract_all(s, '{lit}')) AS BIGINT)"
            f" AS n_{name}{carried} FROM s{i - 1})"
        )
        count_cols.append(f"n_{name}")
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT id, s AS clean_text, {', '.join(count_cols)}"
        + f" FROM s{len(patterns)}"
    )
