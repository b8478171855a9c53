"""Text-analysis operators over a ``documents(doc_id, text, ...)`` table:
token counting, quality scoring, language-ID heuristic, fingerprints.

Every operator here is expressed with built-in ``pyspark.sql.functions``
(JVM-side, whole-stage codegen — no Python in the hot path) and has an
ANSI-SQL twin for the DuckDB oracle. Parity rules:

- tokens  := regexp-split of ``trim(text)`` on ``\\s+``; empty text → 0
- ratios  := single division of exact integer counts (deterministic)
- no float summation in SQL-checked outputs (order-dependent)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed stopword list for quality scoring (frozen; SQL twin is generated
#: from this same constant)
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "this", "be", "are", "was", "at",
]

#: marker words for the n-gram/marker language-ID heuristic. The langs
#: and tie-break order are fixed: en > de > fr > es.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "que", "pour", "dans"],
    "es": ["el", "la", "los", "las", "es", "que", "por", "para"],
}

_TOKENS = "CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\\s+') END"


def _tokens_col():
    """Spark tokens column matching the SQL twin's semantics."""
    return F.when(
        F.length(F.trim(F.col("text"))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))


def token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) — whitespace token count."""
    return documents.select(
        "doc_id",
        F.size(_tokens_col()).cast("long").alias("n_tokens"),
    )


def token_counts_sql() -> str:
    return f"""
        SELECT doc_id, len({_TOKENS})::BIGINT AS n_tokens
        FROM documents
    """


#: BPE-ish pre-tokenizer regex (GPT-2 family): contractions, space-glued
#: letter runs, digit runs, symbol runs, whitespace runs. Restricted to
#: constructs Java regex (Spark) and RE2 (DuckDB) evaluate identically —
#: no lookaheads (RE2 has none), ASCII classes (Java \s is ASCII, RE2 \s
#: is ASCII), and alternation order matters the same way in both
#: (leftmost-first).
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_counts_bpe(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens_ws, n_tokens_bpe) — whitespace count next to a
    BPE-ish pre-tokenizer count (pure-whitespace matches excluded): the
    unit LLM-pipeline budgets are written in. JVM-side regexp, map-only."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    return documents.select(
        "doc_id",
        F.size(_tokens_col()).cast("long").alias("n_tokens_ws"),
        # pure-whitespace matches are excluded by regex, NOT trim():
        # trim strips only ' ' in both engines, so '\n' would survive it
        F.size(
            F.filter(toks, lambda t: ~t.rlike(r"^\s+$"))
        ).cast("long").alias("n_tokens_bpe"),
    )


def token_counts_bpe_sql() -> str:
    pat = BPE_PATTERN.replace("'", "''")
    return f"""
        SELECT doc_id,
               len({_TOKENS})::BIGINT AS n_tokens_ws,
               len(list_filter(regexp_extract_all(text, '{pat}'),
                               x -> NOT regexp_matches(x, '^\\s+$')))::BIGINT
                 AS n_tokens_bpe
        FROM documents
    """


def doc_quality(documents: DataFrame) -> DataFrame:
    """Per-doc quality features: token count, char count, mean token
    length, stopword hits/ratio, punctuation-ish char count.

    All ratios are single divisions of exact integers.
    """
    toks = _tokens_col()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks).cast("long")
    sum_tok_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    stop_hits = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("long")
    n_punct = (
        F.length(F.col("text"))
        - F.length(F.regexp_replace(F.col("text"), r"[.,;:!?]", ""))
    ).cast("long")
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_calc"),
        sum_tok_len.alias("sum_token_len"),
        F.when(n_tokens > 0, sum_tok_len / n_tokens)
        .otherwise(F.lit(0.0))
        .cast("double")
        .alias("avg_token_len"),
        stop_hits.alias("stop_hits"),
        F.when(n_tokens > 0, stop_hits / n_tokens)
        .otherwise(F.lit(0.0))
        .cast("double")
        .alias("stop_ratio"),
        n_punct.alias("n_punct"),
    )


def doc_quality_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
        WITH t AS (SELECT doc_id, text, {_TOKENS} AS toks FROM documents)
        SELECT
          doc_id,
          len(toks)::BIGINT AS n_tokens,
          length(text)::BIGINT AS n_chars_calc,
          coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT
            AS sum_token_len,
          CASE WHEN len(toks) > 0 THEN
            coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::DOUBLE
              / len(toks) ELSE 0.0 END AS avg_token_len,
          len(list_filter(toks, x -> list_contains([{stop_list}], x)))::BIGINT
            AS stop_hits,
          CASE WHEN len(toks) > 0 THEN
            len(list_filter(toks, x -> list_contains([{stop_list}], x)))::DOUBLE
              / len(toks) ELSE 0.0 END AS stop_ratio,
          (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::BIGINT
            AS n_punct
        FROM t
    """


def lang_profile(documents: DataFrame) -> DataFrame:
    """Per-language corpus profile (integer-exact aggregates)."""
    return (
        documents.select("lang", "n_chars", F.size(_tokens_col()).alias("ntok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum("ntok").cast("long").alias("sum_tokens"),
        )
        .withColumn(
            "avg_chars",
            (F.col("sum_chars").cast("double") / F.col("n_docs")).alias(
                "avg_chars"
            ),
        )
    )


def lang_profile_sql() -> str:
    return f"""
        SELECT lang,
               count(*)::BIGINT AS n_docs,
               sum(n_chars)::BIGINT AS sum_chars,
               sum(len({_TOKENS}))::BIGINT AS sum_tokens,
               sum(n_chars)::DOUBLE / count(*) AS avg_chars
        FROM documents
        GROUP BY lang
    """


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language-ID heuristic: count hits per language's
    marker list; predict the argmax (ties break in the fixed lang order).
    """
    toks = _tokens_col()
    cols = [F.col("doc_id")]
    for lg, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        cols.append(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
            .cast("long")
            .alias(f"{lg}_hits")
        )
    out = documents.select(*cols)
    langs = list(LANG_MARKERS)
    # pred = first lang (in the fixed order) whose hits equal the row max,
    # provided max > 0 — identical CASE semantics to the SQL twin
    mx = F.greatest(*[F.col(f"{lg}_hits") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):
        pred = F.when(
            (F.col(f"{lg}_hits") == mx) & (mx > 0), F.lit(lg)
        ).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def lang_id_sql() -> str:
    hit_cols = []
    for lg, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        hit_cols.append(
            f"len(list_filter(toks, x -> list_contains([{lst}], x)))::BIGINT AS {lg}_hits"
        )
    langs = list(LANG_MARKERS)
    mx = "greatest(" + ", ".join(f"{lg}_hits" for lg in langs) + ")"
    case = "CASE "
    for lg in langs:
        case += f"WHEN {lg}_hits = {mx} AND {mx} > 0 THEN '{lg}' "
    case += "ELSE 'und' END"
    return f"""
        WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
        h AS (SELECT doc_id, {', '.join(hit_cols)} FROM t)
        SELECT doc_id, {', '.join(f'{lg}_hits' for lg in langs)},
               {case} AS pred_lang
        FROM h
    """


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Normalization-invariant document fingerprint: md5 of the
    whitespace-normalized text (token stream joined by single spaces)."""
    return documents.select(
        "doc_id",
        F.md5(F.concat_ws(" ", _tokens_col())).alias("fingerprint"),
    )


def doc_fingerprint_sql() -> str:
    return f"""
        SELECT doc_id,
               md5(array_to_string({_TOKENS}, ' ')) AS fingerprint
        FROM documents
    """
