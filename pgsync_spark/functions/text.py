"""Text-analysis operators over the `documents` table: token counting,
quality scoring, language ID, document fingerprinting.

All pure Column expressions (JVM-side, codegen) — no Python in the hot
path; linear in input size, embarrassingly parallel, no shuffles except
final aggregation-free projection. Each has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import (h32, h32_sql, perm, perm_sql, round6, round6_sql, shingles, shingles_sql, tokens, tokens_sql)

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "für", "auf", "ein"],
    "fr": ["le", "la", "et", "les", "des", "en", "un", "du", "que", "pour"],
}


def text_stats(df: DataFrame) -> DataFrame:
    """Token count, distinct count, avg word length, quality score.

    quality = 0.4·min(1, n/100) + 0.3·uniq_ratio + 0.3·min(1, avg_len/8)
    — all double arithmetic with a fixed evaluation order so the oracle
    reproduces it bit-for-bit.
    """
    tok = tokens(F.col("text"))
    n = F.size(tok).cast("double")
    uniq = F.size(F.array_distinct(tok)).cast("double")
    avg_len = F.aggregate(
        tok, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
    ) / F.nullif(n, F.lit(0.0))
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(100.0))
        + F.lit(0.3) * (uniq / F.nullif(n, F.lit(0.0)))
        + F.lit(0.3) * F.least(F.lit(1.0), avg_len / F.lit(8.0))
    )
    return df.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_uniq_tokens"),
        round6(avg_len).alias("avg_token_len"),
        round6(quality).alias("quality"),
    )


def text_stats_sql() -> str:
    tok = tokens_sql("text")
    n = f"CAST(len(toks) AS DOUBLE)"
    uniq = "CAST(len(list_distinct(toks)) AS DOUBLE)"
    avg_len = (
        "list_reduce(list_prepend(0.0, list_transform(toks, "
        "x -> CAST(length(x) AS DOUBLE))), (a, b) -> a + b) / nullif(" + n + ", 0.0)"
    )
    quality = (
        f"0.4 * least(1.0, {n} / 100.0) + 0.3 * ({uniq} / nullif({n}, 0.0)) "
        f"+ 0.3 * least(1.0, ({avg_len}) / 8.0)"
    )
    return f"""
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_uniq_tokens,
               {round6_sql(avg_len)} AS avg_token_len,
               {round6_sql(quality)} AS quality
        FROM (SELECT doc_id, {tok} AS toks FROM documents)
    """


def lang_id(df: DataFrame) -> DataFrame:
    """Stopword-hit language ID with deterministic tiebreak (score desc,
    language code asc). The declared `lang` column rides along so accuracy
    can be inspected; prediction depends only on `text`."""
    tok = F.array_distinct(tokens(F.col("text")))
    scores = [
        F.size(F.array_intersect(tok, F.array(*[F.lit(w) for w in ws]))).alias(
            f"score_{lang}"
        )
        for lang, ws in STOPWORDS.items()
    ]
    scored = df.select("doc_id", "lang", *scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in STOPWORDS])
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "doc_id", "lang", pred.alias("pred_lang"), best.alias("best_score")
    )


def lang_id_sql() -> str:
    tok = f"list_distinct({tokens_sql('text')})"
    # literal lists: ['the','and',...]
    score_cols = ", ".join(
        "len(list_intersect(toks, ["
        + ", ".join("'" + w.replace("'", "''") + "'" for w in ws)
        + f"])) AS score_{lang}"
        for lang, ws in STOPWORDS.items()
    )
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in STOPWORDS) + ")"
    pred = "'und'"
    for lang in sorted(STOPWORDS, reverse=True):
        pred = f"CASE WHEN score_{lang} = best AND best > 0 THEN '{lang}' ELSE {pred} END"
    return f"""
        SELECT doc_id, lang, {pred} AS pred_lang, best AS best_score
        FROM (
          SELECT doc_id, lang, {best} AS best, *
          FROM (SELECT doc_id, lang, {score_cols}
                FROM (SELECT doc_id, lang, {tok} AS toks FROM documents))
        )
    """


def fingerprint(df: DataFrame) -> DataFrame:
    """Document fingerprints: exact content hash (md5 of lowercased
    text), and a 1-permutation min-shingle hash — the rolling-hash
    fingerprint family (content-defined, stable under suffix edits)."""
    tok = tokens(F.col("text"))
    sh = shingles(tok, 3)
    minsh = F.array_min(F.transform(sh, lambda s: perm(h32(s), 0)))
    return df.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("content_hash"),
        minsh.alias("min_shingle_hash"),
    )


def fingerprint_sql() -> str:
    tok = tokens_sql("text")
    sh = shingles_sql("toks", 3)
    minsh = f"list_min(list_transform(sh, s -> {perm_sql(h32_sql('s'), 0)}))"
    return f"""
        SELECT doc_id, md5(lower(text)) AS content_hash,
               {minsh} AS min_shingle_hash
        FROM (SELECT doc_id, text, {sh} AS sh
              FROM (SELECT doc_id, text, {tok} AS toks FROM documents))
    """
