"""Text-analysis operators: tokenization stats, quality scoring, language
identification, document fingerprinting.

Everything is built from JVM-side ``pyspark.sql.functions`` expressions —
no Python UDFs anywhere in this module, so the whole pipeline stays inside
whole-stage codegen and scales linearly with the corpus (100 TB = a single
scan + narrow projections; zero shuffles for per-document ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword inventories for the n-gram/stopword heuristic
#: language ID. Deliberately small & fixed: determinism beats coverage here
#: (a real deployment would swap in fastText-style models via mapInPandas).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "en", "por", "que"],
}


def _count_matches(col: Column, words: list[str]) -> Column:
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))


def tokens(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column) -> Column:
    """Whitespace token count (the BPE-ish regex variant is
    :func:`subword_count`)."""
    return F.size(tokens(col)).cast("bigint")


def subword_count(col: str | Column) -> Column:
    """BPE-flavored token estimate: split on word boundaries AND digit/alpha
    transitions — counts sub-lexical units the way byte-pair encoders
    roughly do, without a vocab."""
    c = F.col(col) if isinstance(col, str) else col
    pat = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
    return F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("bigint")


def _quality_ratios(t: Column) -> dict[str, Column]:
    """The ratio sub-expressions shared by :func:`quality_features` (as
    named columns) and :func:`quality_score_expr` (inline) — one source
    of truth so the inline gate and the join-based operator can never
    drift apart."""
    n_chars = F.length(t).cast("bigint")
    n_tok = F.size(F.split(F.trim(t), r"\s+")).cast("bigint")
    n_punct = F.length(F.regexp_replace(t, r"[^.!?,;:]", "")).cast("bigint")
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", "")).cast("bigint")
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("bigint")
    n_stop = _count_matches(t, LANG_STOPWORDS["en"]).cast("bigint")
    nonspace = F.length(F.regexp_replace(t, r"\s+", "")).cast("bigint")
    return {
        "n_chars_calc": n_chars,
        "n_tokens": n_tok,
        "punct_ratio": (n_punct / n_chars).cast("double"),
        "upper_ratio": (n_upper / n_chars).cast("double"),
        "digit_ratio": (n_digit / n_chars).cast("double"),
        "stopword_ratio": (n_stop / n_tok).cast("double"),
        "mean_token_len": (nonspace / n_tok).cast("double"),
    }


def _quality_combine(stopword_ratio: Column, mean_token_len: Column,
                     punct_ratio: Column) -> Column:
    """Score combiner shared by :func:`quality_score` (over feature
    columns) and :func:`quality_score_expr` (over inline ratios)."""
    return (
        F.least(stopword_ratio * 4, F.lit(1.0)) * 0.5
        + F.when((mean_token_len >= 3) & (mean_token_len <= 10), 0.3).otherwise(0.0)
        + F.when(punct_ratio <= 0.1, 0.2).otherwise(0.0)
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features (length / punctuation / stopword /
    uppercase / digit ratios + mean token length). One narrow projection."""
    ratios = _quality_ratios(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[expr.alias(name) for name, expr in ratios.items()],
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Scalar quality score in [0,1]: stopword presence up-weights,
    punctuation/digit excess down-weights — the standard cheap pre-filter
    shape (cf. Gopher/C4 heuristics)."""
    feats = quality_features(df, text_col, id_col)
    score = _quality_combine(F.col("stopword_ratio"),
                             F.col("mean_token_len"), F.col("punct_ratio"))
    return feats.select(id_col, score.cast("double").alias("quality"))


def quality_score_expr(text_col: str | Column = "text") -> Column:
    """:func:`quality_score`'s score as a single inline Column over the
    raw text — the collapsed form Catalyst produces anyway, exposed for
    pipelines that GATE on quality without emitting it (r15): a filter
    on an inline expression needs no join-back, so the plan does not
    embed a second copy of everything upstream of the gate (the r14
    pipeline_pretraining plan carried three copies of the dedup+decontam
    chain, one per joined-back gate column). Same sub-expressions as
    :func:`quality_features` via ``_quality_ratios``; equality pinned by
    ``test_quality_score_expr_matches_operator``."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    ratios = _quality_ratios(t)
    return _quality_combine(ratios["stopword_ratio"],
                            ratios["mean_token_len"],
                            ratios["punct_ratio"]).cast("double")


def _language_votes(t: Column) -> tuple[Column, Column]:
    """(pick, best) of the stopword vote — shared by :func:`language_id`
    and :func:`language_pick_expr`."""
    counts = {lang: _count_matches(t, words) for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*counts.values())
    pick = F.lit("und")
    for lang in reversed(list(counts)):  # earlier languages win ties
        pick = F.when(counts[lang] == best, F.lit(lang)).otherwise(pick)
    pick = F.when(best == 0, F.lit("und")).otherwise(pick)
    return pick, best


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-voting language ID over a fixed language set. Ties resolve
    in LANG_STOPWORDS declaration order; zero hits => 'und' (undetermined).
    Pure expression — no UDF, no shuffle."""
    pick, best = _language_votes(F.col(text_col))
    return df.select(
        F.col(id_col),
        pick.alias("lang_pred"),
        best.cast("bigint").alias("stopword_hits"),
    )


def language_pick_expr(text_col: str | Column = "text") -> Column:
    """:func:`language_id`'s ``lang_pred`` as a single inline Column —
    the join-free gate twin of :func:`quality_score_expr` (r15)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    pick, _ = _language_votes(t)
    return pick


def norm_tokens(col: str | Column) -> Column:
    """Token array of the canonical normalization (lowercase, strip
    non-alphanumerics, whitespace-delimited) in ONE cheap pass: split on
    whitespace FIRST, strip each short token, drop the ones that were
    all punctuation. Provably the same token sequence as splitting the
    old ``normalized()`` string — punctuation removal never introduces
    a split, so cleaning per whitespace-chunk commutes with splitting —
    and measured r13 at sf10 (250k docs, ~250 MB of text, 32 cores):
    the old whole-text negated-class ``regexp_replace`` cost **16.2 s**
    (Matcher.replaceAll allocation churn dominates every shingle-path
    profile), the per-token strip **1.0 s**. NULL in, NULL out (split
    of NULL propagates)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(F.trim(F.lower(c)), r"\s+"),
                    lambda t: F.regexp_replace(t, r"[^a-z0-9]", "")),
        lambda t: t != "")


def normalized(col: str | Column) -> Column:
    """Canonical text normalization shared by fingerprint + dedup:
    lowercase, strip non-alphanumerics, collapse whitespace — the
    single-space join of :func:`norm_tokens` (r13: rebuilt on the
    per-token strip; byte-identical output, ~15x cheaper). NULL guard
    because ``concat_ws`` maps a NULL array to ''."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None)).otherwise(
        F.concat_ws(" ", norm_tokens(c)))


def fingerprint(col: str | Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text.
    (A rolling/Karp-Rabin hash variant is in dedup.simhash64 — this one is
    the exact-canonical fingerprint used for dedup keys.)"""
    return F.md5(F.encode(normalized(col), "UTF-8"))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition signals (the Gopher-style "excessive
    repetition" quality rules): distinct-token ratio, most-frequent-token
    fraction, most-frequent-bigram fraction.

    Pure array expressions over the whitespace token list — the per-token
    counting is O(distinct x tokens) INSIDE one row (documents are bounded;
    ~hundreds of tokens), so the operator is still one narrow projection:
    zero shuffles, zero UDFs, linear in the corpus."""
    toks = tokens(text_col)
    n = F.size(toks)
    # count of each distinct token via filter-within-row; max count on top
    top_tok = F.array_max(F.transform(
        F.array_distinct(toks),
        lambda t: F.size(F.filter(toks, lambda x: x == t)),
    ))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    nb = F.size(bigrams)
    top_bg = F.array_max(F.transform(
        F.array_distinct(bigrams),
        lambda t: F.size(F.filter(bigrams, lambda x: x == t)),
    ))
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / n).alias("distinct_ratio"),
        (top_tok.cast("double") / n).alias("top_token_frac"),
        F.when(nb > 0, top_bg.cast("double") / nb)
        .otherwise(F.lit(None).cast("double")).alias("top_bigram_frac"),
    )


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-stop per-document profile: token counts + fingerprint + langid."""
    lang = language_id(df, text_col, id_col)
    qual = quality_features(df, text_col, id_col)
    base = df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens_ws"),
        subword_count(text_col).alias("n_subwords"),
        fingerprint(text_col).alias("fingerprint"),
    )
    return base.join(lang, id_col).join(qual, id_col)
