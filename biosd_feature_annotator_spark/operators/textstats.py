"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All four are pure Catalyst column expressions (no UDFs) — they compose
into any scan without leaving whole-stage codegen, which is what makes
them viable as a pre-filter pass over 100 TB of raw text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import norm_text_col

# tiny per-language marker lexicons (n-gram/stopword heuristic). The point
# is the *plumbing* (argmax over per-language evidence, columnar); swap in
# real fastText-style models via a pandas UDF when available.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "por"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "他"],
}


def tokens_col(text) -> Column:
    return F.filter(F.split(norm_text_col(text), r"\s+"), lambda t: F.length(t) > 0)


def token_count(text) -> Column:
    """Whitespace token count; 0 for blank/NULL."""
    return F.coalesce(F.size(tokens_col(text)), F.lit(0)).cast("long")


def bpe_ish_token_count(text) -> Column:
    """Sub-word-ish token estimate: word pieces + digit runs + punctuation
    as separate tokens (a BPE-shaped regex, not a trained BPE)."""
    return F.coalesce(
        F.size(F.regexp_extract_all(text, F.lit(r"([A-Za-z]{1,6}|\d+|[^\sA-Za-z\d])"), 1)),
        F.lit(0),
    ).cast("long")


def lang_scores(text) -> Column:
    """map<lang, matches>: per-language marker hits among the doc tokens."""
    toks = tokens_col(text)
    entries = [
        F.struct(
            F.lit(lang).alias("key"),
            F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))).alias("value"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    return F.map_from_entries(F.array(*entries))


def detect_lang(text) -> Column:
    """argmax over per-language marker hits; deterministic tie-break =
    first language (lexicographic) reaching the max; 'und' when no marker
    hits at all.

    The token array (a regexp_replace + split — the dominant per-row cost)
    is bound ONCE as a higher-order-function lambda variable instead of
    being re-evaluated per language: the old when-chain re-ran tokens_col
    5×/row because Catalyst does not reliably CSE across a when cascade.
    The fold's accumulator is likewise a lambda variable, so referencing
    it in both branches of the comparison costs nothing."""
    init = F.struct(F.lit(0).alias("score"), F.lit("und").alias("lang"))

    def entries(tk) -> Column:
        return F.array(*[
            F.struct(
                F.size(
                    F.array_intersect(
                        tk, F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
                    )
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_MARKERS)
        ])

    best = F.aggregate(
        F.array(tokens_col(text)),  # single-element wrapper: binds toks once
        init,
        lambda acc, tk: F.aggregate(
            entries(tk),
            acc,
            lambda b, x: F.when(x["score"] > b["score"], x).otherwise(b),
        ),
    )
    return best["lang"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition features + a composite
    quality score in [0,1]. Thresholds are deliberately simple and
    documented — the value is the columnar shape."""
    t = F.col(text_col)
    n_chars = F.coalesce(F.length(t), F.lit(0))
    n_toks = token_count(t)
    toks = tokens_col(t)
    n_distinct = F.coalesce(F.size(F.array_distinct(toks)), F.lit(0))
    punct = F.coalesce(F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", "")), F.lit(0))
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(m) for m in LANG_MARKERS["en"]]))
    )
    mean_tok_len = F.when(n_toks > 0, (n_chars - (n_toks - 1)) / n_toks).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n_toks > 0, n_distinct / n_toks).otherwise(F.lit(0.0))
    score = (
        F.when(n_toks < 5, 0.0).otherwise(1.0) * 0.25
        + F.when((mean_tok_len >= 2.5) & (mean_tok_len <= 12), 1.0).otherwise(0.0) * 0.25
        + F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0) * 0.2
        + F.least(distinct_ratio * 2, F.lit(1.0)) * 0.3
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_toks.alias("q_tokens"),
        F.round(mean_tok_len, 6).alias("q_mean_tok_len"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(distinct_ratio, 6).alias("q_distinct_ratio"),
        F.round(score, 6).alias("q_score"),
    )


def doc_fingerprint(text) -> Column:
    """Stable content fingerprint of the normalized text (md5 hex)."""
    return F.md5(norm_text_col(text))


def winnow_fingerprints(text, k: int = 8, keep: int = 4, hasher: str = "xx") -> Column:
    """Winnowing-style robust fingerprint: bottom-`keep` hashes over the
    char k-gram set — stable under small edits. Pure array algebra.
    hasher="md5" swaps in the engine-portable kernel (dedup.hash64) so a
    SQL oracle can recompute the identical fingerprint."""
    from .dedup import hash64

    t = norm_text_col(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - k + 1, F.lit(1))),
        lambda i: hash64(F.substring(t, i, F.lit(k)), hasher=hasher),
    )
    return F.slice(F.array_sort(F.array_distinct(grams)), 1, keep)
