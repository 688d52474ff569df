"""Text-analysis operators for training-data pipelines — language ID,
quality scoring, token counting, document fingerprinting.  All pure
Column expressions (JVM, codegen) so they run at scan speed; the
patterns are deliberately simple, deterministic heuristics (the point
is the distributed plumbing, not SOTA langid)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword inventories per language → n-gram-free heuristic langid
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "de", "que", "los", "y"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "des", "est", "une"],
}


def token_count(text: Column) -> Column:
    """Whitespace tokens."""
    return F.size(F.split(F.trim(text), "\\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword estimate: word-boundary pieces + digit runs +
    punctuation, via regexp count ≈ GPT-style token count heuristic."""
    pieces = F.regexp_count(text, F.lit(r"[A-Za-z]+|\d|[^\sA-Za-z\d]"))
    return pieces


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = F.split(F.lower(F.trim(text)), "\\s+")
    markers = _LANG_MARKERS[lang]
    hits = F.size(F.array_intersect(F.array_distinct(words), F.array(*[F.lit(m) for m in markers])))
    # ratio of marker vocabulary present (0..1) — robust to doc length
    return hits / F.lit(float(len(markers)))


def detect_language(text: Column) -> Column:
    """Heuristic langid: score = count of language-marker words present;
    argmax across languages, 'und' if all zero."""
    words = F.array_distinct(F.split(F.lower(F.trim(text)), "\\s+"))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        s = F.size(F.array_intersect(words, F.array(*[F.lit(m) for m in markers])))
        scores.append(F.struct(s.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """[0,1] document-quality heuristic: mean of
    - length score  (saturating at 200 chars)
    - alpha ratio   (alphabetic chars / all chars)
    - word-length sanity (mean word length in [3, 12])
    """
    n_chars = F.length(text)
    len_score = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    words = F.split(F.trim(text), "\\s+")
    mean_wlen = F.when(F.size(words) > 0, n_chars / F.size(words)).otherwise(F.lit(0.0))
    wlen_score = F.when((mean_wlen >= 3) & (mean_wlen <= 12), F.lit(1.0)).otherwise(F.lit(0.3))
    return (len_score + alpha_ratio + wlen_score) / F.lit(3.0)


def fingerprint(text: Column, window: int = 8) -> Column:
    """Winnowing-style document fingerprint: min rolling hash over
    ``window``-word windows of the normalized text — a single stable
    64-bit id robust to local edits."""
    words = F.split(F.lower(F.trim(text)), "\\s+")
    n = F.size(words)
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, window))),
    )
    return F.array_min(windows)


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document stat frame: all metrics in one narrow
    projection (single scan, no shuffle)."""
    t = F.col(text_col)
    return docs.withColumns(
        {
            "tokens": token_count(t),
            "bpe_tokens": bpe_ish_token_count(t),
            "detected_lang": detect_language(t),
            "quality": quality_score(t),
            "fp": fingerprint(t),
        }
    )
