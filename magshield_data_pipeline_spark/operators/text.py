"""Text-analysis operators for training-data pipelines (SURVEY §2.10 [EXT]).

All hot-path logic is JVM-side column expressions (regexp engines, hash
functions) — no Python UDFs — so profiling a 100 TB corpus is a single
scan with whole-stage codegen, shuffling nothing unless the caller
aggregates.

Design notes for scale:
- every helper is a per-row expression → embarrassingly parallel, no
  exchange introduced;
- ``document_profile`` composes them into one projection so the corpus
  is read once;
- fingerprints are MD5 of normalized text — an exact-dup key that also
  serves as the shuffle key for exact dedup at scale (uniform, no skew).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Per-language marker words for the n-gram language-ID heuristic.
# Deliberately tiny and deterministic: a real deployment would swap in a
# fastText-style model via mapInPandas; the engine-side contract (one
# scan, one projection, no shuffle) stays identical.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "des", "est"),
    "de": ("der", "die", "das", "und", "ist"),
}

STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count(text: Column | str) -> Column:
    """Whitespace token count. ``split`` on ``\\s+`` after trim; empty
    string counts as 1 token ('' survives the split) — consistent with
    the DuckDB oracle's regexp_split_to_array semantics."""
    return F.size(F.split(F.trim(_col(text)), r"\s+"))


def char_count(text: Column | str) -> Column:
    return F.length(_col(text))


# BPE-ish pre-tokenizer: letter runs, single digits, single punctuation
# marks — the split shape GPT-2-style byte-pair encoders apply before
# merging. A real tokenizer would run as a self-contained pandas UDF;
# this regex keeps token statistics JVM-side and oracle-checkable.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def subtoken_count(text: Column | str) -> Column:
    """BPE-ish subtoken count (letter runs + digits + punctuation)."""
    return F.regexp_count(_col(text), F.lit(BPE_ISH_PATTERN))


def word_match_count(text: Column | str, word: str) -> Column:
    """Occurrences of *word* as a whole word (case-insensitive). The word
    is matched literally (regex-escaped)."""
    return F.regexp_count(F.lower(_col(text)), F.lit(rf"\b{re.escape(word)}\b"))


def stopword_count(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    pattern = r"\b(" + "|".join(re.escape(w) for w in stopwords) + r")\b"
    return F.regexp_count(F.lower(_col(text)), F.lit(pattern))


def punct_count(text: Column | str) -> Column:
    return F.regexp_count(_col(text), F.lit(r"[.,;:!?]"))


def quality_score(text: Column | str) -> Column:
    """Length/stopword/punctuation quality heuristic in [0,1]:
    mean of (stopword ratio capped at 0.4)/0.4, presence-of-punct, and a
    length band (50..5000 chars). The exact recipe is a placeholder for a
    production scorer; the engine contract is 'pure projection'."""
    t = _col(text)
    tokens = token_count(t).cast("double")
    stop_ratio = F.least(stopword_count(t) / F.greatest(tokens, F.lit(1.0)), F.lit(0.4)) / 0.4
    has_punct = F.when(punct_count(t) > 0, 1.0).otherwise(0.0)
    len_band = F.when((char_count(t) >= 50) & (char_count(t) <= 5000), 1.0).otherwise(0.0)
    return F.round((stop_ratio + has_punct + len_band) / 3.0, 4)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-word hit count per language."""
    t = F.lower(_col(text))
    out = {}
    for lang, words in LANG_MARKERS.items():
        pattern = r"\b(" + "|".join(re.escape(w) for w in words) + r")\b"
        out[lang] = F.regexp_count(t, F.lit(pattern))
    return out


def lang_id(text: Column | str, default: str = "und") -> Column:
    """Pick the language with the highest marker count (ties broken by
    language-code order, zero hits → *default*). Deterministic, so it is
    oracle-checkable; swap for a model UDF without changing the plan
    shape."""
    scores = lang_scores(text)
    best_lang = F.lit(default)
    best_score = F.lit(0)
    for lang in sorted(scores):  # later entries win only on strict >
        s = scores[lang]
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    trim."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: MD5 of the normalized text. Exact-dup key;
    also the uniform shuffle key for dedup at 100 TB."""
    return F.md5(normalize_text(text))


def document_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """One-scan profile: tokens, chars, stopword/punct counts, quality,
    language guess, fingerprint. ``keep`` names extra source columns to
    carry through (still one scan — no join-back needed downstream)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        token_count(t).alias("n_tokens"),
        subtoken_count(t).alias("n_subtokens"),
        char_count(t).alias("n_chars_computed"),
        stopword_count(t).alias("n_stopwords"),
        punct_count(t).alias("n_punct"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_guess"),
        fingerprint(t).alias("fp"),
    )
