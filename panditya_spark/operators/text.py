"""Text-analysis operators for training-data pipelines.

None of these exist in the reference (its text handling stops at label
formatting); they are the 100 TB-pipeline extensions required by the
build spec: language-ID, quality scoring, token counting, document
fingerprinting. Everything is built-in-function only (JVM, codegen) —
no Python in the hot path, so a 100 TB documents table streams through
scan→project with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A BPE-ish tokenizer regex: runs of letters, runs of digits, or a single
# non-space symbol — the standard pre-tokenization split used before BPE.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword anchors for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "que", "es"],
}


def words(text: Column) -> Column:
    """Whitespace tokenization → ARRAY<STRING>, empties dropped."""
    return F.filter(
        F.transform(F.split(F.trim(text), r"\s+"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def word_count(text: Column) -> Column:
    return F.size(words(text))


def token_count(text: Column) -> Column:
    """BPE-ish token count via the pre-tokenization regex."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[.,!?;:]"), F.lit(0)))


def stopword_ratio(text: Column, markers: list[str]) -> Column:
    """Fraction of words that are marker stopwords (single pass regex)."""
    pat = r"\b(" + "|".join(markers) + r")\b"
    hits = F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))
    n = word_count(text)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_features(text: Column) -> list[Column]:
    """Quality-scoring feature set: word count, BPE-ish token count,
    punctuation count, mean word length. Aliased for direct select()."""
    n_words = word_count(text)
    return [
        n_words.alias("n_words"),
        token_count(text).alias("n_tokens"),
        punct_count(text).alias("n_punct"),
        F.when(
            n_words > 0, F.length(F.regexp_replace(text, r"\s+", "")).cast("double") / n_words
        )
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
    ]


def lang_id(text: Column, threshold: float = 0.05) -> Column:
    """Heuristic language ID: the language whose marker-stopword ratio is
    highest, if above threshold; else 'und'. Deterministic tie-break by
    language code (struct array_max compares fields in order)."""
    scored = F.array(
        *[
            F.struct(
                stopword_ratio(text, m).alias("score"),
                # negative-lexicographic tiebreak not expressible cheaply;
                # array_max picks highest (score, lang) — ties go to the
                # lexicographically largest code, deterministically.
                F.lit(lang).alias("lang"),
            )
            for lang, m in LANG_MARKERS.items()
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] >= threshold, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of case-folded, whitespace-collapsed
    text. Stable across engines (both Spark and DuckDB emit lowercase
    hex md5), so near-identical formatting variants collide."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))
