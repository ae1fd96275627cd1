"""Text analysis for training-data pipelines: tokenization, quality
scoring, language ID, fingerprinting — all JVM-side expressions (no
UDFs), so they run inside whole-stage codegen at scan speed.

Reference capability donors: fail-reason gate strings
(/root/reference/src/rad_ecg/scripts/peak_detect_v4.py:208-233), SQI
quality metrics (peak_detect_v4.py:132-233) re-expressed for text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny public stopword seeds per language for the n-gram/marker heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "nicht"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def words(col: Column) -> Column:
    """Lower-cased alphanumeric word array (deterministic, engine-portable
    semantics: split on one-or-more non-alphanumerics, drop empties)."""
    return F.filter(
        F.split(F.lower(col), r"[^a-z0-9]+"), lambda w: w != F.lit("")
    )


def n_tokens(col: Column, ws: Column | None = None) -> Column:
    """Word count. Pass ``ws`` (a precomputed ``words(col)`` column) when
    several metrics share one projection — the split is by far the most
    expensive part of every word-level metric, and naming it as a column
    computes it ONCE per row instead of once per metric (measured 2.4x
    on the doc_stats profile at sf0.1)."""
    return F.size(words(col) if ws is None else ws)


# Engine-independent whitespace class: Java regex \s includes U+000B
# (vertical tab) but RE2's \s does not, so any \s shared between a Spark
# expression and its DuckDB oracle diverges on VT-bearing input. Spell
# the class out instead (the RE2 set, which both engines agree on).
WS_CLASS = r"[ \t\n\f\r]"

# GPT-2-style pre-tokenizer pattern (public: Radford et al. 2019 /
# openai/gpt-2 encoder.py), restricted to ASCII classes so Spark (Java
# regex) and DuckDB (RE2) match identically: contraction suffixes, then
# optionally-space-prefixed letter runs, digit runs, symbol runs, then
# leftover whitespace runs (explicit class — see WS_CLASS).
BPE_SPLIT_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 \t\n\f\r']+|"
    + WS_CLASS
    + r"+|'"
)


def n_tokens_bpe(col: Column) -> Column:
    """BPE-ish token count for LLM-cost estimation: number of GPT-2-style
    pre-tokenizer pieces (whitespace runs excluded — a single leading
    space attaches to its token, as in the original pattern)."""
    pieces = F.regexp_extract_all(F.lower(col), F.lit(BPE_SPLIT_RE), 0)
    return F.size(F.filter(pieces, lambda t: ~t.rlike("^" + WS_CLASS + "+$")))


def punct_count(col: Column) -> Column:
    """Number of punctuation characters (.,!?;:)."""
    return F.length(col) - F.length(F.regexp_replace(col, r"[.,!?;:]", ""))


def stopword_count(col: Column, ws: Column | None = None) -> Column:
    src = words(col) if ws is None else ws
    return F.size(F.filter(src, lambda w: w.isin(*STOPWORDS_EN)))


def marker_count(col: Column, lang: str, ws: Column | None = None) -> Column:
    """Occurrences of a language's marker words."""
    src = words(col) if ws is None else ws
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(src, lambda w: w.isin(*markers)))


def lang_id(col: Column, ws: Column | None = None) -> Column:
    """Heuristic language ID: argmax of marker-word hits, ties broken by
    language code order; 'und' when no marker hits at all."""
    pairs = F.array(
        *[
            F.struct(
                (-marker_count(col, lg, ws)).alias("neg_hits"),
                F.lit(lg).alias("lg"),
            )
            for lg in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_min(pairs)
    return F.when(best["neg_hits"] == 0, F.lit("und")).otherwise(best["lg"])


def quality_score(col: Column, ws: Column | None = None) -> Column:
    """Integer 0-100 quality score from length/punct/stopword signals —
    arithmetic only, so the DuckDB oracle can reproduce it exactly."""
    nt = n_tokens(col, ws)
    chars = F.length(col)
    # each signal contributes 0..25; floor() keeps double->int conversion
    # identical across engines (Spark cast truncates, DuckDB cast rounds)
    len_pts = F.least(F.lit(25), F.floor(nt * 25 / F.lit(40)).cast("int"))
    char_pts = F.least(F.lit(25), F.floor(chars * 25 / F.lit(300)).cast("int"))
    stop_pts = F.least(
        F.lit(25), F.floor(stopword_count(col, ws) * 25 / F.lit(5)).cast("int")
    )
    punct_pts = F.least(
        F.lit(25), F.floor(punct_count(col) * 25 / F.lit(3)).cast("int")
    )
    return (len_pts + char_pts + stop_pts + punct_pts).alias("quality")


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowered text.
    Exact-dup key (content-defined, layout-insensitive). Explicit
    whitespace class (WS_CLASS) so the DuckDB oracle normalizes
    identically on all inputs, including vertical-tab."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), WS_CLASS + "+", " ")))
