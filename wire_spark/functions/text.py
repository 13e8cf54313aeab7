"""Text-analysis column builders (tokenization, quality, lang-ID,
fingerprinting) — the expressions behind the oracle-gated catalog
queries in wire_spark/queries/text.py, importable for any DataFrame.

All pure `pyspark.sql.functions` — no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: language marker words for the n-gram-heuristic lang-ID
LANG_MARKERS = {
    "en": r"\b(?:the|a|of|and|in)\b",
    "es": r"\b(?:el|los|una|que)\b",
    "fr": r"\b(?:le|les|une|est)\b",
    "de": r"\b(?:der|und|ein|ist)\b",
}

STOPWORD_PATTERN = LANG_MARKERS["en"]
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


_AZ_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_AZ_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(text: Column | str) -> Column:
    """Locale-free ASCII case fold for EXACT pipelines (hashing,
    dedup fingerprints, token identity, group keys).

    Unicode lower() is engine-dependent — measured r10: Java (Spark)
    lowers word-final Σ to ς and İ to i+combining-dot, DuckDB's
    utf8proc gives σ and bare i — so any cross-engine-compared
    normalization must fold only A-Z.  Mirror in SQL with
    translate(text, 'A..Z', 'a..z')."""
    return F.translate(text, _AZ_UPPER, _AZ_LOWER)


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokens (regexp, no split-artifact empties)."""
    return F.regexp_extract_all(text, F.lit(r"\S+"), 0)


def bpe_tokens(text: Column | str) -> Column:
    """BPE-ish pre-tokenization: letter runs | digit runs | single
    punctuation — the standard byte-pair pre-split shape."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def stopword_tokens(text: Column | str, pattern: str = STOPWORD_PATTERN) -> Column:
    return F.regexp_extract_all(text, F.lit(pattern), 0)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-hit counts per language."""
    return {
        lang: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for lang, pat in LANG_MARKERS.items()
    }


def quality_score(text: Column | str, n_chars: Column | str) -> Column:
    """0.4*length + 0.3*lexical-diversity + 0.3*stopword-signal
    (heuristic-filter shape: cheap proxies for document quality).

    Zero-token documents score NULL: the token-count denominator is
    nullif-guarded because Spark 4 (ANSI) raises DIVIDE_BY_ZERO even
    for DOUBLE 0/0 while DuckDB NULL-bands — the unicode-sweep
    divergence class (empty / whitespace-only text)."""
    toks = ws_tokens(text)
    n = F.nullif(F.size(toks), F.lit(0))
    chars = F.col(n_chars) if isinstance(n_chars, str) else n_chars
    length_score = F.least(F.lit(1.0), chars / F.lit(500.0))
    diversity = F.size(F.array_distinct(toks)) * F.lit(1.0) / n
    stop_ratio = F.size(stopword_tokens(text)) * F.lit(1.0) / n
    return F.lit(0.4) * length_score + F.lit(0.3) * diversity + F.lit(0.3) * stop_ratio


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 of whitespace-normalized,
    ASCII-case-folded text (see ascii_lower for why not lower())."""
    return F.md5(ascii_lower(F.regexp_replace(text, r"\s+", " ")))
