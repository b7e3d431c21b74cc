"""Text-analysis column expressions (whole-stage codegen, no UDFs).

Every function returns a pure Spark column expression built from
``pyspark.sql.functions`` so the hot path stays JVM-side; each has an
exactly-matching DuckDB SQL fragment (``duck_*``) so oracle queries can
reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small, fixed stopword list shared by quality scoring and language ID.
STOPWORDS_EN = ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for")

# Marker words per language for the n-gram/stopword language-ID heuristic.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "que", "de", "los"),
}

# BPE-ish tokenizer: words, numbers, or single non-space symbols.
BPEISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace, trim — canonical form for dedup."""
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


def duck_normalize_text(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"


def tokenize_ws(col: Column) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalize_text(col), " ")


def tokenize_bpeish(col: Column) -> Column:
    """BPE-ish regex tokenization: letter runs, digit runs, single symbols."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPEISH_PATTERN), 0)


def char_ngrams(col: Column, n: int = 5) -> Column:
    """Character n-grams (shingles) of normalized text → array<string>.

    Pure expression: substring over a generated offset sequence — stays in
    codegen, no Python. Returns an empty array for texts shorter than n.
    """
    norm = normalize_text(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.length(norm) - (n - 1)),
        lambda i: norm.substr(i, F.lit(n)),
    )
    # Spark's sequence(1, k) with k < 1 counts DOWN — guard short texts.
    return F.when(F.length(norm) >= n, grams).otherwise(F.array().cast("array<string>"))


def duck_char_ngrams(expr: str, n: int = 5) -> str:
    norm = duck_normalize_text(expr)
    return (
        f"list_transform(range(1, greatest(length({norm}) - {n - 1}, 0) + 1), "
        f"i -> substr({norm}, i, {n}))"
    )


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are punctuation/symbols."""
    stripped = F.regexp_replace(col, "[a-zA-Z0-9\\s]", "")
    return F.when(F.length(col) > 0, F.length(stripped) / F.length(col)).otherwise(F.lit(0.0))


def duck_punct_ratio(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) > 0 THEN "
        f"length(regexp_replace({expr}, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0 / length({expr}) "
        f"ELSE 0.0 END"
    )


def upper_ratio(col: Column) -> Column:
    """Fraction of characters that are uppercase letters."""
    uppers = F.length(F.regexp_replace(col, "[^A-Z]", ""))
    return F.when(F.length(col) > 0, uppers / F.length(col)).otherwise(F.lit(0.0))


def duck_upper_ratio(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) > 0 THEN "
        f"length(regexp_replace({expr}, '[^A-Z]', '', 'g')) * 1.0 / length({expr}) "
        f"ELSE 0.0 END"
    )


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    toks = tokenize_ws(col)
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_sw / F.size(toks)).otherwise(F.lit(0.0))


def duck_stopword_ratio(expr: str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> str:
    toks = f"string_split({duck_normalize_text(expr)}, ' ')"
    sw = "[" + ", ".join(f"'{w}'" for w in stopwords) + "]"
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"len(list_filter({toks}, t -> list_contains({sw}, t))) * 1.0 / len({toks}) "
        f"ELSE 0.0 END"
    )


def lang_score(col: Column, markers: tuple[str, ...]) -> Column:
    """Count of marker-word occurrences among whitespace tokens."""
    toks = tokenize_ws(col)
    mk = F.array(*[F.lit(w) for w in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(mk, t)))


def duck_lang_score(expr: str, markers: tuple[str, ...]) -> str:
    toks = f"string_split({duck_normalize_text(expr)}, ' ')"
    mk = "[" + ", ".join(f"'{w}'" for w in markers) + "]"
    return f"len(list_filter({toks}, t -> list_contains({mk}, t)))"


# --- PII scrubbing -----------------------------------------------------------
#
# Training-data redaction: the standard pre-release pass over a web
# corpus. Patterns are RE2-compatible (no backreferences/lookaround) so
# the same regexes run on any engine; all column expressions, no UDFs.

PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

# Replacement order matters: emails first (an address contains no phone/
# IP match but an IP-like fragment can sit inside a hostname), then
# phones, then IPs.
_PII_ORDER = ("email", "phone", "ipv4")


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (email | phone | ipv4)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind]))


def scrub_pii(col: Column) -> Column:
    """Redact emails/phones/IPv4s with typed placeholder tokens."""
    out = col
    for kind in _PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return out
