"""Text-analysis expression builders for training-data pipelines.

Tokenization, shingling, quality stats, language-ID heuristics, and
document fingerprints — all as pure Column expressions (JVM-side,
whole-stage codegen, no Python in the row path), so a 100 TB documents
table costs one scan + projection.

Cross-engine notes: shingles use space-joined word k-grams; fingerprints
use lexicographic-min md5 of shingles (md5 hex is identical in Spark and
DuckDB, unlike murmur/xxhash which are engine-specific).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(_c(col)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def char_count(col: Column | str) -> Column:
    return F.length(_c(col)).cast("bigint")


def avg_token_length(col: Column | str) -> Column:
    """Mean token length, from exact integer counts (cross-engine stable)."""
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return total / F.size(toks)


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Space-joined word k-grams; whole text as one shingle if < k tokens."""
    toks = tokens(col)
    ngrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.when(F.size(toks) >= k, ngrams).otherwise(
        F.array(F.array_join(toks, " "))
    )


def distinct_shingles(col: Column | str, k: int = 3) -> Column:
    return F.array_distinct(word_shingles(col, k))


def word_passages(col: Column | str, size: int = 8) -> Column:
    """Non-overlapping ``size``-word chunks (the last may be shorter).

    The passage is the unit of sub-document dedup in training-data
    pipelines: boilerplate paragraphs repeat across documents whose full
    texts differ, so document-level hashing misses them entirely.
    """
    toks = tokens(col)
    n_chunks = F.ceil(F.size(toks) / size).cast("int")

    def chunk(k: Column) -> Column:
        return F.array_join(F.slice(toks, k * size + 1, size), " ")

    return F.when(
        F.size(toks) > 0,
        F.transform(F.sequence(F.lit(0), n_chunks - 1), chunk),
    ).otherwise(F.array().cast("array<string>"))


def stopword_hits(col: Column | str, stopwords: Sequence[str]) -> Column:
    """# tokens that are in the stopword list (exact match)."""
    return F.size(
        F.filter(tokens(col), lambda t: t.isin(*stopwords))
    ).cast("bigint")


def stopword_ratio(col: Column | str, stopwords: Sequence[str]) -> Column:
    return stopword_hits(col, stopwords) / token_count(col)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are common punctuation. NULL for empty
    text: under ANSI mode a bare 0/0 RAISES in Spark while DuckDB yields
    NULL — nullif makes both engines agree (and quality rubrics score a
    NULL ratio as zero points through their when/otherwise arms)."""
    c = _c(col)
    stripped = F.regexp_replace(c, r"[.,;:!?'\"()\[\]-]", "")
    return (F.length(c) - F.length(stripped)) / F.nullif(
        F.length(c), F.lit(0)
    )


def digit_ratio(col: Column | str) -> Column:
    """Fraction of digit characters; NULL for empty text (see punct_ratio)."""
    c = _c(col)
    return (
        F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    ) / F.nullif(F.length(c), F.lit(0))


# GPT-2-style pre-tokenizer approximation, constrained to syntax both Java
# regex (Spark) and RE2 (DuckDB oracle) support — contractions, a
# letter run / digit run / symbol run each with an optional leading space.
# (The real GPT-2 pattern adds a whitespace lookahead RE2 can't express;
# dropping the whitespace branches only removes pure-space tokens, which a
# token COUNT for budgeting shouldn't include anyway.)
BPE_TOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish pre-tokenization (the unit LLM token budgets count)."""
    # idx=0 = whole match (the pattern has no capture groups)
    return F.regexp_extract_all(_c(col), F.lit(BPE_TOKEN_PATTERN), 0)


def bpe_token_count(col: Column | str) -> Column:
    return F.size(bpe_tokens(col)).cast("bigint")


ROLLING_BASE = 257
ROLLING_MOD = 2_147_483_647  # 2^31 - 1: acc*257 + 255 stays well under 2^63


def fingerprint_rolling(col: Column | str) -> Column:
    """Karp-Rabin rolling polynomial hash over the character sequence:
    h = ((...(c_0·B + c_1)·B + c_2...)·B + c_n) mod M. One codegen
    aggregate over the char array — an order-sensitive fingerprint (unlike
    the shingle-set min-hash), so reorderings change it."""
    chars = F.regexp_extract_all(_c(col), F.lit("."), 0)  # skips newlines,
    # identically in Java regex and RE2 — keeps the DuckDB oracle exact
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * ROLLING_BASE + F.ascii(ch)) % ROLLING_MOD,
    )


def fingerprint_minhash1(col: Column | str, k: int = 3) -> Column:
    """Document fingerprint: lexicographic-min md5 over the shingle set —
    a 1-permutation MinHash usable as a cheap near-dup blocking key."""
    return F.array_min(
        F.transform(distinct_shingles(col, k), lambda s: F.md5(s))
    )


def normalized_text(col: Column | str) -> Column:
    """Casefold + whitespace-collapse normalization for exact-dup hashing."""
    return F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " ")


# Tiny per-language function-word lists for the n-gram/stopword language-ID
# heuristic. Deliberately small: the point is the operator shape (per-lang
# hit counting + argmax), not linguistic accuracy.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "que"),
}


def lang_hits(col: Column | str) -> dict[str, Column]:
    return {lang: stopword_hits(col, sw) for lang, sw in LANG_STOPWORDS.items()}


def lang_id(col: Column | str, default: str = "unknown") -> Column:
    """Argmax language by stopword hits; ``default`` when nothing matches.

    Ties break by the fixed LANG_STOPWORDS order (deterministic)."""
    hits = lang_hits(col)
    langs = list(hits)
    # CASE chain in fixed order: the first language with the max hit count
    # wins, so ties resolve deterministically by LANG_STOPWORDS order.
    expr = None
    for lang in langs:
        cond = hits[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise(default)


def sliding_chunks(
    col: Column | str, size: int = 8, stride: int = 4
) -> Column:
    """Overlapping word windows (RAG-ingestion chunking): a chunk of
    ``size`` words every ``stride`` words, so consecutive chunks share
    ``size - stride`` words of context. The last window may be shorter;
    short texts yield one whole-text chunk."""
    toks = tokens(col)
    n_chunks = (
        F.ceil((F.size(toks) - size) / stride).cast("int") + 1
    )

    def chunk(k: Column) -> Column:
        return F.array_join(F.slice(toks, k * stride + 1, size), " ")

    return F.when(
        F.size(toks) > size,
        F.transform(F.sequence(F.lit(0), n_chunks - 1), chunk),
    ).otherwise(F.array(F.array_join(toks, " ")))
