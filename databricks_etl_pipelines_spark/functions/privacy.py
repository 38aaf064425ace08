"""PII masking / tokenization expression builders.

Parity with the reference's two Python "functions" (`mask_card_number`
02:67-69, `tokenize_name` 02:71-73), which are expression builders — they
return Column expressions composed of built-ins and therefore stay fully
inside Catalyst codegen (SURVEY §2.10). That idiom is preserved here: no
Python executes per row, so these run JVM-side at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mask_card_number(card: Column | str) -> Column:
    """``****-****-****-<last4>`` — irreversible display mask.

    Reference parity: 02_Silver_Cleanse_PII.py:67-69.
    """
    card = F.col(card) if isinstance(card, str) else card
    return F.concat(F.lit("****-****-****-"), F.substring(card, -4, 4))


def tokenize_pii(value: Column | str) -> Column:
    """Deterministic SHA2-256 token of a normalized (lower+trim) value.

    Case/whitespace-insensitive so the same person always maps to the same
    token — the join-safe pseudonymization the reference uses for
    `cardholder_token` (02_Silver_Cleanse_PII.py:71-73). Collision-safe at
    any realistic scale (256-bit).
    """
    value = F.col(value) if isinstance(value, str) else value
    return F.sha2(F.lower(F.trim(value)), 256)


# -- document-corpus PII scrubbing -------------------------------------------
# Extension beyond the reference's column-level masking: training-data
# pipelines scrub free-text documents before pretraining. Same expression-
# builder idiom — Java regex runs JVM-side inside codegen, no per-row
# Python. Patterns are kept RE2-compatible (no backrefs/lookaround) so a
# DuckDB oracle evaluates them identically.

PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_PATTERN = r"\d{3}-\d{3}-\d{4}"


def pii_match_count(text: Column | str, pattern: str) -> Column:
    """How many PII matches a document contains (audit column)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("bigint")


def scrub_text_pii(
    text: Column | str,
    email_token: str = "[EMAIL]",
    phone_token: str = "[PHONE]",
) -> Column:
    """Redact emails then phone numbers (order fixed so the oracle's
    replacement sequence is identical)."""
    text = F.col(text) if isinstance(text, str) else text
    scrubbed = F.regexp_replace(text, PII_EMAIL_PATTERN, email_token)
    return F.regexp_replace(scrubbed, PII_PHONE_PATTERN, phone_token)


def plant_synthetic_pii(id_col: Column | str, text_col: Column | str) -> Column:
    """Deterministically plant one email + one phone on every third row —
    the synthetic corpus carries no real PII, so scrub queries plant the
    SAME construction in both engines (``SQL_PLANT_PII`` is the SQL twin;
    keep the two in lockstep — the differential checks are only
    meaningful while they are byte-identical)."""
    id_col = F.col(id_col) if isinstance(id_col, str) else id_col
    text_col = F.col(text_col) if isinstance(text_col, str) else text_col
    return (
        F.when(
            id_col % 3 == 0,
            F.concat(
                text_col,
                F.lit(" contact user"),
                id_col.cast("string"),
                F.lit("@mail.example or call "),
                F.lpad((id_col % 1000).cast("string"), 3, "0"),
                F.lit("-555-"),
                F.lpad((id_col % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(text_col)
    )


# the SQL twin of plant_synthetic_pii (columns doc_id / text)
SQL_PLANT_PII = """CASE WHEN doc_id % 3 = 0 THEN
      text || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@mail.example or call '
           || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-555-'
           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
    ELSE text END"""
