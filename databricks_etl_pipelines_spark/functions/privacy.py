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
