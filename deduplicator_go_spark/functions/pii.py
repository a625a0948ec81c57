"""PII detection and redaction — native column expressions.

Training pipelines tag and scrub personally identifying strings before
any text ships to a tokenizer (the Dolma/CCNet tagger stage). Pattern
scope here is the classic regex-detectable trio — emails, IPv4
addresses, dashed phone numbers — chosen because they are exactly
expressible in BOTH Java regex (Spark codegen) and RE2 (DuckDB
oracle); richer NER-style detection is a model call, out of scope for
a column engine.

All functions are pure column algebra (regexp_count /
regexp_replace): whole-stage codegen, no UDFs, linear per row. At
10^12 docs this runs inside the existing validate/quality map stage —
no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java-regex and RE2 compatible (no lookarounds, no backrefs)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d{3}-\d{3}-\d{4}\b"

_PATTERNS = [
    (EMAIL_RE, "[EMAIL]"),
    (IPV4_RE, "[IP]"),
    (PHONE_RE, "[PHONE]"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type PII match counts: {n_emails, n_ips, n_phones}."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_ips": F.regexp_count(text, F.lit(IPV4_RE)),
        "n_phones": F.regexp_count(text, F.lit(PHONE_RE)),
    }


def redact_pii(text: Column) -> Column:
    """All matches replaced with typed placeholders, email → ip →
    phone order (email first so user@host never half-matches as a
    host-side IP; the remaining two are disjoint)."""
    out = text
    for pattern, token in _PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out
