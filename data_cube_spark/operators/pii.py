"""PII detection and redaction: emails, IPv4 addresses, SSN-shaped ids,
phone-shaped numbers — the scrubbing pass every training-data pipeline
runs before anything else sees the text.

Scale design: the whole operator is a cascade of JVM ``regexp_replace`` /
``regexp_extract_all`` expressions inside whole-stage codegen — zero
shuffles, zero UDFs, zero Python in the hot path. Counts are computed on
the *progressively redacted* text (email counted on raw, IPv4 on the
email-redacted text, …) so one span is never double-counted by two
patterns (an SSN is also phone-shaped; the cascade attributes it to SSN).

Patterns are deliberately dialect-safe (no lookarounds, no backrefs, no
alternation-order tricks) so the same strings run identically under
Java's regex engine (Spark) and RE2 (DuckDB oracle / Go-style engines).

No reference counterpart; north-star pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kind -> (pattern, redaction token), applied IN THIS ORDER. SSN must
#: precede phone: an SSN span is also phone-shaped, and the cascade
#: attributes each span to the first pattern that claims it.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
}


def redact_pii(col: str | Column) -> Column:
    """The redacted text: every PII span replaced by its kind token."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def pii_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per document: one count column per PII kind (cascade-attributed)
    plus the fully redacted text. Pure narrow projection."""
    cur: Column = F.col(text_col)
    cols = [F.col(id_col)]
    for kind, (pat, token) in PII_PATTERNS.items():
        cols.append(F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
                    .alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, token)
    cols.append(cur.alias("redacted"))
    return df.select(*cols)
