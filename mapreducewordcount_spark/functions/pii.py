"""PII detection and redaction as pure column expressions.

Regex-based scrubbing of the classic identifier shapes (emails,
North-American phone numbers, SSNs, IPv4 addresses) — the first
redaction pass of a training-data pipeline. Every pattern is written
in the common subset of Java regex (Spark executes these JVM-side
inside codegen) and RE2 (the DuckDB oracle): no lookaround, no
backreferences, `\\b` word boundaries only.

This is detection of FORMATS, not identity resolution: a string
shaped like an SSN is redacted whether or not it is one. That is the
correct bias for corpus scrubbing.

Reference parity note: no counterpart in the reference engine
(SURVEY.md §2.5 extension surface).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: pattern table: (class name, regex, replacement token). Scrub order
#: matters only in that every pattern must still find its matches in
#: the partially-redacted text — the four shapes are mutually
#: non-overlapping (phone requires separator groups an SSN lacks and
#: vice versa; IPv4 dots exclude phone separators), so any order
#: yields the same result.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def pii_counts(col: Column | str) -> Column:
    """struct<n_email, n_ipv4, n_phone, n_ssn> of match counts,
    evaluated against the ORIGINAL text (counting is independent of
    scrub order by construction)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(*[
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ])


def scrub_pii(col: Column | str) -> Column:
    """The text with every PII match replaced by its class token."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c
