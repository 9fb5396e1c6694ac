"""PII detection and redaction for training-data curation.

A large-scale corpus pipeline has to find and scrub personally
identifiable information before text reaches a training mix. Both halves
stay entirely JVM-side (regexp_count / regexp_replace inside whole-stage
codegen) — no Python touches the text, so the scan is a narrow map over
the corpus scan with zero shuffles.

The pattern set is deliberately conservative ASCII regex that means the
same thing to Java's regex engine (Spark) and RE2 (DuckDB oracle):
character classes, bounded repetition, non-capturing groups, and \\b word
boundaries only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kind -> (pattern, replacement token). Order matters for redaction:
#: SSN before phone (both dash-digit shapes; SSN is the more specific).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    "phone": (r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "[PHONE]"),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
}


def pii_count_cols(text: Column) -> dict[str, Column]:
    """Per-kind non-overlapping match counts for one text column."""
    return {
        kind: F.regexp_count(text, F.lit(pat))
        for kind, (pat, _) in PII_PATTERNS.items()
    }


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append one `n_<kind>` int column per PII kind plus `has_pii`."""
    counts = pii_count_cols(F.col(text_col))
    for kind, col in counts.items():
        df = df.withColumn(f"n_{kind}", col)
    flag = None
    for kind in PII_PATTERNS:
        c = F.col(f"n_{kind}") > 0
        flag = c if flag is None else (flag | c)
    return df.withColumn("has_pii", flag)


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII match with its bracketed token, in PII_PATTERNS
    order (most-specific first so an SSN is not half-eaten as a phone)."""
    col = F.col(text_col)
    for _, (pat, token) in PII_PATTERNS.items():
        col = F.regexp_replace(col, pat, token)
    return df.withColumn(text_col, col)
