"""PII / contact-info scrubbing — the redaction pass a training-data
pipeline runs before releasing or training on a corpus.

No reference analogue (the reference indexes text verbatim); standard
pipeline hygiene alongside dedup/quality/decontamination. Everything
here is a chain of ``regexp_count`` / ``regexp_replace`` expressions —
whole-stage-codegen'd, zero shuffle, fuses into the corpus scan at any
scale.

Pattern notes: the regexes deliberately use only syntax that behaves
identically in Java regex (Spark), RE2 (DuckDB oracle) and Python
``re`` — character classes, bounded repetition, ``\\b`` — no lookaround,
no backreferences. They are pragmatic scrubbing patterns (catch the
overwhelming bulk), not validators; a production pass would add locale
phone formats, IBANs, etc. to ``PII_PATTERNS`` — the plumbing is
pattern-count agnostic.

Replacement order matters and is fixed: URLs first (an email-shaped
substring inside a URL query string must redact as part of the URL),
then emails, then IPv4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (regex, replacement token), applied in this order
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", "https?://[A-Za-z0-9./?#&=_%:~@+-]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
]


def redacted_text(text: Column) -> Column:
    """The scrubbed text as one chained-``regexp_replace`` expression."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc PII hit counts + the scrubbed text's digest:
    ``(doc_id, n_url, n_email, n_ipv4, redacted_md5)``.

    Counts are measured on the ORIGINAL text (reporting), the digest on
    the order-sensitively redacted text (verification that two runs —
    or two engines — scrub identically).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    return df.select(
        F.col(id_col),
        *counts,
        F.md5(redacted_text(t)).alias("redacted_md5"),
    )


def redact_pii(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The corpus with ``text_col`` scrubbed in place — same rows, same
    schema, URLs/emails/IPv4s replaced by placeholder tokens. Pure
    projection; zero shuffle."""
    return df.withColumn(text_col, redacted_text(F.coalesce(F.col(text_col), F.lit(""))))
