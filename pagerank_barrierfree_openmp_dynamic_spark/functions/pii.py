"""PII detection and redaction for training-data pipelines.

Standard pre-training hygiene (the C4/RefinedWeb/Dolma pipelines all carry
a pass like this): scan every document for personally-identifiable
spans — email addresses, phone numbers, IPv4 addresses, national-id-shaped
numbers — count them per document, and rewrite the text with typed
placeholders so downstream training never sees the raw span.

Scale shape (the 100-TB story): both operators are pure per-row JVM
expressions (``regexp_count`` / ``regexp_replace`` inside whole-stage
codegen) — one narrow map stage, zero shuffles, zero Python. The scan
composes with the corpus funnel (``jobs/run_corpus.py``) as one more
projection on the same pass over the text column.

Pattern dialect note: every regex below restricts itself to the syntax
intersection of Java ``util.regex`` (Spark) and RE2 (DuckDB oracle) —
character classes, bounded repetition, non-capturing groups, ASCII ``\\b``
— so the DuckDB oracles in ``__spark_entry__.py`` run the IDENTICAL
pattern strings.

Reference tie-in: the reference engine has no text surface
(``/root/reference/src/`` is graph kernels only); this extends the
LLM-data-pipeline shelf mandated alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Ordered: redaction applies top-to-bottom, and order matters — an SSN-shaped
# id inside a longer digit run must be consumed before the phone pattern can
# misread its tail. Patterns are mutually exclusive on well-formed spans
# (phone is 3-3-4 digits, ssn is 3-2-4) but real text is adversarial.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
)


def pii_scan(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id",
             extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-document PII counts: (id, *extra_cols, n_email, n_ssn, n_phone,
    n_ipv4, pii_total). Null text counts as zero everywhere."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.regexp_count(t, F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    out = df.select(F.col(id_col), *[F.col(c) for c in extra_cols], *counts)
    total = None
    for name, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total)


def redact_column(text: Column) -> Column:
    """The redaction expression: each PII span replaced by its typed
    placeholder (``<EMAIL>``, ``<SSN>``, ...), applied in PII_PATTERNS
    order. Pure JVM ``regexp_replace`` chain."""
    out = text
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Rewrite ``text_col`` with PII spans replaced by typed placeholders.

    Returns (id, *keep_cols, text, n_redacted) where ``n_redacted`` is the
    total number of spans replaced — documents with ``n_redacted = 0`` pass
    through byte-identical (same invariant as link extraction: hygiene
    passes never rewrite clean text).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    total = None
    for name, pat in PII_PATTERNS:
        c = F.regexp_count(t, F.lit(pat))
        total = c if total is None else total + c
    return df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        redact_column(F.col(text_col)).alias(text_col),
        total.alias("n_redacted"),
    )
