"""PII detection and redaction over text columns — the privacy gate a
training-data pipeline runs before anything ships (reference scope:
the LLM-pipeline extension family of SURVEY §2; no reference-engine
analog — this is net-new capability the 100 TB use case needs).

Design constraints:
- Pure JVM-side regex (`regexp_count` / `regexp_replace`) — narrow
  per-row map, no shuffle, whole corpus in one scan. A Python UDF here
  would put the hottest full-corpus pass on the slow path.
- Patterns are deliberately restricted to the syntax subset shared by
  Java regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
  quantifiers, ``\\b`` word boundaries — no lookaround, no backrefs. The
  same pattern strings drive both engines, so detection is
  differential-testable, not just eyeballed.
- Pattern set is ordered: redaction applies patterns in dict order.
  phone and SSN cannot match the same span (group widths disagree at the
  first separator), but the email pattern CAN subsume digit/dash/dot
  sequences (``555-123-4567@relay.example.com`` is one email whose local
  part is phone-shaped) — so apply order is part of the contract
  (email first), and the redaction count is computed per stage on the
  progressively-redacted text so it equals the number of replacements
  actually made, never a double count of one span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared Java/RE2 subset; see module docstring. Insertion order == apply
# order for redaction.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _counts(col: Column) -> dict[str, Column]:
    return {
        kind: F.regexp_count(col, F.lit(pat)).cast("long")
        for kind, pat in PII_PATTERNS.items()
    }


def pii_stats(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """Per-document PII hit counts and a has_pii gate flag.

    One narrow projection over the scan — each pattern is a leftmost
    non-overlapping regex count (identical scan semantics in Java regex
    and RE2, which is what makes the count oracle-checkable). Counts are
    per-kind INDEPENDENT scans of the raw text: one span may count under
    two kinds (a phone-shaped local part inside an email) — the right
    semantics for detection stats ("does this doc contain something
    phone-shaped"), distinct from :func:`pii_redact`'s replacement
    count."""
    cnts = _counts(F.col(col))
    total = None
    for c in cnts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{kind}") for kind, c in cnts.items()],
        (total > 0).alias("has_pii"),
    )


def pii_redact(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """Redact every PII match with its ``[KIND]`` tag; emits the cleaned
    text and the total redaction count. Each pattern's count is taken on
    the text AFTER the previous patterns' replacements (the replacement
    tags contain no digits or ``@``, so they can't re-match), which
    makes ``n_redactions`` exactly the number of replacements performed —
    a span consumed by an earlier pattern (phone-shaped text inside an
    email) is not double-counted."""
    out = F.col(col)
    total = F.lit(0).cast("long")
    for kind, pat in PII_PATTERNS.items():
        total = total + F.regexp_count(out, F.lit(pat)).cast("long")
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return df.select(
        F.col(id_col),
        out.alias("clean_text"),
        total.alias("n_redactions"),
    )


K_ANON_K = 5


def k_anonymity_histogram(
    df: DataFrame, qi_cols: list[Column | str], k: int = K_ANON_K
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier set (Sweeney 2002): the
    equivalence-class size distribution — for each class size, how many QI
    classes have it and how many ROWS sit in them, flagged when the size is
    below ``k`` (those rows are re-identifiable within fewer than k
    records; publishing them is the privacy risk this audit gates).

    Shape: one groupBy on the QI tuple (the only scan), then a second
    aggregate over the class-size frame, which is already orders of
    magnitude smaller. Output is O(distinct class sizes) rows.

    Output: (class_size, n_classes, n_rows, below_k).
    """
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("class_size"))
    return (
        classes.groupBy("class_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).cast("long").alias("n_rows"),
            F.when(F.col("class_size") < k, 1).otherwise(0).alias("below_k"),
        )
        .orderBy("class_size")
    )
