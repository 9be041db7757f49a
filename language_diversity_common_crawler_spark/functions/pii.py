"""PII redaction for LLM training-data pipelines.

Replaces emails, IPv4 addresses, and phone numbers with typed placeholder
tokens and counts each class per document — the C4/Dolma-style scrub stage
that sits between extraction and training-set selection. The reference
computes no PII handling (training-data extension per the build brief).

Scale shape: a pure whole-stage-codegen JVM map (three regexp_replace
passes + constant-string counting) — shuffle-free, linear, holds at
100 TB. No Python UDF anywhere.

Cross-dialect notes:
- Patterns avoid everything RE2 (DuckDB) lacks: no backreferences, no
  lookaround. Greedy-quantifier semantics on these patterns are identical
  leftmost-first in Java regex and RE2.
- Regex literals go through dialect.rx (Spark SQL escape processing).
- Class counts are derived from the REDACTED text by counting placeholder
  occurrences with non-regex replace(): exact integer math, no
  regexp_count (absent in one engine or the other across versions).
- The redaction expression is materialized in its own projection before
  the count expressions reference it (multiply-referenced lambda-free
  aliases survive CollapseProject in both engines, so the three regex
  passes run once per row, not once per count column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dialect import cast_str, g_flag, rx

EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RX = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_RX = r"\+\d{1,2}[- ]\d{3}[- ]\d{4}"

# (placeholder token, output count column) per class, in application order:
# emails first (their host parts contain dots but no digits, so the IPv4
# pass cannot fire inside them either way; order is still pinned so both
# engines redact byte-identically).
CLASSES = [
    ("<EMAIL>", EMAIL_RX, "n_emails"),
    ("<IP>", IPV4_RX, "n_ips"),
    ("<PHONE>", PHONE_RX, "n_phones"),
]


def redact_expr(text: str, dialect: str) -> str:
    """Placeholder-redacted text from a text COLUMN REFERENCE."""
    e = text
    for token, pattern, _ in CLASSES:
        e = f"regexp_replace({e}, {rx(pattern, dialect)}, '{token}'{g_flag(dialect)})"
    return e


def token_count_expr(red: str, token: str) -> str:
    """Occurrences of a constant placeholder in the redacted COLUMN.

    (length drop after non-regex replace) / len(token): exact integer
    arithmetic, identical in both engines."""
    n = len(token)
    return (
        f"CAST((length({red}) - length(replace({red}, '{token}', ''))) "
        f"/ {n} AS BIGINT)"
    )


def demo_payload_expr(dialect: str) -> str:
    """Deterministic PII-bearing payload over (doc_id, text) — the synthetic
    documents corpus is PII-free word salad, so tests/oracles inject a
    per-class mix keyed on doc_id (some docs get none of a class).

    text is coalesced: DuckDB's concat() SKIPS null arguments while
    Spark's returns NULL — an uncoalesced NULL text row would diverge
    between the engines (the round-1 ADVICE parity trap)."""
    did = cast_str("doc_id", dialect)
    return (
        "concat(coalesce(text, ''),"
        " CASE WHEN doc_id % 7 = 0 THEN ''"
        f" ELSE concat(' contact user', {did}, '@mail.example.com') END,"
        " CASE WHEN doc_id % 3 = 0 THEN ' cc Admin@Example.ORG' ELSE '' END,"
        " CASE WHEN doc_id % 2 = 0 THEN concat(' ip 10.',"
        f" {cast_str('doc_id % 256', dialect)}, '.0.',"
        f" {cast_str('doc_id % 100', dialect)}) ELSE '' END,"
        " CASE WHEN doc_id % 5 = 0 THEN concat(' tel +1-555-',"
        f" {cast_str('1000 + doc_id % 9000', dialect)}) ELSE '' END)"
    )


def with_pii_redaction(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, redacted, n_emails, n_ips, n_phones over any text column."""
    staged = df.select(
        "doc_id", F.expr(redact_expr(text_col, "spark")).alias("redacted")
    )
    counts = [
        F.expr(token_count_expr("redacted", token)).alias(col)
        for token, _, col in CLASSES
    ]
    return staged.select("doc_id", "redacted", *counts)


def sql_pii_redaction(table: str, payload: str | None = None) -> str:
    """DuckDB twin of with_pii_redaction over demo_payload_expr (or a
    caller-supplied payload expression)."""
    pay = payload or demo_payload_expr("duckdb")
    red = redact_expr("payload", "duckdb")
    counts = ",\n       ".join(
        f"{token_count_expr('redacted', token)} AS {col}"
        for token, _, col in CLASSES
    )
    return (
        f"SELECT doc_id, redacted,\n       {counts}\n"
        f"FROM (SELECT doc_id, {red} AS redacted\n"
        f"      FROM (SELECT doc_id, {pay} AS payload FROM {table}))"
    )
