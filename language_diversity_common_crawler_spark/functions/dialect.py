"""Dialect helpers for SQL expressions shared between Spark SQL and DuckDB.

Spark SQL string literals process backslash escapes (so a regex ``\\s+``
must be written ``'\\\\s+'``), while DuckDB literals are standard-SQL
(no escape processing: ``'\\s+'``). Every shared expression builds regex
literals through :func:`rx` with the RAW pattern.
"""

from __future__ import annotations


def rx(pattern: str, dialect: str) -> str:
    """SQL string literal for a raw regex pattern string."""
    if dialect == "spark":
        pattern = pattern.replace("\\", "\\\\")
    return "'" + pattern.replace("'", "''") + "'"


def cast_str(expr: str, dialect: str) -> str:
    return f"CAST({expr} AS {'VARCHAR' if dialect == 'duckdb' else 'STRING'})"


def g_flag(dialect: str) -> str:
    """Global-replace flag argument for regexp_replace (Spark is always
    global; DuckDB needs 'g')."""
    return ", 'g'" if dialect == "duckdb" else ""


def idiv(a: str, b: str, dialect: str) -> str:
    """Exact integer division (Spark ``div``, DuckDB ``//``). Identical for
    non-negative operands; used for integer-scaled scores so the oracle
    value-hash never sees a float."""
    op = "//" if dialect == "duckdb" else "div"
    return f"(({a}) {op} ({b}))"
