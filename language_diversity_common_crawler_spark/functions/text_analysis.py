"""Text-analysis operators for a large-scale training-data pipeline:
token counting, quality scoring, document fingerprinting.

All expressions are dialect-shared: one SQL string runs as the DuckDB oracle
and (via ``F.expr``) as Spark JVM-side expressions — whole-stage-codegen'd,
no Python in the hot path. The token model is deliberately exact-integer so
parallel aggregation is order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dialect import g_flag, rx
from .hashing import sql_md5_60

# Normalized text: trim + collapse whitespace (Spark regexp_replace is
# global; DuckDB needs the 'g' flag — handled per dialect below).
_STOPWORDS = [" the ", " a ", " of ", " and ", " to "]
_PUNCT = [".", ",", "!", "?", ";", ":"]


_WS = r"\s+"


def _sql_norm(text: str, dialect: str) -> str:
    ws = rx(_WS, dialect)
    return f"regexp_replace(trim({text}), {ws}, ' '{g_flag(dialect)})"


def _sql_count_char(expr: str, ch: str) -> str:
    c = ch.replace("'", "''")
    return f"(length({expr}) - length(replace({expr}, '{c}', '')))"


def token_stats_exprs(text: str, dialect: str) -> dict[str, str]:
    """Column-name → SQL expression for token statistics."""
    norm = _sql_norm(text, dialect)
    spaces = _sql_count_char(norm, " ")
    n_tokens = f"CASE WHEN length({norm}) = 0 THEN 0 ELSE {spaces} + 1 END"
    return {
        "n_chars_norm": f"CAST(length({norm}) AS BIGINT)",
        "n_tokens": f"CAST({n_tokens} AS BIGINT)",
        "n_bpe_est": f"CAST(ceil(length({norm}) / 4.0) AS BIGINT)",
        "avg_token_len": (
            f"CAST(CASE WHEN ({n_tokens}) = 0 THEN 0.0 "
            f"ELSE (length({norm}) - ({spaces})) * 1.0 / ({n_tokens}) END AS DOUBLE)"
        ),
    }


def quality_exprs(text: str, dialect: str) -> dict[str, str]:
    """Quality-scoring signals: punctuation count, stopword hits, ratios."""
    norm = _sql_norm(text, dialect)
    pad = f"concat(' ', lower({norm}), ' ')"
    punct = " + ".join(_sql_count_char(norm, p) for p in _PUNCT)
    stop_parts = []
    for w in _STOPWORDS:
        stop_parts.append(
            f"CAST((length({pad}) - length(replace({pad}, '{w}', ''))) / {len(w)} AS BIGINT)"
        )
    stop = " + ".join(stop_parts)
    spaces = _sql_count_char(norm, " ")
    n_tokens = f"CASE WHEN length({norm}) = 0 THEN 0 ELSE {spaces} + 1 END"
    return {
        "punct_cnt": f"CAST({punct} AS BIGINT)",
        "stopword_cnt": f"CAST({stop} AS BIGINT)",
        "stopword_ratio": (
            f"CAST(CASE WHEN ({n_tokens}) = 0 THEN 0.0 "
            f"ELSE ({stop}) * 1.0 / ({n_tokens}) END AS DOUBLE)"
        ),
        "quality_score": (
            f"CAST(CASE WHEN ({n_tokens}) = 0 THEN 0 "
            f"ELSE 100 * ({stop}) + ({n_tokens}) - 5 * ({punct}) END AS BIGINT)"
        ),
    }


def fingerprint_expr(text: str, dialect: str) -> str:
    """Document fingerprint: 60-bit hash of normalized text (exact-dup key)."""
    norm = _sql_norm(text, dialect)
    if dialect == "duckdb":
        return sql_md5_60(norm)
    return f"CAST(conv(substring(md5({norm}), 1, 15), 16, 10) AS BIGINT)"


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Spark side: apply all token/quality expressions via F.expr (JVM)."""
    out = df
    for name, e in {**token_stats_exprs(text_col, "spark"),
                    **quality_exprs(text_col, "spark")}.items():
        out = out.withColumn(name, F.expr(e))
    out = out.withColumn("fingerprint", F.expr(fingerprint_expr(text_col, "spark")))
    return out


def simhash16_exprs(text: str, dialect: str) -> str:
    """16-bit SimHash over tokens, identical in Spark SQL and DuckDB.

    Token hash = md5-60; bit b contributes +1 if set else -1; simhash bit b
    is 1 iff the sum is > 0. Unnest-free: computed with higher-order array
    functions on the token array (JVM-side in Spark, list ops in DuckDB).
    """
    norm = _sql_norm(text, dialect)
    if dialect == "duckdb":
        toks = f"string_split({norm}, ' ')"
        h = sql_md5_60("t")
        bits = []
        for b in range(16):
            bits.append(
                f"(CASE WHEN list_sum(list_transform({toks}, "
                f"t -> CASE WHEN ({h} >> {b}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
                f"THEN {1 << b} ELSE 0 END)"
            )
        return "CAST(" + " + ".join(bits) + " AS BIGINT)"
    else:
        toks = f"split({norm}, ' ')"
        h = "CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)"
        bits = []
        for b in range(16):
            bits.append(
                f"(CASE WHEN aggregate(transform({toks}, "
                f"t -> CASE WHEN ({h} >> {b}) % 2 = 1 THEN 1 ELSE -1 END), "
                f"0, (acc, x) -> acc + x) > 0 THEN {1 << b} ELSE 0 END)"
            )
        return "CAST(" + " + ".join(bits) + " AS BIGINT)"
