"""A2/A3 — the reference's running stats as single-pass aggregations.

The reference mutates counters per record (stats_handler.py:36-38); in Spark
each counter is ``sum(when(predicate, 1))`` in ONE ``agg()`` over the
predictions — a full-scan, map-side-combined reduction with a single-row
result (no shuffle beyond the final combine).

Parity quirk #3 (SURVEY.md §2.6): the reference's third "wrong" branch
compares the whole detect_fast result *dict* to a string
(/root/reference/src/stats/accuracy.py:21), which is always unequal — so the
branch degenerates to ``langid == cld2`` (guarded by the elif chain). We
reproduce the *behavior*.

The elif chains are order-sensitive; each branch's predicate therefore
includes the negation of the prior branches, exactly as Python evaluates it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.langspec import MODEL_PREFIX, MODELS


def _cnt(pred: Column) -> Column:
    return F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))).cast("bigint")


def accuracy_stats(preds: DataFrame) -> DataFrame:
    """A2 (stats/accuracy.py:6-30) — one row:
    wrong_detect_fast/langid/cld2, uniq_*, match_cnt, size, plus *_pct."""
    df, li, cld = (F.col("df_lang"), F.col("li_lang"), F.col("cld_lang"))

    b1 = (df == li) & (df != cld)                    # cld2 wrong
    b2 = ~b1 & (df == cld) & (df != li)              # langid wrong
    b3 = ~b1 & ~((df == cld) & (df != li)) & (li == cld)  # quirk #3 branch

    u1 = (df != "un") & (df != "en") & (li == "en") & (cld == "un")
    u2 = ~u1 & (df == "un") & (li != "en") & (cld == "un")
    u3 = (
        ~u1
        & ~((df == "un") & (li != "en") & (cld == "un"))
        & (df == "un") & (li == "en") & (cld != "un") & (cld != "en")
    )

    match = ((df == li) & (li == cld)) | ((df == "un") & (li == "en") & (cld == "un"))

    out = preds.agg(
        _cnt(b3).alias("wrong_detect_fast"),
        _cnt(b2).alias("wrong_langid"),
        _cnt(b1).alias("wrong_cld2"),
        _cnt(u1).alias("uniq_detect_fast"),
        _cnt(u2).alias("uniq_langid"),
        _cnt(u3).alias("uniq_cld2"),
        _cnt(match).alias("match_cnt"),
        F.count(F.lit(1)).cast("bigint").alias("size"),
    )
    for c in [
        "wrong_detect_fast", "wrong_langid", "wrong_cld2",
        "uniq_detect_fast", "uniq_langid", "uniq_cld2", "match_cnt",
    ]:
        out = out.withColumn(
            f"{c}_pct", (F.col(c) * F.lit(100.0) / F.col("size")).cast("double")
        )
    return out


def sql_accuracy_stats(preds_select: str) -> str:
    """DuckDB oracle mirroring :func:`accuracy_stats` predicate-for-predicate."""
    b1 = "(df_lang = li_lang AND df_lang <> cld_lang)"
    b2 = f"(NOT {b1} AND df_lang = cld_lang AND df_lang <> li_lang)"
    b3 = (
        f"(NOT {b1} AND NOT (df_lang = cld_lang AND df_lang <> li_lang) "
        f"AND li_lang = cld_lang)"
    )
    u1 = ("(df_lang <> 'un' AND df_lang <> 'en' AND li_lang = 'en' "
          "AND cld_lang = 'un')")
    u2 = f"(NOT {u1} AND df_lang = 'un' AND li_lang <> 'en' AND cld_lang = 'un')"
    u3 = (
        f"(NOT {u1} AND NOT (df_lang = 'un' AND li_lang <> 'en' AND "
        f"cld_lang = 'un') AND df_lang = 'un' AND li_lang = 'en' "
        f"AND cld_lang <> 'un' AND cld_lang <> 'en')"
    )
    match = (
        "((df_lang = li_lang AND li_lang = cld_lang) OR "
        "(df_lang = 'un' AND li_lang = 'en' AND cld_lang = 'un'))"
    )

    def cnt(p: str, alias: str) -> str:
        return f"CAST(sum(CASE WHEN {p} THEN 1 ELSE 0 END) AS BIGINT) AS {alias}"

    counters = [
        cnt(b3, "wrong_detect_fast"), cnt(b2, "wrong_langid"), cnt(b1, "wrong_cld2"),
        cnt(u1, "uniq_detect_fast"), cnt(u2, "uniq_langid"), cnt(u3, "uniq_cld2"),
        cnt(match, "match_cnt"),
        "CAST(count(*) AS BIGINT) AS size",
    ]
    base = ",\n       ".join(counters)
    pct = ",\n       ".join(
        f"CAST({c} * 100.0 / size AS DOUBLE) AS {c}_pct"
        for c in [
            "wrong_detect_fast", "wrong_langid", "wrong_cld2",
            "uniq_detect_fast", "uniq_langid", "uniq_cld2", "match_cnt",
        ]
    )
    return (
        f"WITH preds AS ({preds_select}),\n"
        f"c AS (SELECT {base} FROM preds)\n"
        f"SELECT *,\n       {pct}\nFROM c"
    )


def unknown_stats(preds: DataFrame) -> DataFrame:
    """A3 (stats/unknown.py:6-19): per-model 'un' counts + percent of size."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("size")]
    for m in MODELS:
        p = MODEL_PREFIX[m]
        aggs.append(_cnt(F.col(f"{p}_lang") == "un").alias(f"unknown_{p}"))
    out = preds.agg(*aggs)
    for m in MODELS:
        p = MODEL_PREFIX[m]
        out = out.withColumn(
            f"unknown_{p}_pct",
            (F.col(f"unknown_{p}") * F.lit(100.0) / F.col("size")).cast("double"),
        )
    return out


def sql_unknown_stats(preds_select: str) -> str:
    cols = ["CAST(count(*) AS BIGINT) AS size"]
    for m in MODELS:
        p = MODEL_PREFIX[m]
        cols.append(
            f"CAST(sum(CASE WHEN {p}_lang = 'un' THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS unknown_{p}"
        )
    base = ",\n       ".join(cols)
    pct = ",\n       ".join(
        f"CAST(unknown_{MODEL_PREFIX[m]} * 100.0 / size AS DOUBLE) "
        f"AS unknown_{MODEL_PREFIX[m]}_pct"
        for m in MODELS
    )
    return (
        f"WITH preds AS ({preds_select}),\n"
        f"c AS (SELECT {base} FROM preds)\n"
        f"SELECT *,\n       {pct}\nFROM c"
    )


def length_percentiles(
    df: DataFrame, value_col: str = "n_chars", group_col: str = "lang",
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Per-group EXACT discrete percentiles of ``value_col`` — the
    length-distribution report a corpus-quality pass reads per language.

    ``percentile_disc`` picks an actual element (first value whose
    cumulative fraction >= p), which Spark and DuckDB implement
    identically — so the output is integer-exact for the oracle gate.
    Exact percentiles sort each group: correct up to ~10^8 rows/group; at
    full corpus scale swap in ``approx_percentile`` (same call shape, no
    oracle) — the one-line substitution is the documented scale dial."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs")]
    for p in probs:
        aggs.append(
            F.expr(
                f"percentile_disc({p!r}) WITHIN GROUP (ORDER BY {value_col})"
            ).cast("bigint").alias(f"p{int(p * 100)}")
        )
    return df.groupBy(group_col).agg(*aggs)


def sql_length_percentiles(
    table: str = "documents", value_col: str = "n_chars",
    group_col: str = "lang",
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    count_alias: str = "n_docs",
) -> str:
    """DuckDB twin of :func:`length_percentiles` (quantile_disc is
    DuckDB's spelling of percentile_disc)."""
    cols = [f"CAST(count(*) AS BIGINT) AS {count_alias}"]
    for p in probs:
        cols.append(
            f"CAST(quantile_disc({value_col}, {p!r}) AS BIGINT)"
            f" AS p{int(p * 100)}"
        )
    sel = ",\n       ".join(cols)
    return f"SELECT {group_col},\n       {sel}\nFROM {table} GROUP BY {group_col}"


def sampled_length_quantiles(
    df: DataFrame, value_col: str = "n_chars", group_col: str = "lang",
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    rate_inv: int = 4,
) -> DataFrame:
    """:func:`length_percentiles` over a DETERMINISTIC 1/``rate_inv``
    hash sample — the production dial for quantiles at 10^10 rows, where
    even percentile_disc's per-group sort is too hot. The sample is a
    pure function of doc_id (salted 60-bit md5 under a threshold), so
    unlike rand()-sampling it is reproducible across engines, runs and
    cluster sizes — the DuckDB oracle recomputes the IDENTICAL sample
    and the value-hash gate checks the sketch, mirroring the KMV
    rationale (functions/sketches.py). The filter is shuffle-free
    whole-stage codegen; sort volume drops by rate_inv."""
    from ..functions.hashing import HASH_SPACE, sql_md5_60_salted

    thresh = HASH_SPACE // rate_inv
    keep = (
        F.expr(
            sql_md5_60_salted("CAST(doc_id AS STRING)", "qs", "spark")
        ) < F.lit(thresh)
    )
    return length_percentiles(
        df.filter(keep), value_col, group_col, probs
    ).withColumnRenamed("n_docs", "n_sampled")


def sql_sampled_length_quantiles(
    table: str = "documents", value_col: str = "n_chars",
    group_col: str = "lang",
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    rate_inv: int = 4,
) -> str:
    """DuckDB twin of :func:`sampled_length_quantiles`."""
    from ..functions.hashing import HASH_SPACE, sql_md5_60_salted

    thresh = HASH_SPACE // rate_inv
    keep = sql_md5_60_salted("CAST(doc_id AS VARCHAR)", "qs", "duckdb")
    return sql_length_percentiles(
        f"(SELECT * FROM {table} WHERE {keep} < {thresh})",
        value_col, group_col, probs, count_alias="n_sampled",
    )


def quality_length_moments(df: DataFrame, group_col: str = "lang") -> DataFrame:
    """Exact integer moment report relating document LENGTH (n_chars)
    and QUALITY (the text_analysis quality_score): per group, the six
    sufficient statistics (n, Σx, Σx², Σy, Σy², Σxy) from which any
    reader derives mean/variance/covariance/Pearson-r without the
    engine ever dividing — the corpus-diagnostics pass ("are we
    selecting for length when we think we select for quality?") with a
    value-hash-exact oracle.

    Overflow bound: y dominates (y ~ 100*stopwords + tokens, so up to
    ~2*10^5 for a 10^4-char doc; y² ~ 4*10^10), so Σy² stays inside
    BIGINT for groups up to ~10^8 such docs — the documented scale dial
    is quantizing y (not x) down before squaring once a per-language
    slice approaches that.

    Plan: the signals come from with_text_stats' MATERIALIZED staged
    projections (__norm/__pad built once — the inline quality_exprs
    re-runs the whitespace-collapse regex per reference and measured
    ~7x slower on the corpus scan; inline stays the oracle-SQL path),
    then ONE map-side-combined group aggregate."""
    from ..functions.text_analysis import with_text_stats

    staged = with_text_stats(df.filter(F.col("text").isNotNull())).select(
        group_col,
        F.col("n_chars").cast("bigint").alias("x"),
        F.col("quality_score").cast("bigint").alias("y"),
    )
    return staged.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sum_len"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sum_len_sq"),
        F.sum("y").cast("bigint").alias("sum_q"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sum_q_sq"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sum_lq"),
    )


def sql_quality_length_moments(
    table: str = "documents", group_col: str = "lang"
) -> str:
    """DuckDB twin of :func:`quality_length_moments`."""
    from ..functions.text_analysis import quality_exprs

    q = quality_exprs("text", "duckdb")["quality_score"]
    return f"""
WITH staged AS (
  SELECT {group_col}, CAST(n_chars AS BIGINT) AS x, {q} AS y
  FROM {table} WHERE text IS NOT NULL)
SELECT {group_col},
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sum_len,
       CAST(sum(x * x) AS BIGINT) AS sum_len_sq,
       CAST(sum(y) AS BIGINT) AS sum_q,
       CAST(sum(y * y) AS BIGINT) AS sum_q_sq,
       CAST(sum(x * y) AS BIGINT) AS sum_lq
FROM staged GROUP BY {group_col}
"""
