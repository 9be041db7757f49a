"""A1 — the reference's primary analytical query: per-language histogram +
mean precision per model (awk at /root/reference/commands/count_fastwarc_result.sh:5-6),
plus K3 chunked pagination (commands/fasrawc_generetate_graph_comparaison.sh:14-21).

Spark shape: unpivot the three model columns to (model, lang, prec) rows,
then ONE hash aggregation with conditional aggregates. Map-side partial
aggregation handles the combine; cardinality after groupBy is |languages|,
so the shuffle is tiny regardless of input scale. The union-of-language-
domains the awk builds implicitly (`lang[...]` assoc array) falls out of the
group-by over the unpivoted rows; missing model/lang combinations are 0 via
count/coalesce — byte-for-byte the awk's `(i in first) ? ... : 0`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.langspec import MODEL_PREFIX, MODELS


def model_long_form(preds: DataFrame) -> DataFrame:
    """(…, df_lang, df_prec, li_lang, li_prec, cld_lang, cld_prec) →
    one row per (input row, model): (model, lang, prec)."""
    structs = [
        F.struct(
            F.lit(m).alias("model"),
            F.col(f"{MODEL_PREFIX[m]}_lang").alias("lang"),
            F.col(f"{MODEL_PREFIX[m]}_prec").alias("prec"),
        )
        for m in MODELS
    ]
    return preds.select(F.explode(F.array(*structs)).alias("mlp")).select("mlp.*")


def language_histogram(preds: DataFrame) -> DataFrame:
    """A1: lang, cnt_<model>×3, avg_prec_<model>×3 (0-filled)."""
    long_df = model_long_form(preds)
    aggs = []
    for m in MODELS:
        p = MODEL_PREFIX[m]
        aggs.append(
            F.count(F.when(F.col("model") == m, F.lit(1))).alias(f"cnt_{p}")
        )
        aggs.append(
            F.coalesce(
                F.avg(F.when(F.col("model") == m, F.col("prec"))), F.lit(0.0)
            ).alias(f"avg_prec_{p}")
        )
    return long_df.groupBy("lang").agg(*aggs)


def sql_language_histogram(preds_select: str) -> str:
    """DuckDB oracle for :func:`language_histogram` over a predictions
    subquery with the standard column aliases."""
    long_parts = []
    for m in MODELS:
        p = MODEL_PREFIX[m]
        long_parts.append(
            f"SELECT '{m}' AS model, {p}_lang AS lang, {p}_prec AS prec "
            f"FROM preds"
        )
    long_sql = " UNION ALL ".join(long_parts)
    aggs = []
    for m in MODELS:
        p = MODEL_PREFIX[m]
        aggs.append(
            f"count(CASE WHEN model = '{m}' THEN 1 END) AS cnt_{p}"
        )
        aggs.append(
            f"coalesce(avg(CASE WHEN model = '{m}' THEN prec END), 0.0) "
            f"AS avg_prec_{p}"
        )
    agg_sql = ",\n       ".join(aggs)
    return (
        f"WITH preds AS ({preds_select}),\n"
        f"long_form AS ({long_sql})\n"
        f"SELECT lang,\n       {agg_sql}\nFROM long_form GROUP BY lang"
    )


def chunk_paginate(df: DataFrame, order_col: str, chunk_size: int = 10) -> DataFrame:
    """K3: assign row_number + chunk id (10-row pages for the gnuplot
    histograms). Global window is fine here — this runs over *aggregated*
    (small) data; never apply to raw rows at scale."""
    w = Window.orderBy(order_col)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "chunk", F.floor((F.col("rn") - F.lit(1)) / F.lit(chunk_size)).cast("bigint")
        )
    )
