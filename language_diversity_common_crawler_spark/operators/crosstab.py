"""F3/A7/K2 — fixed-language cross-tab (commands/count_fix_lang.sh:8-11).

Fix one model's prediction to a language; count the other two models'
predicted languages; sort desc by count (K2, `sort -k3 -rn`).
Spark: filter → two group-bys unioned — filter prunes before the (tiny)
shuffle; at scale the filter pushes into the scan when predictions are
materialized columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.langspec import MODEL_PREFIX, MODELS


def fixed_lang_crosstab(preds: DataFrame, fixed_model: str, fixed_lang: str) -> DataFrame:
    others = [m for m in MODELS if m != fixed_model]
    fixed_col = f"{MODEL_PREFIX[fixed_model]}_lang"
    filtered = preds.filter(F.col(fixed_col) == fixed_lang)
    parts = []
    for m in others:
        c = f"{MODEL_PREFIX[m]}_lang"
        parts.append(
            filtered.groupBy(F.col(c).alias("lang"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .withColumn("model", F.lit(m))
        )
    out = parts[0].unionByName(parts[1])
    return out.select("model", "lang", "cnt").orderBy(F.desc("cnt"), "model", "lang")


def sql_fixed_lang_crosstab(preds_select: str, fixed_model: str, fixed_lang: str) -> str:
    others = [m for m in MODELS if m != fixed_model]
    fixed_col = f"{MODEL_PREFIX[fixed_model]}_lang"
    parts = []
    for m in others:
        c = f"{MODEL_PREFIX[m]}_lang"
        parts.append(
            f"SELECT '{m}' AS model, {c} AS lang, CAST(count(*) AS BIGINT) AS cnt "
            f"FROM preds WHERE {fixed_col} = '{fixed_lang}' GROUP BY {c}"
        )
    union = " UNION ALL ".join(parts)
    return (
        f"WITH preds AS ({preds_select})\n"
        f"SELECT model, lang, cnt FROM ({union}) ORDER BY cnt DESC, model, lang"
    )
