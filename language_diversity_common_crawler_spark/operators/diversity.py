"""Language-diversity indices over a language-label column.

The reference's research question is literally this repo's name — measuring
language diversity in Common Crawl. Its published analysis stops at the
per-language histogram (/root/reference/commands/count_fastwarc_result.sh:5-6,
consumed by gnuplot); the standard way to summarize such a histogram into a
comparable scalar is the ecology/NLP diversity-index family, so we expose it
as a first-class operator over any language column (model predictions or
ground truth) with arbitrary grouping keys:

- ``n_langs``        — richness (distinct languages seen)
- ``total_docs``     — group size
- ``shannon_milli``  — Shannon entropy of the language distribution in
                       milli-bits: round(1000 * -sum p_i log2 p_i)
- ``simpson_milli``  — Gini–Simpson index in milli-units:
                       round(1000 * (1 - sum p_i^2))

Spark shape: two-stage hash aggregation. Stage 1 groups by
(group_cols, lang) — map-side partial aggregation, shuffle cardinality is
|groups| x |languages| (tiny at any input scale). Stage 2 reduces those
counts per group — |groups| rows. No UDF, no window, whole-stage codegen
throughout; the plan scales to arbitrary input size because nothing after
the first partial aggregation is proportional to the row count.

Oracle-determinism design: a float sum over per-language terms is
order-nondeterministic across Spark partition schedules (last-ulp drift),
so raw-double entropy could flake the value-hash gate between RUNS of the
same engine. Instead each term cnt*log2(cnt) is quantized to an exact
BIGINT at a 1e-3 grid *before* summation — integer addition is
order-independent, so within an engine the result is bit-stable at ANY
scale and partitioning. Cross-ENGINE (Spark vs DuckDB) parity
additionally requires the two log2 implementations to round each term to
the same grid cell: they can differ in the last ulp, which flips a term
only when it lands within ~ulp(term) of a .5 grid boundary — negligible
at gate-scale counts (<=1e5: flip probability ~1e-9 per term, and the
gate data is fixed so a local pass is a driver pass), but NOT guaranteed
at 1e10-count groups, where no DuckDB oracle runs anyway; there the
within-engine determinism is the property that matters. The final
entropy is reconstructed from the exact integer sum (shared quantization
error < n_langs * 5e-4 / total bits, far below the reported milli
resolution for any non-trivial group). sum(cnt^2) is kept exact the same
way (term-wise products summed as DECIMAL(38,0) / HUGEINT so ~1e10-doc
groups cannot overflow the accumulator).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per-term quantization grid for cnt*log2(cnt): 1e3 keeps the summed
# magnitude within BIGINT for ~1e10-doc, 200-language groups while the
# shared rounding error stays orders of magnitude under the milli output.
_TERM_SCALE = 1000.0


def diversity_metrics(
    df: DataFrame, lang_col: str, group_cols: Sequence[str]
) -> DataFrame:
    """Richness + Shannon + Gini–Simpson per group over ``lang_col``."""
    counts = (
        df.groupBy(*[F.col(c) for c in group_cols], F.col(lang_col).alias("lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    term_milli = F.round(
        F.col("cnt").cast("double") * F.log2(F.col("cnt").cast("double"))
        * F.lit(_TERM_SCALE)
    ).cast("bigint")
    sq = (
        F.col("cnt").cast("decimal(19,0)") * F.col("cnt").cast("decimal(19,0)")
    )
    agg = counts.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.sum("cnt").cast("bigint").alias("total_docs"),
        F.sum(term_milli).cast("bigint").alias("_slc_milli"),
        F.sum(sq).alias("_sc2"),
    )
    total_d = F.col("total_docs").cast("double")
    entropy_bits = F.log2(total_d) - (
        F.col("_slc_milli").cast("double") / F.lit(_TERM_SCALE)
    ) / total_d
    simpson = F.lit(1.0) - F.col("_sc2").cast("double") / (total_d * total_d)
    return agg.select(
        *group_cols,
        "n_langs",
        "total_docs",
        F.round(entropy_bits * F.lit(1000.0)).cast("bigint").alias("shannon_milli"),
        F.round(simpson * F.lit(1000.0)).cast("bigint").alias("simpson_milli"),
    )


def lang_kl_from_global(
    df: DataFrame, lang_col: str, group_col: str
) -> DataFrame:
    """Per-group KL divergence (milli-bits) of the group's language
    distribution from the whole corpus's — the skew/drift detector: a
    source whose language mix diverges from the corpus pops to the top.

    Plan: one hash aggregation to (group, lang) counts, then window
    functions over that tiny relation (|groups| x |languages| rows — the
    unpartitioned window is over aggregated data, never raw rows), then a
    final |groups|-row aggregation. KL terms are quantized to exact
    BIGINTs per (group, lang) before summation, same determinism argument
    as :func:`diversity_metrics`; the log argument is computed in doubles
    with an identical expression shape in both dialects (bigint products
    would overflow at ~1e10-doc corpora)."""
    from pyspark.sql.window import Window

    counts = (
        df.groupBy(F.col(group_col), F.col(lang_col).alias("lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w_grp = Window.partitionBy(group_col)
    w_lang = Window.partitionBy("lang")
    w_all = Window.partitionBy()
    ratio = (
        F.col("cnt").cast("double") * F.col("grand").cast("double")
    ) / (F.col("t").cast("double") * F.col("gcnt").cast("double"))
    term_milli = F.round(
        F.col("cnt").cast("double") * F.log2(ratio) * F.lit(_TERM_SCALE)
    ).cast("bigint")
    enriched = (
        counts.withColumn("t", F.sum("cnt").over(w_grp))
        .withColumn("gcnt", F.sum("cnt").over(w_lang))
        .withColumn("grand", F.sum("cnt").over(w_all))
        .withColumn("term_milli", term_milli)
    )
    return (
        enriched.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_langs"),
            F.sum("cnt").cast("bigint").alias("total_docs"),
            F.sum("term_milli").cast("bigint").alias("_skl"),
        )
        .select(
            group_col,
            "n_langs",
            "total_docs",
            F.round(
                F.col("_skl").cast("double") / F.col("total_docs").cast("double")
            ).cast("bigint").alias("kl_milli"),
        )
    )


def sql_lang_kl_from_global(
    base_select: str, lang_col: str, group_col: str
) -> str:
    """DuckDB twin of :func:`lang_kl_from_global` (identical expression
    shapes so the quantized terms match bit-for-bit)."""
    scale = f"{_TERM_SCALE:.1f}"
    return (
        f"WITH base AS ({base_select}),\n"
        f"counts AS (\n"
        f"  SELECT {group_col}, {lang_col} AS lang,\n"
        f"         CAST(count(*) AS BIGINT) AS cnt\n"
        f"  FROM base GROUP BY {group_col}, {lang_col}\n"
        f"),\n"
        f"enriched AS (\n"
        f"  SELECT {group_col}, cnt,\n"
        f"         sum(cnt) OVER (PARTITION BY {group_col}) AS t,\n"
        f"         sum(cnt) OVER (PARTITION BY lang) AS gcnt,\n"
        f"         sum(cnt) OVER () AS grand\n"
        f"  FROM counts\n"
        f"),\n"
        f"terms AS (\n"
        f"  SELECT {group_col}, cnt,\n"
        f"         CAST(round(CAST(cnt AS DOUBLE) * log2(\n"
        f"           (CAST(cnt AS DOUBLE) * CAST(grand AS DOUBLE)) /\n"
        f"           (CAST(t AS DOUBLE) * CAST(gcnt AS DOUBLE))\n"
        f"         ) * {scale}) AS BIGINT) AS term_milli\n"
        f"  FROM enriched\n"
        f")\n"
        f"SELECT {group_col},\n"
        f"       CAST(count(*) AS BIGINT) AS n_langs,\n"
        f"       CAST(sum(cnt) AS BIGINT) AS total_docs,\n"
        f"       CAST(round(CAST(sum(term_milli) AS DOUBLE) /\n"
        f"            CAST(sum(cnt) AS DOUBLE)) AS BIGINT) AS kl_milli\n"
        f"FROM terms GROUP BY {group_col}"
    )


def sql_diversity_metrics(
    base_select: str, lang_col: str, group_cols: Sequence[str]
) -> str:
    """DuckDB twin of :func:`diversity_metrics` — identical per-term
    quantization so the integer sums (and therefore the hashed outputs)
    match Spark's bit-for-bit."""
    keys = ", ".join(group_cols)
    scale = f"{_TERM_SCALE:.1f}"
    return (
        f"WITH base AS ({base_select}),\n"
        f"counts AS (\n"
        f"  SELECT {keys}, {lang_col} AS lang,\n"
        f"         CAST(count(*) AS BIGINT) AS cnt\n"
        f"  FROM base GROUP BY {keys}, {lang_col}\n"
        f"),\n"
        f"agg AS (\n"
        f"  SELECT {keys},\n"
        f"         CAST(count(*) AS BIGINT) AS n_langs,\n"
        f"         CAST(sum(cnt) AS BIGINT) AS total_docs,\n"
        f"         CAST(sum(CAST(round(CAST(cnt AS DOUBLE) *"
        f" log2(CAST(cnt AS DOUBLE)) * {scale}) AS BIGINT)) AS BIGINT)"
        f" AS _slc_milli,\n"
        f"         sum(CAST(cnt AS HUGEINT) * cnt) AS _sc2\n"
        f"  FROM counts GROUP BY {keys}\n"
        f")\n"
        f"SELECT {keys}, n_langs, total_docs,\n"
        f"       CAST(round((log2(CAST(total_docs AS DOUBLE)) -\n"
        f"            (CAST(_slc_milli AS DOUBLE) / {scale})"
        f" / CAST(total_docs AS DOUBLE)) * 1000.0) AS BIGINT)"
        f" AS shannon_milli,\n"
        f"       CAST(round((1.0 - CAST(_sc2 AS DOUBLE) /\n"
        f"            (CAST(total_docs AS DOUBLE) * CAST(total_docs AS DOUBLE)))"
        f" * 1000.0) AS BIGINT) AS simpson_milli\n"
        f"FROM agg"
    )
