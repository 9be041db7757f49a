"""CCNet-style duplicated-line removal.

CCNet (Wenzek et al. 2020, §4.1) dedups Common Crawl at the PARAGRAPH
(newline-delimited) level before language ID: boilerplate lines (footers,
nav text, cookie banners) repeat across millions of pages, and removing
every occurrence but the first strips most of the template noise that
document-level dedup can't see. The reference corpus here keeps the
document grain (`/root/reference/src/main.py` iterates WARC records), so
this operator is the training-data extension of that pipeline: it runs
after text extraction, before language stats.

Unit of dedup: a non-blank line, keyed by the 60-bit md5 of its
``lower(trim(line))`` normalization (CCNet lowercases + strips digits;
we keep the digit-preserving variant so the key stays a pure function of
visible text). First occurrence in the global ``(doc_id, line_pos)``
order survives; every later occurrence — in the same doc or any other —
is dropped. Docs whose every line was seen earlier keep their row with
empty clean text (mirroring spans.duplicated_span_removal).

Scale shape (10^10 pages): the line stream is ONE hash exchange — a
``groupBy(line_hash).agg(min(packed_key))`` whose map-side partial
combine collapses hot boilerplate keys (a footer on every page arrives
at the reducer as one row per upstream task, not one per page), then the
keeper table joins back on line_hash (sort-merge at corpus scale; AQE
skew-split covers residual hot keys — a window ``row_number() OVER
(PARTITION BY line_hash)`` formulation was rejected because it funnels
every occurrence of a hot line through one task with no partial
aggregation), and reassembly is one doc-keyed exchange. Everything is
whole-stage-codegen JVM expressions; no Python.

Key packing: ``doc_id * 2^20 + line_pos`` as DECIMAL(38,0) — exact in
both engines for any BIGINT doc_id and < 2^20 lines/doc. The original
BIGINT key overflowed for doc_id >= 2^43, which the crawl→corpus
integration test (tests/test_crawl_to_corpus.py) hit immediately: at
frontier scale the natural doc_id is the 60-bit md5 of the URL, not a
small per-segment sequence number. A single DECIMAL min is exact and
identical in Spark / DuckDB / Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import sql_md5_60

POS_BITS = 20  # line position packs into the low 20 bits of the order key


def wet_text_expr(dialect: str) -> str:
    """Synthetic WET-style page text over the ``documents`` table:
    title line + body + a per-source footer line (the footer is the
    deliberately-duplicated boilerplate — every doc from the same source
    shares it, which is exactly the line class CCNet dedup removes).
    Dialect-identical semantics; NULL text is filtered by callers.
    ``source`` is coalesced to '' so a NULL-source doc keeps its title +
    body instead of the whole concat going NULL and the doc silently
    vanishing from line_dedup's per-doc output (the sibling
    _source_span_hashes filters NULL source explicitly — NULL sources are
    in-domain)."""
    nl = "chr(10)"
    cast = "VARCHAR" if dialect == "duckdb" else "STRING"
    return (
        f"('Page ' || CAST(doc_id AS {cast}) || {nl} || text || {nl} || "
        f"'(c) example ' || COALESCE(source, ''))"
    )


def line_dedup(docs: DataFrame) -> DataFrame:
    """Duplicated-line removal over documents (WET-style text derived by
    :func:`wet_text_expr`). Returns one row per input doc:
    ``(doc_id, n_lines, n_kept, clean_text)`` where ``clean_text`` is the
    surviving lines re-joined in original order ('' when nothing
    survives) and ``n_lines`` counts the doc's non-blank lines."""
    lines = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.posexplode(
                F.split(F.expr(wet_text_expr("spark")), "\n")
            ).alias("pos", "line"),
        )
        .filter(F.trim("line") != "")
        .select(
            "doc_id",
            "pos",
            "line",
            F.expr(sql_md5_60("lower(trim(line))", "spark")).alias("lh"),
            (
                F.col("doc_id").cast("decimal(38,0)")
                * F.lit(1 << POS_BITS) + F.col("pos")
            ).alias("okey"),
        )
    )
    keepers = lines.groupBy("lh").agg(F.min("okey").alias("keep_key"))
    kept = (
        lines.join(keepers, "lh")
        .withColumn("is_kept", (F.col("okey") == F.col("keep_key")))
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.col("is_kept").cast("bigint")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("is_kept"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return per_doc.select(
        "doc_id", "n_lines", "n_kept",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def sql_line_dedup(table: str = "documents") -> str:
    """DuckDB twin of :func:`line_dedup`. Positional unnest uses the
    lateral ``unnest(range(len))`` + 1-based list indexing device of the
    span CTEs (``pos`` stays 0-based like Spark's posexplode)."""
    wet = wet_text_expr("duckdb")
    lh = sql_md5_60("lower(trim(line))", "duckdb")
    return f"""
WITH split AS (
  SELECT doc_id, string_split({wet}, chr(10)) AS ls
  FROM {table} WHERE text IS NOT NULL),
raw AS (
  SELECT doc_id, t.pos, ls[CAST(t.pos + 1 AS INT)] AS line
  FROM split, unnest(range(0, len(ls))) AS t(pos)),
lines AS (
  SELECT doc_id, pos, line, {lh} AS lh,
         CAST(doc_id AS DECIMAL(38,0)) * {1 << POS_BITS} + pos AS okey
  FROM raw WHERE trim(line) <> ''),
keepers AS (SELECT lh, min(okey) AS keep_key FROM lines GROUP BY lh)
SELECT l.doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN l.okey = k.keep_key THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       coalesce(
         string_agg(CASE WHEN l.okey = k.keep_key THEN l.line END, chr(10)
                    ORDER BY l.pos),
         '') AS clean_text
FROM lines l JOIN keepers k USING (lh)
GROUP BY l.doc_id
"""
