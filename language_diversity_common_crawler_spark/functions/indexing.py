"""Inverted index and TF-IDF term analytics over the documents table.

The reference computes no search index (its analytics stop at language
histograms — src/strategies/ in the reference); this is a
training-data-pipeline extension: once a 100-TB crawl corpus exists, the
first two asks are "which documents contain term X" (inverted index /
postings) and "what is each document about" (top distinctive terms), both
as batch jobs over the same tokenization the quality/dedup stages use.

Scale design (the part that matters at 10^9 documents):

* Postings are capped BEFORE any aggregation buffer exists: a
  ``row_number`` window partitioned by term ranks (term, doc_id) pairs
  sort-based — Spark's window streams each term's partition, so a
  stop-word appearing in every document never materializes 10^9 doc ids
  in one aggregator. ``collect_list`` only ever sees <= K_POSTINGS
  non-null values per term.
* The follow-up ``groupBy(term)`` reuses the window's hash partitioning
  (same key), so the whole postings build is ONE shuffle of the exploded
  pairs.
* Document frequency for TF-IDF derives from the per-(doc, term) tf
  aggregate, not from re-exploding the corpus.
* The tf x df join shuffles on term with AQE handling skew; the df side
  is vocabulary-sized (could exceed broadcast limits at web scale, so no
  broadcast hint is forced — AQE promotes it when it fits).
* The relevance score is exact-integer (``tf * 1_000_000 div df``,
  monotone in tf/df): floats would desync the DuckDB oracle value-hash
  (ln() differs across libm implementations) and integer math keeps the
  ranking deterministic under any partitioning.

All expressions are dialect-shared where the engines agree and
per-dialect only at the explode step (Spark ``explode`` / DuckDB
``unnest``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dialect import idiv
from .text_analysis import _sql_norm

K_POSTINGS = 5   # posting-list cap per term
K_TOP_TERMS = 3  # distinctive terms kept per document
_SCALE = 1_000_000  # integer score scale (ppm)


def tokens_expr(text: str, dialect: str) -> str:
    """Lower-cased whitespace tokens of the normalized text — the same
    norm the quality/dedup stages use, so index terms match their
    vocabulary."""
    split_fn = "string_split" if dialect == "duckdb" else "split"
    return f"{split_fn}(lower({_sql_norm(text, dialect)}), ' ')"


# --- inverted index (term -> df + capped postings) --------------------------


def term_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_POSTINGS,
) -> DataFrame:
    """Per term: document frequency + the k smallest doc ids as a
    comma-joined posting string.

    distinct-per-document tokens (``array_distinct`` before the explode)
    make df a true document frequency in one pass; the window cap keeps
    the per-term aggregation state O(k) regardless of term popularity.
    """
    pairs = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(F.expr(tokens_expr(text_col, "spark")))
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("rn") <= k, F.col("doc_id"))
                    )
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


def sql_term_postings(table: str, k: int = K_POSTINGS) -> str:
    """DuckDB twin of :func:`term_postings`."""
    toks = tokens_expr("text", "duckdb")
    return f"""
WITH pairs AS (
  SELECT doc_id, unnest(list_distinct({toks})) AS term FROM {table}
), nonempty AS (
  SELECT doc_id, term FROM pairs WHERE term <> ''
), ranked AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM nonempty
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string(list_sort(list(doc_id) FILTER (WHERE rn <= {k})),
                       ',') AS postings
FROM ranked GROUP BY term
"""


# --- TF-IDF top terms per document -------------------------------------------


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_TOP_TERMS,
) -> DataFrame:
    """Top-k distinctive terms per document, ranked by the exact-integer
    relevance score ``tf * 1e6 div df`` (ties broken by term) — tf/df is
    monotone-decreasing in df like idf, with no float in the plan."""
    pairs = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.expr(tokens_expr(text_col, "spark"))).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = pairs.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score_ppm",
        F.expr(idiv(f"tf * {_SCALE}", "df", "spark")).cast("bigint"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_ppm"), F.asc("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select("doc_id", "term", "tf", "df", "score_ppm",
                F.col("term_rank").cast("int").alias("term_rank"))
    )


def sql_tfidf_top_terms(table: str, k: int = K_TOP_TERMS) -> str:
    """DuckDB twin of :func:`tfidf_top_terms`."""
    toks = tokens_expr("text", "duckdb")
    score = idiv(f"t.tf * {_SCALE}", "d.df", "duckdb")
    return f"""
WITH pairs AS (
  SELECT doc_id, unnest({toks}) AS term FROM {table}
), nonempty AS (
  SELECT doc_id, term FROM pairs WHERE term <> ''
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM nonempty GROUP BY doc_id, term
), dfq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         CAST({score} AS BIGINT) AS score_ppm
  FROM tf t JOIN dfq d USING (term)
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score_ppm DESC, term ASC) AS term_rank
  FROM scored
)
SELECT doc_id, term, tf, df, score_ppm, CAST(term_rank AS INT) AS term_rank
FROM ranked WHERE term_rank <= {k}
"""
