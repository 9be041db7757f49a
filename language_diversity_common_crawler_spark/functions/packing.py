"""Sequence packing — assigning chunked training text to fixed-token-budget
context windows ("packs"), the step between chunking and tokenized batch
assembly in an LLM data pipeline.

Semantics: GPT-style concatenate-and-split. Within a shard, chunks are laid
end-to-end in a deterministic order and the resulting token stream is cut
every ``budget`` tokens; each chunk's pack is where its first token lands.
A chunk whose span crosses a cut is flagged ``straddles`` (the tokenizer
downstream splits it). This is the packing real pretraining runs use —
greedy first-fit-decreasing bin packing wastes less padding only when
documents must NOT straddle, and it is order-dependent; concat-and-split is
deterministic, exact, and one window pass.

Scale shape: ONE window aggregate per shard (running token sum), no joins,
no shuffle beyond the hash exchange to shards. The order inside a shard is
(doc_id, chunk_idx) — a pure function of the data, so the layout is
reproducible across cluster sizes and resumes. ``n_shards`` bounds the
sequential extent: each shard's cumsum is a single-task ordered scan, so
shards must outnumber cores well (default 64; at 100 TB use thousands —
the per-shard state is one running integer, so shard count is free).
Contrast: a single global Window.orderBy would serialize the corpus
through one task (the offset_skip caveat, SURVEY §2.4 F2).

The reference has no packing (it never tokenizes); this is a training-data
extension. Token counts are the exact whitespace model from
text_analysis.token_stats_from_norm, so both engines agree integer-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text_analysis import (
    CHUNK_STRIDE,
    CHUNK_WIDTH,
    document_chunks,
    sql_document_chunks,
    token_stats_from_norm,
    _sql_norm,
)

PACK_BUDGET = 512  # tokens per context window
N_SHARDS = 64


def sequence_packing(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    n_shards: int = N_SHARDS,
    width: int = CHUNK_WIDTH,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chunk documents, then pack chunks into ``budget``-token windows.

    Output: one row per chunk — (doc_id, chunk_idx, shard, n_tokens,
    pack_id, pack_offset, straddles). pack_id numbers windows within the
    shard; pack_offset is the chunk's first-token position inside its
    pack; straddles marks chunks split across a pack boundary."""
    chunks = document_chunks(docs, id_col=id_col, text_col=text_col,
                             width=width, stride=stride)
    chunks = chunks.withColumn(
        "__norm", F.expr(_sql_norm("chunk_text", "spark"))
    ).withColumn(
        "n_tokens",
        F.expr(token_stats_from_norm("__norm", "spark")["n_tokens"]),
    )
    shard = (F.col(id_col) % n_shards).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col, "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        chunks.withColumn("shard", shard)
        .withColumn("__before", F.coalesce(F.sum("n_tokens").over(w),
                                           F.lit(0)))
        .select(
            F.col(id_col),
            "chunk_idx",
            "shard",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.floor(F.col("__before") / budget).cast("bigint").alias("pack_id"),
            (F.col("__before") % budget).cast("bigint").alias("pack_offset"),
            (
                (F.col("__before") % budget) + F.col("n_tokens") > budget
            ).alias("straddles"),
        )
    )
    return out


def sql_sequence_packing(
    table: str = "documents",
    budget: int = PACK_BUDGET,
    n_shards: int = N_SHARDS,
    width: int = CHUNK_WIDTH,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`sequence_packing` (same chunker CTE, same
    window frame, same integer arithmetic)."""
    chunks = sql_document_chunks(table, id_col=id_col, text_col=text_col,
                                 width=width, stride=stride)
    norm = _sql_norm("chunk_text", "duckdb")
    n_tok = token_stats_from_norm("__norm", "duckdb")["n_tokens"]
    return f"""
WITH chunks AS ({chunks}),
toks AS (
  SELECT {id_col}, chunk_idx,
         CAST({id_col} % {n_shards} AS INT) AS shard,
         {n_tok} AS n_tokens
  FROM (SELECT {id_col}, chunk_idx, {norm} AS __norm FROM chunks)),
packed AS (
  SELECT {id_col}, chunk_idx, shard, n_tokens,
         coalesce(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY {id_col}, chunk_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM toks)
SELECT {id_col}, chunk_idx, shard,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(before // {budget} AS BIGINT) AS pack_id,
       CAST(before % {budget} AS BIGINT) AS pack_offset,
       (before % {budget}) + n_tokens > {budget} AS straddles
FROM packed
"""


def pack_manifest(packed: DataFrame) -> DataFrame:
    """Per-(shard, pack) manifest: chunk count, token fill, utilization in
    basis points — the shuffle-once rollup a batch assembler reads instead
    of re-scanning chunk rows. Fill counts only the tokens that START in
    the pack (straddling tails belong to the next pack's stream position),
    so all packs except each shard's last sum to >= budget."""
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("straddles"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_straddling"),
    )


def sql_pack_manifest(packing_select: str) -> str:
    return f"""
SELECT shard, pack_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT)
         AS n_straddling
FROM ({packing_select}) p
GROUP BY shard, pack_id
"""
