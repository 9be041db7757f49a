"""Structured Streaming variant of the extract pipeline.

The reference is a bounded single pass, but two of its patterns are
streaming-shaped (SURVEY.md §2.10):

- the batched log sink flushing every 100 records
  (/root/reference/src/repositories/repo_handler.py:57-63) → here a
  ``foreachBatch`` sink committing one parquet snapshot per micro-batch;
- the running stats counters finalized by an end-of-stream sentinel
  (/root/reference/src/main.py:57-61, stats_handler.py) → here a stateful
  streaming aggregation that emits on every trigger.

Sources: a file stream over a pages-parquet directory (new segment files
appear → new micro-batch), the natural Spark translation of "new WARC
segments arrive". Event time is ``warc_ts``; the windowed variant uses a
watermark so late pages older than the allowed lateness are dropped
deterministically.

All transformations are the SAME functions the batch path uses
(plans.pipeline.extract_pipeline works unmodified on a streaming
DataFrame — that is the point of declaring the pipeline over DataFrames).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.pages import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a pages parquet directory. One new file =
    one segment arriving; maxFilesPerTrigger reproduces the reference's
    one-segment-at-a-time cadence (Makefile:13-15) as micro-batches."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_lang_counts(pages_stream: DataFrame) -> DataFrame:
    """Running per-language count over the stream (complete-mode aggregate
    — the streaming form of the reference's running stats counters)."""
    return pages_stream.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.length("text")).alias("total_chars"),
    )


def windowed_lang_counts(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed language counts with a watermark: late pages
    beyond ``watermark`` are dropped and windows finalize (append mode)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )


def run_microbatch_extract(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    checkpoint_dir: str,
    batch_fn=None,
) -> None:
    """Run the FULL extract pipeline (decode → boilerplate → 3 lang-ID
    models) as a stream, committing one parquet snapshot per micro-batch
    via foreachBatch — the Iceberg-snapshot-per-flush shape of the
    reference's 100-record buffered sink. Blocks until the directory's
    current files are drained (availableNow trigger → bounded run,
    exactly-once via the checkpoint)."""
    from ..plans.pipeline import extract_pipeline

    stream = read_pages_stream(spark, pages_path)
    extracted = extract_pipeline(stream).select(
        "url", "segment", "content", "df_lang", "li_lang", "cld_lang"
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id:05d}")
        )
        if batch_fn is not None:
            batch_fn(batch_df, batch_id)

    q = (
        extracted.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
