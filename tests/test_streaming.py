"""Structured Streaming: micro-batch extract sink, running aggregates, and
watermarked windows — verified against the equivalent batch queries."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from language_diversity_common_crawler_spark.sources import pages as pg  # noqa: E402
from language_diversity_common_crawler_spark.streaming import microbatch as mb  # noqa: E402


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    """Three parquet files in one dir — three micro-batches."""
    d = str(tmp_path_factory.mktemp("pages_stream"))
    for i in range(3):
        pg.pages_df(spark, 60, seed=100 + i, n_partitions=1).write.mode(
            "append"
        ).parquet(d)
    return d


def test_microbatch_extract_matches_batch(spark, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    seen_batches = []
    mb.run_microbatch_extract(
        spark, pages_dir, out, ckpt,
        batch_fn=lambda df, bid: seen_batches.append(bid),
    )
    assert len(seen_batches) >= 1

    stream_rows = spark.read.parquet(f"{out}/batch=*").select(
        "url", "df_lang", "li_lang", "cld_lang"
    )
    from language_diversity_common_crawler_spark.plans.pipeline import (
        extract_pipeline,
    )

    batch_rows = extract_pipeline(spark.read.parquet(pages_dir)).select(
        "url", "df_lang", "li_lang", "cld_lang"
    )
    got = {tuple(r) for r in stream_rows.collect()}
    want = {tuple(r) for r in batch_rows.collect()}
    assert got == want and len(got) > 0


def test_streaming_lang_counts_complete_mode(spark, pages_dir):
    stream = mb.read_pages_stream(spark, pages_dir, max_files_per_trigger=2)
    agg = mb.streaming_lang_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("lang_counts_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["lang"]: (r["n_pages"], r["total_chars"])
        for r in spark.sql("SELECT * FROM lang_counts_t").collect()
    }
    want = {
        r["lang"]: (r["n_pages"], r["total_chars"])
        for r in spark.read.parquet(pages_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .collect()
    }
    assert got == want


def test_windowed_counts_watermark(spark, pages_dir):
    stream = mb.read_pages_stream(spark, pages_dir, max_files_per_trigger=3)
    win = mb.windowed_lang_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        win.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM win_counts_t")
    # append-mode emits only watermark-finalized windows; every emitted row
    # must match the batch computation for its window
    batch = (
        spark.read.parquet(pages_dir)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("lang"),
            F.col("n_pages"),
        )
    )
    want = {
        (r["window_start"], r["lang"]): r["n_pages"] for r in batch.collect()
    }
    for r in got.collect():
        assert want[(r["window_start"], r["lang"])] == r["n_pages"]


def test_stateful_streaming_seen_dedup(spark, tmp_path):
    """applyInPandasWithState bloom dedup: first occurrence of each URL
    across micro-batches, state carried between batches."""
    from pyspark.sql.types import StringType, StructField, StructType

    from language_diversity_common_crawler_spark.streaming import seen_state

    d = str(tmp_path / "urls")
    schema = StructType([StructField("url_canon", StringType(), False)])
    # batch 1: urls 0..99; batch 2: 50..149 (50 dups); batch 3: all dups
    batches = [range(0, 100), range(50, 150), range(0, 150)]
    for i, rng in enumerate(batches):
        spark.createDataFrame(
            [(f"https://h{u % 7}.ex/p/{u}",) for u in rng], schema
        ).coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = seen_state.streaming_unseen_urls(stream, n_parts=4)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("unseen_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [r["url_canon"] for r in spark.sql("SELECT * FROM unseen_t").collect()]
    # each url exactly once (bloom has no false negatives; at 150 keys in
    # 2^20 bits the false-positive probability is ~0)
    assert len(got) == len(set(got))
    assert set(got) == {f"https://h{u % 7}.ex/p/{u}" for u in range(150)}
