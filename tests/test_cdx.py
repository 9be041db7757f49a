"""CDX-J index source: shard roundtrip, tolerant parsing, fetch-plan math."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from language_diversity_common_crawler_spark.sources import cdx

SF_DIR = "/root/testdata/sf0.001"


def test_fixture_roundtrip_fields(spark, tmp_path):
    out = cdx.write_fixture_from_documents(SF_DIR, str(tmp_path / "cdx"))
    got = cdx.cdx_records(spark, f"{out}/*.cdx.gz")
    rows = {r["url"]: r for r in got.collect()}
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    ).to_pydict()
    assert len(rows) == len(t["doc_id"])
    for doc_id, n_chars in zip(t["doc_id"], t["n_chars"]):
        r = rows[f"https://site{doc_id % 20}.example.org/page/{doc_id}"]
        assert r["surt"] == f"org,example,site{doc_id % 20})/page/{doc_id}"
        assert r["ts"] == 20240101000000 + doc_id
        assert r["status"] == (404 if doc_id % 10 == 0 else 200)
        assert r["length"] == n_chars
        assert r["offset"] == doc_id * 1024
        assert r["filename"].endswith(f"shard-{doc_id % 8}.warc.gz")


def test_malformed_lines_dropped(spark, tmp_path):
    p = tmp_path / "bad.cdx.gz"
    good = (
        'com,ex)/a 20240101000000 {"url": "https://ex.com/a", "mime": '
        '"text/html", "status": "200", "length": "5", "offset": "0", '
        '"filename": "f.warc.gz"}'
    )
    lines = [
        good,
        "",                      # blank
        "no-timestamp-here",     # no shape
        "com,ex)/b 2024 {}",     # ts not 14 digits
    ]
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    got = cdx.cdx_records(spark, str(p)).collect()
    assert len(got) == 1 and got[0]["url"] == "https://ex.com/a"


def test_fetch_plan_excludes_nonfetchable(spark, tmp_path):
    out = cdx.write_fixture_from_documents(SF_DIR, str(tmp_path / "cdx"))
    recs = cdx.cdx_records(spark, f"{out}/*.cdx.gz")
    plan = {r["filename"]: r for r in cdx.fetch_plan(recs).collect()}
    # per-shard totals recomputed from the parsed rows
    want = (
        recs.filter((F.col("status") == 200) & (F.col("mime") == "text/html"))
        .groupBy("filename").count().collect()
    )
    assert {r["filename"]: r["count"] for r in want} == {
        f: r["n_records"] for f, r in plan.items()
    }
    # 404s (doc_id%10==0) and pdfs (doc_id%9==0, not %10==0) are excluded
    n_all = recs.count()
    n_plan = sum(r["n_records"] for r in plan.values())
    assert n_plan < n_all
    for r in plan.values():
        assert r["first_surt"] <= r["last_surt"]


def test_fixture_rewrite_prunes_orphan_shards(spark, tmp_path):
    """Shrinking n_files on a rewrite must delete the old extra shards —
    otherwise the readers' *.cdx.gz glob ingests stale rows (the keyed
    _DONE sentinel forces the rewrite; prune_orphans removes leftovers)."""
    out = str(tmp_path / "cdx")
    cdx.write_fixture_from_documents(SF_DIR, out, n_files=8)
    assert len([f for f in os.listdir(out) if f.endswith(".cdx.gz")]) == 8
    cdx.write_fixture_from_documents(SF_DIR, out, n_files=4)
    names = sorted(f for f in os.listdir(out) if f.endswith(".cdx.gz"))
    assert names == [f"cdx-{i:05d}.cdx.gz" for i in range(4)]
    n = cdx.cdx_records(spark, f"{out}/*.cdx.gz").count()
    import pyarrow.parquet as pq

    n_docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id"]
    ).num_rows
    assert n == n_docs


def test_cdx_records_stream_matches_batch(spark, tmp_path):
    """Streaming shard ingest: cdx.gz files arriving in a directory become
    micro-batches through the SAME parse; availableNow drains one file per
    trigger and the union of batches equals the batch reader."""
    out = cdx.write_fixture_from_documents(SF_DIR, str(tmp_path / "cdx"), n_files=3)
    stream = cdx.cdx_records_stream(spark, out)
    assert stream.isStreaming
    sink = str(tmp_path / "sink")
    batches = []

    def _sink(df, batch_id):
        batches.append(df.count())
        df.write.mode("overwrite").parquet(f"{sink}/batch={batch_id:05d}")

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(batches) == 3 and all(b > 0 for b in batches)
    got = spark.read.parquet(f"{sink}/batch=*").drop("batch")
    want = cdx.cdx_records(spark, f"{out}/*.cdx.gz")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
