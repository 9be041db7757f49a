"""WET export (sinks/wet.py): record-format round-trip through the repo's
own WARC parser, the distributed shard writer's manifest contract, and the
full loop real users run — ``.warc.gz`` in → extract → ``.warc.wet.gz``
out → re-parse byte-identically."""

from __future__ import annotations

import glob
from datetime import datetime, timezone

from language_diversity_common_crawler_spark.sinks import wet
from language_diversity_common_crawler_spark.sources import pages as pg
from language_diversity_common_crawler_spark.sources import warc


TS = datetime(2023, 9, 21, 7, 37, 11, tzinfo=timezone.utc)


def test_wet_record_parses_with_own_warc_parser():
    rec = wet.wet_record_bytes("https://h.ex/a", TS, "héllo wörld")
    parsed = list(warc.iter_warc_records(rec))
    assert len(parsed) == 1
    r = parsed[0]
    assert r["warc_type"] == "conversion"
    assert r["url"] == "https://h.ex/a"
    assert r["warc_date"] == "2023-09-21T07:37:11Z"
    assert r["html"] == "héllo wörld".encode("utf-8")


def test_wet_record_is_deterministic_and_length_exact():
    a = wet.wet_record_bytes("https://h.ex/a", TS, "text")
    b = wet.wet_record_bytes("https://h.ex/a", TS, "text")
    assert a == b  # reproducible record id + digest
    c = wet.wet_record_bytes("https://h.ex/a", TS, "other")
    assert a != c
    # Content-Length is the exact payload byte count (multi-byte chars)
    rec = list(warc.iter_warc_records(
        wet.wet_record_bytes("u", TS, "é" * 5)
    ))[0]
    assert rec["content_length"] == str(len("é".encode("utf-8")) * 5)


def test_wet_gz_driver_writer_roundtrip(tmp_path):
    rows = [
        ("https://h.ex/1", TS, "one"),
        ("https://h.ex/2", TS, "two\nlines"),
        ("https://h.ex/3", TS, ""),
    ]
    path = str(tmp_path / "golden.warc.wet.gz")
    assert wet.write_wet_gz(path, rows) == 3
    parsed = list(warc.iter_warc_records(open(path, "rb").read()))
    assert [(r["url"], r["html"].decode()) for r in parsed] == [
        (u, t) for u, _, t in rows
    ]


def test_distributed_wet_export_full_loop(spark, tmp_path):
    """The real user flow: .warc.gz → pages → extract pipeline →
    distributed WET shards → re-parse: every extracted text survives
    byte-identically, and the manifest counts match the shards."""
    from pyspark.sql import functions as F

    from language_diversity_common_crawler_spark.plans.pipeline import (
        extract_pipeline,
    )

    rows = pg.generate_pages(30, seed=7)
    recs = [
        {
            "url": r["url"],
            "body": r["html"],
            "warc_date": r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
            "record_id": r["warc_record_id"],
            "http_charset": r["http_charset"],
            "accept_language": r["accept_language"],
        }
        for r in rows
    ]
    src = str(tmp_path / "CC-MAIN-20230921073711-20230921103711-00000.warc.gz")
    warc.write_warc_gz(src, recs)
    extracted = extract_pipeline(warc.warc_pages(spark, src)).select(
        "url", "warc_ts", F.col("content").alias("text")
    )
    out_dir = str(tmp_path / "wet")
    manifest = wet.write_wet_files(
        extracted.repartition(3), out_dir
    ).collect()
    assert sum(m.n_records for m in manifest) == extracted.count()
    shards = sorted(glob.glob(f"{out_dir}/part-*.warc.wet.gz"))
    assert {m.path for m in manifest} == set(shards)
    parsed = {}
    for s in shards:
        for r in warc.iter_warc_records(open(s, "rb").read()):
            parsed[r["url"]] = r["html"]
    expect = {
        r["url"]: (r["text"] or "").encode("utf-8")
        for r in extracted.collect()
    }
    assert parsed == expect


def test_wet_shards_are_per_record_gzip_members(tmp_path):
    """CC layout: each record its own gzip member, so record-level readers
    can resynchronize mid-file."""
    path = str(tmp_path / "g.warc.wet.gz")
    wet.write_wet_gz(path, [("u1", TS, "a"), ("u2", TS, "b")])
    data = open(path, "rb").read()
    # decompress ONLY the first member (gzip.GzipFile would transparently
    # concatenate members): its unused_data must hold a second member
    import zlib

    d = zlib.decompressobj(31)
    first = d.decompress(data)
    assert len(list(warc.iter_warc_records(first))) == 1
    assert d.unused_data[:3] == b"\x1f\x8b\x08"


def test_wet_text_reader_roundtrip(spark, tmp_path):
    """The symmetric input path: WET shards written by the sink read back
    as a text table through sources.warc.wet_text, byte-identical text
    (incl. a malformed-utf8 shard surviving as U+FFFD, not a task kill)."""
    from language_diversity_common_crawler_spark.sinks import wet as wsink

    rows = [
        ("https://h.ex/1", TS, "première page"),
        ("https://h.ex/2", TS, "second\npage"),
    ]
    path = str(tmp_path / "CC-MAIN-xxxx-00007.warc.wet.gz")
    wsink.write_wet_gz(path, rows)
    got = {
        r.url: (r.text, r.segment)
        for r in warc.wet_text(spark, path).collect()
    }
    assert got == {u: (t, "00007") for u, _, t in rows}

    # malformed payload: hand-build a conversion record with raw bad bytes
    bad = wsink.wet_record_bytes("https://h.ex/bad", TS, "A")
    bad = bad.replace(b"\r\n\r\nA\r\n\r\n", b"\r\n\r\n\xff\r\n\r\n")
    import gzip as _gz

    bpath = str(tmp_path / "CC-MAIN-xxxx-00008.warc.wet.gz")
    open(bpath, "wb").write(_gz.compress(bad, mtime=0))
    out = warc.wet_text(spark, bpath).collect()
    assert len(out) == 1 and out[0].text == "�"


def test_wet_record_nat_and_tz_handling():
    """NaT (isinstance datetime, fails strftime) falls back to the epoch
    stamp; tz-aware non-UTC datetimes convert to the real UTC instant."""
    import pandas as pd
    from datetime import timedelta, timezone as tz

    rec = wet.wet_record_bytes("u", pd.NaT, "t")
    parsed = list(warc.iter_warc_records(rec))[0]
    assert parsed["warc_date"] == "2020-01-01T00:00:00Z"

    plus2 = datetime(2023, 9, 21, 9, 37, 11, tzinfo=tz(timedelta(hours=2)))
    rec2 = wet.wet_record_bytes("u", plus2, "t")
    parsed2 = list(warc.iter_warc_records(rec2))[0]
    assert parsed2["warc_date"] == "2023-09-21T07:37:11Z"


def test_distributed_export_survives_null_ts(spark, tmp_path):
    df = spark.createDataFrame(
        [("u1", None, "a"), ("u2", TS, "b")],
        "url string, warc_ts timestamp, text string",
    )
    out_dir = str(tmp_path / "wet_null_ts")
    manifest = wet.write_wet_files(df.coalesce(1), out_dir).collect()
    assert manifest[0].n_records == 2
