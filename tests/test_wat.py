"""WAT ingest (sources/wat.py): record-format round-trip through the
repo's own WARC parser, JSON-envelope tolerance, and the headline
contract — the WAT-fed link graph is byte-identical to the HTML-regex
link graph of the same corpus (mirrors tests/test_wet.py's structure for
the WET family)."""

from __future__ import annotations

import json

from language_diversity_common_crawler_spark.sources import warc, wat

WD = "2023-09-21T07:37:11Z"


def _rec(url="https://h.ex/a", links=None):
    return wat.build_wat_record_bytes(
        url=url,
        links=links if links is not None else [
            {"path": "A@/href", "url": "/rel", "text": "x"},
            {"path": "A@/href", "url": "https://t.ex/p", "text": "y"},
        ],
        warc_date=WD,
        record_id="<urn:uuid:abc>",
    )


def test_wat_record_parses_with_own_warc_parser():
    parsed = list(warc.iter_warc_records(_rec()))
    assert len(parsed) == 1
    r = parsed[0]
    assert r["warc_type"] == "metadata"
    assert r["url"] == "https://h.ex/a"
    assert r["warc_date"] == WD
    uri, links = wat._links_of(r["html"])
    assert uri == "https://h.ex/a"
    assert [ln["url"] for ln in links] == ["/rel", "https://t.ex/p"]


def test_wat_record_is_deterministic():
    assert _rec() == _rec()
    assert _rec(links=[]) != _rec()


def test_links_of_tolerates_malformed_payloads():
    assert wat._links_of(b"not json{") == (None, [])
    assert wat._links_of(b"{}") == (None, [])
    # missing HTML-Metadata level (non-HTML response)
    env = {"Envelope": {"WARC-Header-Metadata": {"WARC-Target-URI": "u"},
                        "Payload-Metadata": {}}}
    assert wat._links_of(json.dumps(env).encode()) == ("u", [])
    # Links present but not a list
    env["Envelope"]["Payload-Metadata"] = {
        "HTTP-Response-Metadata": {"HTML-Metadata": {"Links": "nope"}}
    }
    assert wat._links_of(json.dumps(env).encode()) == ("u", [])


def test_segment_of_handles_wat_names():
    assert warc.segment_of(
        "/x/CC-MAIN-20230921073711-20230921103711-00042.warc.wat.gz"
    ) == "00042"


def test_wat_links_reader_end_to_end(spark, tmp_path):
    path = str(tmp_path / "CC-MAIN-x-00007.warc.wat.gz")
    wat.write_wat_gz(
        path,
        [
            {"url": "https://a.ex/1", "warc_date": WD,
             "record_id": "<urn:uuid:1>",
             "links": [{"path": "A@/href", "url": "/p", "text": "t1"},
                       {"path": "A@/href", "url": "https://b.ex/q",
                        "text": "t2"}]},
            {"url": "https://a.ex/2", "warc_date": WD,
             "record_id": "<urn:uuid:2>", "links": []},
        ],
    )
    rows = wat.wat_links(spark, path).collect()
    assert [(r.src_url, r.href, r.anchor, r.segment) for r in rows] == [
        ("https://a.ex/1", "/p", "t1", "00007"),
        ("https://a.ex/1", "https://b.ex/q", "t2", "00007"),
    ]
    assert all(str(r.warc_ts).startswith("2023-09-21") for r in rows)


def test_wat_links_tolerates_non_string_fields(spark, tmp_path):
    """Field-level malformation tolerance: a numeric/object url, text, or
    path in the Links JSON must not reach the Arrow cast and kill the
    task — bad hrefs are skipped, bad anchors/paths null out."""
    import gzip

    payload = json.dumps({
        "Envelope": {
            "WARC-Header-Metadata": {"WARC-Target-URI": "https://a.ex/1"},
            "Payload-Metadata": {"HTTP-Response-Metadata": {
                "HTML-Metadata": {"Links": [
                    {"path": "A@/href", "url": 123, "text": "num href"},
                    {"path": "A@/href", "url": "/ok", "text": 456},
                    {"path": {"x": 1}, "url": "/ok2", "text": "fine"},
                    "not a dict",
                    {"path": "A@/href", "url": "/ok3"},
                ]}}},
        }
    }).encode()
    rec = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"WARC-Target-URI: https://a.ex/1\r\n"
        b"WARC-Date: 2023-09-21T07:37:11Z\r\n"
        b"Content-Type: application/json\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload + b"\r\n\r\n"
    )
    path = str(tmp_path / "bad-00001.warc.wat.gz")
    with open(path, "wb") as f:
        f.write(gzip.compress(rec, mtime=0))
    rows = sorted(
        (r.href, r.anchor, r.link_path)
        for r in wat.wat_links(spark, path).collect()
    )
    assert rows == [
        ("/ok", None, "A@/href"),
        ("/ok2", "fine", None),
        ("/ok3", None, "A@/href"),
    ]


def test_wat_links_max_links_cap(spark, tmp_path):
    path = str(tmp_path / "links-00001.warc.wat.gz")
    wat.write_wat_gz(
        path,
        [{"url": "https://a.ex/1", "warc_date": WD,
          "record_id": "<urn:uuid:1>",
          "links": [{"path": "A@/href", "url": f"/p{i}", "text": "t"}
                    for i in range(10)]}],
    )
    assert wat.wat_links(spark, path, max_links=3).count() == 3


def test_malformed_entries_do_not_consume_link_budget(spark, tmp_path):
    """Round-4 advice: the per-page max_links budget counts EMITTED links
    only — a hostile record front-loaded with malformed entries must not
    crowd the valid links out of the cap."""
    path = str(tmp_path / "budget-00001.warc.wat.gz")
    junk = ["not a dict"] * 5 + [{"path": "A@/href", "url": 1, "text": "n"}]
    good = [{"path": "A@/href", "url": f"/v{i}", "text": "t"}
            for i in range(4)]
    wat.write_wat_gz(
        path,
        [{"url": "https://a.ex/1", "warc_date": WD,
          "record_id": "<urn:uuid:1>", "links": junk + good}],
    )
    hrefs = sorted(
        r.href for r in wat.wat_links(spark, path, max_links=3).collect()
    )
    # cap-before-filter would have burned the whole budget on the 6 junk
    # entries and emitted nothing
    assert hrefs == ["/v0", "/v1", "/v2"]


def test_wat_link_graph_matches_html_extraction(spark, tmp_path):
    """The headline contract: WAT shards carrying the same hrefs the HTML
    corpus embeds must yield the identical canonical (src_url, link_url,
    host) edge set — same resolution, same canonicalizer, same dedup."""
    from language_diversity_common_crawler_spark.frontier import links

    pages = [
        ("https://site1.example.org/page/1",
         '<html><a href="/o/7">x</a>'
         '<a href="HTTPS://Host1.Example.COM:443/x/../p/1">y</a>'
         '<a href="mailto:a@b.c">m</a></html>'),
        ("https://site2.example.org/page/2",
         '<html><a href="/o/14">x</a>'
         '<a href="//proto.rel/skip">n</a></html>'),
    ]
    html_df = spark.createDataFrame(pages, ["url", "html_text"])
    want = sorted(
        (r.src_url, r.link_url, r.host)
        for r in links.extract_links(html_df).collect()
    )

    path = str(tmp_path / "g-00001.warc.wat.gz")
    import re

    recs = []
    for url, html in pages:
        hrefs = re.findall(r'href="([^"]+)"', html)
        recs.append({
            "url": url, "warc_date": WD,
            "record_id": f"<urn:uuid:{url}>",
            "links": [{"path": "A@/href", "url": h, "text": "t"}
                      for h in hrefs],
        })
    wat.write_wat_gz(path, recs)
    got = sorted(
        (r.src_url, r.link_url, r.host)
        for r in wat.wat_link_graph(spark, path).collect()
    )
    assert got == want
    assert len(got) == 3  # mailto + protocol-relative dropped


def test_wat_anchor_corpus_semantics(spark, tmp_path):
    """WAT 'text' fields behave exactly like HTML anchors: lowercased,
    trimmed, empty/NULL dropped, counts per canonical (target, anchor)."""
    path = str(tmp_path / "a-00001.warc.wat.gz")
    wat.write_wat_gz(
        path,
        [
            {"url": "https://a.ex/1", "warc_date": WD,
             "record_id": "<urn:uuid:1>",
             "links": [
                 {"path": "A@/href", "url": "https://T.EX:443/p#f",
                  "text": "  Click HERE "},
                 {"path": "A@/href", "url": "/rel", "text": "click here"},
                 {"path": "A@/href", "url": "https://t.ex/p", "text": ""},
             ]},
            {"url": "https://b.ex/2", "warc_date": WD,
             "record_id": "<urn:uuid:2>",
             "links": [
                 {"path": "A@/href", "url": "https://t.ex/p",
                  "text": "click here"},
                 {"path": "A@/href", "url": "mailto:x@y.z",
                  "text": "mail me"},
                 {"path": "A@/href", "url": "https://t.ex/q"},  # no text
             ]},
        ],
    )
    got = {
        (r["link_url"], r["anchor"]): (r["n_refs"], r["n_src_pages"])
        for r in wat.wat_anchor_corpus(spark, path).collect()
    }
    assert got[("https://t.ex/p", "click here")] == (2, 2)
    assert got[("https://a.ex/rel", "click here")] == (1, 1)
    assert all(a != "" for (_, a) in got)
    assert not any("mail" in a for (_, a) in got)


def test_wat_fixture_idempotent_and_prunes(tmp_path):
    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "wat_fx")
    wat.write_fixture_from_documents(sf, out, n_files=4)
    import os

    names = sorted(n for n in os.listdir(out) if n.endswith(".gz"))
    assert len(names) == 4
    first = {n: os.path.getmtime(os.path.join(out, n)) for n in names}
    wat.write_fixture_from_documents(sf, out, n_files=4)  # fresh -> no-op
    assert {
        n: os.path.getmtime(os.path.join(out, n)) for n in names
    } == first
    # shrinking n_files prunes orphans (different key -> rewrite)
    wat.write_fixture_from_documents(sf, out, n_files=2)
    assert sorted(
        n for n in os.listdir(out) if n.endswith(".gz")
    ) == names[:2]


def test_wat_fixture_graph_matches_synthetic_links(spark, tmp_path):
    """The sf0.001 fixture's WAT-fed graph equals the synthetic html
    corpus link graph the host-graph oracle queries are built on (the
    exact equality the wat_link_graph driver query pins at sf0.01)."""
    from pyspark.sql import functions as F

    from language_diversity_common_crawler_spark.frontier import links

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "wat_fx")
    wat.write_fixture_from_documents(sf, out)
    got = sorted(
        (r.src_url, r.link_url, r.host)
        for r in wat.wat_link_graph(spark, f"{out}/*.warc.wat.gz").collect()
    )

    d = spark.read.parquet(f"{sf}/documents.parquet")
    html = F.concat(
        F.lit('<html><body><a href="/o/'),
        ((F.col("doc_id") * 7) % 1000).cast("string"),
        F.lit('">x</a> <a href="HTTPS://Host'),
        (F.col("doc_id") % 50).cast("string"),
        F.lit('.Example.COM:443/x/../p/'),
        F.col("doc_id").cast("string"),
        F.lit('">y</a> <a href="mailto:a@b.c">m</a></body></html>'),
    )
    pages = d.select(
        F.concat(
            F.lit("https://site"), (F.col("doc_id") % 20).cast("string"),
            F.lit(".example.org/page/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        html.alias("html_text"),
    )
    want = sorted(
        (r.src_url, r.link_url, r.host)
        for r in links.extract_links(pages).collect()
    )
    assert got == want


def test_wat_links_stream_matches_batch(spark, tmp_path):
    """Streaming WAT ingest: shards arriving in a directory become
    micro-batches through the SAME parser (availableNow drain, one file
    per trigger); the union of batches equals the batch reader."""
    src = tmp_path / "incoming"
    src.mkdir()
    for i in range(2):
        wat.write_wat_gz(
            str(src / f"CC-MAIN-x-{i:05d}.warc.wat.gz"),
            [{"url": f"https://a.ex/{i}-{j}", "warc_date": WD,
              "record_id": f"<urn:uuid:{i}-{j}>",
              "links": [{"path": "A@/href", "url": f"/p{j}", "text": "t"}]}
             for j in range(5)],
        )
    stream = wat.wat_links_stream(spark, str(src))
    assert stream.isStreaming
    out = str(tmp_path / "out")
    batches = []

    def _sink(df, batch_id):
        batches.append(df.count())
        df.write.mode("overwrite").parquet(f"{out}/batch={batch_id:05d}")

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batch_rows = sorted(
        (r.src_url, r.href, r.segment)
        for r in wat.wat_links(spark, f"{src}/*.warc.wat.gz").collect()
    )
    assert len(batches) == 2 and sum(batches) == len(batch_rows) == 10
    got = sorted(
        (r.src_url, r.href, r.segment)
        for r in spark.read.parquet(f"{out}/batch=*").collect()
    )
    assert got == batch_rows


def test_wat_gz_one_member_per_record(tmp_path):
    path = str(tmp_path / "m-00001.warc.wat.gz")
    wat.write_wat_gz(
        path,
        [{"url": f"https://a.ex/{i}", "warc_date": WD,
          "record_id": f"<urn:uuid:{i}>", "links": []} for i in range(3)],
    )
    data = open(path, "rb").read()
    # three gzip members (the CC layout): three magic headers, and the
    # parser walks all of them
    assert data.count(b"\x1f\x8b\x08") == 3
    assert len(list(warc.iter_warc_records(data))) == 3
