"""S1 — distributed HTTP fetch against a local deterministic server.

The sandbox has no external network, so the fetcher is driven end-to-end
against a threaded ``http.server`` on 127.0.0.1 serving charset variants,
a 404, a redirect and an oversized body — the full row-level fault matrix
``frontier/fetch.py`` must absorb without failing the job.
"""

from __future__ import annotations

import http.server
import os
import sys
import threading

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from language_diversity_common_crawler_spark.frontier import fetch  # noqa: E402

PAGES = {
    "/utf8": ("text/html; charset=utf-8", "<html><p>héllo utf8</p></html>".encode("utf-8")),
    "/latin1": ("text/html; charset=ISO-8859-1", "<html><p>caf\xe9</p></html>".encode("iso-8859-1")),
    "/nocharset": ("text/html", b"<html><p>plain</p></html>"),
    "/big": ("text/html; charset=utf-8", b"x" * 100_000),
}


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (stdlib API name)
        if self.path == "/redir":
            self.send_response(302)
            self.send_header("Location", "/utf8")
            self.end_headers()
            return
        if self.path not in PAGES:
            self.send_error(404)
            return
        ctype, body = PAGES[self.path]
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_charset_of():
    assert fetch.charset_of("text/html; charset=UTF-8") == "utf-8"
    assert fetch.charset_of('text/html; charset="ISO-8859-1"') == "iso-8859-1"
    assert fetch.charset_of("text/html") is None
    assert fetch.charset_of(None) is None
    # single-quoted values are unquoted, parameter key is exact — the two
    # cases where the WARC scanner's old private regex diverged
    assert fetch.charset_of("text/html; charset='utf-8'") == "utf-8"
    assert fetch.charset_of("text/html; xcharset=latin-1") is None


def test_charset_parser_shared_with_warc_scanner():
    """Both ingest paths MUST run the identical Content-Type->charset
    parser, or the decode chain picks different codecs per path for the
    same header."""
    from language_diversity_common_crawler_spark.functions.decode import (
        charset_of,
    )
    from language_diversity_common_crawler_spark.sources import warc

    assert fetch.charset_of is charset_of
    assert warc._charset_of is charset_of


def test_record_id_deterministic():
    a = fetch.record_id_for("https://h.ex/a")
    assert a == fetch.record_id_for("https://h.ex/a")
    assert a.startswith("<urn:uuid:") and a.endswith(">") and len(a) == 47


def test_fetch_one_matrix(server):
    r = fetch.fetch_one(f"{server}/utf8", "t", 5.0, 1 << 20)
    assert (r.status, r.error, r.charset, r.truncated) == (
        200, None, "utf-8", False,
    )
    assert "héllo utf8" in r.body.decode("utf-8")
    assert r.length_header == str(len(PAGES["/utf8"][1]))

    r = fetch.fetch_one(f"{server}/miss", "t", 5.0, 1 << 20)
    assert (r.body, r.status, r.error) == (None, 404, "http_404")

    # redirect followed transparently by urllib
    r = fetch.fetch_one(f"{server}/redir", "t", 5.0, 1 << 20)
    assert r.status == 200 and b"utf8" in r.body

    # byte cap truncates AND flags it; server Content-Length preserved
    r = fetch.fetch_one(f"{server}/big", "t", 5.0, 1000)
    assert r.status == 200 and len(r.body) == 1000
    assert r.truncated is True
    assert r.length_header == str(len(PAGES["/big"][1]))

    # connection refused -> error result, not an exception
    r = fetch.fetch_one("http://127.0.0.1:9/never", "t", 2.0, 1 << 20)
    assert r.body is None and r.status is None and r.error

    # non-http schemes are refused, never read off local disk
    r = fetch.fetch_one("file:///etc/hostname", "t", 2.0, 1 << 20)
    assert r.body is None and r.error == "non_http_scheme"


def test_fetch_pages_end_to_end(spark, server):
    """Scheduled batch -> fetched pages rows -> extract pipeline."""
    from language_diversity_common_crawler_spark.plans.pipeline import (
        extract_pipeline,
    )
    from pyspark.sql import functions as F

    sched = spark.createDataFrame(
        [
            (f"{server}/utf8", "127.0.0.1", 1),
            (f"{server}/latin1", "127.0.0.1", 2),
            (f"{server}/nocharset", "127.0.0.1", 3),
            (f"{server}/miss", "127.0.0.1", 4),
        ],
        ["url_canon", "host", "slot"],
    )
    rows = {r["url"]: r for r in fetch.fetch_pages(sched, n_partitions=2).collect()}
    assert len(rows) == 4
    ok = rows[f"{server}/utf8"]
    assert ok["status"] == 200 and ok["http_charset"] == "utf-8"
    assert ok["content_length"] == str(len(PAGES["/utf8"][1]))
    assert ok["warc_record_id"] == fetch.record_id_for(f"{server}/utf8")
    assert ok["truncated"] is False and ok["warc_ts"] is not None
    assert rows[f"{server}/latin1"]["http_charset"] == "iso-8859-1"
    assert rows[f"{server}/nocharset"]["http_charset"] is None
    miss = rows[f"{server}/miss"]
    assert miss["html"] is None and miss["status"] == 404

    # fetched rows run the extract chain: decode honors the served charset
    pages = fetch.fetch_pages(sched).filter(F.col("html").isNotNull())
    out = {
        r["url"]: r["content"]
        for r in extract_pipeline(pages.withColumn("segment", F.lit("live")))
        .select("url", "content")
        .collect()
    }
    assert out[f"{server}/utf8"] == "héllo utf8"
    assert out[f"{server}/latin1"] == "café"
    assert out[f"{server}/nocharset"] == "plain"
