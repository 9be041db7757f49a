"""Real WARC ingest (S1/S2): ``.warc.gz`` files → the pages schema.

The reference's actual input is a gzipped WARC stream iterated record-at-a-
time (/root/reference/src/main.py:63-65,97:
``ArchiveIterator(GZipStream(BytesIO(bytes)))``; same pattern in
experiments/cc_fastwarc.py:83-88). This module is the Spark-native path in:

    spark.read.format("binaryFile").load("…/​*.warc.gz")
        → mapInPandas(record-splitting parser)  → pages rows

Parallelism is one file per task (Common Crawl ships ~1 GB segment files,
tens of thousands per crawl — file-level parallelism is the natural unit;
binaryFile never splits a file, so a task's memory is bounded by one
segment). The parser is pure Python over in-memory bytes — one Python
invocation per Arrow batch of files, not per record. When ``fastwarc`` is
installed the parse delegates to it (the reference's exact library,
my_dependencies.yml:10); the bundled fallback implements the same record
walk for this sandbox.

Header extraction parity (warc_extraction.py:17,30,43,57-59;
decoding.py:14-17):
  url              ← WARC-Target-URI
  warc_record_id   ← WARC-Record-ID
  content_length   ← WARC Content-Length header, kept a STRING
  accept_language  ← HTTP Accept-Language (raw; '-' defaulting happens in
                     the extract pipeline, same as the handler chain)
  http_charset     ← charset token of the HTTP Content-Type, lowercased
                     (fastwarc's ``record.http_charset`` semantics); None
                     when absent — decode falls back to utf-8
  warc_ts          ← WARC-Date
  html             ← HTTP payload bytes (the record body after the HTTP
                     header block), exactly what ``record.reader.read()``
                     yields at decoding.py:33
  segment          ← 5-digit segment number from the CC filename template
                     (main.py:85: ``…-{segment}.warc.gz``)

The writer half builds deterministic fixture ``.warc.gz`` files (one gzip
member per record — the Common Crawl layout) so tests can round-trip:
generate_pages → write_warc_gz → warc_pages → byte-identical html.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import re
from datetime import datetime, timedelta, timezone

import pandas as pd

# the ONE Content-Type→charset parser, shared with the HTTP fetcher so
# both ingest paths emit identical http_charset for identical headers
from ..functions.decode import charset_of as _charset_of
from .paths import load_binary

WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, http_charset string, "
    "accept_language string, warc_record_id string, content_length string, "
    "segment string"
)

_SEG_RE = re.compile(r"-(\d{5})\.warc(\.wet|\.wat)?(\.gz)?$")


# ---------------------------------------------------------------------------
# writer (fixture builder)
# ---------------------------------------------------------------------------

def build_record_bytes(
    url: str,
    body: bytes,
    warc_date: str,
    record_id: str,
    http_charset: str | None = "utf-8",
    accept_language: str | None = None,
    status: str = "200 OK",
) -> bytes:
    """One uncompressed WARC/1.0 response record (HTTP payload layout)."""
    ctype = "text/html"
    if http_charset:
        ctype += f"; charset={http_charset}"
    http_lines = [f"HTTP/1.1 {status}", f"Content-Type: {ctype}"]
    if accept_language is not None:
        http_lines.append(f"Accept-Language: {accept_language}")
    http_lines.append(f"Content-Length: {len(body)}")
    http_block = ("\r\n".join(http_lines) + "\r\n\r\n").encode("ascii") + body
    warc_headers = [
        "WARC/1.0",
        "WARC-Type: response",
        f"WARC-Target-URI: {url}",
        f"WARC-Date: {warc_date}",
        f"WARC-Record-ID: {record_id}",
        "Content-Type: application/http; msgtype=response",
        f"Content-Length: {len(http_block)}",
    ]
    return (
        ("\r\n".join(warc_headers) + "\r\n\r\n").encode("ascii")
        + http_block
        + b"\r\n\r\n"
    )


def write_warc_gz(path: str, records: list[dict]) -> None:
    """Write records (dicts with build_record_bytes kwargs) as a
    ``.warc.gz`` with ONE GZIP MEMBER PER RECORD — the Common Crawl layout
    (lets record-level readers resynchronize mid-file)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        for r in records:
            f.write(gzip.compress(build_record_bytes(**r), mtime=0))


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def _parse_headers(block: bytes) -> dict[str, str]:
    """Case-insensitive header map from a CRLF header block (first line —
    WARC/1.0 or the HTTP status line — skipped)."""
    out: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:
        if b":" in line:
            k, _, v = line.partition(b":")
            out[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace"
            )
    return out




def iter_warc_records(data: bytes):
    """Yield record dicts from (possibly multi-member) gzipped or plain
    WARC bytes. Record framing per the WARC spec: header block to the first
    CRLFCRLF, then exactly Content-Length payload bytes, then CRLFCRLF.

    Matches the reference's iteration semantics (main.py:97): every record
    in file order, no type filter — callers filter on ``warc_type`` if they
    want responses only.
    """
    if data[:2] == b"\x1f\x8b":
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    pos, n = 0, len(data)
    while pos < n:
        # resynchronize on the version line (tolerates stray separators)
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        headers = _parse_headers(data[start:hdr_end])
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            clen = 0
        block = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen

        http_headers: dict[str, str] = {}
        body = block
        if "application/http" in headers.get("content-type", ""):
            split = block.find(b"\r\n\r\n")
            if split >= 0:
                http_headers = _parse_headers(block[:split])
                body = block[split + 4 :]
        yield {
            "warc_type": headers.get("warc-type"),
            "url": headers.get("warc-target-uri"),
            "warc_record_id": headers.get("warc-record-id"),
            "warc_date": headers.get("warc-date"),
            "content_length": headers.get("content-length"),
            "http_charset": _charset_of(http_headers.get("content-type")),
            "accept_language": http_headers.get("accept-language"),
            "html": body,
        }


def _iter_with_fastwarc(data: bytes):  # pragma: no cover - lib absent here
    """Delegate to the reference's exact WARC library when installed."""
    from fastwarc.stream_io import GZipStream
    from fastwarc.warc import ArchiveIterator

    stream = (
        GZipStream(io.BytesIO(data)) if data[:2] == b"\x1f\x8b"
        else io.BytesIO(data)
    )
    for record in ArchiveIterator(stream):
        hh = record.http_headers
        # WarcRecordType is a flag enum: str() yields
        # 'WarcRecordType.response' / an int form, never the bare token the
        # record_types filter compares against — use .name
        rtype = getattr(record.record_type, "name", None) or str(
            record.record_type
        ).rsplit(".", 1)[-1]
        yield {
            "warc_type": rtype,
            "url": record.headers.get("WARC-Target-URI"),
            "warc_record_id": record.headers.get("WARC-Record-ID"),
            "warc_date": record.headers.get("WARC-Date"),
            "content_length": record.headers.get("Content-Length"),
            "http_charset": record.http_charset,
            "accept_language": hh.get("Accept-Language") if hh else None,
            "html": record.reader.read(),
        }


def _have_fastwarc() -> bool:
    try:  # pragma: no cover - lib absent in this sandbox
        import fastwarc  # noqa: F401

        return True
    except ImportError:
        return False


def _parse_warc_date(s: str | None):
    if not s:
        return None
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        # keep tzinfo: a NAIVE datetime in a TimestampType column is
        # reinterpreted in the session timezone (wrong instant on any
        # non-UTC session); tz-aware UTC is zone-independent, matching
        # the HTTP fetcher's warc_ts convention (fetch.py)
        return dt.astimezone(timezone.utc)
    except ValueError:
        return None


def segment_of(path: str) -> str:
    """5-digit segment from the CC filename template (main.py:85), else the
    basename without extensions."""
    m = _SEG_RE.search(path)
    if m:
        return m.group(1)
    base = os.path.basename(path)
    return re.sub(r"\.warc(\.wet|\.wat)?(\.gz)?$", "", base)


def _file_parse_fn(record_types, use_fastwarc: bool):
    """mapInPandas generator over (path, content) file rows — shared by the
    batch and streaming readers."""

    def _parse(batches):
        it = _iter_with_fastwarc if use_fastwarc else iter_warc_records
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                seg = segment_of(fpath)
                for rec in it(bytes(content)):
                    if record_types and rec["warc_type"] not in record_types:
                        continue
                    rows.append(
                        (
                            rec["url"],
                            _parse_warc_date(rec["warc_date"]),
                            rec["html"],
                            rec["http_charset"],
                            rec["accept_language"],
                            rec["warc_record_id"],
                            rec["content_length"],
                            seg,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "warc_ts", "html", "http_charset",
                    "accept_language", "warc_record_id", "content_length",
                    "segment",
                ],
            )

    return _parse


def warc_pages(spark, path, record_types: tuple[str, ...] = ("response",)):
    """``.warc.gz`` files → pages DataFrame.

    ``spark.read.format("binaryFile")`` gives (path, content) one row per
    file; the record-splitting parse runs in ``mapInPandas`` — one Python
    call per Arrow batch of files, vectorized output columns. Pass
    ``record_types=None`` for the reference's unfiltered iteration.
    """
    raw = load_binary(spark, path).select("path", "content")
    return raw.mapInPandas(
        _file_parse_fn(record_types, _have_fastwarc()), WARC_PAGES_SCHEMA
    )


def wet_text(spark, path):
    """``.warc.wet.gz`` (Common Crawl WET) files → text DataFrame
    (url, warc_ts, text, warc_record_id, segment).

    The symmetric input path to ``sinks/wet.py``'s export: users who
    start from CC's published WET shards skip html decode/boilerplate
    entirely and feed ``text`` straight into the lang-ID / dedup /
    quality operators. Same binaryFile + mapInPandas parser as
    :func:`warc_pages`, filtered to ``conversion`` records; WET payloads
    are UTF-8 by spec, decoded via make_valid_utf8(cast(...)) — U+FFFD
    replacement for malformed bytes, because ANSI-mode ``decode`` throws
    and one mojibake record must not kill a task."""
    from pyspark.sql import functions as F

    pages = warc_pages(spark, path, record_types=("conversion",))
    return pages.select(
        "url",
        "warc_ts",
        F.expr("make_valid_utf8(cast(html as string))").alias("text"),
        "warc_record_id",
        "segment",
    )


def warc_pages_stream(
    spark,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    max_files_per_trigger: int = 1,
    path_glob: str = "*.warc.gz",
):
    """Streaming WARC ingest: new WARC files landing in ``path`` become
    micro-batches of pages rows (the 'segments arrive continuously from
    the fetch fleet' shape). Same parser as the batch reader — pass
    ``path_glob='*.warc'`` for uncompressed segments (the parser sniffs
    gzip either way, mirroring the batch reader's caller-controlled
    glob). Pair with streaming/microbatch.py sinks (foreachBatch snapshot
    commits, watermarked windowed counts) or streaming/seen_state.py
    dedup."""
    raw = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is fixed but streaming sources require it
        # stated explicitly
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", path_glob)
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(
        _file_parse_fn(record_types, _have_fastwarc()), WARC_PAGES_SCHEMA
    )


# ---------------------------------------------------------------------------
# deterministic fixture derived from the driver's documents table (lets the
# DuckDB oracle recompute the expected parse output with plain SQL)
# ---------------------------------------------------------------------------

def write_fixture_from_documents(
    sf_dir: str, out_dir: str, n_files: int = 8
) -> str:
    """Build ``{out_dir}/CC-MAIN-…-{i:05d}.warc.gz`` files from
    ``{sf_dir}/documents.parquet`` (driver-side pyarrow read — no Spark).

    Derivation is a pure function of (doc_id, text, lang) mirrored by
    sql_warc_roundtrip_oracle; rows are sharded round-robin by doc_id so
    every file is non-empty and the parse fans out over ``n_files`` tasks.
    Idempotent per (source content, n_files): stale shards from a
    regenerated documents.parquet are rewritten and shard publication is
    atomic (fixtures.py).
    """
    import pyarrow.parquet as pq

    from .fixtures import atomic_path, fixture_fresh, fixture_key, \
        mark_fixture_done, prune_orphans

    key = fixture_key(sf_dir, n_files)
    if fixture_fresh(out_dir, key):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    ).to_pydict()
    base = datetime(2023, 9, 21, 7, 37, 11, tzinfo=timezone.utc)
    shards: list[list[dict]] = [[] for _ in range(n_files)]
    for doc_id, text, lang in zip(t["doc_id"], t["text"], t["lang"]):
        body = (text or "").encode("utf-8")
        wd = (base + timedelta(seconds=int(doc_id))).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )
        rec = {
            "url": f"https://w.example/doc/{doc_id}",
            "body": body,
            "warc_date": wd,
            "record_id": "<urn:uuid:"
            + hashlib.md5(f"warc:{doc_id}".encode()).hexdigest()
            + ">",
            "http_charset": "utf-8",
            "accept_language": (
                None if doc_id % 7 == 0 else f"{lang}-XX,{lang};q=0.9"
            ),
        }
        shards[int(doc_id) % n_files].append(rec)
    written: set[str] = set()
    for i, recs in enumerate(shards):
        name = f"CC-MAIN-20230921073711-20230921103711-{i:05d}.warc.gz"
        tmp, final = atomic_path(os.path.join(out_dir, name))
        write_warc_gz(tmp, recs)
        os.replace(tmp, final)
        written.add(name)
    prune_orphans(out_dir, ".warc.gz", written)
    mark_fixture_done(out_dir, key)
    return out_dir


def sql_warc_roundtrip_oracle(n_files: int = 8) -> str:
    """DuckDB recomputation of warc_pages over the documents-derived
    fixture: every field is the same pure function of (doc_id, text, lang)
    the writer used. payload_len = HTTP body byte length (what
    record.reader.read() returns, decoding.py:33)."""
    return f"""
SELECT concat('https://w.example/doc/', CAST(doc_id AS VARCHAR)) AS url,
       TIMESTAMP '2023-09-21 07:37:11' + to_seconds(doc_id) AS warc_ts,
       ('<urn:uuid:' || md5('warc:' || CAST(doc_id AS VARCHAR)) || '>')
         AS warc_record_id,
       'utf-8' AS http_charset,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE concat(lang, '-XX,', lang, ';q=0.9') END AS accept_language,
       CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
         AS payload_len,
       lpad(CAST(doc_id % {n_files} AS VARCHAR), 5, '0') AS segment
FROM documents
"""
