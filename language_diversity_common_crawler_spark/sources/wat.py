"""WAT ingest: Common Crawl's pre-extracted link/metadata shards.

Common Crawl publishes, next to every WARC segment, a ``.warc.wat.gz``
file of *metadata* records — one JSON envelope per crawled page carrying
the page's outlinks (href + anchor text + element path) already parsed
out of the HTML (format: the archive.org WAT spec; cc-pyspark's
``wat_extract_links.py`` consumes the same layout). The reference never
reads these (it re-parses WARC HTML directly, /root/reference/src/main.py:
63-65); at 100 TB nobody re-extracts links from raw HTML when the
pre-extracted shards exist — a WAT reader feeds the host-graph /
PageRank / anchor-corpus operators at ~1/20th the byte volume of the
WARC it summarizes.

Layout and plan shape are exactly :mod:`sources.warc`'s: WAT files ARE
WARC files (``WARC-Type: metadata``, JSON payload, one gzip member per
record), so the record splitter is reused verbatim and the reader is

    spark.read.format("binaryFile").load("…/*.warc.wat.gz")
        → mapInPandas(record split + json.loads)   → link rows

one file per task, pure-Python JSON decode per record inside the Arrow
batch loop (a record is one page's whole link set — per-record, not
per-link, Python work). Downstream resolution/canonicalization is the
SAME JVM path html-extracted links take (frontier/links._resolve_hrefs +
urlgen.with_canonical), so the two ingest paths cannot drift at the
resolution/canonicalization stage — pinned by the ``wat_link_graph``
oracle query, whose expected output is the html-regex link graph of the
same synthetic corpus. The EXTRACTION stages are not byte-equivalent on
arbitrary real pages: the html path's href regex drops hrefs containing
whitespace and its anchor regex skips nested-markup anchors, both of
which a WAT publisher may ingest — on real crawls the WAT path is the
more faithful (and authoritative) link source, which is exactly why it
exists.

The writer half builds deterministic fixture ``.warc.wat.gz`` shards
from the documents table (same idempotent atomic-publish protocol as
warc.write_fixture_from_documents) so tests and the DuckDB oracle can
round-trip without network.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
from datetime import datetime, timedelta, timezone

import pandas as pd

from .paths import load_binary
from .warc import _parse_warc_date, iter_warc_records, segment_of

WAT_LINKS_SCHEMA = (
    "src_url string, warc_ts timestamp, href string, anchor string, "
    "link_path string, segment string"
)


# ---------------------------------------------------------------------------
# writer (fixture builder)
# ---------------------------------------------------------------------------

def build_wat_record_bytes(
    url: str,
    links: list[dict],
    warc_date: str,
    record_id: str,
) -> bytes:
    """One uncompressed WAT metadata record: the WARC envelope around the
    archive.org JSON layout (Envelope → Payload-Metadata →
    HTTP-Response-Metadata → HTML-Metadata → Links, each link
    ``{"path": "A@/href", "url": <href>, "text": <anchor>}`` — the same
    three fields cc-pyspark's WAT reader consumes)."""
    payload = json.dumps(
        {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Type": "response",
                    "WARC-Target-URI": url,
                    "WARC-Date": warc_date,
                },
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {"Links": links}
                    }
                },
            }
        },
        separators=(",", ":"),
        sort_keys=True,
    ).encode("utf-8")
    warc_headers = [
        "WARC/1.0",
        "WARC-Type: metadata",
        f"WARC-Target-URI: {url}",
        f"WARC-Date: {warc_date}",
        f"WARC-Record-ID: {record_id}",
        "Content-Type: application/json",
        f"Content-Length: {len(payload)}",
    ]
    return (
        ("\r\n".join(warc_headers) + "\r\n\r\n").encode("ascii")
        + payload
        + b"\r\n\r\n"
    )


def write_wat_gz(path: str, records: list[dict]) -> None:
    """Write records (build_wat_record_bytes kwargs) with one gzip member
    per record — the Common Crawl layout, same as warc.write_warc_gz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        for r in records:
            f.write(gzip.compress(build_wat_record_bytes(**r), mtime=0))


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _dict_at(d, key):
    """d[key] when d is a dict AND the value is a dict, else {} — the
    level-by-level tolerance _links_of needs: ``.get(k, {})`` only covers
    a MISSING key, while a real-world malformed record can carry ``null``
    (or a list/string) AT any envelope level."""
    v = d.get(key) if isinstance(d, dict) else None
    return v if isinstance(v, dict) else {}


def _links_of(payload: bytes) -> tuple[str | None, list[dict]]:
    """(target_uri, links) from one WAT JSON payload; tolerates missing
    OR non-dict levels (non-HTML responses carry no HTML-Metadata; a
    malformed record can hold null anywhere) by returning an empty link
    list — a malformed record must not kill the task."""
    try:
        env = _dict_at(json.loads(payload), "Envelope")
    except (ValueError, UnicodeDecodeError):
        return None, []
    hdr = _dict_at(env, "WARC-Header-Metadata")
    links = _dict_at(
        _dict_at(
            _dict_at(env, "Payload-Metadata"), "HTTP-Response-Metadata"
        ),
        "HTML-Metadata",
    ).get("Links", [])
    if not isinstance(links, list):
        links = []
    uri = hdr.get("WARC-Target-URI")
    return (uri if isinstance(uri, str) else None), links


def _file_parse_fn(max_links: int):
    def _parse(batches):
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                seg = segment_of(fpath)
                for rec in iter_warc_records(bytes(content)):
                    if rec["warc_type"] != "metadata":
                        continue
                    uri, links = _links_of(rec["html"])
                    src = uri if isinstance(uri, str) and uri else rec["url"]
                    ts = _parse_warc_date(rec["warc_date"])
                    # the per-page budget counts only EMITTED links
                    # (round-4 advice): capping the raw list first would
                    # let malformed entries in a hostile record crowd
                    # valid links out of the budget
                    emitted = 0
                    for ln in links:
                        if emitted >= max_links:
                            break
                        if not isinstance(ln, dict):
                            continue
                        href = ln.get("url")
                        # malformed-record tolerance goes down to the
                        # FIELD level: a non-string url/text/path (a
                        # number, an object) would pass truthiness, land
                        # in the pandas rows, and kill the whole task at
                        # the Arrow cast to the string schema
                        if not isinstance(href, str) or not href:
                            continue
                        emitted += 1
                        anchor = ln.get("text")
                        lpath = ln.get("path")
                        rows.append((
                            src, ts, href,
                            anchor if isinstance(anchor, str) else None,
                            lpath if isinstance(lpath, str) else None,
                            seg,
                        ))
            yield pd.DataFrame(
                rows,
                columns=["src_url", "warc_ts", "href", "anchor",
                         "link_path", "segment"],
            )

    return _parse


def wat_links(spark, path: str, max_links: int = 64):
    """``.warc.wat.gz`` files → raw link rows (src_url, warc_ts, href,
    anchor, link_path, segment) — hrefs exactly as the WAT publisher
    recorded them (possibly relative), one row per link.

    ``max_links`` bounds per-page fan-out like links.extract_links does,
    so one link-farm page cannot blow up a partition."""
    raw = load_binary(spark, path).select("path", "content")
    return raw.mapInPandas(_file_parse_fn(max_links), WAT_LINKS_SCHEMA)


def wat_links_stream(
    spark,
    path: str,
    max_links: int = 64,
    max_files_per_trigger: int = 1,
    path_glob: str = "*.warc.wat.gz",
):
    """Streaming WAT ingest: new link shards landing in ``path`` become
    micro-batches of link rows — the 'segments arrive continuously from
    the fetch fleet' shape, same parser as the batch reader (mirrors
    warc.warc_pages_stream / cdx.cdx_records_stream). Feed into
    streaming/seen_state.py dedup or a foreachBatch host-graph
    increment."""
    raw = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", path_glob)
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(_file_parse_fn(max_links), WAT_LINKS_SCHEMA)


def wat_link_graph(spark, path: str, max_links: int = 64):
    """WAT shards → the canonical link graph (src_url, link_url, host) —
    schema-identical to frontier/links.extract_links, feeding host_edges
    / host_pagerank / the seen-set probe without touching raw HTML.

    Resolution + canonicalization run on the SAME JVM path the HTML
    extractor uses (links._resolve_hrefs + urlgen.with_canonical behind
    its Generate barrier), so the two ingest paths can never drift — the
    only Python is the per-record JSON decode above."""
    from pyspark.sql import functions as F

    from ..frontier import links as links_mod
    from ..frontier import urlgen

    raw = wat_links(spark, path, max_links=max_links)
    base = F.regexp_extract(
        F.col("src_url"), "^([a-z][a-z0-9+.-]*://[^/?#]*)", 1
    )
    exploded = raw.select(
        "src_url", base.alias("__base"), F.col("href").alias("__href")
    )
    resolved = links_mod._resolve_hrefs(exploded)
    out = urlgen.with_canonical(resolved, raw_col="__raw")
    return out.select(
        "src_url", F.col("url_canon").alias("link_url"), "host"
    ).dropDuplicates(["src_url", "link_url"])


def wat_anchor_corpus(spark, path: str, max_links: int = 64):
    """WAT shards → the anchor-text corpus (link_url, anchor, n_refs,
    n_src_pages) — schema-identical to frontier/links.anchor_text_corpus,
    but fed from the published link metadata (WAT's ``text`` field is the
    anchor) instead of re-regexing HTML. Same lowercase+trim+non-empty
    anchor contract, same resolution/canonicalization JVM path, same
    map-side-combined final aggregate."""
    from pyspark.sql import functions as F

    from ..frontier import links as links_mod
    from ..frontier import urlgen

    raw = wat_links(spark, path, max_links=max_links)
    base = F.regexp_extract(
        F.col("src_url"), "^([a-z][a-z0-9+.-]*://[^/?#]*)", 1
    )
    parsed = raw.select(
        "src_url",
        base.alias("__base"),
        F.col("href").alias("__href"),
        F.lower(F.trim(F.coalesce(F.col("anchor"), F.lit("")))).alias(
            "anchor"
        ),
    ).filter(F.col("anchor") != "")
    resolved = links_mod._resolve_hrefs(parsed)
    out = urlgen.with_canonical(resolved, raw_col="__raw")
    return out.groupBy(
        F.col("url_canon").alias("link_url"), "anchor"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_refs"),
        F.countDistinct("src_url").cast("bigint").alias("n_src_pages"),
    )


# ---------------------------------------------------------------------------
# deterministic fixture derived from the documents table (mirrors the
# synthetic html corpus _links_df builds, so the DuckDB oracle for the
# WAT-fed graph is the SAME SQL as the html-fed one)
# ---------------------------------------------------------------------------

def write_fixture_from_documents(
    sf_dir: str, out_dir: str, n_files: int = 8
) -> str:
    """Build ``{out_dir}/CC-MAIN-…-{i:05d}.warc.wat.gz`` from
    ``{sf_dir}/documents.parquet``: per doc, the SAME three outlinks the
    synthetic html corpus embeds (relative /o/…, absolute un-canonical
    HTTPS://Host…:443/x/../p/…, and a mailto: noise link), so the
    expected canonical link graph is exactly the html-regex path's.
    Idempotent per (source content, n_files); atomic shard publication
    (fixtures.py)."""
    import pyarrow.parquet as pq

    from .fixtures import atomic_path, fixture_fresh, fixture_key, \
        mark_fixture_done, prune_orphans

    key = fixture_key(sf_dir, n_files) + ":wat"
    if fixture_fresh(out_dir, key):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).to_pydict()
    base = datetime(2023, 9, 21, 7, 37, 11, tzinfo=timezone.utc)
    shards: list[list[dict]] = [[] for _ in range(n_files)]
    for doc_id in t["doc_id"]:
        doc_id = int(doc_id)
        wd = (base + timedelta(seconds=doc_id)).strftime("%Y-%m-%dT%H:%M:%SZ")
        links = [
            {"path": "A@/href", "url": f"/o/{(doc_id * 7) % 1000}",
             "text": "x"},
            {"path": "A@/href",
             "url": (f"HTTPS://Host{doc_id % 50}.Example.COM:443"
                     f"/x/../p/{doc_id}"),
             "text": "y"},
            {"path": "A@/href", "url": "mailto:a@b.c", "text": "m"},
        ]
        shards[doc_id % n_files].append(
            {
                "url": (f"https://site{doc_id % 20}.example.org"
                        f"/page/{doc_id}"),
                "links": links,
                "warc_date": wd,
                "record_id": "<urn:uuid:"
                + hashlib.md5(f"wat:{doc_id}".encode()).hexdigest()
                + ">",
            }
        )
    written: set[str] = set()
    for i, recs in enumerate(shards):
        name = f"CC-MAIN-20230921073711-20230921103711-{i:05d}.warc.wat.gz"
        tmp, final = atomic_path(os.path.join(out_dir, name))
        write_wat_gz(tmp, recs)
        os.replace(tmp, final)
        written.add(name)
    prune_orphans(out_dir, ".warc.wat.gz", written)
    mark_fixture_done(out_dir, key)
    return out_dir
