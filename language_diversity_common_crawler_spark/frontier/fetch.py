"""S1 — distributed HTTP fetch of scheduled URLs (the reference's segment
download, generalized to a polite per-host fetcher).

The reference fetches one hardcoded Common-Crawl segment over HTTP on the
driver (/root/reference/src/main.py:63-65: ``requests.get`` → BytesIO →
ArchiveIterator). At frontier scale the fetch itself must be distributed:
this module turns a politeness-scheduled batch (``scheduler.
politeness_schedule`` output) into rows of the pages schema by fetching
each URL from inside executor tasks.

Scale/politeness design:

- **One host never fetched concurrently**: rows are hash-repartitioned by
  ``host``, so all of a host's scheduled URLs land in one task and are
  fetched serially, in slot order, with ``min_interval_s`` enforced
  between same-host requests (wall-clock pacing inside the task). Hosts
  are spread across tasks; concurrency = number of partitions.
- **Streaming body reads with a byte cap** (``max_bytes``): a pathological
  response cannot blow task memory.
- **Row-level fault isolation**: DNS errors, timeouts, non-2xx statuses
  become rows with NULL html and the error/status recorded — one dead
  host cannot kill a 10^10-URL job (mirrors the decode chain's
  drop-don't-crash stance).
- Pure stdlib (``urllib``) — no extra dependency; ``mapInPandas`` batches
  keep the per-row Python inherent to socket IO off the hot JVM path.

Output columns (superset of the pages-table fields the extract pipeline
reads — html, http_charset, url, warc_record_id, content_length):
``url, warc_ts, html, http_charset, accept_language, warc_record_id,
content_length, status, error, fetch_ms``. ``warc_record_id`` is a
deterministic urn:uuid of the URL's md5 (stable across refetches);
``warc_ts`` is the fetch time (inherently nondeterministic — tests pin
everything else).
"""

from __future__ import annotations

import hashlib
import time
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# shared with the WARC scanner so both ingest paths emit identical
# http_charset for identical headers
from ..functions.decode import charset_of  # noqa: F401  (module API)

FETCH_SCHEMA = (
    "url string, warc_ts timestamp, html binary, http_charset string, "
    "accept_language string, warc_record_id string, content_length string, "
    "status int, error string, fetch_ms double, truncated boolean"
)


def record_id_for(url: str) -> str:
    """Deterministic WARC-record-id for a URL (urn:uuid of md5, the
    reference's id shape — warc_extraction.py:43)."""
    h = hashlib.md5(url.encode("utf-8")).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


class FetchResult:
    __slots__ = ("body", "charset", "status", "error", "length_header",
                 "truncated")

    def __init__(self, body=None, charset=None, status=None, error=None,
                 length_header=None, truncated=False):
        self.body = body
        self.charset = charset
        self.status = status
        self.error = error
        self.length_header = length_header  # server's Content-Length, if any
        self.truncated = truncated


def fetch_one(
    url: str,
    user_agent: str,
    timeout_s: float,
    max_bytes: int,
    deadline_s: float = 60.0,
) -> FetchResult:
    """Fetch one URL — streaming read capped at ``max_bytes`` AND at
    ``deadline_s`` total wall time (urllib's timeout bounds only individual
    socket operations, so a slow-drip server would otherwise hold the task
    forever). Only http(s) schemes are fetched — anything else (file://,
    ftp://) is refused as an error row, never read off executor disk. Any
    failure is returned, never raised."""
    import urllib.error
    import urllib.request

    if not url.startswith(("http://", "https://")):
        return FetchResult(error="non_http_scheme")
    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    t0 = time.monotonic()
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            chunks, total, truncated = [], 0, False
            while total < max_bytes:
                if time.monotonic() - t0 > deadline_s:
                    return FetchResult(error="deadline_exceeded")
                chunk = resp.read(min(1 << 16, max_bytes - total))
                if not chunk:
                    break
                chunks.append(chunk)
                total += len(chunk)
            if total >= max_bytes and resp.read(1):
                truncated = True  # body continues past the cap
            return FetchResult(
                body=b"".join(chunks),
                charset=charset_of(resp.headers.get("Content-Type")),
                status=int(resp.status),
                length_header=resp.headers.get("Content-Length"),
                truncated=truncated,
            )
    except urllib.error.HTTPError as e:  # non-2xx with a status
        return FetchResult(status=int(e.code), error=f"http_{e.code}")
    except Exception as e:  # DNS, timeout, refused, TLS, ...
        return FetchResult(error=type(e).__name__)


def fetch_pages(
    scheduled: DataFrame,
    user_agent: str = "ldcc-spark-bot/0.1",
    timeout_s: float = 10.0,
    max_bytes: int = 2 * 1024 * 1024,
    min_interval_s: float = 0.0,
    n_partitions: int | None = None,
) -> DataFrame:
    """Fetch a scheduled batch → pages-schema rows (see module docstring).

    ``scheduled`` needs (url_canon, host); a ``slot`` column (politeness
    rank) orders same-host fetches when present. ``min_interval_s`` is the
    per-host pacing floor (crawl-delay); enforced exactly because each
    host lives in one task after the repartition.
    """
    order_cols = ["host"] + (
        ["slot"] if "slot" in scheduled.columns else ["url_canon"]
    )
    cols = ["url_canon", "host"] + (
        ["slot"] if "slot" in scheduled.columns else []
    )
    # slot order must hold across Arrow batch boundaries, so sort the
    # PARTITION (JVM-side) rather than each pandas batch: batches arrive
    # in partition order and the Python loop just walks them
    parts = (
        scheduled.select(*cols)
        .repartition(*([n_partitions] if n_partitions else []), "host")
        .sortWithinPartitions(*order_cols)
    )

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_hit: dict[str, float] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            out: dict[str, list] = {k: [] for k in (
                "url", "warc_ts", "html", "http_charset", "accept_language",
                "warc_record_id", "content_length", "status", "error",
                "fetch_ms", "truncated",
            )}
            for url, host in zip(pdf["url_canon"], pdf["host"]):
                if min_interval_s > 0.0:
                    wait = last_hit.get(host, 0.0) + min_interval_s - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                t0 = time.monotonic()
                r = fetch_one(url, user_agent, timeout_s, max_bytes)
                dt = time.monotonic() - t0
                if min_interval_s > 0.0:
                    last_hit[host] = time.monotonic()
                out["url"].append(url)
                out["warc_ts"].append(datetime.now(timezone.utc))
                out["html"].append(r.body)
                out["http_charset"].append(r.charset)
                out["accept_language"].append(None)
                out["warc_record_id"].append(record_id_for(url))
                # the server's Content-Length (the WARC-header-parity value)
                # when sent; actual body length otherwise
                out["content_length"].append(
                    r.length_header
                    if r.length_header is not None
                    else (str(len(r.body)) if r.body is not None else None)
                )
                out["status"].append(r.status)
                out["error"].append(r.error)
                out["fetch_ms"].append(dt * 1000.0)
                out["truncated"].append(r.truncated)
            pdf_out = pd.DataFrame(out)
            # tz-aware UTC: Spark stores TimestampType as UTC micros — a
            # naive datetime would be reinterpreted in the session timezone
            pdf_out["warc_ts"] = pd.to_datetime(pdf_out["warc_ts"], utc=True)
            yield pdf_out

    return parts.mapInPandas(_fetch, FETCH_SCHEMA)
