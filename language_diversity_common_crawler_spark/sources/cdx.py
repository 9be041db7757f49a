"""Common Crawl CDX-J index source: ``.cdx.gz`` shards → a fetch-plan table.

CDX-J is the Common Crawl capture index format (cc-index collinfo /
pywb cdxj): one capture per line —

    <SURT key> <14-digit timestamp> <JSON blob>

gzipped into shards that are globally sorted by (SURT, ts). Reading the
index is how a 100 TB pipeline plans SELECTIVE WARC fetches: filter by
host range / status / mime over the (tiny, ~100s of GB) index, aggregate
per WARC filename, and fetch only the byte ranges you need — never
scanning the WARCs themselves. SURT order (urlgen.surt_expr) makes the
host/domain filters partition-range-prunable. The reference reads WARC
files directly (/root/reference/src/main.py:63-65) and has no index
stage; this is the scale path in front of sources/warc.py.

Scale shape: gzip shards are non-splittable, so parallelism is one shard
per task (CC ships 300 x ~1 GB cdx.gz per crawl — natural file-level
fan-out, same argument as warc.py). The parse is three anchored regex
groups + JSON field extraction — all JVM whole-stage codegen, no Python.

The fixture writer derives lines as a pure function of the documents
table (doc_id, n_chars), mirrored expression-for-expression by the
DuckDB oracle builders, so the driver gate value-checks the full
read → parse → plan path.
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dialect import cast_str, rx
from .paths import load_text

# line = SURT key, space, 14-digit ts, space, JSON rest-of-line
_LINE_RX = r"^(\S+) (\d{14}) (.*)$"

# parsed schema: output column -> (json field, SQL cast type or None)
FIELDS = [
    ("url", "url", None),
    ("status", "status", "INT"),
    ("mime", "mime", None),
    ("length", "length", "BIGINT"),
    ("offset", "offset", "BIGINT"),
    ("filename", "filename", None),
]


def _parse_lines(lines: DataFrame) -> DataFrame:
    """The one parse path (batch AND streaming): anchored regex split,
    JSON field extraction, malformed lines dropped (pywb's tolerant
    reader semantics)."""
    pat = _LINE_RX
    staged = lines.select(
        F.regexp_extract("value", pat, 1).alias("surt"),
        F.regexp_extract("value", pat, 2).alias("__ts"),
        F.regexp_extract("value", pat, 3).alias("__js"),
    ).filter(F.col("__ts") != "")
    cols = [F.col("surt"), F.col("__ts").cast("bigint").alias("ts")]
    for out, field, typ in FIELDS:
        c = F.get_json_object(F.col("__js"), f"$.{field}")
        if typ:
            c = c.cast(typ.lower())
        cols.append(c.alias(out))
    return staged.select(*cols)


def cdx_records(spark: SparkSession, path: str) -> DataFrame:
    """Parse CDX-J shards into (surt, ts, url, status, mime, length,
    offset, filename)."""
    return _parse_lines(load_text(spark, path))


# ---------------------------------------------------------------------------
# deterministic derivation from the documents table (fixture + oracle twin)
# ---------------------------------------------------------------------------

def _parts(dialect: str) -> dict[str, str]:
    did = cast_str("doc_id", dialect)
    host_n = cast_str("doc_id % 20", dialect)
    return {
        "surt": f"concat('org,example,site', {host_n}, ')/page/', {did})",
        "ts": f"(20240101000000 + doc_id)",
        "url": (
            f"concat('https://site', {host_n}, '.example.org/page/', {did})"
        ),
        "status": "CASE WHEN doc_id % 10 = 0 THEN '404' ELSE '200' END",
        "mime": (
            "CASE WHEN doc_id % 9 = 0 THEN 'application/pdf' "
            "ELSE 'text/html' END"
        ),
        "length": cast_str("coalesce(n_chars, 0)", dialect),
        "offset": cast_str("doc_id * 1024", dialect),
        "filename": (
            f"concat('crawl-data/CC-MAIN-2024/segments/shard-',"
            f" {cast_str('doc_id % 8', dialect)}, '.warc.gz')"
        ),
    }


def line_expr(dialect: str) -> str:
    """The CDX-J line for a documents row — the single source of truth the
    Python fixture writer and both parsers' oracles share."""
    p = _parts(dialect)
    js = (
        f"concat('{{\"url\": \"', {p['url']}, '\", \"mime\": \"', {p['mime']},"
        f" '\", \"status\": \"', {p['status']}, '\", \"length\": \"',"
        f" {p['length']}, '\", \"offset\": \"', {p['offset']},"
        f" '\", \"filename\": \"', {p['filename']}, '\"}}')"
    )
    ts = cast_str(p["ts"], dialect)
    return f"concat({p['surt']}, ' ', {ts}, ' ', {js})"


def write_fixture_from_documents(
    sf_dir: str, out_dir: str, n_files: int = 8
) -> str:
    """``{out_dir}/cdx-{i:05d}.cdx.gz`` from ``{sf_dir}/documents.parquet``
    (driver-side pyarrow read — no Spark). Lines are derived with the SAME
    expression as line_expr (via DuckDB, so there is exactly one
    derivation), sharded by doc_id % n_files and sorted by (surt, ts)
    within each shard — the CC index layout. Idempotent per (source
    content, n_files); stale shards from a regenerated documents.parquet
    are rewritten, and shard publication is atomic (fixtures.py)."""
    import duckdb

    from .fixtures import atomic_path, fixture_fresh, fixture_key, \
        mark_fixture_done, prune_orphans

    key = fixture_key(sf_dir, n_files)
    if fixture_fresh(out_dir, key):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id % {n_files}, {line_expr('duckdb')} AS line "
        f"FROM read_parquet('{os.path.join(sf_dir, 'documents.parquet')}') "
        f"ORDER BY 1, {_parts('duckdb')['surt']}, doc_id"
    ).fetchall()
    shards: list[list[str]] = [[] for _ in range(n_files)]
    for shard, line in rows:
        shards[int(shard)].append(line)
    written: set[str] = set()
    for i, lines in enumerate(shards):
        name = f"cdx-{i:05d}.cdx.gz"
        tmp, final = atomic_path(os.path.join(out_dir, name))
        with gzip.open(tmp, "wt", encoding="utf-8") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        os.replace(tmp, final)
        written.add(name)
    prune_orphans(out_dir, ".cdx.gz", written)
    mark_fixture_done(out_dir, key)
    return out_dir


def sql_cdx_parse_oracle(table: str = "documents") -> str:
    """DuckDB twin of cdx_records over the fixture derivation: build each
    line from the documents table with line_expr, then parse it back with
    DuckDB's regex + JSON functions — a genuine roundtrip, not a shortcut
    to the pre-parse fields."""
    pat = rx(_LINE_RX, "duckdb")
    field_cols = []
    for out, field, typ in FIELDS:
        e = f"json_extract_string(__js, '$.{field}')"
        if typ:
            e = f"CAST({e} AS {typ})"
        field_cols.append(f"{e} AS {out}")
    fields = ",\n       ".join(field_cols)
    return f"""
SELECT surt, CAST(__ts AS BIGINT) AS ts,
       {fields}
FROM (
  SELECT regexp_extract(line, {pat}, 1) AS surt,
         regexp_extract(line, {pat}, 2) AS __ts,
         regexp_extract(line, {pat}, 3) AS __js
  FROM (SELECT {line_expr('duckdb')} AS line FROM {table})
) WHERE __ts <> ''
"""


def fetch_plan(records: DataFrame) -> DataFrame:
    """Selective-fetch plan: fetchable captures (HTTP 200, html) grouped
    per WARC shard file → record count + total payload bytes. ONE hash
    aggregate on filename (map-side partials); at full CC scale the output
    is one row per WARC file (~90k/crawl) — the driver's fetch manifest."""
    return (
        records.filter((F.col("status") == 200) & (F.col("mime") == "text/html"))
        .groupBy("filename")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_records"),
            F.sum("length").cast("bigint").alias("total_bytes"),
            F.min("surt").alias("first_surt"),
            F.max("surt").alias("last_surt"),
        )
    )


def sql_cdx_fetch_plan_oracle(table: str = "documents") -> str:
    return f"""
SELECT filename, CAST(count(*) AS BIGINT) AS n_records,
       CAST(sum(length) AS BIGINT) AS total_bytes,
       min(surt) AS first_surt, max(surt) AS last_surt
FROM ({sql_cdx_parse_oracle(table)})
WHERE status = 200 AND mime = 'text/html'
GROUP BY filename
"""


def cdx_records_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
    path_glob: str = "*.cdx.gz",
):
    """Streaming CDX ingest: new index shards landing in ``path`` become
    micro-batches of parsed capture rows — the 'index shards publish as
    the crawl progresses' shape (Common Crawl releases cdx.gz shards per
    segment as a crawl runs). Identical parse expressions to the batch
    reader; pair with streaming/microbatch.py sinks or feed fetch_plan
    per micro-batch via foreachBatch."""
    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", path_glob)
        .load(path)
    )
    return _parse_lines(lines)
