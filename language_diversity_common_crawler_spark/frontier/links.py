"""Outlink extraction: href discovery from page HTML/text.

The reference never follows links (it replays fixed Common Crawl segments,
/root/reference/main.py:85-87); the frontier's crawl rounds use a
deterministic synthetic discovery stand-in (crawl.discover_children). This
module is the REAL discovery path for actual pages: pull ``href``
attributes out of the markup, resolve them against the page URL, and
canonicalize — all JVM-side (regexp_extract_all + explode + the staged
canonicalizer), no Python in the loop.

Scale shape: pure map + explode (no shuffle until the seen-set probe);
output fan-out is bounded per page by ``max_links`` (slice) so one
link-farm page cannot blow up a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dialect import rx
from . import urlgen

# '#' IS allowed inside the href — fragments are stripped by
# canonicalization, not by refusing to match the link at all (a docs site
# whose every outlink carries an anchor must still contribute outlinks)
_HREF = r'href="([^"\s]+)"'

# The href-resolution contract, shared by extract_links and
# anchor_text_corpus in BOTH dialects (_resolve_hrefs / _sql_resolve):
# scheme-noise dropped, absolute http(s) passes through, everything else
# resolves against the page's scheme://host, non-http(s) results dropped.
_ABS_RX = "^[A-Za-z][A-Za-z0-9+.-]*://"
_NOISE_RX = "^(mailto:|javascript:|data:|//)"
_HTTP_RX = "^[Hh][Tt][Tt][Pp][Ss]?://"


def _resolve_hrefs(exploded: DataFrame) -> DataFrame:
    """Resolve a ``__href`` column against ``__base`` into ``__raw`` —
    the single Spark-side resolution path; edits here apply to link
    extraction AND the anchor corpus (the DuckDB twin is _sql_resolve)."""
    is_abs = F.col("__href").rlike(_ABS_RX)
    is_scheme_noise = F.col("__href").rlike(_NOISE_RX)
    return (
        exploded.filter(~is_scheme_noise)
        .withColumn(
            "__raw",
            F.when(is_abs, F.col("__href")).otherwise(
                F.concat(
                    F.col("__base"),
                    F.when(
                        F.col("__href").startswith("/"), F.col("__href")
                    ).otherwise(F.concat(F.lit("/"), F.col("__href"))),
                )
            ),
        )
        .filter(F.col("__raw").rlike(_HTTP_RX))
    )


def _sql_resolve(select_cols: str, from_cte: str, extra_where: str = "") -> str:
    """DuckDB body of the resolution contract: emits ``{select_cols},
    __raw`` rows from a CTE exposing ``__href``/``__base``."""
    return f"""SELECT * FROM (
  SELECT {select_cols},
         CASE WHEN regexp_matches(__href, '{_ABS_RX}')
              THEN __href
              ELSE __base || (CASE WHEN starts_with(__href, '/')
                                   THEN __href ELSE '/' || __href END)
         END AS __raw
  FROM {from_cte}
  WHERE NOT regexp_matches(__href, '{_NOISE_RX}'){extra_where}
) WHERE regexp_matches(__raw, '{_HTTP_RX}')"""


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html_text",
    max_links: int = 64,
) -> DataFrame:
    """(page url, canonical outlink) pairs.

    ``html_col`` must be a STRING column (decode binary html first — the
    extract pipeline's ``content_decoded`` stage). Relative hrefs resolve
    against the page's scheme://host; absolute http(s) hrefs pass through;
    everything else (mailto:, javascript:, protocol-relative) is dropped.
    """
    hrefs = F.expr(
        f"slice(regexp_extract_all({html_col}, {rx(_HREF, 'spark')}, 1), "
        f"1, {max_links})"
    )
    base = F.regexp_extract(
        F.col(url_col), "^([a-z][a-z0-9+.-]*://[^/?#]*)", 1
    )
    exploded = pages.select(
        F.col(url_col).alias("src_url"),
        base.alias("__base"),
        F.explode(hrefs).alias("__href"),
    )
    resolved = _resolve_hrefs(exploded)
    out = urlgen.with_canonical(resolved, raw_col="__raw")
    return out.select(
        "src_url", F.col("url_canon").alias("link_url"), "host"
    ).dropDuplicates(["src_url", "link_url"])


def sql_extract_links(
    table: str,
    url_col: str = "url",
    html_col: str = "html_text",
    max_links: int = 64,
) -> str:
    """DuckDB oracle: same semantics (regexp_extract_all + unnest +
    inline canonicalize)."""
    href_rx = rx(_HREF, "duckdb")
    canon = urlgen.canonicalize_expr("__raw", "duckdb")
    host = urlgen.host_expr("url_canon", "duckdb")
    return f"""
WITH ex AS (
  SELECT {url_col} AS src_url,
         regexp_extract({url_col}, '^([a-z][a-z0-9+.-]*://[^/?#]*)', 1) AS __base,
         unnest(list_slice(regexp_extract_all({html_col}, {href_rx}, 1),
                           1, {max_links})) AS __href
  FROM {table}),
res AS ({_sql_resolve("src_url", "ex")}),
canon AS (
  SELECT src_url, {canon} AS url_canon
  FROM res)
SELECT DISTINCT src_url, url_canon AS link_url, {host} AS host
FROM canon
"""


# full anchor element: href + visible anchor text (no nested tags — the
# regex corpus path is a boilerplate-level extractor, not an HTML parser;
# nested-markup anchors fall to the extract pipeline's real DOM delegate)
_ANCHOR_ELEM = r'<a href="[^"\s]+"[^>]*>[^<]*</a>'
_ANCHOR_TEXT = r">([^<]*)</a>$"


def anchor_text_corpus(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html_text",
    max_links: int = 64,
) -> DataFrame:
    """(link_url, anchor, n_refs, n_src_pages): the anchor-text corpus —
    what other pages CALL a target — used as a retrieval/ranking training
    signal and as link-context features for crawl prioritization.

    Scale shape: same Generate-only extraction as extract_links (anchor
    elements per page bounded by ``max_links``); the one shuffle is the
    final (link_url, anchor) count aggregate, which is map-side combined
    (the web's anchor distribution is extremely repetitive, so partial
    aggregation collapses most of the fan-out before the exchange)."""
    elems = F.expr(
        f"slice(regexp_extract_all({html_col}, {rx(_ANCHOR_ELEM, 'spark')},"
        f" 0), 1, {max_links})"
    )
    base = F.regexp_extract(
        F.col(url_col), "^([a-z][a-z0-9+.-]*://[^/?#]*)", 1
    )
    exploded = pages.select(
        F.col(url_col).alias("src_url"),
        base.alias("__base"),
        F.explode(elems).alias("__elem"),
    )
    parsed = exploded.select(
        "src_url", "__base",
        F.expr(f"regexp_extract(__elem, {rx(_HREF, 'spark')}, 1)")
        .alias("__href"),
        F.lower(F.trim(
            F.expr(f"regexp_extract(__elem, {rx(_ANCHOR_TEXT, 'spark')}, 1)")
        )).alias("anchor"),
    ).filter(F.col("anchor") != "")
    resolved = _resolve_hrefs(parsed)
    out = urlgen.with_canonical(resolved, raw_col="__raw")
    return out.groupBy(
        F.col("url_canon").alias("link_url"), "anchor"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_refs"),
        F.countDistinct("src_url").cast("bigint").alias("n_src_pages"),
    )


def sql_anchor_text_corpus(
    table: str,
    url_col: str = "url",
    html_col: str = "html_text",
    max_links: int = 64,
) -> str:
    """DuckDB twin of anchor_text_corpus."""
    elem_rx = rx(_ANCHOR_ELEM, "duckdb")
    href_rx = rx(_HREF, "duckdb")
    text_rx = rx(_ANCHOR_TEXT, "duckdb")
    canon = urlgen.canonicalize_expr("__raw", "duckdb")
    return f"""
WITH ex AS (
  SELECT {url_col} AS src_url,
         regexp_extract({url_col}, '^([a-z][a-z0-9+.-]*://[^/?#]*)', 1) AS __base,
         unnest(list_slice(regexp_extract_all({html_col}, {elem_rx}, 0),
                           1, {max_links})) AS __elem
  FROM {table}),
parsed AS (
  SELECT src_url, __base,
         regexp_extract(__elem, {href_rx}, 1) AS __href,
         lower(trim(regexp_extract(__elem, {text_rx}, 1))) AS anchor
  FROM ex),
res AS ({_sql_resolve("src_url, anchor", "parsed",
                      extra_where=" AND anchor <> ''")}),
canon AS (
  SELECT src_url, anchor, {canon} AS url_canon
  FROM res)
SELECT url_canon AS link_url, anchor,
       CAST(count(*) AS BIGINT) AS n_refs,
       CAST(count(DISTINCT src_url) AS BIGINT) AS n_src_pages
FROM canon GROUP BY 1, 2
"""
