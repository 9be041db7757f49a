"""Robots.txt rules cache: parse once per host, broadcast per batch
(north rule: "robots.txt rules cache broadcast per batch").

The rules table is tiny relative to the frontier (one row per host, even at
10^8 hosts it is GBs not TBs; per-batch it is the hosts touched by the
round's candidates — typically small enough to broadcast). We broadcast-join
it against candidate URLs so the 10^10-row side never shuffles for the
robots check; the rule test itself is a JVM-side array aggregate over the
host's match specs — codegen ``startswith`` for plain prefixes, anchored
regex (compiled once per host at parse time) for RFC 9309 §2.2.3
wildcard rules.

Parsing robots.txt bodies is string work over a per-host text column — a
vectorized pandas transformation inside ``mapInPandas`` (no per-row Python
UDF calls; one Python invocation per Arrow batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from pyspark.sql.types import IntegerType  # noqa: E402

from pyspark.sql.types import BooleanType  # noqa: E402

# Match-ready rule spec, precomputed ONCE PER HOST at parse time (the rules
# table is tiny; the 10^10-URL side must never pay pattern compilation):
# pat = raw robots pattern, ln = its octet length (RFC 9309 §2.2.2
# specificity: the longest pattern wins), wild = contains '*' or ends in
# '$' (RFC §2.2.3 special characters), rx = the anchored regex a wildcard
# pattern matches with (NULL for plain prefixes, which use startswith).
_MATCH_SPEC = StructType(
    [
        StructField("pat", StringType(), False),
        StructField("ln", IntegerType(), False),
        StructField("wild", BooleanType(), False),
        StructField("rx", StringType(), True),
    ]
)

RULES_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("disallow", ArrayType(StringType(), False), False),
        StructField("allow", ArrayType(StringType(), False), False),
        StructField("crawl_delay", IntegerType(), True),
        StructField("disallow_m", ArrayType(_MATCH_SPEC, False), False),
        StructField("allow_m", ArrayType(_MATCH_SPEC, False), False),
    ]
)


def _match_spec(pattern: str) -> dict:
    """Parse-time regexification of one robots path pattern (RFC 9309
    §2.2.3): '*' matches any octet sequence, a TRAILING '$' anchors the
    end; both are literal anywhere else. re.escape's output uses only
    escapes Java regex reads identically, so ONE rx string serves the
    Spark executor (Java) and the Python oracle."""
    import re

    wild = "*" in pattern or pattern.endswith("$")
    rx = None
    if wild:
        esc = re.escape(pattern).replace(r"\*", ".*")
        if esc.endswith(r"\$"):
            rx = "^" + esc[:-2] + "$"
        else:
            rx = "^" + esc
    return {"pat": pattern, "ln": len(pattern), "wild": wild, "rx": rx}


def parse_robots_txt(body: str, user_agent: str = "*") -> tuple[list[str], list[str]]:
    """Disallow/Allow prefixes for ``user_agent`` from one robots.txt body.

    Group semantics per REP: consecutive User-agent lines form a group
    header; ANY other field line ends the header, so the next User-agent
    line starts a NEW group (a bot-specific group's rules must never leak
    into the wildcard group, and vice versa). Rule matching is longest-
    match (see py_allowed). Pure function — deterministic across oracle
    and executors.
    """
    disallow: list[str] = []
    allow: list[str] = []

    def on_field(field: str, value: str, applies: bool) -> None:
        if applies and field in ("disallow", "allow") and value:
            (disallow if field == "disallow" else allow).append(value)

    _walk_groups(body, user_agent, on_field)
    return disallow, allow


def _walk_groups(body: str, user_agent: str, on_field) -> None:
    """Shared group walk: calls on_field(field, value, applies) for every
    non-user-agent field line, in body order.

    Group boundaries: consecutive User-agent lines form one group header;
    any other field line closes the header, so the next User-agent line
    starts a NEW group. Group selection per RFC 9309 §2.2.1: if any group
    names ``user_agent`` (exact, case-insensitive), ONLY those groups
    apply; otherwise the ``*`` groups apply — a crawler obeys the most
    specific matching group, never a merge of wildcard + specific rules.
    Field lines before any User-agent line belong to no group
    (applies=False)."""
    groups: list[tuple[set[str], list[tuple[str, str]]]] = []
    pre: list[tuple[str, str]] = []
    in_header = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_header:
                groups.append(({value.lower()}, []))
                in_header = True
            else:
                groups[-1][0].add(value.lower())
        else:
            in_header = False
            if groups:
                groups[-1][1].append((field, value))
            else:
                pre.append((field, value))
    ua = user_agent.lower()
    has_specific = any(ua in uas for uas in (g[0] for g in groups)) and ua != "*"
    for field, value in pre:
        on_field(field, value, False)
    for uas, fields in groups:
        applies = (ua in uas) if has_specific else ("*" in uas or ua in uas)
        for field, value in fields:
            on_field(field, value, applies)


def parse_crawl_delay(body: str, user_agent: str = "*") -> int | None:
    """Crawl-delay (whole seconds) for ``user_agent``, or None. Same group
    semantics as parse_robots_txt (shared _walk_groups)."""
    found: list[int] = []

    def on_field(field: str, value: str, applies: bool) -> None:
        if applies and field == "crawl-delay" and value:
            try:
                found.append(max(int(float(value)), 0))
            except ValueError:
                pass

    _walk_groups(body, user_agent, on_field)
    return found[-1] if found else None


def rules_from_bodies(
    robots_df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) -> (host, disallow[], allow[]) via mapInPandas."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_robots_txt(b or "", user_agent) for b in pdf[body_col]]
            delays = [
                parse_crawl_delay(b or "", user_agent) for b in pdf[body_col]
            ]
            yield pd.DataFrame(
                {
                    "host": pdf[host_col].values,
                    "disallow": [p[0] for p in parsed],
                    "allow": [p[1] for p in parsed],
                    "crawl_delay": pd.array(delays, dtype="Int32"),
                    "disallow_m": [
                        [_match_spec(x) for x in p[0]] for p in parsed
                    ],
                    "allow_m": [
                        [_match_spec(x) for x in p[1]] for p in parsed
                    ],
                }
            )

    return robots_df.mapInPandas(_parse, RULES_SCHEMA)


def host_budgets(
    rules: DataFrame, default_budget: int, round_seconds: int = 60
) -> DataFrame:
    """(host, budget): fetch slots per round honoring Crawl-delay — a host
    demanding d seconds between fetches gets at most round_seconds/d slots
    per round (floor, min 1), capped by the default."""
    b = F.when(
        F.col("crawl_delay").isNull() | (F.col("crawl_delay") <= 0),
        F.lit(default_budget),
    ).otherwise(
        F.greatest(
            F.lit(1),
            F.least(
                F.lit(default_budget),
                F.floor(F.lit(round_seconds) / F.col("crawl_delay")).cast("int"),
            ),
        )
    )
    return rules.select("host", b.cast("int").alias("budget"))


def url_path(url_col: str = "url_canon") -> F.Column:
    return F.regexp_extract(F.col(url_col), "^[a-z][a-z0-9+.-]*://[^/]*(/.*)$", 1)


def _longest_match_len(arr_col: str) -> F.Column:
    """Length (RFC 9309 §2.2.2 specificity = pattern octet count) of the
    longest rule in the ``arr_col`` match-spec array matching the
    ``__path_tmp`` column (0 when none match) — JVM-side array aggregate.
    Plain prefixes (the overwhelming majority of real rules) stay on the
    codegen ``startswith`` fast path; only rules that actually carry a
    wildcard pay the per-row regex (``rx`` was compiled to its final form
    once per host at parse time)."""
    return F.expr(
        f"aggregate(filter({arr_col}, x -> CASE WHEN x.wild "
        f"THEN __path_tmp RLIKE x.rx "
        f"ELSE startswith(__path_tmp, x.pat) END), "
        f"0, (acc, x) -> greatest(acc, x.ln))"
    )


def filter_allowed(
    candidates: DataFrame,
    rules: DataFrame,
    url_col: str = "url_canon",
    host_col: str = "host",
) -> DataFrame:
    """REP longest-match: the most specific matching rule wins; Allow wins
    ties; no matching Disallow means allowed. RFC 9309 §2.2.3 wildcards
    ('*' anywhere, trailing '$') are honored via the parse-time match
    specs. Broadcast join on host; the longest-match lengths are JVM-side
    array aggregates."""
    r = rules.select(
        F.col("host").alias("__r_host"),
        F.col("disallow_m").alias("__r_disallow"),
        F.col("allow_m").alias("__r_allow"),
    )
    joined = candidates.join(
        F.broadcast(r), candidates[host_col] == r["__r_host"], "left"
    ).withColumn("__path_tmp", url_path(url_col))
    max_dis = _longest_match_len("__r_disallow")
    max_alw = _longest_match_len("__r_allow")
    allowed = (
        F.col("__r_host").isNull() | (max_dis == 0) | (max_alw >= max_dis)
    )
    return joined.filter(allowed).drop(
        "__r_host", "__r_disallow", "__r_allow", "__path_tmp"
    )


def _py_match(path: str, pattern: str) -> bool:
    """Python mirror of one match-spec test (same regexification as
    :func:`_match_spec`; re.match anchors at the start like the '^')."""
    import re

    if "*" in pattern or pattern.endswith("$"):
        esc = re.escape(pattern).replace(r"\*", ".*")
        rxs = esc[:-2] + "$" if esc.endswith(r"\$") else esc
        return re.match(rxs, path) is not None
    return path.startswith(pattern)


def py_allowed(url: str, disallow: list[str], allow: list[str]) -> bool:
    """Python equivalent of :func:`filter_allowed`'s predicate (oracle):
    longest matching rule wins (specificity = pattern length), Allow wins
    ties, no Disallow match = allowed; wildcards per RFC 9309 §2.2.3."""
    import re

    m = re.match(r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)$", url)
    path = m.group(1) if m else ""
    max_dis = max((len(p) for p in disallow if _py_match(path, p)), default=0)
    max_alw = max((len(p) for p in allow if _py_match(path, p)), default=0)
    return max_dis == 0 or max_alw >= max_dis


# RFC 9309 §2.3: Sitemap lines are NOT group members — any "sitemap:" line
# anywhere in the file applies to the whole host, case-insensitively.
# Per the RFC's ABNF the pattern tolerates leading WS, WS around ':', and a
# trailing '#'-comment; the explicit `\r?$` is load-bearing: Java's
# multiline `$` matches before a full \r\n terminator but RE2/Python match
# only before \n, so without it a CRLF robots.txt (extremely common) parses
# differently across the three engines.
_SITEMAP_RX = (
    r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^ \t\r\n#]+)[ \t]*(?:#[^\r\n]*)?\r?$"
)


def sitemaps_expr(body_col: str, dialect: str) -> str:
    """Array of sitemap URLs declared in a robots.txt body column —
    identical regexp_extract_all in Spark and DuckDB (RE2 and Java both
    take the (?im) inline flags)."""
    from ..functions.dialect import rx

    return f"regexp_extract_all({body_col}, {rx(_SITEMAP_RX, dialect)}, 1)"


def py_sitemaps(body: str) -> list[str]:
    """Python mirror of sitemaps_expr."""
    import re as _re

    return _re.findall(_SITEMAP_RX, body or "")
