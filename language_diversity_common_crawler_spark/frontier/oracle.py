"""Sequential pure-Python crawl oracle.

The north rule requires the distributed frontier's crawl ordering and
URL-seen set to match "the reference under the same seed list and politeness
budget". The reference has no frontier (it reads one hardcoded segment,
/root/reference/main.py:85-87), so the contract is anchored here: a
single-threaded, obviously-correct crawler implementing the *same pure
functions* (canonicalization regexes, md5-based priority, discovery
condition, robots predicate, (priority DESC, url ASC) per-host order). Tests
assert the Spark rounds reproduce this oracle's schedule and seen set
exactly (tests/test_frontier.py), which proves crawl order is a function of
the data, never of partitioning.
"""

from __future__ import annotations

import re

from ..functions.hashing import py_md5_60
from .robots import py_allowed
from .scheduler import py_priority

_DOTSEG = re.compile(r"/[^/]+/\.\./")
_URL = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)(.*)$")


def py_synthetic_url(o_orderkey: int, o_custkey: int) -> str:
    """Mirror of urlgen.synthetic_url_expr."""
    host_n = o_custkey % 50
    url = f"HTTPS://Host{host_n}.Example.COM:443"
    url += "/x/../o/" if o_orderkey % 11 == 0 else "/o/"
    url += str(o_orderkey)
    if o_orderkey % 5 == 0:
        url += f"?id={o_orderkey}&utm_source=feed&utm_medium=rss&ref=home"
    if o_orderkey % 7 == 0:
        url += "#section-2"
    return url


def py_canonicalize(url: str) -> str:
    """Mirror of urlgen.canonicalize_expr (same regexes, same order).

    Raw line terminators pass through unchanged — see canonicalize_expr's
    CONTRACT note (Java/RE2/Python '$' semantics can't be aligned there).
    """
    if "\n" in url or "\r" in url:
        return url
    e = re.sub(r"#.*$", "", url)
    m = _URL.match(e)
    if not m:
        return e
    scheme = m.group(1).lower()
    host = re.sub(r":(443|80)$", "", m.group(2).lower())
    pathq = m.group(3)
    p = _DOTSEG.sub("/", pathq)
    # tracking-param strip: run-collapsing mid pass + single trailing pass,
    # mirroring urlgen._TRACK_MID/_TRACK_TAIL (the cross-engine contract)
    p = re.sub(r"([?&])((?:utm_[a-z]+|ref)=[^&#]*&)+", r"\1", p)
    p = re.sub(r"[?&](utm_[a-z]+|ref)=[^&#]*$", "", p)
    p = re.sub(r"[?&]$", "", p)
    return f"{scheme}://{host}{p if p else '/'}"


def py_host(canon_url: str) -> str:
    if "\n" in canon_url or "\r" in canon_url:
        return ""  # canonicalize passthrough case — mirror of host_expr
    m = re.match(r"^[a-z][a-z0-9+.\-]*://([^/:?#]*)", canon_url)
    return m.group(1) if m else ""


def py_surt(canon_url: str | None) -> str | None:
    """Mirror of urlgen.surt_expr (same guards, same label reversal)."""
    if canon_url is None:
        return None
    host = py_host(canon_url)
    if host == "":
        return ""
    h2 = re.sub(r"^www\.", "", host)
    rev = ",".join(reversed(h2.split(".")))
    mp = re.match(r"^[a-z][a-z0-9+.\-]*://[^/:?#]*(:[0-9]+)", canon_url)
    port = mp.group(1) if mp else ""
    mq = re.match(r"^[a-z][a-z0-9+.\-]*://[^/]*(/.*)$", canon_url)
    path = mq.group(1) if mq else ""
    return f"{rev}{port}){path}"


def py_discover(url: str, fanout: int = 2, mod: int = 3) -> list[str]:
    """Mirror of crawl.discover_children for one URL."""
    base = re.sub(r"[?#].*$", "", url)
    out = []
    for i in range(1, fanout + 1):
        child = f"{base}/c{i}"
        if py_md5_60(child, salt="disc") % mod != 0:
            out.append(child)
    return out


class SequentialCrawler:
    """Single-threaded frontier with identical semantics to crawl.run_round.

    ``rules``: optional {host: (disallow_prefixes, allow_prefixes)}.
    """

    def __init__(
        self,
        seeds: list[str],
        budget: int = 3,
        rules: dict[str, tuple[list[str], list[str]]] | None = None,
    ):
        self.budget = budget
        self.rules = rules or {}
        canon = []
        seen = set()
        for u in seeds:
            c = py_canonicalize(u)
            if c not in seen:
                seen.add(c)
                canon.append(c)
        self.frontier: set[str] = set(canon)
        self.seen: set[str] = set(canon)
        self.order: list[tuple[int, str, int, str, int]] = []  # round,host,slot,url,prio
        self.round = 0

    def _allowed(self, url: str) -> bool:
        host = py_host(url)
        if host not in self.rules:
            return True
        dis, alw = self.rules[host]
        return py_allowed(url, dis, alw)

    def run_round(self) -> dict:
        self.round += 1
        by_host: dict[str, list[str]] = {}
        for u in self.frontier:
            if self._allowed(u):
                by_host.setdefault(py_host(u), []).append(u)
        scheduled: list[str] = []
        for host in by_host:
            ranked = sorted(by_host[host], key=lambda u: (-py_priority(u), u))
            for slot, u in enumerate(ranked[: self.budget], start=1):
                self.order.append((self.round, host, slot, u, py_priority(u)))
                scheduled.append(u)
        discovered: set[str] = set()
        for u in scheduled:
            discovered.update(py_discover(u))
        new = discovered - self.seen
        self.seen |= new
        self.frontier = (self.frontier - set(scheduled)) | new
        return {
            "round": self.round,
            "n_frontier": len(self.frontier),
            "n_scheduled": len(scheduled),
            "n_new": len(new),
        }

    def run(self, n_rounds: int) -> None:
        for _ in range(n_rounds):
            self.run_round()
