"""Iterative crawl rounds over snapshot tables, with exact mid-crawl resume
(north rule: "resumable from checkpoint with per-partition lineage +
metrics").

Each round is one batch job over the frontier table:

    frontier_k  --politeness schedule-->  scheduled_k      (fetch slots)
    scheduled_k --link discovery------->  discovered_k     (pure function)
    discovered_k --bloom + anti-join--->  new_k            (vs URL-seen set)
    frontier_{k+1} = (frontier_k \\ scheduled_k) UNION new_k
    seen_{k+1}     = seen_k UNION new_k           (seen = ever-enqueued)

State between rounds is a set of immutable parquet snapshot directories —
the sandbox stand-in for Iceberg snapshot commits (same shape: append-only
deltas for the seen set, full small snapshot for the pending frontier, and a
manifest written LAST as the atomic commit marker; a crash mid-round leaves
no manifest, so resume re-runs the round from the previous committed state,
exactly like an uncommitted Iceberg snapshot). Per-round, per-hash-partition
lineage rows (row counts in/out by stage) land in ``metrics/``.

Everything that determines crawl order is a pure function of the data
(priority hash, url tiebreak, discovery condition) — never of partitioning
or wall clock — so the distributed rounds reproduce the sequential oracle's
crawl order and URL-seen set exactly (tests/test_frontier.py).

The reference has no frontier (it fetches one hardcoded segment,
/root/reference/main.py:85-87); this is the BASELINE.json extension.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_60
from . import robots as robots_mod
from . import scheduler, seen, urlgen

N_PARTS = seen.N_PARTS  # canonical hash-range partition count (seen.py)
DISCOVERY_FANOUT = 2
DISCOVERY_MOD = 3  # child kept iff md5_60('disc:'+child) % 3 != 0


# ---------------------------------------------------------------------------
# deterministic link discovery (pure function — mirrored in oracle.py)
# ---------------------------------------------------------------------------

def discover_children(
    scheduled: DataFrame, url_col: str = "url_canon", dedupe: bool = False
) -> DataFrame:
    """Child URLs of fetched pages: ``<url-sans-query>/c<i>`` for i in
    1..FANOUT, kept iff a 60-bit hash of the child is nonzero mod
    DISCOVERY_MOD. Stand-in for real outlink extraction — deterministic so
    the sequential oracle reproduces it; swap with an href-extracting
    pandas UDF on real pages. Dedup is normally left to the seen-set
    probe's cogroup shuffle (filter_unseen(dedupe=True)) — one exchange
    instead of two."""
    base = F.regexp_replace(F.col(url_col), r"[?#].*$", "")
    children = F.array(
        *[F.concat(base, F.lit(f"/c{i}")) for i in range(1, DISCOVERY_FANOUT + 1)]
    )
    out = scheduled.select(
        F.col("host"), F.explode(children).alias(url_col)
    )
    keep = md5_60(F.concat(F.lit("disc:"), F.col(url_col))) % DISCOVERY_MOD != 0
    out = out.filter(keep)
    return out.dropDuplicates([url_col]) if dedupe else out


# ---------------------------------------------------------------------------
# snapshot state helpers
# ---------------------------------------------------------------------------

def _rdir(ckpt: str, k: int, sub: str) -> str:
    return os.path.join(ckpt, "rounds", f"r={k:04d}", sub)


def _manifest_path(ckpt: str, k: int) -> str:
    return os.path.join(ckpt, f"MANIFEST-{k:04d}.json")


def latest_round(ckpt: str) -> int | None:
    """Highest committed round, or None if no init commit exists."""
    best = None
    if not os.path.isdir(ckpt):
        return None
    for name in os.listdir(ckpt):
        if name.startswith("MANIFEST-") and name.endswith(".json"):
            k = int(name[len("MANIFEST-"):-len(".json")])
            best = k if best is None else max(best, k)
    return best


def read_seen(spark: SparkSession, ckpt: str, upto: int) -> DataFrame:
    """Union of seen-set deltas for rounds 0..upto (append-only log, the
    Iceberg-snapshot shape — no rewrite of the 10^10-row set per round)."""
    paths = [
        _rdir(ckpt, k, "seen_delta")
        for k in range(upto + 1)
        if os.path.isdir(_rdir(ckpt, k, "seen_delta"))
    ]
    return spark.read.parquet(*paths).select("url_canon")


def init_crawl(spark: SparkSession, seeds: DataFrame, ckpt: str) -> None:
    """Round 0 commit: frontier = seeds, seen = seeds, nothing scheduled.
    ``seeds`` must have (url_canon, host)."""
    seeds = seeds.select("url_canon", "host").dropDuplicates(["url_canon"])
    seeds.write.mode("overwrite").parquet(_rdir(ckpt, 0, "frontier"))
    hashed = seen.with_url_hashes(seeds, n_parts=N_PARTS)
    hashed.select("url_canon", "host", "part_id").write.mode("overwrite").parquet(
        _rdir(ckpt, 0, "seen_delta")
    )
    seen.build_bloom(hashed).write.mode("overwrite").parquet(_rdir(ckpt, 0, "bloom"))
    n = spark.read.parquet(_rdir(ckpt, 0, "frontier")).count()
    with open(_manifest_path(ckpt, 0), "w") as f:
        json.dump({"round": 0, "n_frontier": n, "n_scheduled": 0, "n_new": n}, f)


def run_round(
    spark: SparkSession,
    ckpt: str,
    budget: int = 3,
    rules: DataFrame | None = None,
    use_bloom: bool = True,
) -> dict:
    """Execute the next crawl round from the latest committed snapshot;
    commit scheduled/frontier/seen-delta/metrics, manifest last. Returns the
    manifest dict. Idempotent on crash: an uncommitted round is simply
    re-run."""
    prev = latest_round(ckpt)
    if prev is None:
        raise ValueError(f"no committed state under {ckpt}; call init_crawl first")
    k = prev + 1

    frontier = spark.read.parquet(_rdir(ckpt, prev, "frontier"))
    seen_urls = read_seen(spark, ckpt, prev)

    eligible = frontier
    if rules is not None:
        eligible = robots_mod.filter_allowed(eligible, rules)

    sched = scheduler.politeness_schedule(eligible, budget).select(
        "host", "url_canon", "priority", "slot"
    )
    sched.write.mode("overwrite").parquet(_rdir(ckpt, k, "scheduled"))
    sched = spark.read.parquet(_rdir(ckpt, k, "scheduled"))

    discovered = discover_children(sched)
    cand = seen.with_url_hashes(discovered, n_parts=N_PARTS)
    # incremental bloom: the committed filter already covers all prior
    # rounds — never rebuilt from the (10^10-row) seen set
    bloom = None
    if use_bloom:
        prev_bloom = _rdir(ckpt, prev, "bloom")
        bloom = (
            spark.read.parquet(prev_bloom)
            if os.path.isdir(prev_bloom)
            else seen.build_bloom(seen.with_url_hashes(seen_urls, n_parts=N_PARTS))
        )
    new = seen.filter_unseen(cand, seen_urls, bloom=bloom, dedupe=True)

    new.select("url_canon", "host", "part_id").write.mode("overwrite").parquet(
        _rdir(ckpt, k, "seen_delta")
    )
    new_urls = spark.read.parquet(_rdir(ckpt, k, "seen_delta"))

    # per-partition lineage metrics for this round (scale observability:
    # one row per hash partition, not per URL)
    new_urls.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n_new")
    ).withColumn("round", F.lit(k)).write.mode("overwrite").parquet(
        _rdir(ckpt, k, "metrics")
    )

    if bloom is not None:
        delta_bloom = seen.build_bloom(
            seen.with_url_hashes(new_urls.select("url_canon"), n_parts=N_PARTS)
        )
        seen.merge_bloom(bloom, delta_bloom).write.mode("overwrite").parquet(
            _rdir(ckpt, k, "bloom")
        )

    next_frontier = frontier.join(
        sched.select("url_canon"), "url_canon", "left_anti"
    ).unionByName(new_urls.select("url_canon", "host"))
    next_frontier.write.mode("overwrite").parquet(_rdir(ckpt, k, "frontier"))

    manifest = {
        "round": k,
        "n_frontier": spark.read.parquet(_rdir(ckpt, k, "frontier")).count(),
        "n_scheduled": sched.count(),
        "n_new": spark.read.parquet(_rdir(ckpt, k, "seen_delta")).count(),
    }
    with open(_manifest_path(ckpt, k), "w") as f:  # commit marker, written LAST
        json.dump(manifest, f)
    return manifest


def crawl_order(spark: SparkSession, ckpt: str) -> DataFrame:
    """Total crawl order across committed rounds: (round, host, slot,
    url_canon, priority) ordered by (round, host, slot)."""
    last = latest_round(ckpt)
    parts = []
    for k in range(1, (last or 0) + 1):
        p = _rdir(ckpt, k, "scheduled")
        if os.path.isdir(p):
            parts.append(
                spark.read.parquet(p).withColumn("round", F.lit(k))
            )
    if not parts:
        raise ValueError("no scheduled rounds committed")
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df.select("round", "host", "slot", "url_canon", "priority").orderBy(
        "round", "host", "slot"
    )


# ---------------------------------------------------------------------------
# benchmark entry (bench.py)
# ---------------------------------------------------------------------------

def bench_round(spark: SparkSession, sf_dir: str, budget: int = 3) -> tuple[int, int]:
    """One full in-memory frontier round over orders-derived seeds:
    canonicalize -> hash -> bloom-probe vs a pre-seen third of the seeds ->
    exact anti-join -> robots broadcast filter -> two-phase politeness
    schedule. Returns (n_seed_urls, n_scheduled)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # repartition before the regex-heavy canonicalize map: the orders file
    # is a single small parquet split, which would otherwise serialize the
    # whole map into one task
    par = spark.sparkContext.defaultParallelism * 2
    seeds = urlgen.with_canonical(
        orders.select(
            F.col("o_orderkey").alias("seed_id"),
            F.expr(urlgen.synthetic_url_expr("spark")).alias("url_raw"),
        ).repartition(par)
    ).select("seed_id", "url_canon", "host")
    n_seeds = seeds.count()

    pre_seen = seeds.filter(F.col("seed_id") % 3 == 0).select("url_canon")
    bloom = seen.build_bloom(seen.with_url_hashes(pre_seen, n_parts=N_PARTS))
    cand = seen.with_url_hashes(seeds, n_parts=N_PARTS)
    fresh = seen.filter_unseen(cand, pre_seen, bloom=bloom, dedupe=True)

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    robots_bodies = nation.select(
        F.concat(
            F.lit("host"), F.col("n_nationkey").cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.concat(
            F.lit("User-agent: *\nDisallow: "),
            F.when(F.col("n_nationkey") % 3 == 0, F.lit("/o/1")).otherwise(
                F.lit("/private/")
            ),
        ).alias("robots_txt"),
    )
    rules = robots_mod.rules_from_bodies(robots_bodies)
    allowed = robots_mod.filter_allowed(fresh, rules)

    sched = scheduler.politeness_schedule(allowed, budget)
    n_scheduled = sched.count()
    return n_seeds, n_scheduled
