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

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_60
from . import fsio
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


def latest_round(spark: SparkSession, ckpt: str) -> int | None:
    """Highest committed round, or None if no init commit exists. Listing
    goes through the Hadoop FileSystem API (fsio) so the checkpoint can be
    a local dir, hdfs://, or s3a:// URI alike."""
    best = None
    for name in fsio.list_names(spark, ckpt):
        if name.startswith("MANIFEST-") and name.endswith(".json"):
            k = int(name[len("MANIFEST-"):-len(".json")])
            best = k if best is None else max(best, k)
    return best


def read_manifest(spark: SparkSession, ckpt: str, k: int) -> dict:
    return json.loads(fsio.read_text(spark, _manifest_path(ckpt, k)))


def read_seen(spark: SparkSession, ckpt: str, upto: int) -> DataFrame:
    """Union of seen-set deltas for rounds 0..upto (append-only log, the
    Iceberg-snapshot shape — no rewrite of the 10^10-row set per round)."""
    paths = [
        _rdir(ckpt, k, "seen_delta")
        for k in range(upto + 1)
        if fsio.exists(spark, _rdir(ckpt, k, "seen_delta"))
    ]
    return spark.read.parquet(*paths).select("url_canon")


def init_crawl(spark: SparkSession, seeds: DataFrame, ckpt: str) -> None:
    """Round 0 commit: frontier = seeds, seen = seeds, nothing scheduled.
    ``seeds`` must have (url_canon, host)."""
    seeds = seeds.select("url_canon", "host").dropDuplicates(["url_canon"])
    obs = Observation("init")
    seeds = seeds.observe(obs, F.count(F.lit(1)).alias("n"))
    seeds.write.mode("overwrite").parquet(_rdir(ckpt, 0, "frontier"))
    n = int(obs.get["n"])  # ride the write job — no re-read count
    hashed = seen.with_url_hashes(
        spark.read.parquet(_rdir(ckpt, 0, "frontier")), n_parts=N_PARTS
    )
    hashed.select("url_canon", "host", "part_id").write.mode("overwrite").parquet(
        _rdir(ckpt, 0, "seen_delta")
    )
    seen.build_bloom(hashed).write.mode("overwrite").parquet(_rdir(ckpt, 0, "bloom"))
    fsio.write_text(
        spark,
        _manifest_path(ckpt, 0),
        json.dumps({"round": 0, "n_frontier": n, "n_scheduled": 0, "n_new": n}),
    )


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
    prev = latest_round(spark, ckpt)
    if prev is None:
        raise ValueError(f"no committed state under {ckpt}; call init_crawl first")
    k = prev + 1

    frontier = spark.read.parquet(_rdir(ckpt, prev, "frontier"))
    seen_urls = read_seen(spark, ckpt, prev)

    eligible = frontier
    if rules is not None:
        eligible = robots_mod.filter_allowed(eligible, rules)

    # manifest counts ride the snapshot writes as Observations — zero
    # extra jobs (the old shape re-scanned three snapshots it just wrote)
    obs_sched = Observation(f"sched-{k}")
    sched = scheduler.politeness_schedule(eligible, budget).select(
        "host", "url_canon", "priority", "slot"
    ).observe(obs_sched, F.count(F.lit(1)).alias("n"))
    sched.write.mode("overwrite").parquet(_rdir(ckpt, k, "scheduled"))
    n_scheduled = int(obs_sched.get["n"])
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
            if fsio.exists(spark, prev_bloom)
            else seen.build_bloom(seen.with_url_hashes(seen_urls, n_parts=N_PARTS))
        )
    new = seen.filter_unseen(cand, seen_urls, bloom=bloom, dedupe=True)

    obs_new = Observation(f"new-{k}")
    new.select("url_canon", "host", "part_id").observe(
        obs_new, F.count(F.lit(1)).alias("n")
    ).write.mode("overwrite").parquet(_rdir(ckpt, k, "seen_delta"))
    n_new = int(obs_new.get["n"])
    new_urls = spark.read.parquet(_rdir(ckpt, k, "seen_delta"))

    if bloom is not None:
        delta_bloom = seen.build_bloom(
            seen.with_url_hashes(new_urls.select("url_canon"), n_parts=N_PARTS)
        )
        seen.merge_bloom(bloom, delta_bloom).write.mode("overwrite").parquet(
            _rdir(ckpt, k, "bloom")
        )

    # per-partition lineage metrics for this round (scale observability:
    # one row per hash partition, not per URL), plus the committed bloom's
    # fill ratio / estimated fpp so operators see the filter saturating
    lineage = new_urls.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    if bloom is not None:
        bstats = seen.bloom_stats(
            spark.read.parquet(_rdir(ckpt, k, "bloom"))
        ).withColumnRenamed("n_keys", "bloom_keys")
        lineage = lineage.join(bstats, "part_id", "full_outer").withColumn(
            "n_new", F.coalesce(F.col("n_new"), F.lit(0))
        )
    lineage.withColumn("round", F.lit(k)).write.mode("overwrite").parquet(
        _rdir(ckpt, k, "metrics")
    )

    obs_front = Observation(f"front-{k}")
    next_frontier = frontier.join(
        sched.select("url_canon"), "url_canon", "left_anti"
    ).unionByName(new_urls.select("url_canon", "host")).observe(
        obs_front, F.count(F.lit(1)).alias("n")
    )
    next_frontier.write.mode("overwrite").parquet(_rdir(ckpt, k, "frontier"))

    manifest = {
        "round": k,
        "n_frontier": int(obs_front.get["n"]),
        "n_scheduled": n_scheduled,
        "n_new": n_new,
    }
    # commit marker, written LAST (via the Hadoop FS API — works for
    # local, hdfs:// and s3a:// checkpoints alike)
    fsio.write_text(spark, _manifest_path(ckpt, k), json.dumps(manifest))
    return manifest


def crawl_order(spark: SparkSession, ckpt: str) -> DataFrame:
    """Total crawl order across committed rounds: (round, host, slot,
    url_canon, priority) ordered by (round, host, slot). ONE multi-path
    scan — the round number is recovered from the snapshot path, not via a
    per-round read+union loop."""
    last = latest_round(spark, ckpt)
    paths = [
        p
        for k in range(1, (last or 0) + 1)
        for p in [_rdir(ckpt, k, "scheduled")]
        if fsio.exists(spark, p)
    ]
    if not paths:
        raise ValueError("no scheduled rounds committed")
    df = spark.read.parquet(*paths).withColumn(
        "round",
        F.regexp_extract(F.input_file_name(), r"r=(\d+)/scheduled", 1).cast(
            "int"
        ),
    )
    return df.select("round", "host", "slot", "url_canon", "priority").orderBy(
        "round", "host", "slot"
    )


# ---------------------------------------------------------------------------
# benchmark entry (bench.py)
# ---------------------------------------------------------------------------

def bench_round(
    spark: SparkSession, sf_dir: str, budget: int = 3, mult: int = 1
) -> tuple[int, int]:
    """One full in-memory frontier round over orders-derived seeds:
    canonicalize -> hash -> bloom-probe vs a pre-seen third of the seeds ->
    exact anti-join -> robots broadcast filter -> two-phase politeness
    schedule. Returns (n_seed_urls, n_scheduled).

    ``mult`` replicates the seed list (distinct URLs per replica) so the
    measured round carries enough rows per task at high parallelism —
    bench.py sizes it to the core count; without it a small sf puts only
    hundreds of rows per task and the timing measures stage overhead, not
    the engine."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # repartition the small side BEFORE expansion + the regex-heavy
    # canonicalize map: the orders file is a single small parquet split,
    # which would otherwise serialize the whole map into one task
    par = spark.sparkContext.defaultParallelism * 2
    base = orders.select("o_orderkey", "o_custkey").repartition(par)
    n_orders = orders.count()  # parquet footer metadata — no data scan
    if mult > 1:
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        base = base.crossJoin(F.broadcast(reps)).select(
            (F.col("o_orderkey") * mult + F.col("rep")).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("rep")).alias("o_custkey"),
        )
    seeds = urlgen.with_canonical(
        base.select(
            F.col("o_orderkey").alias("seed_id"),
            F.expr(urlgen.synthetic_url_expr("spark")).alias("url_raw"),
        )
    ).select("seed_id", "url_canon", "host")
    n_seeds = n_orders * mult

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
