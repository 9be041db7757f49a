#!/usr/bin/env python3
"""spark-submit entry point for the crawl frontier (north rule packaging).

Cluster usage (the real deployment shape):

    # package the library once per release
    python tools/build_pyfiles.py            # -> dist/ldcc_spark.zip

    spark-submit \
      --master yarn --deploy-mode cluster \
      --num-executors 400 --executor-cores 4 --executor-memory 16g \
      --py-files dist/ldcc_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.adaptive.skewJoin.enabled=true \
      --conf spark.sql.shuffle.partitions=4096 \
      tools/submit_crawl.py \
      --seeds  s3://bucket/frontier/seeds.parquet \
      --ckpt   s3://bucket/frontier/ckpt \
      --rounds 5 --budget 100

Locally (sandbox smoke): the same file runs under a local master —
    python tools/submit_crawl.py --local --rounds 2 --budget 2

The job is resumable: rerunning with the same --ckpt continues from the
last committed round (crawl.latest_round); an interrupted round re-runs
from the previous snapshot with identical results (manifest-last commit).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default=None,
                    help="parquet of (url_canon, host) seed URLs; omit with "
                         "--local to synthesize from testdata orders")
    ap.add_argument("--robots", default=None,
                    help="optional parquet of (host, robots_txt) bodies")
    ap.add_argument("--ckpt", default="/tmp/crawl_ckpt")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--budget", type=int, default=100)
    ap.add_argument("--local", action="store_true",
                    help="run on a local[] master (sandbox smoke)")
    ap.add_argument("--fetch", action="store_true",
                    help="HTTP-fetch each round's scheduled URLs into "
                         "rounds/r=K/pages (frontier/fetch.py: per-host "
                         "serial, paced, fault-isolated)")
    ap.add_argument("--min-interval", type=float, default=1.0,
                    help="per-host pacing floor in seconds for --fetch")
    args = ap.parse_args()

    if args.local:
        from language_diversity_common_crawler_spark.session import get_spark

        spark = get_spark("crawl-submit")
    else:
        # under spark-submit the session comes from the submit conf
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.getOrCreate()

    from pyspark.sql import functions as F

    from language_diversity_common_crawler_spark.frontier import (
        crawl,
        robots as robots_mod,
        urlgen,
    )

    if args.seeds:
        seeds = spark.read.parquet(args.seeds)
    else:
        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        orders = spark.read.parquet(f"{sf}/orders.parquet")
        par = spark.sparkContext.defaultParallelism * 2
        seeds = urlgen.with_canonical(
            orders.select(
                F.col("o_orderkey").alias("seed_id"),
                F.expr(urlgen.synthetic_url_expr("spark")).alias("url_raw"),
            ).repartition(par)
        ).select("url_canon", "host")

    rules = None
    if args.robots:
        rules = robots_mod.rules_from_bodies(spark.read.parquet(args.robots))

    def _fetch_round(k: int) -> None:
        from language_diversity_common_crawler_spark.frontier import (
            fetch as fetch_mod,
        )

        st = crawl.ParquetStateBackend(spark, args.ckpt)
        pages = fetch_mod.fetch_pages(
            st.read(k, "scheduled"), min_interval_s=args.min_interval
        )
        st.write(pages, k, "pages")
        print(f"round {k}: fetched pages committed")

    def _pages_committed(k: int) -> bool:
        # the parquet writer's _SUCCESS marker is the fetch commit marker:
        # a crash mid-fetch leaves a partial dir without it and the round
        # is re-fetched on resume (the round's own manifest committed
        # earlier, so run_round alone would never revisit it)
        from language_diversity_common_crawler_spark.frontier import (
            crawl as _crawl,
            fsio,
        )

        # one source of the checkpoint directory contract (crawl._rdir)
        base = _crawl._rdir(args.ckpt, k, "pages")
        return fsio.exists(spark, os.path.join(base, "_SUCCESS"))

    last = crawl.latest_round(spark, args.ckpt)
    if last is None:
        crawl.init_crawl(spark, seeds, args.ckpt)
        print(f"initialized frontier at {args.ckpt}")
    else:
        print(f"resuming from round {last}")
        if args.fetch:
            for k in range(1, last + 1):
                if not _pages_committed(k):
                    print(f"round {k}: pages missing — re-fetching")
                    _fetch_round(k)

    for _ in range(args.rounds):
        m = crawl.run_round(spark, args.ckpt, budget=args.budget, rules=rules)
        print(f"round {m['round']}: scheduled={m['n_scheduled']} "
              f"new={m['n_new']} frontier={m['n_frontier']}")
        if args.fetch:
            _fetch_round(m["round"])

    spark.stop()


if __name__ == "__main__":
    main()
