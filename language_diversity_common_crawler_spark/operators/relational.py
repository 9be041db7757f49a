"""Relational headliner queries over the driver's TPC-H-ish tables.

These prove the generic join/agg/window capability layer at scale — the
frontier and extract pipelines compose from the same primitives. Scale
notes per query:

- pricing_summary: single scan + hash agg, cardinality ≤ |flag×status| —
  shuffles ~nothing; money sums are cent-quantized to BIGINT so parallel
  aggregation is exact (order-independent) and matches the DuckDB oracle
  bit-for-bit.
- top_customers: lineitem⋈orders is the big join (both sides shuffled on
  orderkey, AQE-skew-safe); customer/nation are broadcast — no shuffle for
  the dimension side.
- window_events: per-user ordering — shuffle on user_id only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cents(col) -> F.Column:  # type: ignore[name-defined]
    """Exact cent quantization: round(x*100) as BIGINT (same expr in oracle)."""
    return F.round(col * F.lit(100.0), 0).cast("bigint")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    out = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
        (F.sum(_cents(F.col("l_extendedprice"))) / F.lit(100.0)).alias("sum_base_price"),
        (F.sum(_cents(disc_price)) / F.lit(100.0)).alias("sum_disc_price"),
        (F.sum(_cents(charge)) / F.lit(100.0)).alias("sum_charge"),
        F.count(F.lit(1)).cast("bigint").alias("count_order"),
    )
    return out


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0) AS BIGINT)) / 100.0 AS sum_disc_price,
       sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100.0, 0) AS BIGINT)) / 100.0 AS sum_charge,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

    rev_cents = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0), 0
    ).cast("bigint")

    # Aggregate lineitem BEFORE the join: shrinks the probe side to
    # |orders| rows — partial-agg pushdown a 100-TB join depends on.
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(rev_cents).alias("rev_cents")
    )
    joined = (
        per_order.join(orders.select("o_orderkey", "o_custkey"),
                       per_order.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey", "c_name", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    out = (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum("rev_cents") / F.lit(100.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
    return out


SQL_TOP_CUSTOMERS = """
WITH per_order AS (
  SELECT l_orderkey,
         sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0) AS BIGINT)) AS rev_cents
  FROM lineitem GROUP BY l_orderkey
)
SELECT c_custkey, c_name, n_name,
       sum(rev_cents) / 100.0 AS revenue
FROM per_order
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def nation_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join demo over the small dims: suppliers per region/nation."""
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    out = (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("supplier_cnt"),
            (F.sum(F.round(F.col("s_acctbal") * F.lit(100.0), 0).cast("bigint"))
             / F.lit(100.0)).alias("total_acctbal"),
        )
    )
    return out


SQL_NATION_REGION_ROLLUP = """
SELECT r_name, n_name,
       CAST(count(*) AS BIGINT) AS supplier_cnt,
       sum(CAST(round(s_acctbal * 100.0, 0) AS BIGINT)) / 100.0 AS total_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event ordering: row_number + lag delta, first 3 per user.
    Shuffle on user_id only; window order tie-broken by event_id."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    out = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("prev_value", F.lag("value").over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "user_id",
            "event_id",
            "rn",
            F.col("event_type"),
            (F.round(F.col("value") * F.lit(1000.0), 0).cast("bigint")).alias("value_milli"),
            F.coalesce(
                F.round((F.col("value") - F.col("prev_value")) * F.lit(1000.0), 0)
                .cast("bigint"),
                F.lit(0).cast("bigint"),
            ).alias("delta_milli"),
        )
    )
    return out


SQL_WINDOW_EVENTS = """
SELECT user_id, event_id, rn, event_type,
       CAST(round(value * 1000.0, 0) AS BIGINT) AS value_milli,
       coalesce(CAST(round((value - prev_value) * 1000.0, 0) AS BIGINT), 0) AS delta_milli
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
  FROM events
)
WHERE rn <= 3
"""


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation; hour emitted as epoch seconds (BIGINT) so
    the comparison is timezone-representation-proof."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).cast("bigint").alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.sum(F.round(F.col("value") * F.lit(1000.0), 0).cast("bigint"))
             / F.lit(1000.0)).alias("sum_value"),
        )
    )
    return out


SQL_EVENTS_HOURLY = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(round(value * 1000.0, 0) AS BIGINT)) / 1000.0 AS sum_value
FROM events
GROUP BY 1, 2
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer⋈orders⋈lineitem, revenue per undelivered
    order, top-10. Scale: customer filter broadcasts; orders⋈lineitem is
    the one big shuffle (orderkey); the top-k is a tiny global sort after
    map-side partial ordering (Catalyst TakeOrderedAndProject)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    rev = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev) / F.lit(100.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
    return out


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0) AS BIGINT)) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def part_type_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-ish: lineitem⋈part⋈supplier — revenue and volume per part
    type per supplier nation. part/supplier broadcast (dimensions); one
    fact shuffle for the final two-key aggregation."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rev = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    out = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "p_type")
        .agg(
            (F.sum(rev) / F.lit(100.0)).alias("revenue"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("volume"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
    return out


SQL_PART_TYPE_MARGIN = """
SELECT n_name, p_type,
       sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0) AS BIGINT)) / 100.0 AS revenue,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS volume,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, p_type
"""
