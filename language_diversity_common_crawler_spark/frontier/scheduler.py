"""Per-host politeness scheduler: salted two-phase top-k + window-ranked
priority queue (north rule).

The reference crawls a single WARC segment sequentially with no notion of
hosts (/root/reference/main.py:97-101); politeness is part of the frontier
extension. Semantics: each crawl round, every host gets at most ``budget``
fetch slots, assigned to its highest-priority pending URLs; the total order
within a host is ``(priority DESC, url ASC)`` — a pure function of the data,
never of partitioning, so crawl order matches the sequential oracle
(SURVEY.md §7.3).

Scale design — hot-host skew is THE skew problem at 10^10 URLs (a handful
of hosts own billions of URLs). A naive
``Window.partitionBy(host)`` puts each host in one task, so the hottest
host serializes the stage. We run **two-phase top-k**:

  phase 1: rank within (host, salt) — salt = hash(url) mod n_salts spreads
           a hot host over ``n_salts`` tasks; keep ``rn <= budget`` — at
           most ``n_salts * budget`` survivors per host, independent of how
           many billions of URLs the host had;
  phase 2: rank the survivors within host — now the per-host partition is
           tiny by construction.

Both phases shuffle, but phase 2's input is bounded by
``n_hosts * n_salts * budget`` rows. AQE skew handling
(spark.sql.adaptive.skewJoin) stays on as a backstop for the phase-1
shuffle. Priority itself is a deterministic 60-bit md5 hash (cross-engine:
Spark / DuckDB / Python oracle all compute the identical value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import md5_60, py_md5_60, sql_md5_60

PRIORITY_MOD = 1_000_000


def priority_col(url_col: str = "url_canon") -> F.Column:
    """Deterministic URL priority in [0, PRIORITY_MOD) (Spark)."""
    return md5_60(F.concat(F.lit("prio:"), F.col(url_col))) % PRIORITY_MOD


def sql_priority(url_expr: str) -> str:
    """DuckDB-equivalent priority expression."""
    inner = "concat('prio:', " + url_expr + ")"
    return f"({sql_md5_60(inner)} % {PRIORITY_MOD})"


def py_priority(url: str) -> int:
    """Python-equivalent priority (sequential oracle)."""
    return py_md5_60(url, salt="prio") % PRIORITY_MOD


def politeness_schedule(
    frontier: DataFrame,
    budget: int,
    url_col: str = "url_canon",
    host_col: str = "host",
    n_salts: int = 16,
    priority: F.Column | None = None,
    budgets: DataFrame | None = None,
) -> DataFrame:
    """Assign fetch slots: per host, top-``budget`` URLs by
    (priority DESC, url ASC), slot = rank. Two-phase top-k (see module doc).

    ``budgets``: optional (host, budget) table — per-host slot limits (e.g.
    derived from robots Crawl-delay via robots.host_budgets), broadcast-
    joined; hosts absent from it get the scalar ``budget``, and the scalar
    is the global ceiling either way.

    Output: frontier columns + ``priority`` + ``slot`` (1-based), filtered
    to the applicable budget.
    """
    df = frontier.withColumn(
        "priority", priority if priority is not None else priority_col(url_col)
    )
    if budgets is not None:
        b = budgets.select(
            F.col("host").alias("__b_host"), F.col("budget").alias("__budget")
        )
        df = df.join(
            F.broadcast(b), df[host_col] == b["__b_host"], "left"
        ).drop("__b_host")
        df = df.withColumn(
            "__budget",
            F.least(F.coalesce(F.col("__budget"), F.lit(budget)), F.lit(budget)),
        )
    else:
        df = df.withColumn("__budget", F.lit(budget))
    salt = F.pmod(F.xxhash64(F.col(url_col), F.lit(7)), F.lit(n_salts))
    w1 = Window.partitionBy(host_col, "salt").orderBy(
        F.desc("priority"), F.asc(url_col)
    )
    # Both rank filters carry an explicit LITERAL bound (the scalar global
    # ceiling) in addition to the exact per-host column bound: Catalyst's
    # rank-limit pushdown (WindowGroupLimit, Partial + Final) only fires on
    # a literal, and it is what keeps the sort-and-shuffle volume at
    # O(groups * budget) instead of O(rows) — map-side top-k before the
    # exchange. With a per-host ``budgets`` table the column comparison
    # alone would silently disable it (measured: full-row sorts + full
    # shuffle); the literal ceiling is implied by the column bound
    # (__budget <= budget by construction) so semantics are unchanged.
    survivors = (
        df.withColumn("salt", salt)
        .withColumn("rn", F.row_number().over(w1))
        .filter(
            (F.col("rn") <= F.lit(budget)) & (F.col("rn") <= F.col("__budget"))
        )
        .drop("rn", "salt")
    )
    w2 = Window.partitionBy(host_col).orderBy(F.desc("priority"), F.asc(url_col))
    return (
        survivors.withColumn("slot", F.row_number().over(w2))
        .filter(
            (F.col("slot") <= F.lit(budget))
            & (F.col("slot") <= F.col("__budget"))
        )
        .drop("__budget")
    )
