"""plans/barrier.py unit tests: the no-op Generate must be exactly a
no-op on values (row count, order-insensitive content, NULLs) while
changing only plan topology. The integration-level guarantees (compile
pinning, selective pushdown) live in tests/test_plan_shape.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from language_diversity_common_crawler_spark.plans.barrier import (
    with_barrier_columns,
)


def test_values_identical_to_plain_withcolumn(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], ["id", "s"]
    )
    plain = df.withColumn("u", F.upper("s")).withColumn(
        "n2", (F.col("id") * 2).cast("bigint")
    )
    barr = with_barrier_columns(
        df, {"u": F.upper("s"), "n2": (F.col("id") * 2).cast("bigint")}
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, barr.collect())
    )
    assert barr.columns == ["id", "s", "u", "n2"]


def test_null_derived_values_do_not_drop_rows(spark):
    """explode() drops rows for NULL/empty arrays — the barrier's array
    constructor must make that impossible even when every derived value
    is NULL."""
    df = spark.createDataFrame([(1,), (2,)], ["id"])
    out = with_barrier_columns(df, {"x": F.lit(None).cast("string")})
    rows = out.collect()
    assert len(rows) == 2
    assert all(r["x"] is None for r in rows)


def test_empty_cols_is_identity(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    assert with_barrier_columns(df, {}) is df


def test_name_collisions_raise(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError, match="appends"):
        with_barrier_columns(df, {"id": F.lit(1)})
    df2 = df.withColumn("__barrier", F.lit(0))
    with pytest.raises(ValueError, match="collides"):
        with_barrier_columns(df2, {"x": F.lit(1)})


def test_plan_contains_generate_and_blocks_substitution(spark):
    """The optimized plan of a filter on the derived column must keep the
    defining expression in a single place (inside the Generate), with the
    Filter referencing only the generated attribute."""
    df = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    expensive = F.concat(F.lit("v"), (F.col("id") * 37).cast("string"))
    out = with_barrier_columns(df, {"v": expensive}).filter(
        F.col("v") != "v74"
    )
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" in opt, opt
    # exactly one concat in the whole plan: the Filter did not re-inline it
    assert opt.count("concat(") == 1, opt
    assert out.count() == 9
