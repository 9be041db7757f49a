"""Cross-engine value parity for the text-analysis expressions on edge
inputs the driver tables don't currently contain (NULL / empty text)."""

from __future__ import annotations

import duckdb
import pytest

from language_diversity_common_crawler_spark.functions import text_analysis as ta


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute(
        "INSERT INTO documents VALUES (1,'hello world'),(2,NULL),(3,''),"
        "(4,'a'),(5,'  spaced   out  ')"
    )
    return con


def test_simhash60_null_and_empty_parity(spark, duck):
    """NULL text must fingerprint to 0 in BOTH engines (the Spark
    single-pass aggregate would otherwise propagate NULL while DuckDB's
    per-bit CASE sum yields 0)."""
    rows = [(1, "hello world"), (2, None), (3, ""), (4, "a"),
            (5, "  spaced   out  ")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["simhash60"]
        for r in ta.simhash60(df).select("doc_id", "simhash60").collect()
    }
    want = dict(
        duck.execute(
            f"SELECT doc_id, {ta.simhash60_exprs('text', 'duckdb')} AS s "
            "FROM documents"
        ).fetchall()
    )
    assert got == want
    assert got[2] == 0


def test_simhash60_inline_equals_staged(spark):
    """The staged Spark builder and the inline dialect-shared expression
    produce identical fingerprints (oracle-generation invariant)."""
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(
        ["one two three", "one two three four", "", None, "x y z x y z"]
    )]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    staged = {r["doc_id"]: r["simhash60"]
              for r in ta.simhash60(df).collect()}
    inline = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", F.expr(ta.simhash60_exprs("text", "spark")).alias("s")
        ).collect()
    }
    assert staged == inline
