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


def test_winnow_guarantee_shared_substring(spark):
    """MOSS guarantee: two documents sharing a substring of length
    >= k + w - 1 (after norm) must share at least one fingerprint."""
    k, w = ta.WINNOW_K, ta.WINNOW_W
    shared = "the quick brown fox jumps over it"[: k + w - 1]
    assert len(shared) >= k + w - 1
    rows = [(1, "PREFIX aaaa " + shared + " zz suffix one"),
            (2, "completely different head " + shared + " other tail")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fps = ta.winnow_fingerprints(df).collect()
    s1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    s2 = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert s1 & s2


def test_winnow_boundaries_and_duckdb_parity(spark, duck):
    """NULL / empty / shorter-than-k / between-k-and-k+w texts hit every
    CASE branch; both engines agree row-for-row."""
    k = ta.WINNOW_K
    rows = [(1, "hello world"), (2, None), (3, ""), (4, "a" * (k - 1)),
            (5, "b" * k), (6, "exact gram here"), (7, "  spaced   out  ")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted((r["doc_id"], r["fp"])
                 for r in ta.winnow_fingerprints(df).collect())
    duck.execute("CREATE OR REPLACE TABLE wdocs(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO wdocs VALUES (?, ?)", rows)
    want = sorted(duck.execute(
        ta.sql_winnow_fingerprints("wdocs")).fetchall())
    assert got == want
    by_id = {}
    for d, fp in got:
        by_id.setdefault(d, set()).add(fp)
    assert 2 not in by_id and 3 not in by_id and 4 not in by_id
    assert len(by_id[5]) == 1  # single gram -> one global minimum


def _py_winnow(text, k=None, w=None):
    """Independent pure-Python mirror of the winnowing selection (norm ->
    lower -> k-gram md5-60 hashes -> distinct w-window minima) used to
    cross-check the two SQL implementations' index arithmetic."""
    import hashlib
    import re

    k = k if k is not None else ta.WINNOW_K
    w = w if w is not None else ta.WINNOW_W
    if text is None:
        return set()
    norm = re.sub(r"\s+", " ", text.strip()).lower()
    if len(norm) < k:
        return set()
    hashes = [
        int(hashlib.md5(norm[i:i + k].encode()).hexdigest()[:15], 16)
        for i in range(len(norm) - k + 1)
    ]
    if len(hashes) < w:
        return {min(hashes)}
    return {min(hashes[i:i + w]) for i in range(len(hashes) - w + 1)}


def test_winnow_three_way_parity_on_random_corpus(spark, duck):
    """Spark, DuckDB, and an independent pure-Python winnower agree on a
    seeded random ASCII corpus (lengths straddling every CASE boundary)."""
    import random

    rng = random.Random(1234)
    alphabet = "abcdefgh XY.,-"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got_spark = {}
    for r in ta.winnow_fingerprints(df).collect():
        got_spark.setdefault(r["doc_id"], set()).add(r["fp"])
    duck.execute("CREATE OR REPLACE TABLE wrand(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO wrand VALUES (?, ?)", rows)
    got_duck = {}
    for d, fp in duck.execute(ta.sql_winnow_fingerprints("wrand")).fetchall():
        got_duck.setdefault(d, set()).add(fp)
    want = {i: _py_winnow(t) for i, t in rows if _py_winnow(t)}
    assert got_spark == want
    assert got_duck == want


def test_document_chunks_overlap_and_tail(spark):
    from language_diversity_common_crawler_spark.functions.text_analysis import (
        document_chunks,
    )

    df = spark.createDataFrame(
        [(1, "abcdefghijklmnop"), (2, "xy"), (3, None), (4, "abcdefgh")],
        "doc_id bigint, text string",
    )
    rows = sorted(
        document_chunks(df, width=8, stride=6).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    got = [(r.doc_id, r.chunk_idx, r.chunk_text, r.chunk_len) for r in rows]
    assert got == [
        (1, 0, "abcdefgh", 8),
        (1, 1, "ghijklmn", 8),   # starts at 6: one-char overlap window
        (1, 2, "mnop", 4),       # short tail kept
        (2, 0, "xy", 2),         # doc shorter than width: one chunk
        (4, 0, "abcdefgh", 8),   # len == width: exactly one chunk — a
                                 # naive 0..len-1 start bound would emit a
                                 # second chunk fully contained in the first
    ]                            # NULL text dropped


def test_document_chunks_no_contained_tail(spark):
    """No chunk may be wholly contained in its predecessor: every chunk
    after the first must extend past the previous chunk's end (the
    redundant-tail regression: doc lengths in (k*stride,
    k*stride + width - stride] used to emit a fully-duplicated tail)."""
    from language_diversity_common_crawler_spark.functions.text_analysis import (
        document_chunks,
    )

    # lengths sweeping all residues around the stride period
    docs = [(i, "x" * n) for i, n in enumerate(range(1, 40))]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = document_chunks(df, width=8, stride=6).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r
    for doc_id, chunks in by_doc.items():
        n = len(docs[doc_id][1])
        ends = [
            min(idx * 6 + chunks[idx].chunk_len, n)
            for idx in sorted(chunks)
        ]
        assert ends[-1] == n, (doc_id, ends, n)  # full coverage
        for prev, cur in zip(ends, ends[1:]):
            assert cur > prev, (doc_id, ends)    # each chunk adds content


def test_document_chunks_reconstruct_coverage(spark):
    """Every character position of every document is covered by at least
    one chunk (stride <= width guarantees no gaps)."""
    from pyspark.sql import functions as F

    from language_diversity_common_crawler_spark.functions.text_analysis import (
        document_chunks,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    joined = (
        document_chunks(docs, width=100, stride=75)
        .groupBy("doc_id")
        .agg(
            F.sum("chunk_len").alias("covered_with_overlap"),
            F.max(F.col("chunk_idx") * 75 + F.col("chunk_len")).alias("max_end"),
        )
        .join(docs.select("doc_id", F.length("text").alias("n")), "doc_id")
        .collect()
    )
    assert joined
    for r in joined:
        assert r.max_end == r.n, (r.doc_id, r.max_end, r.n)
        assert r.covered_with_overlap >= r.n


def test_document_chunks_is_shuffle_free(spark):
    from language_diversity_common_crawler_spark.functions.text_analysis import (
        document_chunks,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        document_chunks(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Generate" in plan


def test_quality_length_moments_python_recompute(spark):
    """The six sufficient statistics must equal a Python recompute, and
    the derived Pearson r must be finite and in [-1, 1]."""
    import math

    from language_diversity_common_crawler_spark.functions.text_analysis import (
        quality_exprs,
    )
    from language_diversity_common_crawler_spark.operators import stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r["lang"]: r for r in stats.quality_length_moments(docs).collect()}
    # recompute y with the engines' own expression to avoid re-speccing
    # the quality recipe in Python
    ys = docs.selectExpr(
        "lang", "CAST(n_chars AS BIGINT) AS x",
        f"{quality_exprs('text', 'spark')['quality_score']} AS y",
    ).collect()
    per: dict[str, list[tuple[int, int]]] = {}
    for r in ys:
        per.setdefault(r["lang"], []).append((r["x"], r["y"]))
    assert set(got) == set(per)
    for lang, xy in per.items():
        g = got[lang]
        assert g["n"] == len(xy)
        assert g["sum_len"] == sum(x for x, _ in xy)
        assert g["sum_len_sq"] == sum(x * x for x, _ in xy)
        assert g["sum_q"] == sum(y for _, y in xy)
        assert g["sum_q_sq"] == sum(y * y for _, y in xy)
        assert g["sum_lq"] == sum(x * y for x, y in xy)
        n = g["n"]
        cov = n * g["sum_lq"] - g["sum_len"] * g["sum_q"]
        vx = n * g["sum_len_sq"] - g["sum_len"] ** 2
        vy = n * g["sum_q_sq"] - g["sum_q"] ** 2
        if vx > 0 and vy > 0:
            r_p = cov / math.sqrt(vx * vy)
            assert -1.0 <= r_p <= 1.0
