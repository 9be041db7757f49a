"""Inverted-index postings + TF-IDF top terms: ground-truth values on
hand-built documents, posting-cap semantics, and cross-engine parity."""

from __future__ import annotations

import duckdb
import pytest

from language_diversity_common_crawler_spark.functions import indexing

ROWS = [
    (1, "apple banana apple cherry"),
    (2, "apple banana banana"),
    (3, "apple date"),
    (4, "Apple  apple   APPLE"),   # case + whitespace normalization
    (5, None),                     # NULL text: contributes nothing
    (6, ""),                       # empty text: contributes nothing
    (7, "apple"),
    (8, "apple"),
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", ROWS)
    return con


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id bigint, text string")


def test_postings_ground_truth(spark):
    rows = {
        r["term"]: (r["df"], r["postings"])
        for r in indexing.term_postings(_docs(spark), k=3).collect()
    }
    # 'apple' appears in docs 1,2,3,4,7,8 -> df=6, postings capped to the
    # 3 smallest doc ids
    assert rows["apple"] == (6, "1,2,3")
    assert rows["banana"] == (2, "1,2")
    assert rows["cherry"] == (1, "1")
    assert rows["date"] == (1, "3")
    # case-folded: no 'Apple'/'APPLE' terms; NULL/empty docs added nothing
    assert set(rows) == {"apple", "banana", "cherry", "date"}


def test_postings_parity(spark, duck):
    for k in (1, 3, 100):
        got = {
            (r["term"], r["df"], r["postings"])
            for r in indexing.term_postings(_docs(spark), k=k).collect()
        }
        want = set(
            map(tuple, duck.execute(
                indexing.sql_term_postings("documents", k=k)
            ).fetchall())
        )
        assert got == want, k


def test_tfidf_ground_truth(spark):
    out = indexing.tfidf_top_terms(_docs(spark), k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: cherry tf=1 df=1 -> 1e6; apple tf=2 df=6 -> 333333;
    # banana tf=1 df=2 -> 500000. Top-2 = cherry, banana.
    d1 = {r["term"]: (r["score_ppm"], r["term_rank"]) for r in by_doc[1]}
    assert d1 == {"cherry": (1_000_000, 1), "banana": (500_000, 2)}
    # doc 4: only 'apple' (tf=3, df=6) -> one row, exact integer score
    (d4,) = by_doc[4]
    assert (d4["term"], d4["tf"], d4["df"], d4["score_ppm"]) == (
        "apple", 3, 6, 500_000
    )
    # NULL/empty docs produce no rows
    assert 5 not in by_doc and 6 not in by_doc
    # every score is exact-integer bigint (oracle-hash-safe by type)
    assert all(isinstance(r["score_ppm"], int) for r in out)


def test_tfidf_parity(spark, duck):
    for k in (1, 2, 5):
        got = {
            tuple(r) for r in indexing.tfidf_top_terms(
                _docs(spark), k=k
            ).collect()
        }
        want = set(
            map(tuple, duck.execute(
                indexing.sql_tfidf_top_terms("documents", k=k)
            ).fetchall())
        )
        assert got == want, k


def test_postings_single_shuffle_plan(spark):
    """The window cap and the term groupBy must share one hash
    partitioning: exactly one Exchange in the postings plan."""
    plan = indexing.term_postings(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
