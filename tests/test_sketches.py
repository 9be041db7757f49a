"""KMV cardinality sketch (functions/sketches.py).

Covers: the k-th-smallest statistic against a pure-Python mirror, the
estimator's relative-error band at k=64, exact fallback when a group has
fewer than k distinct hashes, and the WindowGroupLimit plan shape the
map-side top-k relies on at scale.
"""

from __future__ import annotations

from pyspark.sql import Row

from language_diversity_common_crawler_spark.functions import sketches
from language_diversity_common_crawler_spark.functions.hashing import (
    HASH_SPACE,
    py_md5_60,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_shingle_hashes(text: str) -> set[int]:
    import re

    toks = re.sub(r"\s+", " ", text.lower().strip(" ")).split(" ")
    if len(toks) < 3:
        return set()
    return {
        py_md5_60(" ".join(toks[i:i + 3])) for i in range(len(toks) - 2)
    }


def test_kmv_statistic_matches_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r["lang"]: r
        for r in sketches.kmv_shingle_cardinality(docs).collect()
    }
    per_lang: dict[str, set[int]] = {}
    for r in docs.select("lang", "text").collect():
        per_lang.setdefault(r["lang"], set()).update(
            _py_shingle_hashes(r["text"])
        )
    assert set(got) == set(per_lang)
    for lang, hashes in per_lang.items():
        row = got[lang]
        assert row["exact_distinct"] == len(hashes)
        smallest = sorted(hashes)[:64]
        assert row["n_in_sketch"] == len(smallest)
        assert row["kth_min_hash"] == smallest[-1]
        if len(hashes) < 64:
            assert row["est_distinct"] == len(hashes), "exact fallback"
        else:
            # KMV with k=64: ~1/sqrt(k-2) relative error; allow 4 sigma
            err = abs(row["est_distinct"] - len(hashes)) / len(hashes)
            assert err < 0.55, (lang, row["est_distinct"], len(hashes))


def test_kmv_exact_fallback_small_group(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="only three tokens here now", lang="xx")]
    )
    [row] = sketches.kmv_shingle_cardinality(df).collect()
    assert row["n_in_sketch"] == row["exact_distinct"] == 3
    assert row["est_distinct"] == 3


def test_kmv_estimate_is_pure_function_of_statistic():
    # the CASE expression itself: estimate = floor((k-1)*2^60 / h_k)
    import math

    k, h_k = 64, HASH_SPACE // 1000  # pretend kth min at 1/1000 of space
    est = math.floor((k - 1) * float(HASH_SPACE) / float(h_k))
    assert abs(est - 63000) <= 1


def test_kmv_plans_window_group_limit(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        sketches.kmv_shingle_cardinality(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan
