"""lang_consensus and dataset_split driver queries: ground-truth semantics
on hand-built predictions and split determinism/proportions."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from language_diversity_common_crawler_spark.functions.hashing import md5_60


def _consensus_cols(df):
    consensus = (
        F.when(
            (F.col("df_lang") == F.col("li_lang"))
            | (F.col("df_lang") == F.col("cld_lang")),
            F.col("df_lang"),
        )
        .when(F.col("li_lang") == F.col("cld_lang"), F.col("li_lang"))
        .otherwise(F.col("df_lang"))
    )
    n_agree = (
        F.when(
            (F.col("df_lang") == F.col("li_lang"))
            & (F.col("li_lang") == F.col("cld_lang")),
            F.lit(3),
        )
        .when(
            (F.col("df_lang") == F.col("li_lang"))
            | (F.col("li_lang") == F.col("cld_lang"))
            | (F.col("df_lang") == F.col("cld_lang")),
            F.lit(2),
        )
        .otherwise(F.lit(1))
    )
    return df.select(
        "doc_id", consensus.alias("consensus_lang"),
        n_agree.cast("int").alias("n_agree"),
    )


def test_consensus_semantics(spark):
    rows = [
        (1, "en", "en", "en"),   # unanimous
        (2, "en", "en", "de"),   # df+li pair
        (3, "en", "de", "en"),   # df+cld pair
        (4, "de", "en", "en"),   # li+cld pair -> en
        (5, "en", "de", "fr"),   # all differ -> detect_fast
        (6, "un", "un", "fr"),   # pair on 'un' wins (normalized unknowns vote)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, df_lang string, li_lang string, cld_lang string"
    )
    got = {r["doc_id"]: (r["consensus_lang"], r["n_agree"])
           for r in _consensus_cols(df).collect()}
    assert got == {
        1: ("en", 3), 2: ("en", 2), 3: ("en", 2), 4: ("en", 2),
        5: ("en", 1), 6: ("un", 2),
    }


def _py_bucket(doc_id: int) -> int:
    h = hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:15]
    return int(h, 16) % 100


def test_split_matches_python_and_is_stable(spark):
    ids = list(range(1000))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    bucket = (
        md5_60(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
        % 100
    )
    out = df.select(
        "doc_id",
        bucket.cast("int").alias("bucket"),
        F.when(bucket < 98, F.lit("train"))
        .when(bucket < 99, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    got = {r["doc_id"]: (r["bucket"], r["split"]) for r in out.collect()}
    for i in ids:
        b = _py_bucket(i)
        want = "train" if b < 98 else ("val" if b < 99 else "test")
        assert got[i] == (b, want), i
    # repartitioning must not move any assignment (hash of data, not layout)
    got2 = {r["doc_id"]: (r["bucket"], r["split"])
            for r in out.repartition(7).collect()}
    assert got2 == got
    # proportions roughly 98/1/1 at n=1000
    n_val = sum(1 for v in got.values() if v[1] == "val")
    n_test = sum(1 for v in got.values() if v[1] == "test")
    assert 1 <= n_val <= 40 and 1 <= n_test <= 40
