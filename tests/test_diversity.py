"""Language-diversity indices: hand-computed values + grouping semantics."""

from __future__ import annotations

from language_diversity_common_crawler_spark.operators import diversity


def _rows(spark, data):
    return spark.createDataFrame(data, "source string, lang string")


def test_uniform_distribution(spark):
    # 4 languages x 2 docs each: H = log2(4) = 2 bits, Simpson = 1 - 4/16.
    data = [("a", lang) for lang in ["en", "de", "fr", "ru"] for _ in range(2)]
    out = diversity.diversity_metrics(
        _rows(spark, data), "lang", ["source"]
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_langs, r.total_docs) == (4, 8)
    assert r.shannon_milli == 2000
    assert r.simpson_milli == 750


def test_single_language_is_zero_diversity(spark):
    out = diversity.diversity_metrics(
        _rows(spark, [("a", "en")] * 5), "lang", ["source"]
    ).collect()
    r = out[0]
    assert (r.n_langs, r.total_docs) == (1, 5)
    assert r.shannon_milli == 0
    assert r.simpson_milli == 0


def test_skewed_distribution_hand_computed(spark):
    # counts (3, 1): H = -(0.75*log2(0.75) + 0.25*log2(0.25)) = 0.8113 bits;
    # per-term milli quantization gives round((2 - 4.755/4) * 1000) = 811.
    # Simpson = 1 - (9 + 1)/16 = 0.375.
    data = [("a", "en")] * 3 + [("a", "de")]
    r = diversity.diversity_metrics(
        _rows(spark, data), "lang", ["source"]
    ).collect()[0]
    assert r.shannon_milli == 811
    assert r.simpson_milli == 375


def test_groups_are_independent(spark):
    data = [("a", "en"), ("a", "de"), ("b", "en"), ("b", "en")]
    out = {
        r.source: r
        for r in diversity.diversity_metrics(
            _rows(spark, data), "lang", ["source"]
        ).collect()
    }
    assert out["a"].shannon_milli == 1000  # 50/50 split = 1 bit
    assert out["a"].simpson_milli == 500
    assert out["b"].shannon_milli == 0
    assert out["b"].n_langs == 1


def test_kl_zero_when_group_matches_corpus(spark):
    # Two sources with the identical language mix: KL from global = 0.
    mix = ["en", "en", "de"]
    data = [("a", lang) for lang in mix] + [("b", lang) for lang in mix]
    out = {
        r.source: r.kl_milli
        for r in diversity.lang_kl_from_global(
            _rows(spark, data), "lang", "source"
        ).collect()
    }
    assert out == {"a": 0, "b": 0}


def test_kl_hand_computed_disjoint_sources(spark):
    # a = all-en, b = all-de, equal sizes: global is 50/50, each source's
    # KL = log2(1/0.5) = 1 bit = 1000 milli.
    data = [("a", "en")] * 4 + [("b", "de")] * 4
    out = {
        r.source: (r.n_langs, r.total_docs, r.kl_milli)
        for r in diversity.lang_kl_from_global(
            _rows(spark, data), "lang", "source"
        ).collect()
    }
    assert out == {"a": (1, 4, 1000), "b": (1, 4, 1000)}


def test_kl_sql_twin_matches_spark(spark):
    import duckdb

    data = (
        [("a", "en")] * 7 + [("a", "de")] * 2 + [("a", "fr")]
        + [("b", "ru")] * 3 + [("b", "en")] * 5
        + [("c", "en")] * 4 + [("c", "de")] * 4
    )
    spark_rows = {
        r.source: (r.n_langs, r.total_docs, r.kl_milli)
        for r in diversity.lang_kl_from_global(
            _rows(spark, data), "lang", "source"
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (source VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", data)
    sql = diversity.sql_lang_kl_from_global(
        "SELECT source, lang FROM docs", "lang", "source"
    )
    duck_rows = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}
    assert spark_rows == duck_rows


def test_sql_twin_matches_spark(spark):
    """The DuckDB dialect twin produces identical quantized values."""
    import duckdb

    data = (
        [("a", "en")] * 7 + [("a", "de")] * 2 + [("a", "fr")]
        + [("b", "ru")] * 3 + [("b", "en")]
    )
    spark_rows = {
        (r.source,): (r.n_langs, r.total_docs, r.shannon_milli, r.simpson_milli)
        for r in diversity.diversity_metrics(
            _rows(spark, data), "lang", ["source"]
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (source VARCHAR, lang VARCHAR)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?)", data)
    sql = diversity.sql_diversity_metrics(
        "SELECT source, lang FROM docs", "lang", ["source"]
    )
    duck_rows = {
        (r[0],): tuple(r[1:]) for r in con.execute(sql).fetchall()
    }
    assert spark_rows == duck_rows


def test_sampled_length_quantiles_matches_python(spark):
    """The hash sample is deterministic: recompute the sample and its
    discrete percentiles in Python and compare exactly."""
    from language_diversity_common_crawler_spark.functions.hashing import (
        HASH_SPACE,
        py_md5_60,
    )
    from language_diversity_common_crawler_spark.operators import stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["lang"]: r
        for r in stats.sampled_length_quantiles(docs).collect()
    }
    rows = docs.select("doc_id", "lang", "n_chars").collect()
    thresh = HASH_SPACE // 4
    per: dict[str, list[int]] = {}
    for r in rows:
        if py_md5_60(str(r["doc_id"]), salt="qs") < thresh:
            per.setdefault(r["lang"], []).append(r["n_chars"])
    assert set(got) == set(per)
    for lang, vals in per.items():
        vals.sort()
        n = len(vals)
        assert got[lang]["n_sampled"] == n
        for p, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                       (0.95, "p95")):
            import math

            idx = max(0, math.ceil(p * n) - 1)  # percentile_disc semantics
            assert got[lang][col] == vals[idx], (lang, col)
