"""Gopher-style quality rules + 2-gram repetition: ground-truth values on
hand-built documents (incl. multi-line/bullet/ellipsis cases the synthetic
driver tables can't exercise) and row-exact cross-engine parity."""

from __future__ import annotations

import duckdb
import math
import pytest

from language_diversity_common_crawler_spark.functions import quality_rules

ROWS = [
    # 60 words, stopword-rich, clean prose: passes every rule
    (1, " ".join(
        ["the cat sat on the mat and that dog ran to the park with be"] * 5
    )),
    (2, None),                                  # NULL text
    (3, ""),                                    # empty text
    (4, "short text only"),                     # < 50 words
    (5, "### ### " + "# " * 30 + "the of and that"),  # symbol-heavy
    (6, "12 34 56 78 " * 20 + "the of"),        # alpha-poor
    (7, "line one ends well\nline two trails off...\nshort...\n- bullet a\n"
        "* bullet b\n• bullet c"),              # line-shape signals
    (8, "dup dup dup dup dup the of and"),      # high duplicate-word frac
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", ROWS)
    return con


def _spark_rows(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    out = quality_rules.with_gopher_quality(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_ground_truth_signals(spark):
    got = _spark_rows(spark)
    # doc 1: 5 x 15 = 75 words, all alpha, >= 2 stopwords, no symbols
    d1 = got[1]
    assert d1["n_words"] == 75
    assert d1["alpha_word_frac"] == 1.0
    assert d1["stopword_hits"] >= 4
    assert d1["gopher_pass"] is True
    # NULL and empty behave identically: zero words, nothing passes
    for i in (2, 3):
        assert got[i]["n_words"] == 0
        assert got[i]["mean_word_len"] == 0.0
        assert got[i]["gopher_pass"] is False
    # doc 4: too short
    assert got[4]["n_words"] == 3 and got[4]["words_ok"] is False
    # doc 5: '#' runs push symbol ratio over 0.1
    assert got[5]["symbol_word_ratio"] > 0.1 and got[5]["symbol_ok"] is False
    # doc 6: 80 of 82 words are digit-only
    assert got[6]["alpha_word_frac"] < 0.8 and got[6]["alpha_ok"] is False
    # doc 7: 2 of 6 trimmed lines end with '...', 3 of 6 start with bullets
    d7 = got[7]
    assert math.isclose(d7["ellipsis_line_frac"], 2 / 6)
    assert math.isclose(d7["bullet_line_frac"], 3 / 6)
    assert d7["ellipsis_ok"] is False and d7["bullet_ok"] is True
    # doc 8: 'dup' x5 of 8 words -> 4 duplicate occurrences
    assert math.isclose(got[8]["dup_word_frac"], 4 / 8)


def test_duckdb_parity_gopher(spark, duck):
    got = _spark_rows(spark)
    sql = quality_rules.sql_gopher_quality("documents")
    cur = duck.execute(sql)
    names = [d[0] for d in cur.description]
    for row in cur.fetchall():
        d = dict(zip(names, row))
        s = got[d["doc_id"]]
        for k, v in d.items():
            if isinstance(v, float):
                assert math.isclose(s[k], v, rel_tol=0, abs_tol=0), (
                    f"doc {d['doc_id']} col {k}: spark={s[k]} duck={v}"
                )
            else:
                assert s[k] == v, (
                    f"doc {d['doc_id']} col {k}: spark={s[k]} duck={v}"
                )


def _spark_2gram(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    out = quality_rules.top_2gram_stats(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_2gram_ground_truth(spark):
    got = _spark_2gram(spark)
    # docs with < 2 words emit no grams at all
    assert 2 not in got and 3 not in got
    # doc 8: grams of "dup dup dup dup dup the of and":
    # 'dup dup' x4, 'dup the', 'the of', 'of and' -> top 4 of 7
    d8 = got[8]
    assert d8["top_cnt"] == 4 and d8["n_grams"] == 7
    assert math.isclose(d8["top_2gram_frac"], 4 / 7)


def test_duckdb_parity_2gram(spark, duck):
    got = _spark_2gram(spark)
    sql = quality_rules.sql_top_2gram_stats("documents")
    rows = duck.execute(sql).fetchall()
    assert {r[0] for r in rows} == set(got)
    for doc_id, top_cnt, n_grams, frac in rows:
        s = got[doc_id]
        assert (s["top_cnt"], s["n_grams"]) == (top_cnt, n_grams)
        assert math.isclose(s["top_2gram_frac"], frac, rel_tol=0, abs_tol=0)


def test_shuffle_free_plan(spark):
    """The signal scan must stay a single whole-stage-codegen map — no
    Exchange, no Python. At 100 TB this is the property that makes the
    quality gate a free rider on the ingest scan."""
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    plan = (
        quality_rules.with_gopher_quality(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_unigram_lm_score_ground_truth(spark):
    """Power-of-two corpus: every probability is exactly representable so
    the expected milli-terms are exact by hand; parity vs the DuckDB twin
    on the same rows."""
    import duckdb

    rows = [
        (1, "a a b b"),   # 4 tokens, p(a)=p(b)=1/2 -> every term -1000
        (2, "a b"),       # 2 tokens, same terms
        (3, None),        # NULL: no tokens -> absent from output
        (4, ""),          # empty: no tokens -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob_milli_sum"],
                      r["avg_logprob_milli"])
        for r in quality_rules.unigram_lm_score(df).collect()
    }
    assert got == {1: (4, -4000, -1000), 2: (2, -2000, -1000)}

    con = duckdb.connect()
    con.execute("CREATE TABLE d2(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d2 VALUES (?, ?)", rows)
    duck = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            quality_rules.sql_unigram_lm_score("d2")
        ).fetchall()
    }
    assert duck == got


def test_unigram_lm_score_rare_tokens_score_lower(spark):
    """A doc made of corpus-rare tokens scores below a doc of corpus-common
    tokens — the filterable signal the operator exists to provide."""
    common = "the and of to in " * 20
    rows = [(i, common) for i in range(1, 9)] + [(9, "zyx wvu tsr qpo nml")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["avg_logprob_milli"]
        for r in quality_rules.unigram_lm_score(df).collect()
    }
    assert got[9] < got[1]


def test_filter_funnel_all_stages(spark):
    """Crafted docs hit every funnel stage exactly once; first-failing
    gate gets the charge; identical text dedups to one survivor."""
    from pyspark.sql import Row

    from language_diversity_common_crawler_spark.functions import (
        quality_rules as qr,
    )

    stop = "the be to of and that have with"  # >= MIN_STOPWORD_HITS
    good = ("word " * 60).strip() + " " + stop
    docs = [
        Row(doc_id=0, text=None),                       # -> empty
        Row(doc_id=1, text="tiny doc"),                 # -> words (too few)
        Row(doc_id=2, text=("a " * 60).strip() + " " + stop),  # word_len low
        Row(doc_id=3, text=("word " * 60).strip() + " " + "#" * 12 + " "
            + stop),
        Row(doc_id=4, text=good),                       # -> survived
        Row(doc_id=5, text=good),                       # dup -> exact_dup
    ]
    got = {
        r["stage"]: r["n_docs"]
        for r in qr.filter_funnel_report(
            spark.createDataFrame(docs)
        ).collect()
    }
    assert got["empty"] == 1
    assert got["words"] == 1
    assert got["word_len"] == 1
    assert got["symbol"] == 1
    assert got["survived"] == 1
    assert got["exact_dup"] == 1
    assert sum(got.values()) == len(docs)


def test_funnel_stage_order_is_first_fail(spark):
    """A doc failing BOTH word_len and symbol is charged to word_len
    (the earlier gate)."""
    from pyspark.sql import Row

    from language_diversity_common_crawler_spark.functions import (
        quality_rules as qr,
    )

    bad_both = ("a " * 60).strip() + " " + "#" * 12
    got = {
        r["stage"]: r["n_docs"]
        for r in qr.filter_funnel_report(
            spark.createDataFrame([Row(doc_id=0, text=bad_both)])
        ).collect()
    }
    assert got == {"word_len": 1}
