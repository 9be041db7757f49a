"""Exact inverted-index n-gram Jaccard dedup: cross-engine parity, df-cap
semantics, and ground-truth Jaccard values on hand-built documents."""

from __future__ import annotations

import duckdb
import pytest

from language_diversity_common_crawler_spark.functions import dedup

ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (4, "completely different content with nothing shared here at all"),
    (5, "too short"),                                     # < 3 tokens: no shingles
    (6, None),                                            # NULL text
    (7, ""),                                              # empty text
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", ROWS)
    return con


def _spark_pairs(spark, **kw):
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    out = dedup.ngram_jaccard_pairs(df, **kw)
    return {(r["a"], r["b"]): r["jaccard_bp"] for r in out.collect()}


def _duck_pairs(duck, **kw):
    sql = dedup.sql_ngram_jaccard_pairs("documents", **kw)
    return {(a, b): j for a, b, j in duck.execute(sql).fetchall()}


def test_ground_truth_values(spark):
    """Docs 1/3 are identical (7 shingles each → jaccard 10000); docs 1/2
    share 6 of 8 distinct shingles (6/8 = 7500 bp); doc 4 shares nothing;
    docs 5-7 have no shingles and never pair."""
    got = _spark_pairs(spark, min_jaccard_bp=0)
    assert got[(1, 3)] == 10000
    assert got[(1, 2)] == 7500
    assert got[(2, 3)] == 7500
    assert not any(4 in p or 5 in p or 6 in p or 7 in p for p in got)


def test_cross_engine_parity(spark, duck):
    for kw in ({"min_jaccard_bp": 0}, {"min_jaccard_bp": 7600},
               {"min_jaccard_bp": 0, "max_df": 2}):
        assert _spark_pairs(spark, **kw) == _duck_pairs(duck, **kw), kw


def test_df_cap_prunes_hot_shingles(spark, duck):
    """max_df=2 drops every shingle shared by docs 1, 2 AND 3 (df=3),
    leaving only the df<=2 shingle space: 1/3 still agree on their
    remaining shingles (identical sets → 10000), 1/2 keep only their
    differing tails."""
    capped = _spark_pairs(spark, min_jaccard_bp=0, max_df=2)
    uncapped = _spark_pairs(spark, min_jaccard_bp=0)
    assert capped == _duck_pairs(duck, min_jaccard_bp=0, max_df=2)
    assert capped[(1, 3)] == 10000
    # the shared 7-shingle core has df=3 and is gone; 1 and 2 now share
    # nothing in the capped space, so the pair disappears entirely
    assert (1, 2) not in capped and (1, 2) in uncapped


def test_threshold_filters(spark):
    got = _spark_pairs(spark, min_jaccard_bp=8000)
    assert set(got) == {(1, 3)}


def test_winnow_near_dup_pairs_parity_and_detection(spark):
    """Docs sharing a long passage (>= k + w - 1 chars) are paired; both
    engines agree row-for-row; unrelated docs are absent."""
    import duckdb

    from language_diversity_common_crawler_spark.functions import dedup

    passage = ("the quick brown fox jumps over the lazy dog while the "
               "band plays on through the long night")
    rows = [
        (1, "intro text alpha " + passage + " closing remarks one"),
        (2, "different opening " + passage + " other ending"),
        (3, "totally unrelated content about maritime navigation signals"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r["a"], r["b"], r["n_shared"])
        for r in dedup.winnow_near_dup_pairs(df, min_shared=2).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE wnd(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO wnd VALUES (?, ?)", rows)
    want = sorted(con.execute(
        dedup.sql_winnow_near_dup_pairs("wnd", min_shared=2)).fetchall())
    assert got == want
    pair_ids = {(a, b) for a, b, _ in got}
    assert (1, 2) in pair_ids
    assert all(3 not in p and 4 not in p and 5 not in p for p in pair_ids)


def test_decontaminate_flags_planted_overlap(spark):
    """A doc containing an eval 8-gram is flagged with the exact distinct
    count; unrelated docs are not; the bench membership test must be a
    broadcast join (the corpus side never shuffles for it)."""
    from language_diversity_common_crawler_spark.functions import dedup

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, bench_text),                                   # bench source (0 % 97 == 0)
        (1, "prefix words then " + bench_text + " suffix"),  # contaminated
        (2, "totally unrelated words with no overlap at all here today"),
        (3, " ".join(["alpha beta gamma delta epsilon zeta eta"] * 2)),  # 7-gram only
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = dedup.decontaminate(df, bench_mod=97, prefix_chars=200, k=8)
    got = {r["doc_id"]: r["n_eval_ngrams"] for r in out.collect()}
    # bench text has 10 tokens -> 3 distinct 8-grams; doc 1 contains all 3
    assert got[0] == 3 and got[1] == 3
    assert 2 not in got and 3 not in got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_containment_decontaminate_planted(spark):
    """A doc that embeds an eval doc's prefix verbatim must show high
    containment; an unrelated doc must not appear at all."""
    from pyspark.sql import Row

    from language_diversity_common_crawler_spark.functions import dedup

    eval_text = " ".join(f"ev{i}" for i in range(20))  # doc_id 0 -> eval
    contaminated = eval_text + " tail tail2 tail3"
    clean = " ".join(f"cl{i}" for i in range(30))
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=eval_text),
            Row(doc_id=1, text=contaminated),
            Row(doc_id=2, text=clean),
        ]
    )
    got = {
        r["doc_id"]: r
        for r in dedup.containment_decontaminate(
            df, bench_mod=97, prefix_chars=160, k=8
        ).collect()
    }
    assert 2 not in got
    assert 1 in got and 0 in got
    # doc 0 IS the eval doc: full containment of its in-prefix shingles
    assert got[0]["containment_milli"] == 1000
    # doc 1 contains the whole eval prefix; its extra tail shingles keep
    # the ratio below 1000 but well above zero
    assert 0 < got[1]["containment_milli"] < 1000
    assert got[1]["n_eval_hits"] > 5
