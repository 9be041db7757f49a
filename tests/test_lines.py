"""CCNet-style duplicated-line removal (functions/lines.py) and the
language-deficit crawl budget (sampling.lang_deficit_budget).

Covers: first-occurrence-wins semantics against a pure-Python mirror,
the all-lines-removed doc keeping an empty row, within-doc duplicates,
the exact-integer budget arithmetic, and the plan shapes both rely on
at scale (map-side partial aggregation on the line key; single corpus
exchange for the budget).
"""

from __future__ import annotations

from pyspark.sql import Row

from language_diversity_common_crawler_spark.functions import lines, sampling
from language_diversity_common_crawler_spark.functions.hashing import py_md5_60

SF_DIR = "/root/testdata/sf0.001"

POS_MULT = 1 << lines.POS_BITS


def _py_line_dedup(rows):
    """Pure-Python mirror of line_dedup over (doc_id, text, source)."""
    stream = []  # (okey, doc_id, pos, line)
    for doc_id, text, source in rows:
        if text is None:
            continue
        wet = f"Page {doc_id}\n{text}\n(c) example {source}"
        for pos, line in enumerate(wet.split("\n")):
            if line.strip() == "":
                continue
            stream.append((doc_id * POS_MULT + pos, doc_id, pos, line))
    keeper: dict[int, int] = {}
    for okey, _d, _p, line in stream:
        h = py_md5_60(line.strip().lower())
        keeper[h] = min(keeper.get(h, okey), okey)
    out: dict[int, dict] = {}
    for okey, doc_id, pos, line in sorted(stream):
        d = out.setdefault(
            doc_id, {"n_lines": 0, "n_kept": 0, "kept": []}
        )
        d["n_lines"] += 1
        if keeper[py_md5_60(line.strip().lower())] == okey:
            d["n_kept"] += 1
            d["kept"].append(line)
    return {
        k: (v["n_lines"], v["n_kept"], "\n".join(v["kept"]))
        for k, v in out.items()
    }


def test_line_dedup_matches_python_mirror(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
        for r in lines.line_dedup(docs).collect()
    }
    want = _py_line_dedup(
        [(r["doc_id"], r["text"], r["source"])
         for r in docs.select("doc_id", "text", "source").collect()]
    )
    assert got == want


def test_line_dedup_hash_scale_doc_ids(spark):
    """Regression pin (r5): with 60-bit hash doc_ids — the natural id at
    frontier scale, doc_id = md5_60(url) — the BIGINT order key
    doc_id * 2^20 + pos overflowed (ANSI ArithmeticException; caught by
    the crawl→corpus integration test). The DECIMAL(38,0) key must give
    the same first-occurrence-wins results the python mirror computes
    with unbounded ints."""
    big = (1 << 59) + 7  # well past the old 2^43 overflow threshold
    rows = [
        (big, "shared line\nunique one", "s1"),
        (big + 12345, "shared line\nunique two", "s1"),
        (3, "shared line\nunique three", "s1"),  # smallest id wins
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=d, text=t, source=s) for d, t, s in rows]
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
        for r in lines.line_dedup(docs).collect()
    }
    assert got == _py_line_dedup(rows)
    # the duplicated "shared line" survives only in the min-okey doc
    assert "shared line" in got[3][2]
    assert "shared line" not in got[big][2]
    assert "shared line" not in got[big + 12345][2]


def test_line_dedup_footer_removed_once(spark):
    # three docs from one source: the shared footer line survives only in
    # the lowest (doc_id, pos); unique body/title lines all survive
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta", source="s"),
            Row(doc_id=2, text="gamma delta", source="s"),
            Row(doc_id=3, text="epsilon", source="s"),
        ]
    )
    got = {r["doc_id"]: r for r in lines.line_dedup(df).collect()}
    assert got[1]["n_kept"] == 3
    assert got[1]["clean_text"] == "Page 1\nalpha beta\n(c) example s"
    for d in (2, 3):
        assert got[d]["n_kept"] == 2, got[d]
        assert "(c) example" not in got[d]["clean_text"]


def test_line_dedup_fully_duplicated_doc_keeps_empty_row(spark):
    # doc 2 repeats doc 1's body; its title is unique but its body+footer
    # are dups — a doc whose EVERY line is a dup still yields a row
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="same body", source="s"),
            Row(doc_id=2, text="same body", source="s"),
        ]
    )
    got = {r["doc_id"]: r for r in lines.line_dedup(df).collect()}
    assert got[2]["n_lines"] == 3
    assert got[2]["n_kept"] == 1  # only its unique 'Page 2' title
    assert got[2]["clean_text"] == "Page 2"


def test_line_dedup_within_doc_duplicate_dropped(spark):
    # normalization is lower(trim(...)): 'Alpha' dups 'alpha'
    df = spark.createDataFrame(
        [Row(doc_id=7, text="alpha\nAlpha\nbeta", source="s")]
    )
    [row] = lines.line_dedup(df).collect()
    assert row["n_lines"] == 5
    assert row["n_kept"] == 4  # title, alpha, beta, footer; 'Alpha' cut
    assert row["clean_text"] == "Page 7\nalpha\nbeta\n(c) example s"


def test_line_dedup_plans_partial_aggregate_on_line_key(spark):
    # the keeper aggregate must have a map-side partial (HashAggregate
    # appears twice around the exchange) — that collapse of hot
    # boilerplate keys is the skew story at 10^10 pages
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        lines.line_dedup(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_min" in plan or "partial" in plan.lower(), plan


def test_lang_deficit_budget_exact_math(spark):
    # 6 docs: en=3, fr=2, zh=1 over 2 sources; n_langs=3, total=6
    # deficit: en max(0,6-9)=0, fr max(0,6-6)=0, zh max(0,6-3)=3
    # srcA docs: en2, zh1 -> score 3; srcB: en1, fr2 -> score 0
    df = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", source="A"),
            Row(doc_id=2, lang="en", source="A"),
            Row(doc_id=3, lang="zh", source="A"),
            Row(doc_id=4, lang="en", source="B"),
            Row(doc_id=5, lang="fr", source="B"),
            Row(doc_id=6, lang="fr", source="B"),
        ]
    )
    got = {
        r["source"]: r
        for r in sampling.lang_deficit_budget(df, extra_slots=64).collect()
    }
    assert got["A"]["score"] == 3 and got["B"]["score"] == 0
    # score_sum=3 -> A: 1 + 64*3//3 = 65, B: 1 + 0 = 1
    assert got["A"]["budget"] == 65
    assert got["B"]["budget"] == 1


def test_lang_deficit_budget_balanced_corpus_floors_to_one(spark):
    # perfectly balanced corpus: every deficit 0, score_sum clamps to 1,
    # every source gets the floor budget of 1
    df = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", source="A"),
            Row(doc_id=2, lang="fr", source="A"),
            Row(doc_id=3, lang="en", source="B"),
            Row(doc_id=4, lang="fr", source="B"),
        ]
    )
    rows = sampling.lang_deficit_budget(df).collect()
    assert {r["budget"] for r in rows} == {1}


def test_lang_deficit_budget_single_corpus_scan(spark):
    # the single-branch window formulation scans the corpus exactly ONCE
    # (a join formulation re-planned the shared aggregate subtree and
    # scanned it six times); the corpus-keyed exchange is the
    # (source, lang) partial-combined aggregate, every later exchange
    # carries dimension-table cardinality only
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        sampling.lang_deficit_budget(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan  # map-side combine on the corpus
