"""Three-way parity of the deterministic language models:
pandas (Spark UDF body) == plain Python == generated DuckDB SQL."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from language_diversity_common_crawler_spark.functions import langspec as L

CASES = [
    "",
    " ",
    "the and of the data",
    "und nicht batch batch",
    "的是了 window window",
    "xxxx yyyy zzzz",          # no markers anywhere
    "le les avec merge merge",
    "o uma não hash",
    "a a a a a",
    "und the und the",          # cross-model tie material
    "\x00\x01 the and of\x7f",  # control chars (cld2 strip)
    "multi    space\ttabs",
]


@pytest.mark.parametrize("model", L.MODELS)
def test_pandas_vs_python(model):
    got = L.predict_pandas(model, pd.Series(CASES))
    for i, case in enumerate(CASES):
        lang, prec = L.predict_py(model, case)
        assert got["lang"].iloc[i] == lang, (model, case)
        assert got["precision"].iloc[i] == prec, (model, case)


def test_duckdb_vs_pandas():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(CASES))
    )
    sql = L.sql_all_models_select("t", ["doc_id"], "text") + " ORDER BY doc_id"
    rows = con.execute(sql).df()
    for m in L.MODELS:
        p = L.MODEL_PREFIX[m]
        pred = L.predict_pandas(m, pd.Series(CASES))
        assert list(rows[f"{p}_lang"]) == list(pred["lang"]), m
        assert list(rows[f"{p}_prec"]) == list(pred["precision"]), m


def test_tie_break_alphabetical():
    # 'und' is a marker for de in detect_fast AND langid; craft exact tie
    lang, _ = L.predict_py("detect_fast", "the und")  # en:1 the, de:1 und
    assert lang == "de"  # alphabetical first on tie


def test_fallbacks():
    assert L.predict_py("detect_fast", "qqq") == ("un", 0.0)
    lang, prec = L.predict_py("langid", "qqq")
    assert lang == "en" and prec == -3.0
    assert L.predict_py("cld2", "qqq") == ("un", 0.0)
