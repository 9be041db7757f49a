"""End-to-end parity: distributed extract pipeline == sequential oracle.

The oracle (parity.run_oracle) replays the reference handler chain in pure
Python over the same generated pages; the Spark pipeline must match it
line-for-line (log), counter-for-counter (stats), and cell-for-cell
(histogram) — under multi-partition execution and Arrow batching.
"""

from __future__ import annotations

import pytest

from language_diversity_common_crawler_spark import parity
from language_diversity_common_crawler_spark.operators import histogram, stats
from language_diversity_common_crawler_spark.plans.pipeline import (
    decode_error_count,
    extract_pipeline,
)
from language_diversity_common_crawler_spark.sinks import parity_log
from language_diversity_common_crawler_spark.sources import pages

N = 200


@pytest.fixture(scope="module")
def fixture_rows():
    return pages.generate_pages(N, seed=42)


@pytest.fixture(scope="module")
def oracle(fixture_rows):
    return parity.run_oracle(fixture_rows)


@pytest.fixture(scope="module")
def preds(spark, fixture_rows):
    df = pages.pages_df(spark, N, seed=42, n_partitions=7)
    return extract_pipeline(df).cache()


def test_golden_text_byte_identity(spark, fixture_rows):
    """`content` produced by the distributed UDF chain == golden `text`
    column (computed by the same pure functions at generation time),
    per url — the byte-identity invariant from BASELINE.json input_hint."""
    df = pages.pages_df(spark, N, seed=42, n_partitions=7)
    out = extract_pipeline(df).select("url", "content").collect()
    golden = {r["url"]: r["text"] for r in fixture_rows}
    assert len(out) == sum(1 for r in fixture_rows if r["text"] is not None)
    for row in out:
        assert row.content == golden[row.url], row.url


def test_log_lines_match_oracle(preds, oracle):
    got = [
        r.line
        for r in parity_log.log_lines(preds).orderBy("warc_ts", "url").collect()
    ]
    assert got == oracle.log_lines


def test_decode_error_count(spark, oracle):
    df = pages.pages_df(spark, N, seed=42, n_partitions=7)
    row = decode_error_count(df).collect()[0]
    assert row.decode_errors == oracle.decode_errors
    assert row.records == N


def test_accuracy_stats_match_oracle(preds, oracle):
    row = stats.accuracy_stats(preds).collect()[0]
    assert row.size == oracle.size
    assert row.wrong_detect_fast == oracle.wrong["detect_fast"]
    assert row.wrong_langid == oracle.wrong["langid"]
    assert row.wrong_cld2 == oracle.wrong["cld2"]
    assert row.uniq_detect_fast == oracle.uniq["detect_fast"]
    assert row.uniq_langid == oracle.uniq["langid"]
    assert row.uniq_cld2 == oracle.uniq["cld2"]
    assert row.match_cnt == oracle.match
    assert parity_log.format_accuracy(row) == oracle.accuracy_text()


def test_unknown_stats_match_oracle(preds, oracle):
    row = stats.unknown_stats(preds).collect()[0]
    assert parity_log.format_unknown(row) == oracle.unknown_text()


def test_histogram_matches_oracle(preds, oracle):
    rows = histogram.language_histogram(preds).collect()
    got = {
        r.lang: (
            (r.cnt_df, r.avg_prec_df),
            (r.cnt_li, r.avg_prec_li),
            (r.cnt_cld, r.avg_prec_cld),
        )
        for r in rows
    }
    assert set(got) == set(oracle.histogram)
    for lang, cells in oracle.histogram.items():
        for i in range(3):
            cnt, prec_sum = cells[i]
            gcnt, gavg = got[lang][i]
            assert gcnt == cnt, (lang, i)
            want_avg = prec_sum / cnt if cnt else 0.0
            assert gavg == want_avg, (lang, i)


def test_parity_log_file(tmp_path, preds, oracle):
    p = str(tmp_path / "seg.log")
    parity_log.write_parity_log(preds, p)
    lines = open(p, encoding="utf-8").read().splitlines()
    assert lines[0] == parity.HEADER
    assert lines[1:] == oracle.log_lines


def test_dat_writer_matches_awk_equivalent(tmp_path, preds, oracle):
    """W5: the .dat artifact equals the awk transliteration applied to the
    ACTUAL parity log text, and chunk files replicate the header per 10
    data rows (fasrawc_generetate_graph_comparaison.sh:14-21)."""
    from language_diversity_common_crawler_spark.operators import histogram
    from language_diversity_common_crawler_spark.sinks import dat

    hist = histogram.language_histogram(preds)
    got = dat.histogram_dat_lines(hist)
    want = dat.awk_equivalent_dat_lines(oracle.log_lines)
    assert got == want

    paths = dat.write_dat(hist, str(tmp_path), "seg", chunk_size=3)
    full = open(paths[0], encoding="utf-8").read().splitlines()
    assert full == got
    reassembled = [got[0]]
    for p in paths[1:]:
        lines = open(p, encoding="utf-8").read().splitlines()
        assert lines[0] == dat.DAT_HEADER
        assert 1 <= len(lines) <= 4
        reassembled.extend(lines[1:])
    assert reassembled == got


def test_segment_filter_prunes(spark):
    df = pages.pages_df(spark, N, seed=42)
    seg_preds = extract_pipeline(df, segment="00001")
    segs = {r.segment for r in seg_preds.select("segment").distinct().collect()}
    assert segs == {"00001"}


def test_limit_k1(spark):
    df = pages.pages_df(spark, N, seed=42)
    assert extract_pipeline(df, size=10).count() <= 10
