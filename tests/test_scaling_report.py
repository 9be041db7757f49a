"""Estimator math of the scaling harness (tools/scaling_bench.py).

Pure-Python: no Spark, no subprocesses. Pins the reporting contract —
efficiency = median of paired per-round ratios, vs-control = median of
the same ratios normalized by the SAME round's control ratio — so a
future harness edit can't silently revert to dividing per-level bests
(the estimator that a lucky low-level window deflates forever; see
BASELINE.md § Scaling).
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_SB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "scaling_bench.py",
)


@pytest.fixture()
def sb():
    spec = importlib.util.spec_from_file_location("scaling_bench", _SB_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _acc(levels=(2, 8)):
    """A minimal accumulation file: 4 paired rounds for two jobs."""
    lv = {}
    for c in levels:
        lv[str(c)] = {
            "cpus": c,
            "frontier_per_sec": 100.0 * c,
            "frontier_per_sec_median": 90.0 * c,
            "frontier_units": 1000,
            "frontier_sec": 10.0 / c,
            "cpu_probe_per_sec": 1000.0 * c,
            "cpu_probe_per_sec_median": 900.0 * c,
            "cpu_probe_units": 5000,
            "cpu_probe_sec": 5.0 / c,
        }
    return {
        "code_key": "x",
        "levels": lv,
        # engine job: one clean round, one contended, two middling
        "paired_rounds": {
            "frontier": [1.0, 0.2, 0.7, 0.8],
            "cpu_probe": [1.0, 0.25, 0.9, 0.85],
        },
        "paired_control": {
            "frontier": [1.0, 0.25, 0.9, 0.85],
            "cpu_probe": [1.0, 0.25, 0.9, 0.85],
        },
        "units": {"frontier": 1000, "cpu_probe": 5000},
    }


def test_report_only_medians(sb, tmp_path, monkeypatch, capsys):
    acc_path = tmp_path / "best.json"
    acc_path.write_text(json.dumps(_acc()))
    monkeypatch.setattr(sb, "BEST_PATH", str(acc_path))
    baseline = tmp_path / "BASELINE.md"
    baseline.write_text("# header\n\n## Scaling (measured)\nold\n")
    monkeypatch.setenv("SCALING_BASELINE_PATH", str(baseline))
    scaling_json = tmp_path / "SCALING.json"
    monkeypatch.setenv("SCALING_JSON_PATH", str(scaling_json))

    sb.report_only([2, 8], update_baseline=True)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # absolute efficiency: median of the paired ratios, NOT
    # best_hi/best_lo/4 (which would be (800/200)/4 = 1.0 here)
    assert out["scaling_efficiency"]["frontier"] == 0.75  # med(1.0,.2,.7,.8)
    # vs-control: median of per-round engine/control
    # rounds: 1.0/1.0, 0.2/0.25, 0.7/0.9, 0.8/0.85 -> med(1.0,.8,.778,.941)
    assert out["scaling_efficiency_vs_control"]["frontier"] == pytest.approx(
        0.871, abs=0.001
    )
    # the control never normalizes itself
    assert "cpu_probe" not in out["scaling_efficiency_vs_control"]

    text = baseline.read_text()
    assert "# header" in text  # content above the marker survives
    assert text.count("## Scaling (measured)") == 1  # old section replaced
    assert "0.75 (n=4)" in text  # efficiency + sample count in the table

    # the machine-readable evidence went to the redirected path, NOT the
    # repo's real SCALING.json (which holds measured numbers)
    ev = json.loads(scaling_json.read_text())
    assert ev["jobs"]["frontier"]["efficiency"] == 0.75
    assert ev["levels"] == [2, 8]


def test_none_control_rounds_are_skipped_in_normalization(
    sb, tmp_path, monkeypatch, capsys
):
    acc = _acc()
    # a legacy round with no recorded control must not crash or skew
    acc["paired_rounds"]["frontier"] = [1.0, 0.5]
    acc["paired_control"]["frontier"] = [None, 1.0]
    (tmp_path / "best.json").write_text(json.dumps(acc))
    monkeypatch.setattr(sb, "BEST_PATH", str(tmp_path / "best.json"))

    sb.report_only([2, 8], update_baseline=False)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["scaling_efficiency"]["frontier"] == 0.75  # med(1.0, 0.5)
    assert out["scaling_efficiency_vs_control"]["frontier"] == 0.5  # 0.5/1.0


def test_plan_audit_summarize_counts():
    """tools/plan_audit.py's plan parser: node counting + pushed-filter
    detection over a representative plan fragment."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "plan_audit",
        os.path.join(os.path.dirname(__file__), "..", "tools", "plan_audit.py"),
    )
    pa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pa)

    plan = """
AdaptiveSparkPlan
+- Exchange hashpartitioning(lang#1, 32)
   +- *(2) HashAggregate
      +- Generate posexplode(starts#3)
         +- ArrowEvalPython [_decode_batch(html#0)], [pythonUDF0#9]
            +- BroadcastHashJoin [id#4], [id#5]
               +- Exchange SinglePartition
                  +- Scan parquet PushedFilters: [IsNotNull(doc_id)]
"""
    r = pa.summarize(plan)
    assert r["exchanges"] == 1
    assert r["range_exchanges"] == 0
    assert pa.summarize("Exchange rangepartitioning(c ASC, 32)")[
        "range_exchanges"] == 1
    assert pa.summarize("BatchEvalPython [f(x)]")["arrow_udfs"] == 1
    assert r["single_part_exchanges"] == 1
    assert r["arrow_udfs"] == 1
    assert r["bcast_joins"] == 1
    assert r["generates"] == 1
    assert r["codegen"] == 1
    assert r["pushed_filters"] is True
    assert pa.summarize("Scan parquet PushedFilters: []")["pushed_filters"] is False
