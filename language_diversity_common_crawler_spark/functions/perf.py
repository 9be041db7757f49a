"""L6/A4 — in-engine per-model performance instrumentation.

The reference times each model with ``time.process_time()`` around an x100
repeated call per record when ``Perf=1``
(/root/reference/src/strategies/language_identification/cld2.py:22-27,
langid.py:19-24, detect_fast.py:19-24; flag default.ini:4), sums the
durations per segment, and reports mean seconds/record
(stats/performance.py:18-19,41).

Spark surface: the hot path stays clean (bench.py remains the headline
harness); when instrumentation is requested, each model UDF is wrapped so
every Arrow batch adds its ``process_time`` delta and row count to SPARK
ACCUMULATORS — executor-side totals stream back to the driver with task
completion, no extra jobs, no per-row Python beyond the model call the
batch already makes. The x100 repetition is intentionally NOT reproduced
in-engine (it was the reference's micro-benchmark-stabilization for
per-record timing, README.md:17; batch timing amortizes that noise
already).
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from . import langid_models, langspec

_RESULT_TYPE = "lang: string, precision: double"


class ModelPerf:
    """Accumulator set for one instrumented run.

    ``seconds[model]`` / ``rows[model]`` fill as tasks complete; call
    :meth:`mean_seconds_per_record` after an action. Accumulator updates
    from re-executed tasks can double-count under speculation/retries —
    fine for A4-style reporting, never used for correctness."""

    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self.seconds = {m: sc.accumulator(0.0) for m in langspec.MODELS}
        self.rows = {m: sc.accumulator(0) for m in langspec.MODELS}

    def with_predictions(self, df: DataFrame,
                         text_col: str = "text") -> DataFrame:
        """L5 fan-out with timing: df_lang/df_prec, li_lang/li_prec,
        cld_lang/cld_prec columns, accumulators fed per Arrow batch."""
        out = df
        for model in langspec.MODELS:
            p = langspec.MODEL_PREFIX[model]
            sec_acc = self.seconds[model]
            row_acc = self.rows[model]

            # snapshot the real-library probe once (same contract as
            # langid_models._make_udf): the instrumented pipeline must time
            # the SAME models the uninstrumented one runs — real libs when
            # importable, deterministic langspec otherwise
            use_real = langspec.real_models_available()

            def make(model=model, sec_acc=sec_acc, row_acc=row_acc,
                     use_real=use_real):
                def fn(text: pd.Series) -> pd.DataFrame:
                    t0 = time.process_time()
                    res = langid_models.predict_batch(model, text, use_real)
                    sec_acc.add(time.process_time() - t0)
                    row_acc.add(len(text))
                    return res

                fn.__name__ = f"{model}_identify_timed"
                return pandas_udf(_RESULT_TYPE)(fn)

            struct_col = make()(F.col(text_col))
            out = out.withColumn(f"_{p}", struct_col)
            out = out.withColumn(f"{p}_lang", F.col(f"_{p}.lang"))
            out = out.withColumn(f"{p}_prec", F.col(f"_{p}.precision"))
            out = out.drop(f"_{p}")
        return out

    def mean_seconds_per_record(self) -> dict[str, float]:
        return {
            m: (self.seconds[m].value / self.rows[m].value
                if self.rows[m].value else 0.0)
            for m in langspec.MODELS
        }

    def performance_text(self) -> str:
        """A4 file format (stats/performance.py:30-41, trailing space)."""
        mean = self.mean_seconds_per_record()
        return (f"{mean['detect_fast']} {mean['langid']} "
                f"{mean['cld2']} \n")
