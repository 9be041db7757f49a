"""Sequential pure-Python oracle of the reference pipeline.

Re-executes the reference's record-at-a-time handler chain
(/root/reference/src/main.py:97-102 → handlers/*) over generated page rows,
using the SAME pure functions the Spark UDFs wrap (decode_bytes,
html_to_text, langspec.predict_py). Tests assert the distributed pipeline
equals this oracle line-for-line / counter-for-counter — the sandbox's
byte-identity anchor (SURVEY.md §5, §7.3).

Reproduces:
- decode short-circuit + error counter (decoding_handler.py:25-29)
- boilerplate→extraction order, meta always None (quirk #1, main.py:29 +
  warc_extraction.py:60-74)
- L4 normalization with string '0' precision (quirk #2)
- accuracy elif chain incl. the degenerate dict-vs-string branch (quirk #3,
  stats/accuracy.py:17-30)
- log line format (file_repo.py:29,34) and stats formats
  (accuracy.py:41-52, unknown.py:30-41, performance.py:30-41)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .functions.boilerplate import html_to_text
from .functions.decode import decode_bytes
from .functions.langspec import MODELS, predict_py

HEADER = "meta|http_header|detectfast|langid|cld2|pre-detectfast|pre-langid|pre-cld2"


@dataclass
class OracleResult:
    log_lines: list[str] = field(default_factory=list)
    decode_errors: int = 0
    size: int = 0  # records that survived decode
    wrong: dict = field(default_factory=lambda: {m: 0 for m in MODELS})
    uniq: dict = field(default_factory=lambda: {m: 0 for m in MODELS})
    unknown: dict = field(default_factory=lambda: {m: 0 for m in MODELS})
    match: int = 0
    histogram: dict = field(default_factory=dict)  # lang -> per-model [cnt, prec_sum]

    def accuracy_text(self) -> str:
        s = self.size
        return (
            "amount of different prediction than the other two language models\n"
            f"{self.wrong['detect_fast'] * 100 / s}% {self.wrong['langid'] * 100 / s}% "
            f"{self.wrong['cld2'] * 100 / s}%\n"
            "amount of prediction with unknown prediction in the other two models.\n"
            f"{self.uniq['detect_fast'] * 100 / s}% {self.uniq['langid'] * 100 / s}% "
            f"{self.uniq['cld2'] * 100 / s}%\n"
            f"the number of perfect matches are: {self.match * 100 / s}%"
        )

    def unknown_text(self) -> str:
        s = self.size
        return (
            f"{self.unknown['detect_fast'] * 100 / s}% "
            f"{self.unknown['langid'] * 100 / s}% {self.unknown['cld2'] * 100 / s}%\n"
        )


def run_oracle(rows: list[dict], size: int = -1) -> OracleResult:
    """rows: output of sources.pages.generate_pages (dicts)."""
    res = OracleResult()
    counter = 0
    for row in rows:
        if size >= 0 and counter >= size:
            break
        counter += 1
        # DecodingHandler
        content = decode_bytes(row["html"], row["http_charset"])
        if content is None:
            res.decode_errors += 1
            continue
        # BoilerPlateHandler (before extraction — quirk #1 root cause)
        content = html_to_text(content)
        # ExtractionHandler
        meta = None  # warc_extraction.py:60-74 swallows the return
        al = row["accept_language"]
        http_header = al.split(",")[0] if al is not None else "-"
        # LanguageIdentificationHandler + L4 normalization
        preds = {}
        for m in MODELS:
            lang, prec = predict_py(m, content)
            if lang == "unknown":
                preds[m] = ("un", "0")
            elif lang == "un" and prec == 0.0:
                preds[m] = ("un", "0")  # sentinel path
            else:
                preds[m] = (lang, prec)
        # StatsHandler
        res.size += 1
        df_l, li_l, cld_l = (preds[m][0] for m in MODELS)
        if df_l == li_l and df_l != cld_l:
            res.wrong["cld2"] += 1
        elif df_l == cld_l and df_l != li_l:
            res.wrong["langid"] += 1
        elif li_l == cld_l:  # quirk #3: dict != string is always True
            res.wrong["detect_fast"] += 1
        if df_l != "un" and df_l != "en" and li_l == "en" and cld_l == "un":
            res.uniq["detect_fast"] += 1
        elif df_l == "un" and li_l != "en" and cld_l == "un":
            res.uniq["langid"] += 1
        elif df_l == "un" and li_l == "en" and cld_l != "un" and cld_l != "en":
            res.uniq["cld2"] += 1
        if (df_l == li_l and li_l == cld_l) or (
            df_l == "un" and li_l == "en" and cld_l == "un"
        ):
            res.match += 1
        for m in MODELS:
            if preds[m][0] == "un":
                res.unknown[m] += 1
        # Histogram (awk count_fastwarc_result.sh:5-6 semantics)
        for i, m in enumerate(MODELS):
            lang, prec = preds[m]
            h = res.histogram.setdefault(lang, [[0, 0.0], [0, 0.0], [0, 0.0]])
            h[i][0] += 1
            h[i][1] += float(prec) if prec != "0" else 0.0
        # RepoHandler / FileRepository line (file_repo.py:34)
        res.log_lines.append(
            f"{meta}|{http_header}|{df_l}|{li_l}|{cld_l}|"
            f"{preds['detect_fast'][1]}|{preds['langid'][1]}|{preds['cld2'][1]}"
        )
    return res
