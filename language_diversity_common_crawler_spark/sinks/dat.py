"""W5 — ``.dat`` histogram artifact writer (gnuplot input parity).

The reference turns the pipe-delimited log into a whitespace-separated
table via awk (/root/reference/commands/count_fastwarc_result.sh:5-6):

    lang detectfast langid cld2 pre-detectfast pre-langid pre-cld2
    <lang> <cnt_df> <cnt_li> <cnt_cld> <avg_df> <avg_li> <avg_cld>

and splits it into 10-row chunks with the header replicated per chunk
(fasrawc_generetate_graph_comparaison.sh:14-21) so the gnuplot histograms
stay legible. Numbers print like awk's default %.6g (ints bare, floats
trimmed). Row order: the awk's ``for (i in lang)`` iteration order is
unspecified — this writer fixes the contract to lang-ascending, which the
gnuplot clustered-histogram consumer is insensitive to.

The histogram itself is the (tiny, aggregated) A1 DataFrame — collecting
it driver-side is the correct scale call, same as sinks/parity_log.py's
golden-artifact writers; the 100-TB-scale sink remains write_results.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

DAT_HEADER = "lang detectfast langid cld2 pre-detectfast pre-langid pre-cld2"


def _num(x) -> str:
    """awk default output format (%.6g): integers bare, floats trimmed."""
    f = float(x)
    if f == int(f):
        return str(int(f))
    return f"{f:.6g}"


def histogram_dat_lines(hist: DataFrame) -> list[str]:
    """Header + one line per language (lang-ascending) from the A1
    histogram DataFrame (operators.histogram.language_histogram)."""
    rows = sorted(hist.collect(), key=lambda r: r["lang"])
    lines = [DAT_HEADER]
    for r in rows:
        lines.append(
            " ".join(
                [
                    r["lang"],
                    _num(r["cnt_df"]),
                    _num(r["cnt_li"]),
                    _num(r["cnt_cld"]),
                    _num(r["avg_prec_df"]),
                    _num(r["avg_prec_li"]),
                    _num(r["avg_prec_cld"]),
                ]
            )
        )
    return lines


def write_dat(
    hist: DataFrame, out_dir: str, name: str, chunk_size: int = 10
) -> list[str]:
    """Write ``{name}.dat`` plus K3 chunk files ``{name}_{i}.dat`` (header
    replicated per chunk, ``chunk_size`` data rows each — the split loop of
    fasrawc_generetate_graph_comparaison.sh:14-21). Returns written
    paths."""
    os.makedirs(out_dir, exist_ok=True)
    lines = histogram_dat_lines(hist)
    header, data = lines[0], lines[1:]
    paths = []
    full = os.path.join(out_dir, f"{name}.dat")
    with open(full, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    paths.append(full)
    for i in range(0, max(len(data), 1), chunk_size):
        p = os.path.join(out_dir, f"{name}_{i // chunk_size}.dat")
        with open(p, "w", encoding="utf-8") as f:
            f.write("\n".join([header] + data[i : i + chunk_size]) + "\n")
        paths.append(p)
    return paths


def awk_equivalent_dat_lines(log_lines: list[str]) -> list[str]:
    """Pure-python transliteration of count_fastwarc_result.sh's awk over
    the 8-column pipe log (header excluded): per-language counts + mean
    precisions per model column, langs union'd across the three columns,
    missing cells 0 — the independent oracle the .dat writer is tested
    against."""
    cnt = [{} for _ in range(3)]
    prec = [{} for _ in range(3)]
    langs: set[str] = set()
    for line in log_lines:
        f = line.split("|")
        for j in range(3):
            lang = f[2 + j]
            cnt[j][lang] = cnt[j].get(lang, 0) + 1
            prec[j][lang] = prec[j].get(lang, 0.0) + float(f[5 + j])
            langs.add(lang)
    out = [DAT_HEADER]
    for lang in sorted(langs):
        cells = [lang]
        for j in range(3):
            cells.append(_num(cnt[j].get(lang, 0)))
        for j in range(3):
            c = cnt[j].get(lang, 0)
            cells.append(_num(prec[j][lang] / c if c else 0))
        out.append(" ".join(cells))
    return out
