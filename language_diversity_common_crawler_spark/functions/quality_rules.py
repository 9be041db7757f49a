"""Rule-based document quality filtering for LLM training-data pipelines.

Implements the Gopher-style heuristic rules (Rae et al. 2021, "Scaling
Language Models: ...", Appendix A) as dialect-shared SQL expressions: word
count/length bounds, symbol-to-word ratio, ellipsis/bullet line fractions,
alpha-word fraction, stopword presence — plus repetition signals
(duplicate-word fraction, most-common-2-gram fraction).

The reference computes no quality filtering (this is a training-data
extension per the build brief); all per-document signals are pure
whole-stage-codegen JVM expressions — a shuffle-free linear scan that
holds at 100 TB. The 2-gram repetition operator is the one shape that
needs an aggregation: it explodes ~n_words rows per document, but both
hash aggregations key on (doc_id, gram), so every gram of a document sits
in its producing partition and map-side partial aggregation collapses the
explosion before any exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text_analysis import _sql_count_char, _sql_norm

# Gopher rule constants (Rae et al. 2021, Table A1)
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_ELLIPSIS_LINE_FRAC = 0.3
MAX_BULLET_LINE_FRAC = 0.9
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOPWORD_HITS = 2

# Gopher's required-stopword list (presence, not frequency)
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _fns(dialect: str) -> tuple[str, str, str, str]:
    """(array-length, filter, transform, distinct) function names."""
    if dialect == "duckdb":
        return "len", "list_filter", "list_transform", "list_distinct"
    return "size", "filter", "transform", "array_distinct"


def gopher_signal_exprs(
    toks: str, norm: str, pad: str, lines: str, dialect: str
) -> dict[str, str]:
    """Column-name -> SQL expression for the Gopher quality signals.

    Inputs are COLUMN REFERENCES to pre-materialized stages (lambda bodies
    get no common-subexpression elimination in either engine, so the token
    array / padded text / trimmed-line array must each be built once in an
    earlier projection):

    - ``toks``:  ``split(norm, ' ')`` token array
    - ``norm``:  whitespace-collapsed trimmed text
    - ``pad``:   ``concat(' ', lower(norm), ' ')``
    - ``lines``: per-line trimmed array of the RAW text (newlines survive;
      ``norm`` collapses them)
    """
    alen, lfilter, _, ldistinct = _fns(dialect)
    regex_match = (
        "regexp_matches(t, '[a-zA-Z]')" if dialect == "duckdb"
        else "t rlike '[a-zA-Z]'"
    )
    spaces = _sql_count_char(norm, " ")
    n_words = f"CASE WHEN length({norm}) = 0 THEN 0 ELSE {spaces} + 1 END"
    # All ratios divide as DOUBLE: a bare `* 1.0` literal is DECIMAL in
    # Spark (scale-12 rounded division) but DOUBLE-ish in DuckDB, so the
    # engines disagree in the last bits without the explicit cast.
    mean_wl = (
        f"CASE WHEN ({n_words}) = 0 THEN 0.0 "
        f"ELSE CAST(length({norm}) - ({spaces}) AS DOUBLE) / ({n_words}) END"
    )
    alpha_cnt = f"{alen}({lfilter}({toks}, t -> {regex_match}))"
    # '#' and unicode/ascii ellipses per Gopher's "symbols"; the ascii
    # '...' counts each non-overlapping triple once (replace semantics are
    # leftmost non-overlapping in both engines)
    symbols = (
        f"({_sql_count_char(norm, '#')} + {_sql_count_char(norm, '…')} + "
        f"(length({norm}) - length(replace({norm}, '...', ''))) / 3)"
    )
    stop_hits = " + ".join(
        f"(CASE WHEN {pad} LIKE '% {w} %' THEN 1 ELSE 0 END)"
        for w in _GOPHER_STOPWORDS
    )
    ellipsis_cnt = (
        f"{alen}({lfilter}({lines}, t -> t LIKE '%...' OR t LIKE '%…'))"
    )
    bullet_cnt = (
        f"{alen}({lfilter}({lines}, t -> t LIKE '-%' OR t LIKE '*%' "
        f"OR t LIKE '•%'))"
    )
    n_lines = f"{alen}({lines})"  # split never yields an empty array
    dup_words = f"(({n_words}) - {alen}({ldistinct}({toks})))"
    return {
        "n_words": f"CAST({n_words} AS BIGINT)",
        "mean_word_len": f"CAST({mean_wl} AS DOUBLE)",
        "alpha_word_frac": (
            f"CASE WHEN ({n_words}) = 0 THEN 0.0 "
            f"ELSE CAST({alpha_cnt} AS DOUBLE) / ({n_words}) END"
        ),
        "dup_word_frac": (
            f"CASE WHEN ({n_words}) = 0 THEN 0.0 "
            f"ELSE CAST({dup_words} AS DOUBLE) / ({n_words}) END"
        ),
        "symbol_word_ratio": (
            f"CASE WHEN ({n_words}) = 0 THEN 0.0 "
            f"ELSE CAST({symbols} AS DOUBLE) / ({n_words}) END"
        ),
        "stopword_hits": f"CAST({stop_hits} AS BIGINT)",
        "ellipsis_line_frac": (
            f"CAST({ellipsis_cnt} AS DOUBLE) / {n_lines}"
        ),
        "bullet_line_frac": (
            f"CAST({bullet_cnt} AS DOUBLE) / {n_lines}"
        ),
    }


def gopher_flag_exprs() -> dict[str, str]:
    """Per-rule booleans + the overall gate, over the SIGNAL COLUMNS
    (signals are materialized first; flags are plain comparisons, so
    referencing columns keeps each signal computed once)."""
    flags = {
        "words_ok": f"n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}",
        "word_len_ok": (
            f"mean_word_len BETWEEN {MIN_MEAN_WORD_LEN} "
            f"AND {MAX_MEAN_WORD_LEN}"
        ),
        "symbol_ok": f"symbol_word_ratio <= {MAX_SYMBOL_WORD_RATIO}",
        "ellipsis_ok": f"ellipsis_line_frac <= {MAX_ELLIPSIS_LINE_FRAC}",
        "bullet_ok": f"bullet_line_frac <= {MAX_BULLET_LINE_FRAC}",
        "alpha_ok": f"alpha_word_frac >= {MIN_ALPHA_WORD_FRAC}",
        "stopword_ok": f"stopword_hits >= {MIN_STOPWORD_HITS}",
    }
    flags["gopher_pass"] = " AND ".join(f"({e})" for e in flags.values())
    return flags


def _stage_exprs(text: str, dialect: str) -> dict[str, str]:
    """The four pre-materialized stages the signals reference."""
    split_fn = "string_split" if dialect == "duckdb" else "split"
    _, _, ltransform, _ = _fns(dialect)
    norm = _sql_norm(f"coalesce({text}, '')", dialect)
    return {
        "__norm": norm,
        "__toks": f"{split_fn}(__norm, ' ')",
        "__pad": "concat(' ', lower(__norm), ' ')",
        # raw-text lines, trimmed; chr(10) avoids the '\n'-literal escape
        # divergence between the dialects
        "__lines": (
            f"{ltransform}({split_fn}(coalesce({text}, ''), chr(10)), "
            f"t -> trim(t))"
        ),
    }


def with_gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Spark side: signals + rule flags as staged JVM projections
    (shuffle-free; whole-stage codegen end to end)."""
    out = df
    for name, e in _stage_exprs(text_col, "spark").items():
        out = out.withColumn(name, F.expr(e))
    for name, e in gopher_signal_exprs(
        "__toks", "__norm", "__pad", "__lines", "spark"
    ).items():
        out = out.withColumn(name, F.expr(e))
    for name, e in gopher_flag_exprs().items():
        out = out.withColumn(name, F.expr(e))
    return out.drop("__norm", "__toks", "__pad", "__lines")


def sql_gopher_quality(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle: identical staging via chained CTEs."""
    stages = _stage_exprs(text_col, "duckdb")
    sig = gopher_signal_exprs("__toks", "__norm", "__pad", "__lines", "duckdb")
    sig_cols = ",\n       ".join(f"{e} AS {n}" for n, e in sig.items())
    flag_cols = ",\n       ".join(
        f"{e} AS {n}" for n, e in gopher_flag_exprs().items()
    )
    stage_cols = ",\n       ".join(f"{e} AS {n}" for n, e in stages.items())
    return f"""
WITH staged AS (
  SELECT {id_col},
       {stage_cols}
  FROM {table}
), signals AS (
  SELECT {id_col},
       {sig_cols}
  FROM staged
)
SELECT {id_col}, n_words, mean_word_len, alpha_word_frac, dup_word_frac,
       symbol_word_ratio, stopword_hits, ellipsis_line_frac,
       bullet_line_frac,
       {flag_cols}
FROM signals
"""


# --- 2-gram repetition (Gopher's "fraction in most common n-gram") ---------

def top_2gram_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document most-common-2-gram share: (id, top_cnt, n_grams,
    top_2gram_frac). Documents with < 2 words produce no grams and drop
    out (both dialects).

    Scale shape: the explode multiplies rows by ~n_words, but the first
    groupBy keys on (doc_id, gram) — all grams of a document are in the
    partition that produced them, so the partial (map-side) aggregation
    collapses duplicates before the exchange; the second aggregation
    shuffles one row per distinct (doc, gram)."""
    norm = _sql_norm(f"coalesce({text_col}, '')", "spark")
    grams = (
        "CASE WHEN size(__toks) < 2 THEN CAST(array() AS ARRAY<STRING>) "
        "ELSE transform(sequence(1, size(__toks) - 1), "
        "i -> concat(element_at(__toks, CAST(i AS INT)), ' ', "
        "element_at(__toks, CAST(i AS INT) + 1))) END"
    )
    exploded = (
        df.withColumn("__toks", F.expr(f"split({norm}, ' ')"))
        .select(F.col(id_col), F.explode(F.expr(grams)).alias("gram"))
    )
    counts = exploded.groupBy(id_col, "gram").agg(
        F.count("*").alias("cnt")
    )
    return (
        counts.groupBy(id_col)
        .agg(
            F.max("cnt").alias("top_cnt"),
            F.sum("cnt").alias("n_grams"),
        )
        .withColumn(
            "top_2gram_frac",
            F.expr("CAST(top_cnt AS DOUBLE) / n_grams"),
        )
    )


def sql_top_2gram_stats(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    norm = _sql_norm(f"coalesce({text_col}, '')", "duckdb")
    return f"""
WITH t AS (
  SELECT {id_col}, string_split({norm}, ' ') AS __toks FROM {table}
), g AS (
  SELECT {id_col},
         unnest(list_transform(generate_series(1, len(__toks) - 1),
                               i -> __toks[i] || ' ' || __toks[i + 1])) AS gram
  FROM t WHERE len(__toks) >= 2
), c AS (
  SELECT {id_col}, gram, count(*) AS cnt FROM g GROUP BY {id_col}, gram
)
SELECT {id_col},
       CAST(max(cnt) AS BIGINT) AS top_cnt,
       CAST(sum(cnt) AS BIGINT) AS n_grams,
       CAST(max(cnt) AS DOUBLE) / sum(cnt) AS top_2gram_frac
FROM c GROUP BY {id_col}
"""


# ---------------------------------------------------------------------------
# unigram-LM quality score (CCNet-style perplexity-filter stand-in)
# ---------------------------------------------------------------------------

def unigram_lm_score(
    docs: DataFrame, text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document average unigram log-probability under the corpus's own
    unigram distribution — the deterministic stand-in for CCNet's KenLM
    perplexity filter (low avg logprob = gibberish/rare-token soup, high =
    head-heavy boilerplate; both tails get filtered in a real pipeline).

    Scale shape: the vocab table (token → corpus count) is ORDERS OF
    MAGNITUDE smaller than the corpus (≈10^7 tokens at web scale) and
    BROADCASTS onto the exploded token stream, so the corpus side is
    Generate + broadcast-join + one doc_id-keyed aggregate; the vocab
    build itself is one token-keyed aggregate with map-side partials.

    Oracle-determinism: per-token terms round(1000*log2(cnt/total)) are
    quantized to exact BIGINTs BEFORE summation (order-independent integer
    adds — the operators/diversity.py contract; see its docstring for the
    cross-engine grid-boundary analysis). The final average divides two
    exact integers with an explicit floor(double) — floor, not integer
    division, because Spark's `div` truncates toward zero while DuckDB's
    `//` floors, and the sums are negative.

    ``extra_cols`` are carried through the per-doc aggregate unchanged
    (functionally dependent on doc_id — e.g. lang for
    sampling.budget_threshold_selection, which buckets THIS score; the
    two operators must share one score recipe or a doc's score and its
    budget bucket silently diverge)."""
    from .dedup import tokens_expr

    tok = docs.select(
        "doc_id", *extra_cols,
        F.expr(tokens_expr(text_col, "spark")).alias("toks"),
    )
    t = tok.select(
        "doc_id", *extra_cols, F.explode("toks").alias("tok")
    ).filter(F.col("tok") != "")
    vocab = t.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    v = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.expr(
            "CAST(round(1000.0 * log2(CAST(cnt AS DOUBLE) "
            "/ CAST(total AS DOUBLE))) AS BIGINT)"
        ).alias("term_milli"),
    )
    agg = (
        t.join(F.broadcast(v), "tok")
        .groupBy("doc_id", *extra_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("term_milli").cast("bigint").alias("logprob_milli_sum"),
        )
    )
    return agg.withColumn(
        "avg_logprob_milli",
        F.expr(
            "CAST(floor(CAST(logprob_milli_sum AS DOUBLE) / n_tokens) "
            "AS BIGINT)"
        ),
    )


def sql_unigram_lm_score(
    table: str, text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of unigram_lm_score."""
    from .dedup import tokens_expr

    extra = "".join(f", {c}" for c in extra_cols)
    return f"""
WITH tok AS (
  SELECT doc_id{extra}, unnest({tokens_expr(text_col, 'duckdb')}) AS tok
  FROM {table}),
t AS (SELECT doc_id{extra}, tok FROM tok WHERE tok <> ''),
vocab AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
tot AS (SELECT sum(cnt) AS total FROM vocab),
v AS (
  SELECT tok,
         CAST(round(1000.0 * log2(CAST(cnt AS DOUBLE)
              / CAST(total AS DOUBLE))) AS BIGINT) AS term_milli
  FROM vocab, tot)
SELECT doc_id{extra}, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(term_milli) AS BIGINT) AS logprob_milli_sum,
       CAST(floor(CAST(sum(term_milli) AS DOUBLE) / count(*)) AS BIGINT)
         AS avg_logprob_milli
FROM t JOIN v USING (tok)
GROUP BY doc_id{extra}
"""


# --- filter-funnel report (FineWeb-style per-stage ablation counts) --------

def funnel_stages() -> list[tuple[int, str, str]]:
    """Ordered funnel: (stage_idx, stage_name, fail-predicate over the
    gopher flag/signal COLUMNS plus the ``__dedup_keep`` flag). ONE
    definition drives the Spark CASE and the DuckDB CASE — the funnel
    order IS the semantics (a doc is charged to the FIRST gate it fails,
    the way pipeline ablation tables attribute removals)."""
    stages = [(1, "empty", "n_words < 1")]
    idx = 2
    for name in gopher_flag_exprs():
        if name == "gopher_pass":
            continue
        stages.append((idx, name.removesuffix("_ok"), f"NOT ({name})"))
        idx += 1
    stages.append((idx, "exact_dup", "NOT (__dedup_keep)"))
    return stages


def _funnel_case() -> tuple[str, str]:
    """(stage_idx CASE, stage_name CASE) — identical text both dialects."""
    idx_arms, name_arms = [], []
    for idx, name, fail in funnel_stages():
        idx_arms.append(f"WHEN {fail} THEN {idx}")
        name_arms.append(f"WHEN {fail} THEN '{name}'")
    return (
        "CASE " + " ".join(idx_arms) + " ELSE 0 END",
        "CASE " + " ".join(name_arms) + " ELSE 'survived' END",
    )


def filter_funnel_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-stage removal counts for the full quality funnel (the ablation
    table FineWeb/Dolma publish per filter): every doc is charged to the
    FIRST gate it fails — empty → the seven Gopher rules in order →
    exact-dedup survivorship — or to 'survived'.

    Scale shape: the Gopher gates are the same shuffle-free staged codegen
    as with_gopher_quality; exact-dedup survivorship is ONE window over
    md5(text) (hash-partitioned; duplicate groups are politeness-bounded
    in practice and AQE covers pathological ones); the report aggregate
    is a tiny groupBy on stage_idx. Two exchanges total at any corpus
    size, both carrying either the dedup key or ~10 rows."""
    staged = with_gopher_quality(
        df.select("doc_id", F.coalesce(F.col(text_col), F.lit("")).alias(
            text_col
        )),
        text_col,
    )
    w = Window.partitionBy(F.md5(F.col(text_col)))
    marked = staged.withColumn(
        "__dedup_keep", F.col("doc_id") == F.min("doc_id").over(w)
    )
    idx_case, name_case = _funnel_case()
    charged = marked.select(
        F.expr(idx_case).alias("stage_idx"),
        F.expr(name_case).alias("stage"),
    )
    return charged.groupBy("stage_idx", "stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


def sql_filter_funnel_report(
    table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`filter_funnel_report` (the flag CTE is
    sql_gopher_quality itself — one recipe; NULL text coalesces to ''
    exactly like the Spark side)."""
    idx_case, name_case = _funnel_case()
    inner = sql_gopher_quality(
        f"(SELECT doc_id, coalesce({text_col}, '') AS {text_col} "
        f"FROM {table})",
        text_col=text_col,
    )
    return f"""
WITH flags AS ({inner}),
keys AS (
  SELECT doc_id, md5(coalesce({text_col}, '')) AS __k FROM {table}),
marked AS (
  SELECT f.*, f.doc_id = min(f.doc_id) OVER (PARTITION BY k.__k)
           AS __dedup_keep
  FROM flags f JOIN keys k USING (doc_id)),
charged AS (
  SELECT {idx_case} AS stage_idx, {name_case} AS stage FROM marked)
SELECT stage_idx, stage, CAST(count(*) AS BIGINT) AS n_docs
FROM charged GROUP BY stage_idx, stage
"""
