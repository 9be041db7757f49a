"""Text-analysis operators for a large-scale training-data pipeline:
token counting, quality scoring, document fingerprinting.

All expressions are dialect-shared: one SQL string runs as the DuckDB oracle
and (via ``F.expr``) as Spark JVM-side expressions — whole-stage-codegen'd,
no Python in the hot path. The token model is deliberately exact-integer so
parallel aggregation is order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dialect import g_flag, rx
from .hashing import sql_md5_60

# Normalized text: trim + collapse whitespace (Spark regexp_replace is
# global; DuckDB needs the 'g' flag — handled per dialect below).
_STOPWORDS = [" the ", " a ", " of ", " and ", " to "]
_PUNCT = [".", ",", "!", "?", ";", ":"]


_WS = r"\s+"


def _sql_norm(text: str, dialect: str) -> str:
    ws = rx(_WS, dialect)
    return f"regexp_replace(trim({text}), {ws}, ' '{g_flag(dialect)})"


def _sql_count_char(expr: str, ch: str) -> str:
    c = ch.replace("'", "''")
    return f"(length({expr}) - length(replace({expr}, '{c}', '')))"


def token_stats_exprs(text: str, dialect: str) -> dict[str, str]:
    """Column-name → SQL expression for token statistics (inline norm —
    fine for oracle SQL; Spark hot path materializes the norm first, see
    with_text_stats)."""
    return token_stats_from_norm(_sql_norm(text, dialect), dialect)


# BPE-ish pre-tokenizer pattern (GPT-2-style splitting, reduced to the
# character classes that behave identically in Java regex and DuckDB's RE2):
# letter runs, single digits, single non-alphanumeric marks. No backslash
# escapes, so it needs no dialect rx() handling.
_BPE_PAT = "[a-z]+|[0-9]|[^a-z0-9 ]"


def token_stats_from_norm(norm: str, dialect: str = "spark") -> dict[str, str]:
    """Token statistics over an ALREADY-NORMALIZED text expression/column."""
    spaces = _sql_count_char(norm, " ")
    n_tokens = f"CASE WHEN length({norm}) = 0 THEN 0 ELSE {spaces} + 1 END"
    arr_len = "len" if dialect == "duckdb" else "size"
    bpe = (
        f"{arr_len}(regexp_extract_all(lower({norm}), '{_BPE_PAT}', 0))"
    )
    return {
        "n_chars_norm": f"CAST(length({norm}) AS BIGINT)",
        "n_tokens": f"CAST({n_tokens} AS BIGINT)",
        "n_bpe_est": f"CAST(ceil(length({norm}) / 4.0) AS BIGINT)",
        "n_bpe_tokens": f"CAST({bpe} AS BIGINT)",
        "avg_token_len": (
            f"CAST(CASE WHEN ({n_tokens}) = 0 THEN 0.0 "
            f"ELSE (length({norm}) - ({spaces})) * 1.0 / ({n_tokens}) END AS DOUBLE)"
        ),
    }


def quality_exprs(text: str, dialect: str) -> dict[str, str]:
    """Quality-scoring signals (inline norm — oracle SQL path)."""
    norm = _sql_norm(text, dialect)
    return quality_from_norm(norm, f"concat(' ', lower({norm}), ' ')")


def quality_from_norm(norm: str, pad: str) -> dict[str, str]:
    """Quality signals over pre-materialized norm + padded-lower columns."""
    punct = " + ".join(_sql_count_char(norm, p) for p in _PUNCT)
    stop_parts = []
    for w in _STOPWORDS:
        stop_parts.append(
            f"CAST((length({pad}) - length(replace({pad}, '{w}', ''))) / {len(w)} AS BIGINT)"
        )
    stop = " + ".join(stop_parts)
    spaces = _sql_count_char(norm, " ")
    n_tokens = f"CASE WHEN length({norm}) = 0 THEN 0 ELSE {spaces} + 1 END"
    return {
        "punct_cnt": f"CAST({punct} AS BIGINT)",
        "stopword_cnt": f"CAST({stop} AS BIGINT)",
        "stopword_ratio": (
            f"CAST(CASE WHEN ({n_tokens}) = 0 THEN 0.0 "
            f"ELSE ({stop}) * 1.0 / ({n_tokens}) END AS DOUBLE)"
        ),
        "quality_score": (
            f"CAST(CASE WHEN ({n_tokens}) = 0 THEN 0 "
            f"ELSE 100 * ({stop}) + ({n_tokens}) - 5 * ({punct}) END AS BIGINT)"
        ),
    }


def fingerprint_expr(text: str, dialect: str) -> str:
    """Document fingerprint: 60-bit hash of normalized text (exact-dup key)."""
    return sql_md5_60(_sql_norm(text, dialect), dialect)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Spark side: apply all token/quality expressions via F.expr (JVM).

    The normalized text and its padded-lowercase variant are materialized
    once as intermediate columns: the stat expressions reference them many
    times, and Spark has no CSE across a lambda/alias re-inline — without
    this, every stat column re-runs the whitespace-collapse regex
    (~10 regex passes per row instead of 1)."""
    out = df.withColumn("__norm", F.expr(_sql_norm(text_col, "spark")))
    out = out.withColumn("__pad", F.expr("concat(' ', lower(__norm), ' ')"))
    for name, e in {**token_stats_from_norm("__norm", "spark"),
                    **quality_from_norm("__norm", "__pad")}.items():
        out = out.withColumn(name, F.expr(e))
    out = out.withColumn("fingerprint", F.expr(sql_md5_60("__norm", "spark")))
    return out.drop("__norm", "__pad")


def token_hash_expr(toks: str, dialect: str) -> str:
    """60-bit md5 per token over a token-array column — the ONE expensive
    pass; simhash bit-sums derive from this array with integer ops only."""
    h = sql_md5_60("t", dialect)
    fn = "list_transform" if dialect == "duckdb" else "transform"
    return f"{fn}({toks}, t -> {h})"


SIMHASH_BITS = 60  # md5-60 native width; fits a signed BIGINT in both engines
# 8 bands (4x8-bit + 4x7-bit) — pigeonhole: a pair with hamming <= 7 differs
# in at most 7 bands, so at least one of the 8 matches exactly.
SIMHASH_BAND_OFFSETS = [0, 8, 16, 24, 32, 39, 46, 53]
SIMHASH_BAND_WIDTHS = [8, 8, 8, 8, 7, 7, 7, 7]


def simhash60_from_hashes(th: str, dialect: str) -> str:
    """60-bit SimHash from a token-hash-array column.

    Spark path: ONE traversal of the token-hash array builds the 60
    per-bit counts (aggregate with an array accumulator + zip_with), then
    one cheap pass turns counts into the fingerprint — O(tokens * 60) work
    with a single array iteration, no per-bit re-traversal. DuckDB (oracle,
    sf0.01 only) uses the simple per-bit list_sum formula; values are
    identical (+1/-1 vote per bit, fingerprint bit set iff sum > 0).
    """
    n = SIMHASH_BITS
    if dialect == "duckdb":
        bits = []
        for b in range(n):
            bits.append(
                f"(CASE WHEN list_sum(list_transform({th}, "
                f"h -> CASE WHEN (h >> {b}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
                f"THEN (1::BIGINT << {b}) ELSE 0 END)"
            )
        return "CAST(" + " + ".join(bits) + " AS BIGINT)"
    counts = (
        f"aggregate({th}, transform(sequence(0, {n - 1}), "
        f"b -> CAST(0 AS BIGINT)), "
        f"(acc, h) -> zip_with(acc, sequence(0, {n - 1}), "
        f"(c, b) -> c + (CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE -1 END)))"
    )
    # coalesce: NULL text propagates a NULL array through the aggregates,
    # but the DuckDB per-bit formula sums 60 CASE..ELSE 0 branches to 0 —
    # pin the Spark value to the same 0 fingerprint
    return (
        f"coalesce(aggregate(zip_with({counts}, sequence(0, {n - 1}), "
        f"(c, b) -> CASE WHEN c > 0 THEN shiftleft(CAST(1 AS BIGINT), "
        f"CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x), CAST(0 AS BIGINT))"
    )


def simhash60(df: DataFrame, text_col: str = "text",
              out_col: str = "simhash60") -> DataFrame:
    """Spark: staged simhash — norm, token array, token-hash array each
    materialized once (Spark lambdas get no CSE), then the single-pass
    count/fingerprint aggregate."""
    norm = _sql_norm(text_col, "spark")
    out = (
        df.withColumn("__toks", F.expr(f"split({norm}, ' ')"))
        .withColumn("__th", F.expr(token_hash_expr("__toks", "spark")))
        .withColumn(out_col, F.expr(simhash60_from_hashes("__th", "spark")))
    )
    return out.drop("__toks", "__th")


def simhash60_exprs(text: str, dialect: str) -> str:
    """60-bit SimHash over tokens, identical in Spark SQL and DuckDB.

    Token hash = md5-60; bit b contributes +1 if set else -1; simhash bit b
    is 1 iff the sum is > 0. Unnest-free: computed with higher-order array
    functions on the token array (JVM-side in Spark, list ops in DuckDB).
    """
    norm = _sql_norm(text, dialect)
    split_fn = "string_split" if dialect == "duckdb" else "split"
    th = token_hash_expr(f"{split_fn}({norm}, ' ')", dialect)
    return simhash60_from_hashes(th, dialect)


# --- winnowing (rolling-hash document fingerprints) -------------------------
# Schleimer/Wilkerson/Aiken '03 (MOSS): hash every char k-gram of the
# normalized text, slide a w-window over the hash sequence, keep each
# window's minimum — guarantees any shared substring of length >= k + w - 1
# between two documents yields a shared fingerprint, with ~2/(w+1) of the
# grams selected. The reference computes no fingerprinting (this is a
# training-data-pipeline extension); expressed as pure dialect-shared SQL
# so the hot path is whole-stage-codegen'd JVM work — a shuffle-free map
# that scales linearly with corpus bytes.
WINNOW_K = 8  # char-gram length
WINNOW_W = 4  # winnowing window (in grams)


def _winnow_gram_hash(gram: str, dialect: str) -> str:
    return sql_md5_60(gram, dialect)


def winnow_hashes_expr(norm: str, dialect: str, k: int = WINNOW_K) -> str:
    """Array of k-gram rolling hashes over an already-normalized,
    ALREADY-LOWERCASED column reference — lowercase in the projection that
    materializes ``norm``, never here: a lower() inside the per-gram
    lambda would re-lowercase the whole string for every gram (no CSE in
    lambda bodies → O(len²) character work per document).
    Explicit empty-array guard: Spark's sequence(1, 0) produces a
    DESCENDING [1, 0] (not empty), DuckDB's generate_series(1, 0) is empty
    — the CASE keeps both engines at [] for short/NULL text."""
    if dialect == "duckdb":
        gram = f"substring({norm}, i, {k})"
        h = _winnow_gram_hash(gram, dialect)
        return (
            f"CASE WHEN {norm} IS NULL OR length({norm}) < {k} THEN []::BIGINT[] "
            f"ELSE list_transform(generate_series(1, length({norm}) - {k - 1}), "
            f"i -> {h}) END"
        )
    gram = f"substring({norm}, CAST(i AS INT), {k})"
    h = _winnow_gram_hash(gram, dialect)
    return (
        f"CASE WHEN {norm} IS NULL OR length({norm}) < {k} "
        f"THEN CAST(array() AS ARRAY<BIGINT>) "
        f"ELSE transform(sequence(1, length({norm}) - {k - 1}), i -> {h}) END"
    )


def winnow_select_expr(hashes: str, dialect: str, w: int = WINNOW_W) -> str:
    """Distinct window minima over a HASH-ARRAY COLUMN reference (pass a
    materialized column, not the hash expression — lambda bodies get no
    CSE, so inlining would recompute the md5 array per window). Fewer than
    ``w`` grams → the single global minimum (every non-empty doc gets at
    least one fingerprint, per the paper's boundary rule)."""
    if dialect == "duckdb":
        win_min = f"list_min(({hashes})[i:i + {w - 1}])"
        return (
            f"CASE WHEN len({hashes}) = 0 THEN []::BIGINT[] "
            f"WHEN len({hashes}) < {w} THEN [list_min({hashes})] "
            f"ELSE list_distinct(list_transform("
            f"generate_series(1, len({hashes}) - {w - 1}), i -> {win_min})) END"
        )
    win_min = f"array_min(slice({hashes}, CAST(i AS INT), {w}))"
    return (
        f"CASE WHEN size({hashes}) = 0 THEN CAST(array() AS ARRAY<BIGINT>) "
        f"WHEN size({hashes}) < {w} THEN array(array_min({hashes})) "
        f"ELSE array_distinct(transform("
        f"sequence(1, size({hashes}) - {w - 1}), i -> {win_min})) END"
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """(id, fp) — one row per selected winnowing fingerprint. Staged so the
    lowercased norm and the k-gram hash array each materialize once per
    row."""
    norm = df.select(
        F.col(id_col),
        F.expr(f"lower({_sql_norm(text_col, 'spark')})").alias("__norm"),
    )
    hashed = norm.select(
        id_col,
        F.expr(winnow_hashes_expr("__norm", "spark", k)).alias("__wh"),
    )
    return hashed.select(
        F.col(id_col),
        F.explode(
            F.expr(winnow_select_expr("__wh", "spark", w))
        ).alias("fp"),
    )


def sql_winnow_fingerprints(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> str:
    norm = _sql_norm(text_col, "duckdb")
    hashes = winnow_hashes_expr("__norm", "duckdb", k)
    sel = winnow_select_expr("__wh", "duckdb", w)
    return f"""
WITH n AS (SELECT {id_col}, lower({norm}) AS __norm FROM {table}),
h AS (SELECT {id_col}, {hashes} AS __wh FROM n)
SELECT {id_col}, unnest({sel}) AS fp FROM h
"""


# ---------------------------------------------------------------------------
# fixed-window document chunking (context-window packing prep)
# ---------------------------------------------------------------------------

# Defaults sized for ~512-token contexts at the corpus's ~4 chars/token,
# with 25% overlap so no span is split across a chunk boundary unseen.
CHUNK_WIDTH = 2048
CHUNK_STRIDE = 1536


def document_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = CHUNK_WIDTH,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split each document into overlapping fixed-width character windows
    — the preprocessing step that turns variable-length documents into
    training-context-sized rows (token-exact packing happens after
    tokenization; character windows with overlap are the standard
    distributed approximation since the tokenizer runs downstream).

    Plan shape: a single codegen ``Generate`` (posexplode of a
    ``sequence()`` of window starts) + ``substring`` projection —
    shuffle-free, linear in input bytes, composes with any upstream
    operator without an exchange. A document shorter than ``width``
    yields exactly one chunk; the final chunk of a longer document is
    the (possibly short) tail, matching the oracle twin exactly.

    The start bound is the smallest stride multiple >= len - width
    (integer arithmetic, shared with the twin): generation stops as soon
    as a window reaches the end of the document, so no chunk is ever
    wholly contained in its predecessor — a naive 0..len-1 bound emits a
    redundant fully-duplicated tail chunk for every doc whose length
    falls in (k*stride, k*stride + (width - stride)], silently
    duplicating training text.
    """
    ln = F.length(F.col(text_col))
    bound = (
        F.floor(
            (F.greatest(ln - F.lit(width), F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        ).cast("bigint")
        * F.lit(stride)
    )
    starts = F.sequence(F.lit(0).cast("bigint"), bound, F.lit(stride))
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(text_col),
            F.posexplode(starts).alias("chunk_idx", "__pos"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.expr(f"substring({text_col}, __pos + 1, {width})").alias(
                "chunk_text"
            ),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("int"))
    )


def sql_document_chunks(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = CHUNK_WIDTH,
    stride: int = CHUNK_STRIDE,
) -> str:
    """DuckDB twin of :func:`document_chunks` (range() excludes its stop,
    so the bound is the smallest stride multiple >= len - width, plus 1 —
    the same start set Spark's inclusive sequence() generates)."""
    bound = (
        f"((greatest(length(d.{text_col}) - {width}, 0) + {stride - 1})"
        f" // {stride}) * {stride}"
    )
    return f"""
SELECT d.{id_col},
       CAST(t.pos // {stride} AS INT) AS chunk_idx,
       substring(d.{text_col}, CAST(t.pos + 1 AS INT), {width}) AS chunk_text,
       CAST(length(substring(d.{text_col}, CAST(t.pos + 1 AS INT), {width}))
            AS INT) AS chunk_len
FROM {table} d,
     UNNEST(range(0, ({bound}) + 1, {stride})) AS t(pos)
WHERE d.{text_col} IS NOT NULL
"""
