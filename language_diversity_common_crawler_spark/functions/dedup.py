"""Deduplication operators for training-data pipelines.

- exact: groupBy on a 128-bit content hash (md5). One shuffle on the hash —
  at 100 TB this is the canonical exact-dedup plan (hash-partitioned,
  map-side pre-aggregated, AQE-coalesced).
- MinHash + LSH: word-shingle → k salted min-hashes → banded bucket keys;
  near-dup candidates come from a self-join on (band, bucket) — the join key
  is the bucket hash, so only genuinely-colliding docs meet. This is the
  scale path: no pairwise O(n²) anywhere.
- SimHash: see functions.text_analysis.simhash16_exprs.
- n-gram Jaccard: exact verification on LSH candidates (or, at small scale,
  on all shingle-sharing pairs) via unnest + join + group.

Every expression is dialect-shared (Spark SQL + DuckDB) so the driver's
oracle validates values exactly. Shingle hashes are 60-bit md5 (hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dialect import g_flag, rx
from .hashing import sql_md5_60

N_MINHASH = 8
N_BANDS = 4  # 2 rows per band


_WS = r"\s+"


def _norm(text: str, dialect: str) -> str:
    ws = rx(_WS, dialect)
    return f"regexp_replace(trim(lower({text})), {ws}, ' '{g_flag(dialect)})"


def shingles_expr(text: str, dialect: str, k: int = 3) -> str:
    """Array of word k-gram shingle strings (inline expression — no
    subquery, so it runs inside whole-stage codegen / list ops)."""
    norm = _norm(text, dialect)
    if dialect == "duckdb":
        toks = f"string_split({norm}, ' ')"
        joined = " || ' ' || ".join(f"({toks})[i + {j}]" for j in range(k))
        return (
            f"CASE WHEN len({toks}) < {k} THEN []::VARCHAR[] "
            f"ELSE list_transform(generate_series(1, len({toks}) - {k - 1}), "
            f"i -> {joined}) END"
        )
    toks = f"split({norm}, ' ')"
    joined = ", ".join(f"element_at({toks}, CAST(i + {j} AS INT))" for j in range(k))
    return (
        f"CASE WHEN size({toks}) < {k} THEN CAST(array() AS ARRAY<STRING>) "
        f"ELSE transform(sequence(1, size({toks}) - {k - 1}), "
        f"i -> concat_ws(' ', {joined})) END"
    )


def minhash_exprs(shingles: str, dialect: str) -> dict[str, str]:
    """k salted 60-bit min-hashes over a shingle-array expression.
    Empty shingle set → NULL (doc too short to near-dup)."""
    out = {}
    for j in range(N_MINHASH):
        if dialect == "duckdb":
            h = sql_md5_60(f"concat('mh{j}:', s)")
            out[f"mh{j}"] = f"list_min(list_transform({shingles}, s -> {h}))"
        else:
            h = f"CAST(conv(substring(md5(concat('mh{j}:', s)), 1, 15), 16, 10) AS BIGINT)"
            out[f"mh{j}"] = f"array_min(transform({shingles}, s -> {h}))"
    return out


def band_exprs(dialect: str) -> dict[str, str]:
    """Band bucket keys: hash of the concatenated row hashes (2 per band)."""
    rows_per_band = N_MINHASH // N_BANDS
    out = {}
    cast_t = "VARCHAR" if dialect == "duckdb" else "STRING"
    for b in range(N_BANDS):
        parts = [f"CAST(mh{b * rows_per_band + r} AS {cast_t})"
                 for r in range(rows_per_band)]
        joined = "concat(" + ", ':', ".join(parts) + ")"
        if dialect == "duckdb":
            h = sql_md5_60(f"concat('b{b}:', {joined})")
        else:
            h = (
                f"CAST(conv(substring(md5(concat('b{b}:', {joined})), 1, 15), 16, 10) AS BIGINT)"
            )
        # Guard: null minhash (too-short doc) must yield null bucket in BOTH
        # dialects (Spark's concat_ws would silently skip nulls).
        out[f"band{b}"] = (
            f"CASE WHEN mh0 IS NULL THEN CAST(NULL AS BIGINT) ELSE {h} END"
        )
    return out


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Spark: id + mh0..mh{k-1} + band0..band{b-1} (all JVM-side exprs)."""
    sh = shingles_expr(text_col, "spark")
    out = df.select(id_col, *[F.expr(e).alias(n)
                              for n, e in minhash_exprs(sh, "spark").items()])
    for n, e in band_exprs("spark").items():
        out = out.withColumn(n, F.expr(e))
    return out


def sql_minhash_signatures(table: str, id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    sh = shingles_expr(text_col, "duckdb")
    mh = ",\n       ".join(f"{e} AS {n}"
                           for n, e in minhash_exprs(sh, "duckdb").items())
    bands = ",\n       ".join(f"{e} AS {n}" for n, e in band_exprs("duckdb").items())
    return (
        f"SELECT {id_col}, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7,\n"
        f"       {bands}\n"
        f"FROM (SELECT {id_col}, {mh} FROM {table})"
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Self-join per band on the bucket key → distinct candidate pairs a<b.
    Shuffles on the band hash (uniform by construction; no skew salting
    needed unless many identical docs — AQE skew-join covers that)."""
    pairs = None
    for b in range(N_BANDS):
        left = sigs.select(F.col(id_col).alias("a"), F.col(f"band{b}").alias("bk"))
        right = sigs.select(F.col(id_col).alias("b"), F.col(f"band{b}").alias("bk"))
        p = (
            left.join(right, "bk")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def sql_lsh_candidate_pairs(sigs_select: str) -> str:
    parts = []
    for b in range(N_BANDS):
        parts.append(
            f"SELECT l.doc_id AS a, r.doc_id AS b FROM sigs l "
            f"JOIN sigs r ON l.band{b} = r.band{b} AND l.doc_id < r.doc_id"
        )
    return (
        f"WITH sigs AS ({sigs_select})\n"
        f"SELECT DISTINCT a, b FROM (" + " UNION ALL ".join(parts) + ")"
    )
