"""Embedding similarity search (ANN) over an ``array<float>`` column.

Numeric strategy: components are quantized to exact integers
(round(x * 1e6) — float→double cast is exact, product/round deterministic
IEEE in both engines), so dot products and norms are EXACT integer sums —
order-independent, parallelizable, and bit-identical between Spark and the
DuckDB oracle. Cosine = dot / sqrt(na*nb) is then a single deterministic
double op.

Scale path:
- brute-force top-k: queries broadcast against the corpus (corpus stays
  partitioned; each task scores its slice; global top-k via
  per-partition top-k then merge — expressed as window rank, which AQE
  executes as partial top-k).
- LSH-bucketed: sign-bit bucket over leading dimensions → self-join within
  bucket only. (A full random-hyperplane LSH is the same plan with better
  buckets; sign-bits keep the oracle SQL-expressible.)
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .hashing import md5_60

DIM = 64
QUANT = 1000000.0


def _q(dialect: str, arr: str, i: str) -> str:
    """Quantized component i (1-based) of array expr."""
    if dialect == "duckdb":
        return f"round(CAST({arr}[{i}] AS DOUBLE) * {QUANT}, 0)"
    return f"round(CAST(element_at({arr}, {i}) AS DOUBLE) * {QUANT}, 0)"


def norm_sq_expr(arr: str, dialect: str) -> str:
    """Σ q_i² as exact double-held integers."""
    if dialect == "duckdb":
        comp = _q(dialect, arr, "i")
        return (
            f"list_sum(list_transform(generate_series(1, {DIM}), "
            f"i -> {comp} * {comp}))"
        )
    comp = _q("spark", arr, "CAST(i AS INT)")
    return (
        f"aggregate(sequence(1, {DIM}), CAST(0.0 AS DOUBLE), "
        f"(acc, i) -> acc + {comp} * {comp})"
    )


def dot_expr(a: str, b: str, dialect: str) -> str:
    if dialect == "duckdb":
        ca, cb = _q(dialect, a, "i"), _q(dialect, b, "i")
        return (
            f"list_sum(list_transform(generate_series(1, {DIM}), "
            f"i -> {ca} * {cb}))"
        )
    ca, cb = _q("spark", a, "CAST(i AS INT)"), _q("spark", b, "CAST(i AS INT)")
    return (
        f"aggregate(sequence(1, {DIM}), CAST(0.0 AS DOUBLE), "
        f"(acc, i) -> acc + {ca} * {cb})"
    )


def cosine_expr(a: str, b: str, dialect: str) -> str:
    dot = dot_expr(a, b, dialect)
    na, nb = norm_sq_expr(a, dialect), norm_sq_expr(b, dialect)
    return f"round(({dot}) / sqrt(({na}) * ({nb})), 6)"


# --- random-hyperplane LSH geometry -----------------------------------------
# Signed random projections (Charikar '02): bit_j = sign(<v, h_j>), banded
# OR-construction over N_LSH_BANDS bands of LSH_BITS_PER_BAND bits. At
# corpus scale the bucket count per band must grow with n — raise
# LSH_BITS_PER_BAND (16-24 for 10^9 vectors); 8 bits/band keeps the
# sandbox's sf0.01 buckets non-degenerate. Hyperplane components are ±1
# from a fixed LCG, embedded as SQL literals so Spark and the DuckDB
# oracle compute bit-identical buckets (dot products are exact-integer
# after the shared 1e6 quantization).
N_LSH_BANDS = 4
LSH_BITS_PER_BAND = 8


def _hyperplanes(n: int, dim: int = DIM, seed: int = 0x5EED) -> list[list[int]]:
    """n deterministic ±1 hyperplanes (LCG-derived, no numpy global
    state)."""
    state = seed & 0x7FFFFFFF
    out = []
    for _ in range(n):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            row.append(1 if (state >> 16) & 1 else -1)
        out.append(row)
    return out


def _dot_literal(qv: str, plane: list[int], dialect: str) -> str:
    """<quantized-vector, ±1 literal hyperplane> — exact integer sum held
    in doubles, identical in both engines."""
    lits = ", ".join(str(x) for x in plane)
    if dialect == "duckdb":
        return (
            f"list_sum(list_transform(generate_series(1, {len(plane)}), "
            f"i -> ({qv})[i] * ([{lits}])[i]))"
        )
    return (
        f"aggregate(zip_with({qv}, array({lits}), (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def rh_band_key_exprs(
    qv: str,
    dialect: str,
    n_bands: int = N_LSH_BANDS,
    bits_per_band: int = LSH_BITS_PER_BAND,
) -> list[str]:
    """One bucket-key expression per band over a QUANTIZED vector column:
    key = Σ_j (dot(qv, h_j) > 0) << j within the band's hyperplane group."""
    planes = _hyperplanes(n_bands * bits_per_band)
    out = []
    for b in range(n_bands):
        bits = []
        for j in range(bits_per_band):
            d = _dot_literal(qv, planes[b * bits_per_band + j], dialect)
            bits.append(f"(CASE WHEN ({d}) > 0 THEN {1 << j} ELSE 0 END)")
        out.append("CAST(" + " + ".join(bits) + " AS BIGINT)")
    return out


def quantized_with_norm(
    emb: DataFrame, id_col: str, vec_col: str, prefix: str
) -> DataFrame:
    """(id, quantized vector, norm²) — computed ONCE per row. The pairwise
    stages then do only the zip_with dot product: without this staging the
    quantization (64 round/cast ops) and both norms re-run per PAIR, an
    O(n·k·dim) → O((n+k)·dim) fix that matters enormously when one corpus
    row is scored against many queries."""
    qvec = F.expr(
        f"transform({vec_col}, x -> round(CAST(x AS DOUBLE) * {QUANT}, 0))"
    )
    out = emb.select(
        F.col(id_col).alias(f"{prefix}_id"), qvec.alias(f"{prefix}_q")
    )
    norm = F.expr(
        f"aggregate({prefix}_q, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v)"
    )
    return out.withColumn(f"{prefix}_norm", norm)


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors for each query id (excluding self).

    The query side is a handful of rows → broadcast; the corpus side never
    shuffles until the final (tiny) top-k rank. Quantization and norms are
    per-row columns (see quantized_with_norm); the per-pair work is one
    zip_with dot product."""
    queries = quantized_with_norm(
        emb.filter(F.col(id_col).isin(query_ids)), id_col, vec_col, "q"
    )
    corpus = quantized_with_norm(emb, id_col, vec_col, "n")
    cosine = F.round(
        _dot("q_q", "n_q") / F.sqrt(F.col("q_norm") * F.col("n_norm")), 6
    )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cosine", cosine)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cosine")
    )


def sql_brute_force_topk(table: str, query_ids: list[int], k: int = 10) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos = cosine_expr("q.embedding", "n.embedding", "duckdb")
    return f"""
WITH q AS (SELECT vec_id AS q_id, embedding FROM {table} WHERE vec_id IN ({ids})),
     n AS (SELECT vec_id AS n_id, embedding FROM {table}),
scored AS (
  SELECT q.q_id, n.n_id, {cos} AS cosine
  FROM q, n WHERE n.n_id <> q.q_id
)
SELECT q_id, n_id, rank, cosine FROM (
  SELECT q_id, n_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def lsh_bucketed_neighbors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    min_cosine: float = 0.0,
    n_bands: int = N_LSH_BANDS,
    bits_per_band: int = LSH_BITS_PER_BAND,
) -> DataFrame:
    """Near-neighbor candidate pairs from banded random-hyperplane LSH +
    their exact cosine (distinct pairs — a pair colliding in several bands
    is emitted once).

    Plan shape: quantize + hash once per row (map), stack band keys, self-
    join per (band, key) — the shuffle key is the band bucket, never the
    vector; per-band collision probability for angle θ is (1 - θ/π)^bits,
    so candidate volume is dialed by bits_per_band independent of corpus
    size (raise it as n grows)."""
    keys = rh_band_key_exprs("qv", "spark", n_bands, bits_per_band)
    base = emb.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({vec_col}, x -> round(CAST(x AS DOUBLE) * {QUANT}, 0))"
        ).alias("qv"),
    ).withColumn(
        "norm",
        F.expr("aggregate(qv, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v)"),
    )
    stack_args = ", ".join(f"{b}, {k}" for b, k in enumerate(keys))
    # persist: both self-join sides read the hashed relation; without the
    # cache each side reruns the 32 hyperplane dot products per row
    banded = base.select(
        "id", "qv", "norm",
        F.expr(f"stack({n_bands}, {stack_args}) AS (band, bk)"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    left = banded.select(F.col("id").alias("a"), F.col("qv").alias("qa"),
                         F.col("norm").alias("na"), "band", "bk")
    right = banded.select(F.col("id").alias("b"), F.col("qv").alias("qb"),
                          F.col("norm").alias("nb"), "band", "bk")
    cosine = F.round(
        _dot("qa", "qb") / F.sqrt(F.col("na") * F.col("nb")), 6
    )
    return (
        left.join(right, ["band", "bk"])
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= min_cosine)
        .select("a", "b", "cosine")
        .distinct()
    )


N_IVF_CELLS = 16
N_PROBE = 4


def ivf_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = N_IVF_CELLS,
) -> DataFrame:
    """Deterministic hash-sampled centroids: the ``n_cells`` vectors with
    the smallest md5-60 of 'ivf:<id>' — an unbiased uniform sample that the
    DuckDB oracle reproduces exactly (ORDER BY hash LIMIT n). This is the
    standard sample-initialization of IVF without the k-means refinement
    (centroid *quality* is orthogonal to the distributed plan: either way
    the centroid table is tiny, broadcast, and the corpus is assigned in
    one map pass; swap in k-means|| output for production recall)."""
    h = md5_60(F.concat(F.lit("ivf:"), F.col(id_col).cast("string")))
    return (
        emb.select(id_col, vec_col)
        .withColumn("__h", h)
        .orderBy("__h", id_col)
        .limit(n_cells)
        .drop("__h")
    )


def ivf_assign(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = N_IVF_CELLS,
    cents_q: DataFrame | None = None,
) -> DataFrame:
    """IVF cell assignment: nearest of ``n_cells`` centroids by cosine —
    tiny broadcast cross join + per-row argmax, no shuffle of the corpus.
    ``cents_q``: pre-quantized centroids (prefix 'c') to reuse across
    stages; computed here when absent."""
    cents = cents_q if cents_q is not None else quantized_with_norm(
        ivf_centroids(emb, id_col, vec_col, n_cells), id_col, vec_col, "c"
    )
    vecs = quantized_with_norm(emb, id_col, vec_col, "v")
    cos = F.round(
        _dot("v_q", "c_q") / F.sqrt(F.col("v_norm") * F.col("c_norm")), 6
    )
    scored = vecs.crossJoin(F.broadcast(cents)).withColumn("c_cos", cos)
    w = Window.partitionBy("v_id").orderBy(F.desc("c_cos"), F.asc("c_id"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= 1)
        .select(
            F.col("v_id").alias(id_col),
            F.col("c_id").alias("ivf_cell"),
            "v_q",
            "v_norm",
        )
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = N_IVF_CELLS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF search: probe the ``n_probe`` nearest cells per query, brute-
    force only within them. The corpus is scanned once for assignment; the
    scored join touches ~n_probe/n_cells of the corpus per query — the
    recall/throughput dial of a classic IVF index (size n_cells ~ sqrt(n)
    at scale; tests/test_similarity.py pins recall >= 0.9 vs brute force
    at this default dial)."""
    # centroid selection is a full-corpus hash + top-N — compute/persist it
    # ONCE and feed both the assignment and the query-probe stages
    cents = quantized_with_norm(
        ivf_centroids(emb, id_col, vec_col, n_cells), id_col, vec_col, "c"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    assigned = ivf_assign(emb, id_col, vec_col, n_cells, cents_q=cents)
    queries = quantized_with_norm(
        emb.filter(F.col(id_col).isin(query_ids)), id_col, vec_col, "q"
    )
    qcos = F.round(
        _dot("q_q", "c_q") / F.sqrt(F.col("q_norm") * F.col("c_norm")), 6
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("__qc"), F.asc("c_id"))
    probe = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("__qc", qcos)
        .withColumn("__rk", F.row_number().over(wq))
        .filter(F.col("__rk") <= n_probe)
        .select("q_id", "q_q", "q_norm", F.col("c_id").alias("ivf_cell"))
    )
    cand = assigned.join(
        F.broadcast(probe), "ivf_cell"
    ).filter(F.col(id_col) != F.col("q_id"))
    cos = F.round(
        _dot("q_q", "v_q") / F.sqrt(F.col("q_norm") * F.col("v_norm")), 6
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col(id_col).alias("n_id"), "rank", "cosine")
    )


def _sql_cos(a: str, b: str) -> str:
    return cosine_expr(a, b, "duckdb")


def sql_ivf_topk(
    table: str,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = N_IVF_CELLS,
    n_probe: int = N_PROBE,
) -> str:
    from .hashing import sql_md5_60

    ids = ", ".join(str(i) for i in query_ids)
    assign_cos = _sql_cos("v.embedding", "c.embedding")
    q_cos = _sql_cos("q.embedding", "c.embedding")
    pair_cos = _sql_cos("q.embedding", "v.embedding")
    cent_hash = sql_md5_60("concat('ivf:', CAST(vec_id AS VARCHAR))")
    return f"""
WITH cents AS (SELECT vec_id AS c_id, embedding FROM {table}
               ORDER BY {cent_hash}, vec_id LIMIT {n_cells}),
assigned AS (
  SELECT vec_id, c_id AS ivf_cell FROM (
    SELECT v.vec_id, c.c_id, {assign_cos} AS cc,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {assign_cos} DESC, c.c_id ASC) AS rk
    FROM {table} v, cents c) WHERE rk <= 1),
probe AS (
  SELECT q_id, c_id AS ivf_cell FROM (
    SELECT q.vec_id AS q_id, c.c_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {q_cos} DESC, c.c_id ASC) AS rk
    FROM {table} q, cents c WHERE q.vec_id IN ({ids}))
  WHERE rk <= {n_probe}),
cand AS (
  SELECT p.q_id, a.vec_id AS n_id
  FROM probe p JOIN assigned a ON a.ivf_cell = p.ivf_cell
  WHERE a.vec_id <> p.q_id)
SELECT q_id, n_id, rank, cosine FROM (
  SELECT cand.q_id, cand.n_id, {pair_cos} AS cosine,
         row_number() OVER (PARTITION BY cand.q_id
                            ORDER BY {pair_cos} DESC, cand.n_id ASC) AS rank
  FROM cand
  JOIN {table} q ON q.vec_id = cand.q_id
  JOIN {table} v ON v.vec_id = cand.n_id
) WHERE rank <= {k}
"""


def sql_lsh_bucketed_neighbors(
    table: str,
    min_cosine: float = 0.0,
    n_bands: int = N_LSH_BANDS,
    bits_per_band: int = LSH_BITS_PER_BAND,
) -> str:
    keys = rh_band_key_exprs("qv", "duckdb", n_bands, bits_per_band)
    band_ids = ", ".join(str(b) for b in range(n_bands))
    band_keys = ", ".join(keys)
    cos = cosine_expr("l.embedding", "r.embedding", "duckdb")
    return f"""
WITH q AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
                        x -> round(CAST(x AS DOUBLE) * {QUANT}, 0)) AS qv
  FROM {table}),
banded AS (
  SELECT vec_id, embedding, band, bk FROM (
    SELECT vec_id, embedding,
           unnest([{band_ids}]) AS band,
           unnest([{band_keys}]) AS bk
    FROM q))
SELECT DISTINCT l.vec_id AS a, r.vec_id AS b, {cos} AS cosine
FROM banded l JOIN banded r ON l.band = r.band AND l.bk = r.bk
  AND l.vec_id < r.vec_id
WHERE {cos} >= {min_cosine}
"""


def cosine_dedup(
    emb: DataFrame,
    threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = N_LSH_BANDS,
    bits_per_band: int = LSH_BITS_PER_BAND,
) -> DataFrame:
    """Embedding-cosine near-duplicate dedup: one row per vector with a
    keep/drop verdict. A vector is DROPPED when any lower-id vector
    collides with it in an LSH band at cosine >= threshold; the lowest id
    in each near-dup neighborhood survives as the representative
    (``dup_of`` = the smallest such neighbor, NULL for kept rows).

    Greedy min-id, not transitive closure: exact connected components need
    an iterative join loop; the single-pass greedy rule is deterministic,
    order-independent (min/max aggregates), and is what production
    embedding-dedup pipelines run at corpus scale. Plan: the banded LSH
    self-join from lsh_bucketed_neighbors (shuffle key = band bucket, no
    all-pairs), then one groupBy(b) aggregation — candidate volume, not
    corpus size, drives the extra cost. The verdict join back to the
    corpus is a plain hash join on the id."""
    pairs = lsh_bucketed_neighbors(
        emb, min_cosine=threshold, id_col=id_col, vec_col=vec_col,
        n_bands=n_bands, bits_per_band=bits_per_band,
    )
    dup = pairs.groupBy(F.col("b").alias(id_col)).agg(
        F.min("a").alias("dup_of"),
        F.max("cosine").alias("max_cosine"),
        F.count(F.lit(1)).alias("n_near"),
    )
    return (
        emb.select(id_col)
        .join(dup, id_col, "left")
        .select(
            id_col,
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
            "max_cosine",
            F.coalesce("n_near", F.lit(0)).alias("n_near"),
        )
    )


def sql_cosine_dedup(
    table: str,
    threshold: float = 0.25,
    n_bands: int = N_LSH_BANDS,
    bits_per_band: int = LSH_BITS_PER_BAND,
) -> str:
    pairs = sql_lsh_bucketed_neighbors(table, threshold, n_bands, bits_per_band)
    return f"""
WITH dup AS (
  SELECT b AS vec_id, min(a) AS dup_of, max(cosine) AS max_cosine,
         count(*) AS n_near
  FROM ({pairs}) pairs
  GROUP BY b)
SELECT e.vec_id, dup.vec_id IS NULL AS kept, dup.dup_of, dup.max_cosine,
       coalesce(dup.n_near, 0) AS n_near
FROM {table} e LEFT JOIN dup ON e.vec_id = dup.vec_id
"""


# ---------------------------------------------------------------------------
# label-centroid similarity matrix (corpus-geometry report)
# ---------------------------------------------------------------------------

# element quantization reuses the module's ONE micros contract (QUANT)
CENTROID_QUANT = QUANT


def label_centroid_similarity(emb: DataFrame) -> DataFrame:
    """Pairwise similarity of per-label centroid directions — the
    corpus-geometry report (how separated are the clusters / language
    groups in embedding space?) that steers diversity-aware selection.

    Exact-integer formulation so the value-hash oracle can check it:
    each element is quantized to integer micros FIRST (round of an
    identical IEEE double product — engine-identical), centroids are the
    per-(label, dim) integer SUMS (cosine of the sum equals cosine of
    the mean, so no division ever happens), and the output is
    (dot, norm_sq_a, norm_sq_b) as exact BIGINTs — the reader applies
    sqrt, the engine never does. Magnitudes: |q| <= ~2^21 per element,
    ~2^28 per centroid dim at 10^4 vectors/label, dot over 64 dims
    < 2^62 — inside BIGINT until ~10^6 vectors/label, after which the
    quantization dial (CENTROID_QUANT) scales down.

    Scale shape: ONE corpus exchange (the (label, dim) sum aggregate
    with map-side partials; out-cardinality = labels x dims). That tiny
    relation is ``localCheckpoint``'d — it is referenced THREE times
    (self-join both sides + norms) and Catalyst re-plans shared
    DataFrames per reference, which would re-scan the corpus three
    times (the components.py edge-list rationale). Everything after the
    checkpoint is dimension-table work."""
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(
            x.cast("double") * F.lit(CENTROID_QUANT)
        ).cast("bigint"),
    )
    s = (
        emb.select("label", F.posexplode(q).alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.sum("v").alias("s"))
        .localCheckpoint(eager=True)
    )
    norms = s.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).cast("bigint").alias("norm_sq")
    )
    a, b = s.alias("a"), s.alias("b")
    dots = (
        a.join(b, (F.col("a.dim") == F.col("b.dim"))
               & (F.col("a.label") < F.col("b.label")))
        .groupBy(F.col("a.label").alias("label_a"),
                 F.col("b.label").alias("label_b"))
        .agg(F.sum(F.col("a.s") * F.col("b.s")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("label").alias("label_a"),
                      F.col("norm_sq").alias("norm_sq_a"))
    nb = norms.select(F.col("label").alias("label_b"),
                      F.col("norm_sq").alias("norm_sq_b"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select("label_a", "label_b", "dot", "norm_sq_a", "norm_sq_b")
    )


def sql_label_centroid_similarity(table: str = "embeddings") -> str:
    """DuckDB twin of :func:`label_centroid_similarity` (lateral
    unnest(range) + 1-based indexing for the positional explode; the
    quantized product is the same widened-float IEEE double both
    engines round identically)."""
    return f"""
WITH e AS (SELECT label, embedding AS emb FROM {table}),
q AS (
  SELECT label, t.d AS dim,
         CAST(round(CAST(emb[CAST(t.d + 1 AS INT)] AS DOUBLE)
                    * {CENTROID_QUANT!r}) AS BIGINT) AS v
  FROM e, unnest(range(0, len(emb))) AS t(d)),
s AS (SELECT label, dim, CAST(sum(v) AS BIGINT) AS s
      FROM q GROUP BY label, dim),
norms AS (SELECT label, CAST(sum(s * s) AS BIGINT) AS norm_sq
          FROM s GROUP BY label),
dots AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(sum(a.s * b.s) AS BIGINT) AS dot
  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label)
SELECT label_a, label_b, dot,
       na.norm_sq AS norm_sq_a, nb.norm_sq AS norm_sq_b
FROM dots
JOIN norms na ON na.label = dots.label_a
JOIN norms nb ON nb.label = dots.label_b
"""
