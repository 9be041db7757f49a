"""Partitioned URL-seen set: bloom-filter pre-filter + exact anti-join,
with a cuckoo-filter fallback where deletions are needed (north rule).

Design for 10^10 URLs (SURVEY.md §4.3):

- The bitset is **partitioned by hash range**: ``part_id = pmod(xxhash64(url),
  n_parts)``. Each partition owns an independent bloom filter over only its
  keys, stored as one ``binary`` row. At 1% fpp, 10^10 keys need ~12 GB of
  bitset total — partitioned over e.g. 4096 parts that is ~3 MB per task,
  loaded only by the task probing that hash range. The preferred probe
  (:func:`probe_bloom_jvm`) re-encodes each slice as ``array<bigint>``
  words and tests membership in pure whole-stage-codegen arithmetic —
  broadcast-joined (shuffle-free) for filter sets within the broadcast
  budget, hash-range shuffle-hash join beyond it, with ZERO rows crossing
  the Python boundary. Arrow fallbacks (cogrouped ``applyInArrow`` /
  broadcast ``mapInArrow``) remain for non-power-of-two geometries.
- Membership math is double hashing (Kirsch-Mitzenmacher): bit index
  ``(h1 + i*h2) mod m`` for i in 0..k-1, fully vectorized in numpy over the
  Arrow batch — no per-row Python (input_hint).
- The bloom answer is only "definitely new" vs "maybe seen". Rows flagged
  maybe-seen go through an **exact** ``left_anti`` join against the seen-URL
  table; definitely-new rows skip that shuffle entirely. On a real crawl
  the overwhelming majority of candidate URLs are re-discoveries of seen
  URLs or brand-new — the bloom collapses the anti-join's probe side to the
  (small) maybe set, which is what makes the 10^10-row anti-join cheap.
- Deletions (e.g. recrawl-after-TTL) can't come out of a bloom filter; the
  :class:`CuckooFilter` variant supports ``delete`` and serializes to the
  same per-partition ``binary`` row layout.

The reference has no URL-seen set at all (it re-reads whatever segment the
config names, /root/reference/main.py:85-87); this module is the frontier
extension mandated by BASELINE.json's north rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..plans.barrier import with_barrier_columns

# canonical hash-range partition count for the URL-seen set — every state
# producer/consumer (batch crawl rounds, streaming dedup state, bench jobs)
# must agree on this or probe against the wrong bitset slice
N_PARTS = 64

BLOOM_SCHEMA = StructType(
    [
        StructField("part_id", IntegerType(), False),
        StructField("bits", BinaryType(), False),
        StructField("n_bits", LongType(), False),
        StructField("n_hashes", IntegerType(), False),
        StructField("n_keys", LongType(), False),
    ]
)


def with_url_hashes(
    df: DataFrame, url_col: str = "url_canon", n_parts: int = 64
) -> DataFrame:
    """Attach (h1, h2, part_id) 64-bit hash columns, JVM-side (xxhash64 in
    whole-stage codegen — pure map, no shuffle)."""
    h1 = F.xxhash64(F.col(url_col))
    h2 = F.xxhash64(F.col(url_col), F.lit(1))
    return (
        df.withColumn("h1", h1)
        .withColumn("h2", h2)
        .withColumn("part_id", F.pmod(h1, F.lit(n_parts)).cast("int"))
    )


def _bit_indices(h1: np.ndarray, h2: np.ndarray, i: int, n_bits: int) -> np.ndarray:
    # uint64 wraparound arithmetic is well-defined; mod brings it into range
    return ((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64)


def _u64_col(tbl: pa.Table, name: str) -> np.ndarray:
    """Near-zero-copy view of a non-null int64 Arrow column as uint64
    (copies only when the column arrived in multiple chunks). Nulls are
    rejected loudly: pyarrow would otherwise convert the whole batch to
    float64 (NaN for nulls) and the uint64 reinterpretation would corrupt
    every hash in the batch — a silent bloom false-negative factory."""
    col = tbl.column(name)
    if col.null_count:
        raise ValueError(
            f"_u64_col: column {name!r} has {col.null_count} null(s) — "
            "hash columns must be non-null (null url_canon upstream?)"
        )
    return col.combine_chunks().to_numpy(zero_copy_only=False).view(np.uint64)


def build_bloom(
    hashed: DataFrame, n_bits_per_part: int = 1 << 20, n_hashes: int = 7
) -> DataFrame:
    """Per-partition bloom filters from a hashed URL DataFrame.

    ``n_bits_per_part`` default (1 Mi bits = 128 KiB) holds ~100k keys/part
    at ~1% fpp; size up with key count (m ≈ 9.6 n for 1% fpp).

    Arrow-native (``applyInArrow``): the grouped exchange carries only
    ``(part_id, h1, h2)`` — 20 bytes/row instead of full URL rows — and the
    hash columns reach numpy as zero-copy views of the Arrow buffers; no
    pandas conversion, no Python string objects.
    """
    n_bytes = (n_bits_per_part + 7) // 8

    def _build(tbl: pa.Table) -> pa.Table:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        h1 = _u64_col(tbl, "h1")
        h2 = _u64_col(tbl, "h2")
        for i in range(n_hashes):
            idx = _bit_indices(h1, h2, i, n_bits_per_part)
            np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        return pa.table(
            {
                "part_id": pa.array(
                    [tbl.column("part_id")[0].as_py()], type=pa.int32()
                ),
                "bits": pa.array([bits.tobytes()], type=pa.binary()),
                "n_bits": pa.array([n_bits_per_part], type=pa.int64()),
                "n_hashes": pa.array([n_hashes], type=pa.int32()),
                "n_keys": pa.array([tbl.num_rows], type=pa.int64()),
            }
        )

    return (
        hashed.select("part_id", "h1", "h2")
        .groupBy("part_id")
        .applyInArrow(_build, BLOOM_SCHEMA)
    )


def merge_bloom(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two compatible per-partition filter sets (e.g. snapshot + delta).
    Bloom filters of identical geometry merge by bitwise OR."""

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["n_bits"].nunique() > 1 or pdf["n_hashes"].nunique() > 1:
            raise ValueError(
                "merge_bloom: incompatible filter geometries in part "
                f"{int(pdf['part_id'].iloc[0])}: n_bits={set(pdf['n_bits'])} "
                f"n_hashes={set(pdf['n_hashes'])} — merging filters with "
                "different geometry would create false negatives"
            )
        arrs = [np.frombuffer(x, dtype=np.uint8) for x in pdf["bits"]]
        merged = arrs[0].copy()
        for x in arrs[1:]:
            merged |= x
        return pd.DataFrame(
            {
                "part_id": [int(pdf["part_id"].iloc[0])],
                "bits": [merged.tobytes()],
                "n_bits": [int(pdf["n_bits"].iloc[0])],
                "n_hashes": [int(pdf["n_hashes"].iloc[0])],
                "n_keys": [int(pdf["n_keys"].sum())],  # upper bound
            }
        )

    return a.unionByName(b).groupBy("part_id").applyInPandas(_merge, BLOOM_SCHEMA)


def bloom_stats(bloom: DataFrame) -> DataFrame:
    """Per-partition filter health: (part_id, n_keys, fill_ratio, est_fpp).

    ``est_fpp = fill_ratio ** n_hashes`` (probability all k probed bits are
    set). Surfaced into each round's metrics snapshot so operators see the
    seen-set saturating BEFORE false positives start silently dropping
    genuinely-new URLs — the signal to re-shard with more/bigger
    partitions."""

    def _stats(batches):
        for pdf in batches:
            rows = []
            for part_id, bits, n_bits, n_hashes, n_keys in zip(
                pdf["part_id"], pdf["bits"], pdf["n_bits"],
                pdf["n_hashes"], pdf["n_keys"],
            ):
                arr = np.frombuffer(bits, dtype=np.uint8)
                fill = float(np.unpackbits(arr).sum()) / float(n_bits)
                rows.append(
                    (int(part_id), int(n_keys), fill, fill ** int(n_hashes))
                )
            yield pd.DataFrame(
                rows,
                columns=["part_id", "n_keys", "fill_ratio", "est_fpp"],
            )

    return bloom.mapInPandas(
        _stats,
        "part_id int, n_keys long, fill_ratio double, est_fpp double",
    )


def _probe_hashes(
    bits: np.ndarray, n_bits: int, n_hashes: int,
    h1: np.ndarray, h2: np.ndarray,
) -> np.ndarray:
    """Vectorized membership test of (h1, h2) key batches against one
    bitset slice; shared by the cogroup and broadcast probe paths."""
    hit = np.ones(h1.size, dtype=bool)
    for i in range(n_hashes):
        idx = _bit_indices(h1, h2, i, n_bits)
        hit &= (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
    return hit


def collect_bloom(bloom: DataFrame) -> dict[int, tuple[bytes, int, int]]:
    """Driver-side collect of a per-partition filter set:
    ``{part_id: (bits, n_bits, n_hashes)}`` for broadcast probing.
    Refuses unmerged snapshot+delta inputs (two rows per part) the same
    way probe_bloom does — probing one row would lose the other's keys."""
    out: dict[int, tuple[bytes, int, int]] = {}
    for r in bloom.select("part_id", "bits", "n_bits", "n_hashes").collect():
        p = int(r["part_id"])
        if p in out:
            raise ValueError(
                f"collect_bloom: multiple filter rows for part_id {p} — "
                "merge_bloom snapshot and delta first"
            )
        out[p] = (bytes(r["bits"]), int(r["n_bits"]), int(r["n_hashes"]))
    return out


def _dedupe_min_struct(
    flagged: DataFrame, dedupe_on: str, cols: list[str]
) -> DataFrame:
    """Post-probe dedup for the map/join probe paths (broadcast + jvm):
    a JVM hash aggregate keeping the deterministic ``min(struct(...))``
    row per key — the same survivor the cogroup path's full-row sort
    keeps. ``h1``/``h2`` are pure functions of ``dedupe_on``
    (with_url_hashes contract), so they are dropped before the exchange
    and recomputed after it; being group-constant they can never decide
    the struct-min comparison, so the elected survivor is unchanged."""
    hash_cols = [c for c in ("h1", "h2") if c in cols]
    others = [
        c for c in flagged.columns if c != dedupe_on and c not in hash_cols
    ]
    agged = (
        flagged.drop(*hash_cols)
        .groupBy(dedupe_on)
        .agg(F.min(F.struct(*[F.col(c) for c in others])).alias("__rest"))
        .select(dedupe_on, "__rest.*")
    )
    if hash_cols:
        # identical recipe to with_url_hashes — group-constant, so exact
        agged = agged.withColumn("h1", F.xxhash64(F.col(dedupe_on)))
        agged = agged.withColumn(
            "h2", F.xxhash64(F.col(dedupe_on), F.lit(1))
        )
    return agged.select(*cols, "maybe_seen")


def probe_bloom_broadcast(
    candidates: DataFrame,
    bloom: DataFrame,
    dedupe_on: str | None = None,
) -> DataFrame:
    """Broadcast-map variant of :func:`probe_bloom`: the whole per-partition
    filter set is collected once, broadcast to executors, and probed in a
    fused ``mapInArrow`` — a pure map stage, NO exchange. Catalyst fuses it
    with the upstream canonicalize/hash projections, so the probe adds zero
    shuffle to the round.

    Scale boundary: broadcast is for filters that fit an executor-memory
    budget — at 1% fpp that is ~2x10^8 keys per 256 MB. A 10^10-key set
    (~12 GB of bitset) must keep the cogrouped :func:`probe_bloom`, where
    each task loads only its ~3 MB hash-range slice.
    :func:`filter_unseen` picks the path automatically from the filter's
    metadata (``probe_mode="auto"``).

    ``dedupe_on``: in the cogroup variant dedup rides the probe's own
    shuffle; a map-only probe has no shuffle to ride, so dedup here is a
    JVM hash aggregate AFTER the probe — the probe stays fused with the
    upstream canonicalize/hash map stage, map-side partial aggregation
    collapses duplicates early, and ``min(struct(...))`` keeps the
    deterministic smallest row per key (the cogroup path keeps the same
    row: it sorts by dedupe_on plus every other column in schema order
    and takes the first occurrence). Shuffle-byte discipline: ``h1``/``h2``
    are pure functions of ``dedupe_on`` (with_url_hashes contract — dedup
    key IS the hashed column), so they are dropped before the exchange and
    recomputed after it — 16 fewer bytes per row through the round's one
    big shuffle; being group-constant they can never decide the struct-min
    comparison, so the elected survivor row is unchanged."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(collect_bloom(bloom))

    cols = candidates.columns

    out_schema = StructType(
        candidates.schema.fields + [StructField("maybe_seen", BooleanType(), False)]
    )

    def _probe_batches(batches):
        parts = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([batch]).combine_chunks()
            pid = tbl.column("part_id").combine_chunks().to_numpy(
                zero_copy_only=False
            )
            h1 = _u64_col(tbl, "h1")
            h2 = _u64_col(tbl, "h2")
            hit = np.zeros(tbl.num_rows, dtype=bool)
            for p in np.unique(pid):
                ent = parts.get(int(p))
                if ent is None:
                    continue  # no keys ever inserted in this hash range
                mask = pid == p
                hit[mask] = _probe_hashes(
                    np.frombuffer(ent[0], dtype=np.uint8),
                    ent[1], ent[2], h1[mask], h2[mask],
                )
            out = tbl.append_column("maybe_seen", pa.array(hit, type=pa.bool_()))
            yield from out.to_batches()

    flagged = candidates.mapInArrow(_probe_batches, out_schema)
    if dedupe_on is None:
        return flagged
    return _dedupe_min_struct(flagged, dedupe_on, cols)


def probe_bloom(
    candidates: DataFrame,
    bloom: DataFrame,
    dedupe_on: str | None = None,
) -> DataFrame:
    """Flag each candidate row ``maybe_seen`` by probing its partition's
    filter. Cogrouped on ``part_id`` so each task touches exactly one bitset
    slice — the pattern that scales to a partitioned 10^10-key set.

    ``candidates`` must carry (h1, h2, part_id) from :func:`with_url_hashes`.
    Output = candidate columns + ``maybe_seen`` boolean.

    ``dedupe_on``: optionally drop duplicate candidates by this column
    inside the cogroup (keeps the lexicographically minimal row per key —
    sorted by ``dedupe_on`` then every other column, so the survivor is
    deterministic under retries and identical to broadcast-mode's
    ``min(struct(...))``). A URL's partition is a function of the URL, so
    per-partition dedup IS global dedup — and it rides the shuffle the
    cogroup needs anyway, saving the separate dropDuplicates exchange.

    Arrow-native (``applyInArrow``): candidate rows cross the Python
    boundary as Arrow buffers and come back the same way — URL strings are
    never materialized as Python/pandas objects, the hash columns feed
    numpy as zero-copy views, and the output appends one boolean column to
    the input table. This matters because the probe's cost at scale is
    pure memory bandwidth across the Arrow boundary; cutting the
    pandas<->Arrow conversion roughly halves the bytes touched per row
    (BASELINE.md stage diagnosis: the probe is the weakest-scaling stage).
    """
    out_schema = StructType(
        candidates.schema.fields + [StructField("maybe_seen", BooleanType(), False)]
    )

    def _probe(cand: pa.Table, filt: pa.Table) -> pa.Table:
        if dedupe_on is not None and cand.num_rows > 1:
            # sort by ALL columns (dedupe_on first, rest in schema order):
            # the surviving first row per key is then the lexicographically
            # minimal row — the same row broadcast-mode's min(struct(...))
            # keeps, and deterministic under task retries (a dedupe_on-only
            # sort would keep an arbitrary arrival-order companion when
            # duplicate keys carry differing other columns)
            keys = [dedupe_on] + [
                c for c in cand.column_names if c != dedupe_on
            ]
            cand = cand.sort_by(
                [(c, "ascending") for c in keys]
            ).combine_chunks()
            col = cand.column(dedupe_on)
            keep = np.ones(cand.num_rows, dtype=bool)
            # first occurrence of each run in the sorted column survives
            neq = pc.fill_null(
                pc.not_equal(col.slice(1), col.slice(0, cand.num_rows - 1)),
                True,
            ).combine_chunks()
            keep[1:] = neq.to_numpy(zero_copy_only=False)
            cand = cand.filter(pa.array(keep))
        cand = cand.combine_chunks()
        if filt.num_rows == 0 or cand.num_rows == 0:
            hit = np.zeros(cand.num_rows, dtype=bool)
        elif filt.num_rows > 1:
            raise ValueError(
                f"probe_bloom: {filt.num_rows} filter rows for part_id "
                f"{filt.column('part_id')[0].as_py()} — merge_bloom snapshot "
                "and delta first (probing one row would silently lose the "
                "other rows' keys)"
            )
        else:
            hit = _probe_hashes(
                np.frombuffer(filt.column("bits")[0].as_buffer(), dtype=np.uint8),
                filt.column("n_bits")[0].as_py(),
                filt.column("n_hashes")[0].as_py(),
                _u64_col(cand, "h1"),
                _u64_col(cand, "h2"),
            )
        return cand.append_column(
            "maybe_seen", pa.array(hit, type=pa.bool_())
        )

    return (
        candidates.groupBy("part_id")
        .cogroup(bloom.groupBy("part_id"))
        .applyInArrow(_probe, out_schema)
    )


WORDS_SCHEMA = StructType(
    [
        StructField("part_id", IntegerType(), False),
        StructField("words", ArrayType(LongType(), False), False),
        StructField("n_bits", LongType(), False),
        StructField("n_hashes", IntegerType(), False),
    ]
)


def bloom_words(bloom: DataFrame) -> DataFrame:
    """Per-partition bitsets re-encoded as ``array<bigint>`` words for the
    JVM probe: ``words[j]`` is the little-endian int64 view of bytes
    ``8j..8j+7`` of the bitset, so bit ``idx`` lives in word ``idx >> 6``
    at in-word position ``idx & 63`` — exactly the layout numpy's
    ``bits[idx >> 3] |= 1 << (idx & 7)`` writes. Multiple rows per part
    (snapshot + delta) are OR-merged here, riding the same grouped
    exchange — the jvm probe therefore never needs a separate
    ``merge_bloom`` pass."""

    def _conv(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["n_bits"].nunique() > 1 or pdf["n_hashes"].nunique() > 1:
            raise ValueError(
                "bloom_words: incompatible filter geometries in part "
                f"{int(pdf['part_id'].iloc[0])}: n_bits={set(pdf['n_bits'])} "
                f"n_hashes={set(pdf['n_hashes'])} — merging filters with "
                "different geometry would create false negatives"
            )
        n_bits = int(pdf["n_bits"].iloc[0])
        if n_bits % 64:
            raise ValueError(
                f"bloom_words: n_bits={n_bits} is not a multiple of 64 — "
                "the word encoding requires whole int64 words"
            )
        arrs = [np.frombuffer(x, dtype=np.uint8) for x in pdf["bits"]]
        merged = arrs[0].copy()
        for x in arrs[1:]:
            merged |= x
        words = np.frombuffer(merged.tobytes(), dtype="<i8")
        return pd.DataFrame(
            {
                "part_id": [int(pdf["part_id"].iloc[0])],
                "words": [words],
                "n_bits": [n_bits],
                "n_hashes": [int(pdf["n_hashes"].iloc[0])],
            }
        )

    return bloom.groupBy("part_id").applyInPandas(_conv, WORDS_SCHEMA)


def _bloom_hit_expr(n_bits: int, n_hashes: int, words_col: str):
    """Whole-stage-codegen membership test against a joined ``words``
    column — the same double-hashing bits :func:`_probe_hashes` probes,
    as pure JVM integer arithmetic (zero Python boundary).

    ANSI-safe wraparound: numpy computes ``(h1 + i*h2) mod 2^64 mod m``
    in uint64; for power-of-two ``m`` that equals
    ``((h1 & (m-1)) + i*(h2 & (m-1))) & (m-1)`` with intermediates
    ≤ (m-1)·k — no int64 overflow, so the expression is exact under
    ANSI mode (Spark 4 default) where a raw ``h1 + i*h2`` would throw
    ARITHMETIC_OVERFLOW. A missing partition row (NULL ``words``) probes
    NULL through ``element_at`` and coalesces to false: definitely new."""
    if n_bits & (n_bits - 1):
        raise ValueError(
            f"_bloom_hit_expr: n_bits={n_bits} must be a power of two — "
            "uint64 modulo by a non-power-of-two cannot be reproduced "
            "exactly in signed JVM arithmetic; use the cogroup probe"
        )
    mask = n_bits - 1
    terms = []
    for i in range(n_hashes):
        idx = f"(((h1 & {mask}) + {i} * (h2 & {mask})) & {mask})"
        word = (
            f"element_at({words_col}, "
            f"cast(shiftright({idx}, 6) as int) + 1)"
        )
        terms.append(
            f"((shiftright({word}, cast(({idx} & 63) as int)) & 1) = 1)"
        )
    return F.coalesce(F.expr(" AND ".join(terms)), F.lit(False))


def probe_bloom_jvm(
    candidates: DataFrame,
    bloom: DataFrame,
    dedupe_on: str | None = None,
    broadcast: bool | None = None,
    broadcast_max_bytes: int = 256 << 20,
    geometry: tuple[int, int, int] | None = None,
) -> DataFrame:
    """Fully JVM-side bloom probe: bitset slices re-encoded as
    ``array<bigint>`` words (:func:`bloom_words`), joined to candidates on
    ``part_id``, membership tested by :func:`_bloom_hit_expr` inside
    whole-stage codegen. No Python/Arrow boundary in the probe itself —
    BASELINE.md's stage diagnosis measured the Arrow cogroup probe as the
    round's weakest-scaling stage (0.74: per-batch serialization is
    bandwidth on the shared bus), and this path removes that boundary
    entirely.

    Join strategy is the scale dial: for filter sets within
    ``broadcast_max_bytes`` the words side is broadcast — the probe fuses
    into the upstream map stage, zero exchange, like
    :func:`probe_bloom_broadcast` but without the Python stage. A
    10^10-key set (~12 GB of bitset over e.g. 4096 parts) exceeds the
    budget and takes a shuffle-hash join on ``part_id`` instead: the same
    hash-range-aligned exchange the cogroup probe pays, but the probe
    math stays in codegen and each task's hash map holds only its ~3 MB
    slices. The 8 KB+ words arrays never reach a downstream operator —
    the projection consumes them inside the join stage.

    Requires single-geometry, power-of-two ``n_bits`` (a multiple of 64);
    :func:`filter_unseen` auto-mode falls back to the Arrow paths
    otherwise. ``geometry`` = precomputed ``(n_bits, n_hashes,
    total_bits)`` to skip the metadata aggregate when the caller already
    ran it.

    ``bloom`` may be either the canonical binary form (converted here via
    :func:`bloom_words`, which also OR-merges snapshot+delta rows) or an
    already-converted WORDS form (a ``words`` column present) — the state
    a crawl commit can write once so every later probe skips the
    conversion pass. A words-form input must be pre-merged: one row per
    ``part_id`` (a duplicate part would duplicate candidate rows through
    the join; the geometry aggregate enforces this).

    Candidates carrying a pre-existing ``maybe_seen`` column raise (the
    output barrier appends, it does not replace) — drop the stale flag
    before a re-probe; the previous withColumn form silently produced a
    duplicate-column select for that input, never a meaningful result."""
    words_form = "words" in bloom.columns
    if geometry is None:
        g = bloom.agg(
            F.min("n_bits").alias("nb_min"),
            F.max("n_bits").alias("nb_max"),
            F.min("n_hashes").alias("nh_min"),
            F.max("n_hashes").alias("nh_max"),
            F.sum("n_bits").alias("total"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("part_id").alias("n_parts"),
        ).collect()[0]
        if g["total"] is None:
            raise ValueError(
                "probe_bloom_jvm: empty filter set — no geometry to probe "
                "(callers with possibly-empty state use filter_unseen, "
                "which falls back)"
            )
        if g["nb_min"] != g["nb_max"] or g["nh_min"] != g["nh_max"]:
            raise ValueError(
                "probe_bloom_jvm: mixed filter geometries "
                f"(n_bits {g['nb_min']}..{g['nb_max']}, n_hashes "
                f"{g['nh_min']}..{g['nh_max']}) — merge_bloom first"
            )
        if words_form and g["n_rows"] != g["n_parts"]:
            raise ValueError(
                f"probe_bloom_jvm: words-form filter has {g['n_rows']} rows "
                f"over {g['n_parts']} partitions — a duplicate part_id would "
                "duplicate candidate rows through the probe join; pass the "
                "binary form (bloom_words merges) or pre-merge the state"
            )
        geometry = (int(g["nb_min"]), int(g["nh_min"]), int(g["total"]))
    n_bits, n_hashes, total_bits = geometry
    if broadcast is None:
        broadcast = total_bits // 8 <= broadcast_max_bytes

    cols = candidates.columns
    if "__bf_words" in cols:
        raise ValueError("probe_bloom_jvm: candidate column __bf_words collides")
    w = (bloom if words_form else bloom_words(bloom)).select(
        "part_id", F.col("words").alias("__bf_words")
    )
    side = F.broadcast(w) if broadcast else w.hint("shuffle_hash")
    # maybe_seen goes through the no-op Generate barrier (plans/barrier.py):
    # a downstream filter(~maybe_seen) / filter(maybe_seen) would otherwise
    # be pushed below this projection with the whole probe expression
    # substituted — 2k copies of the h1/h2 index arithmetic (and of
    # whatever expressions feed h1/h2 if the upstream stage is fused) in a
    # single Filter method. Behind the barrier the probe is evaluated once
    # and downstream predicates see an attribute.
    joined = candidates.join(side, on="part_id", how="left")
    flagged = with_barrier_columns(
        joined,
        {"maybe_seen": _bloom_hit_expr(n_bits, n_hashes, "__bf_words")},
    ).select(*cols, "maybe_seen")
    if dedupe_on is None:
        return flagged
    return _dedupe_min_struct(flagged, dedupe_on, cols)


def filter_unseen(
    candidates: DataFrame,
    seen_urls: DataFrame,
    bloom: DataFrame | None = None,
    url_col: str = "url_canon",
    dedupe: bool = False,
    probe_mode: str = "auto",
    broadcast_max_bytes: int = 256 << 20,
) -> DataFrame:
    """Exact unseen set: bloom pre-filter (if given) then precise anti-join.

    ``seen_urls`` is the exact table (one ``url_canon`` column at minimum).
    Definitely-new rows (bloom miss) bypass the anti-join shuffle; only the
    maybe-seen remainder is joined. Without a bloom, plain ``left_anti``.
    ``dedupe=True`` also drops duplicate candidate URLs (riding the probe's
    cogroup shuffle, or a map-side-combinable hash aggregate in broadcast
    mode — one exchange either way). When the candidate columns are EXACTLY
    ``(url_col, h1, h2, part_id)`` — i.e. everything else was already
    dropped and every remaining column is a pure function of the URL —
    broadcast mode dedups BEFORE the probe on a slim (url, part_id)
    projection, so the exchange carries no hash/struct payload at all and
    the probe touches only distinct URLs. Callers with derivable companion
    columns (host = host of url_canon) should drop them before this call
    and recompute downstream (``urlgen.host_of_canon``).

    ``probe_mode``: ``"jvm"`` (the preferred path) probes entirely in
    whole-stage codegen via :func:`probe_bloom_jvm` — broadcast-joined and
    shuffle-free within ``broadcast_max_bytes``, hash-range shuffle-hash
    join beyond it; ``"broadcast"`` collects + broadcasts the whole filter
    set and probes in a shuffle-free ``mapInArrow``; ``"cogroup"`` keeps
    the hash-range-aligned Arrow cogroup where each task loads only its
    slice; ``"auto"`` (default) reads the filter geometry and picks
    ``jvm`` whenever the geometry supports it (single geometry,
    power-of-two n_bits — true for every ``build_bloom`` default), else
    sizes between broadcast and cogroup. The geometry check is a
    column-pruned metadata scan for a storage-backed bloom; for a
    COMPUTED bloom (``build_bloom(...)`` passed straight in) it executes
    the build — auto/jvm therefore persist the bloom first so the probe
    reuses the result instead of building twice. The default 256 MB
    budget covers ~2x10^8 keys at 1% fpp; a 10^10-key frontier (~12 GB
    of bitset) takes the shuffle-hash-join jvm probe.
    """
    if bloom is None:
        if dedupe:
            candidates = candidates.dropDuplicates([url_col])
        return candidates.join(
            seen_urls.select(url_col), on=url_col, how="left_anti"
        )
    if probe_mode not in ("auto", "broadcast", "cogroup", "jvm"):
        raise ValueError(
            f"probe_mode must be 'auto', 'jvm', 'broadcast' or 'cogroup', "
            f"got {probe_mode!r} (a silent fallback would quietly discard "
            "the plan shape the caller asked for)"
        )
    mode = probe_mode
    words_form = "words" in bloom.columns
    if words_form and probe_mode in ("broadcast", "cogroup"):
        raise ValueError(
            f"filter_unseen: probe_mode={probe_mode!r} needs the binary "
            "filter form; a words-form (pre-converted) state only probes "
            "via 'jvm'/'auto'"
        )
    geometry: tuple[int, int, int] | None = None
    if mode in ("auto", "jvm"):
        # the geometry check executes the bloom plan: cheap column-pruned
        # metadata scan for a storage-backed bloom, but a FULL build for a
        # computed one (build_bloom(...) passed straight in) — persist so
        # the probe below reuses that work instead of building twice
        bloom = bloom.persist(StorageLevel.MEMORY_AND_DISK)
        g = bloom.agg(
            F.min("n_bits").alias("nb_min"),
            F.max("n_bits").alias("nb_max"),
            F.min("n_hashes").alias("nh_min"),
            F.max("n_hashes").alias("nh_max"),
            F.sum("n_bits").alias("total"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("part_id").alias("n_parts"),
        ).collect()[0]
        total_bits = g["total"]
        jvm_ok = (
            total_bits is not None
            and g["nb_min"] == g["nb_max"]
            and g["nh_min"] == g["nh_max"]
            and int(g["nb_min"]) % 64 == 0
            and int(g["nb_min"]) & (int(g["nb_min"]) - 1) == 0
        )
        if words_form and total_bits is not None and g["n_rows"] != g["n_parts"]:
            raise ValueError(
                f"filter_unseen: words-form filter has {g['n_rows']} rows "
                f"over {g['n_parts']} partitions — pre-merge the state "
                "(bloom_words merges the binary form)"
            )
        if words_form and not jvm_ok:
            raise ValueError(
                "filter_unseen: words-form state requires jvm-compatible "
                f"geometry; got n_bits {g['nb_min']}..{g['nb_max']}, "
                f"n_hashes {g['nh_min']}..{g['nh_max']}"
            )
        if jvm_ok:
            geometry = (int(g["nb_min"]), int(g["nh_min"]), int(total_bits))
        if mode == "jvm" and not jvm_ok:
            raise ValueError(
                "filter_unseen: probe_mode='jvm' needs a non-empty, "
                "single-geometry filter set with power-of-two n_bits "
                f"(multiple of 64); got n_bits {g['nb_min']}..{g['nb_max']}"
                f", n_hashes {g['nh_min']}..{g['nh_max']} — use 'auto' to "
                "fall back to the Arrow probe paths"
            )
        if mode == "auto":
            if jvm_ok:
                # the JVM probe wins at every filter size: broadcast-join
                # (shuffle-free, codegen-fused) within the budget, hash-
                # range shuffle-hash join beyond it — no Python boundary
                mode = "jvm"
            else:
                mode = (
                    "broadcast"
                    if total_bits is not None
                    and total_bits // 8 <= broadcast_max_bytes
                    else "cogroup"
                )
    slim_cols = dedupe and set(candidates.columns) == {
        url_col, "h1", "h2", "part_id"
    }
    jvm_bcast = (
        mode == "jvm"
        and geometry is not None
        and geometry[2] // 8 <= broadcast_max_bytes
    )
    if mode == "jvm" and slim_cols and jvm_bcast:
        # PROBE-FIRST slim path: the broadcast-join jvm probe fuses into
        # the upstream canonicalize/hash map stage (zero exchange), so
        # probing BEFORE dedup costs nothing extra and the round keeps
        # exactly ONE exchange — the dedup aggregate over
        # (url, part_id, maybe_seen), every column a pure function of the
        # URL, so any dropDuplicates survivor is value-identical
        # (deterministic without a min(struct) ordering). Measured at 2
        # pinned cores on 3M URLs: probe-first 9.9s vs dedup-first 12.2s
        # vs Arrow cogroup 10.4s for the same prefix — dedup-first pays a
        # post-exchange probe stage the fused ordering avoids. h1/h2 are
        # recomputed after the exchange (with_url_hashes recipe, pruned
        # away when the caller never reads them).
        flagged_all = probe_bloom_jvm(
            candidates, bloom, broadcast=True, geometry=geometry
        )
        deduped = flagged_all.select(
            url_col, "part_id", "maybe_seen"
        ).dropDuplicates([url_col])
        flagged = (
            deduped.withColumn("h1", F.xxhash64(F.col(url_col)))
            .withColumn("h2", F.xxhash64(F.col(url_col), F.lit(1)))
            .select(*candidates.columns, "maybe_seen")
        )
    elif mode in ("broadcast", "jvm") and slim_cols:
        # SLIM DEDUP-FIRST path: every non-key column is a pure function of
        # the key (the with_url_hashes contract), so dedup can run BEFORE
        # the probe on a (url, part_id) projection — the round's one big
        # exchange then carries the URL string plus 4 bytes instead of the
        # URL + host + a min(struct(...)) aggregation buffer, and the
        # Python-boundary probe runs on the deduplicated (smaller) set.
        # h1/h2 are recomputed after the exchange with the identical
        # with_url_hashes recipe; part_id rides through (group-constant, a
        # FIRST aggregate — recomputing it would need n_parts, which the
        # probe does not know). Semantically identical to probe-then-dedup:
        # maybe_seen is itself a pure function of the URL.
        deduped = candidates.select(url_col, "part_id").dropDuplicates(
            [url_col]
        )
        rehashed = deduped.withColumn(
            "h1", F.xxhash64(F.col(url_col))
        ).withColumn("h2", F.xxhash64(F.col(url_col), F.lit(1)))
        if mode == "jvm":
            flagged = probe_bloom_jvm(
                rehashed, bloom,
                broadcast_max_bytes=broadcast_max_bytes, geometry=geometry,
            ).select(*candidates.columns, "maybe_seen")
        else:
            flagged = probe_bloom_broadcast(rehashed, bloom).select(
                *candidates.columns, "maybe_seen"
            )
    elif mode == "jvm":
        flagged = probe_bloom_jvm(
            candidates, bloom, dedupe_on=url_col if dedupe else None,
            broadcast_max_bytes=broadcast_max_bytes, geometry=geometry,
        )
    else:
        probe = probe_bloom_broadcast if mode == "broadcast" else probe_bloom
        flagged = probe(
            candidates, bloom, dedupe_on=url_col if dedupe else None
        )
    # the two branches below would otherwise re-execute the cogrouped
    # Python probe (and everything upstream) once each — persist the probe
    # output; the ContextCleaner unpersists it when the DataFrame is GC'd.
    # LAZY persist deliberately (measured, interleaved A/B at pinned 2 and
    # 8 cores): an eager count() here costs 9-15% per round — the barrier
    # splits the round into two sequential jobs and kills stage overlap —
    # while the feared cache-population race between the branches does not
    # materialize (stage scheduling populates the cache once; lazy also
    # beat no-persist-at-all, so the dedup is real).
    flagged = flagged.persist(StorageLevel.MEMORY_AND_DISK)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybe.join(seen_urls.select(url_col), on=url_col, how="left_anti")
    return definitely_new.unionByName(confirmed_new)


# ---------------------------------------------------------------------------
# Cuckoo filter — deletion-capable variant (north rule: "cuckoo-filter
# fallback for deletions"). Same partitioned layout: one serialized filter
# per hash-range partition.
# ---------------------------------------------------------------------------

class CuckooFilter:
    """Bucketed cuckoo filter (4 slots/bucket, 16-bit fingerprints).

    Standard construction (Fan et al., CoNEXT'14): a key hashes to bucket
    ``i1 = h mod n`` and its alternate ``i2 = i1 XOR hash(fp)``; membership
    checks both buckets for the fingerprint; delete removes one copy, which
    bloom filters cannot do. Contains/delete are numpy-vectorized over
    batches; insert uses the bounded kick loop.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1 << 14, table: np.ndarray | None = None):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
        self.n_buckets = n_buckets
        self.table = (
            table
            if table is not None
            else np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        )

    # fingerprint: 16-bit, never 0 (0 marks an empty slot)
    @staticmethod
    def _fingerprint(h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # MurmurHash-style fingerprint scramble for the partner bucket
        scrambled = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
            0xFFFFFFFF
        )
        return (idx ^ scrambled.astype(np.int64)) % self.n_buckets

    def _indices(self, h: np.ndarray):
        fp = self._fingerprint(h)
        i1 = (h % np.uint64(self.n_buckets)).astype(np.int64)
        i2 = self._alt_index(i1, fp)
        return fp, i1, i2

    def insert(self, h64: np.ndarray) -> int:
        """Insert a batch of uint64 hashes; returns number that FAILED
        (table too full). Idempotency is NOT guaranteed (multiset), matching
        standard cuckoo semantics — callers dedupe first."""
        fp, i1, i2 = self._indices(h64.view(np.uint64))
        failed = 0
        for f, a, b in zip(fp.tolist(), i1.tolist(), i2.tolist()):
            if not self._insert_one(np.uint16(f), a, b):
                failed += 1
        return failed

    def _insert_one(self, f: np.uint16, a: int, b: int) -> bool:
        for idx in (a, b):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = f
                return True
        # kick loop
        idx = a
        rng_state = int(f)  # deterministic "random" slot choice
        for _ in range(self.MAX_KICKS):
            rng_state = (rng_state * 1103515245 + 12345) & 0x7FFFFFFF
            slot = rng_state % self.SLOTS
            f, self.table[idx, slot] = self.table[idx, slot], f
            idx = int(
                self._alt_index(
                    np.array([idx], dtype=np.int64), np.array([f], dtype=np.uint16)
                )[0]
            )
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = f
                return True
        return False

    def contains(self, h64: np.ndarray) -> np.ndarray:
        fp, i1, i2 = self._indices(h64.view(np.uint64))
        fcol = fp[:, None]
        return ((self.table[i1] == fcol) | (self.table[i2] == fcol)).any(axis=1)

    def delete(self, h64: np.ndarray) -> np.ndarray:
        """Delete one copy of each hash's fingerprint; returns boolean
        array of which deletions found a copy."""
        fp, i1, i2 = self._indices(h64.view(np.uint64))
        out = np.zeros(len(fp), dtype=bool)
        for j, (f, a, b) in enumerate(zip(fp.tolist(), i1.tolist(), i2.tolist())):
            for idx in (a, b):
                row = self.table[idx]
                hit = np.nonzero(row == f)[0]
                if hit.size:
                    row[hit[0]] = 0
                    out[j] = True
                    break
        return out

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_buckets: int) -> "CuckooFilter":
        table = (
            np.frombuffer(data, dtype=np.uint16).reshape(n_buckets, cls.SLOTS).copy()
        )
        return cls(n_buckets, table)


CUCKOO_SCHEMA = StructType(
    [
        StructField("part_id", IntegerType(), False),
        StructField("table", BinaryType(), False),
        StructField("n_buckets", IntegerType(), False),
        StructField("n_keys", LongType(), False),
    ]
)


def build_cuckoo(hashed: DataFrame, n_buckets: int = 1 << 14) -> DataFrame:
    """Per-partition cuckoo filters (deletion-capable seen set).
    Arrow-native like :func:`build_bloom`: the grouped exchange carries
    only ``(part_id, h1)``."""

    def _build(tbl: pa.Table) -> pa.Table:
        cf = CuckooFilter(n_buckets)
        h = np.unique(_u64_col(tbl, "h1"))
        failed = cf.insert(h)
        if failed:
            raise ValueError(
                f"build_cuckoo: partition "
                f"{tbl.column('part_id')[0].as_py()} "
                f"overflowed — {failed}/{len(h)} keys failed to insert at "
                f"n_buckets={n_buckets} ({n_buckets * CuckooFilter.SLOTS} "
                "slots). A lossy cuckoo filter has false negatives, which "
                "the seen-set must never have; size n_buckets to ~keys/3"
            )
        return pa.table(
            {
                "part_id": pa.array(
                    [tbl.column("part_id")[0].as_py()], type=pa.int32()
                ),
                "table": pa.array([cf.to_bytes()], type=pa.binary()),
                "n_buckets": pa.array([n_buckets], type=pa.int32()),
                "n_keys": pa.array([len(h)], type=pa.int64()),
            }
        )

    return (
        hashed.select("part_id", "h1")
        .groupBy("part_id")
        .applyInArrow(_build, CUCKOO_SCHEMA)
    )


def probe_cuckoo(candidates: DataFrame, cuckoo: DataFrame) -> DataFrame:
    """``maybe_seen`` flag from the cuckoo variant (same contract as
    :func:`probe_bloom`)."""
    out_schema = StructType(
        candidates.schema.fields + [StructField("maybe_seen", BooleanType(), False)]
    )

    def _probe(cand: pa.Table, filt: pa.Table) -> pa.Table:
        cand = cand.combine_chunks()
        if filt.num_rows == 0 or cand.num_rows == 0:
            hit = np.zeros(cand.num_rows, dtype=bool)
        elif filt.num_rows > 1:
            raise ValueError(
                f"probe_cuckoo: {filt.num_rows} filter rows for part_id "
                f"{filt.column('part_id')[0].as_py()} — combine filters first"
            )
        else:
            cf = CuckooFilter.from_bytes(
                filt.column("table")[0].as_py(),
                filt.column("n_buckets")[0].as_py(),
            )
            hit = cf.contains(_u64_col(cand, "h1"))
        return cand.append_column(
            "maybe_seen", pa.array(hit, type=pa.bool_())
        )

    return (
        candidates.groupBy("part_id")
        .cogroup(cuckoo.groupBy("part_id"))
        .applyInArrow(_probe, out_schema)
    )
