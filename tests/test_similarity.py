"""ANN quality tests: IVF and random-hyperplane LSH recall against the
brute-force oracle on data with actual neighborhood structure.

The driver's synthetic embeddings table is near-uniform on the sphere
(mean pairwise cosine 0, top-10 neighbor cosine ~0.3) — no ANN index can
beat fraction-probed recall there, so these tests generate CLUSTERED
vectors (the geometry real embedding corpora exhibit and IVF assumes) and
pin the recall contract where it is meaningful.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from language_diversity_common_crawler_spark.functions import similarity


def _clustered_vectors(n_clusters=16, per_cluster=60, dim=64, seed=11,
                       spread=0.25):
    """Deterministic clustered unit-ish vectors: cluster centers are
    random ±1 sign vectors (far apart w.h.p.), members = center + small
    noise."""
    rng = random.Random(seed)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = [rng.choice((-1.0, 1.0)) for _ in range(dim)]
        for _ in range(per_cluster):
            v = [x + rng.gauss(0.0, spread) for x in center]
            norm = math.sqrt(sum(y * y for y in v))
            rows.append((vid, [y / norm for y in v]))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def clustered(spark):
    rows = _clustered_vectors()
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).repartition(8).cache()


def _pairs(df):
    return {(r["q_id"], r["n_id"]) for r in df.collect()}


def test_ivf_recall_on_clustered_data(clustered):
    """IVF at the default dial (16 cells, probe 4) must recover >= 0.9 of
    the true top-10 neighbors when the corpus is clustered."""
    qids = [5, 100, 333, 512, 777]
    want = _pairs(similarity.brute_force_topk(clustered, qids, k=10))
    got = _pairs(similarity.ivf_topk(clustered, qids, k=10))
    recall = len(want & got) / len(want)
    assert recall >= 0.9, recall


def test_ivf_probe_dial_monotone(clustered):
    """More probes -> recall can only grow (same assignment, wider scan);
    full probe == brute force exactly."""
    qids = [5, 100, 333]
    want = _pairs(similarity.brute_force_topk(clustered, qids, k=10))
    r_prev = -1.0
    for n_probe in (1, 4, 16):
        got = _pairs(
            similarity.ivf_topk(clustered, qids, k=10, n_probe=n_probe)
        )
        r = len(want & got) / len(want)
        assert r >= r_prev, (n_probe, r, r_prev)
        r_prev = r
    assert r_prev == 1.0  # probing every cell degenerates to brute force


def test_lsh_recall_on_near_duplicates(spark):
    """Banded random-hyperplane LSH must surface >= 0.9 of planted
    near-duplicate pairs (cosine ~0.98 -> per-band hit (1-θ/π)^8 ≈ 0.59,
    OR over 4 bands ≈ 0.97 expected recall)."""
    rng = random.Random(23)
    dim = 64
    rows, truth = [], set()
    vid = 0
    for i in range(150):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        nb = math.sqrt(sum(x * x for x in base))
        base = [x / nb for x in base]
        rows.append((vid, base))
        twin = [x + rng.gauss(0, 0.025) for x in base]
        nt = math.sqrt(sum(x * x for x in twin))
        rows.append((vid + 1, [x / nt for x in twin]))
        truth.add((vid, vid + 1))
        vid += 2
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        (r["a"], r["b"])
        for r in similarity.lsh_bucketed_neighbors(
            emb, min_cosine=0.9
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, recall


def test_brute_force_matches_numpy(spark):
    import numpy as np

    rows = _clustered_vectors(n_clusters=4, per_cluster=25)
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qids = [0, 50]
    got = similarity.brute_force_topk(emb, qids, k=5).collect()
    X = np.array([r[1] for r in rows], dtype=np.float64)
    Xq = np.round(X * 1e6)  # the engines' exact-integer quantization
    S = (Xq @ Xq.T) / np.sqrt((Xq * Xq).sum(1)[:, None] * (Xq * Xq).sum(1)[None, :])
    for q in qids:
        s = S[q].copy()
        s[q] = -2
        want = set(np.argsort(-np.round(s, 6))[:5].tolist())
        have = {r["n_id"] for r in got if r["q_id"] == q}
        assert have == want


def test_cosine_dedup_drops_planted_twins(spark):
    """Greedy cosine dedup: >=90% of planted near-twins (odd ids) are
    dropped with dup_of = their even-id original; the unrelated random
    originals overwhelmingly survive."""
    rng = random.Random(47)
    dim = 64
    rows = []
    vid = 0
    for _ in range(120):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        nb = math.sqrt(sum(x * x for x in base))
        base = [x / nb for x in base]
        rows.append((vid, base))
        twin = [x + rng.gauss(0, 0.02) for x in base]
        nt = math.sqrt(sum(x * x for x in twin))
        rows.append((vid + 1, [x / nt for x in twin]))
        vid += 2
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    verdicts = {r["vec_id"]: r for r in
                similarity.cosine_dedup(emb, threshold=0.9).collect()}
    assert len(verdicts) == len(rows)
    twins = [v for i, v in verdicts.items() if i % 2 == 1]
    dropped = [v for v in twins if not v["kept"]]
    assert len(dropped) >= 0.9 * len(twins), len(dropped)
    assert all(v["dup_of"] == v["vec_id"] - 1 for v in dropped)
    originals = [v for i, v in verdicts.items() if i % 2 == 0]
    kept_orig = sum(1 for v in originals if v["kept"])
    assert kept_orig >= 0.95 * len(originals), kept_orig


def test_label_centroid_similarity_matches_numpy(spark):
    """The integer geometry must equal a numpy recompute of the same
    quantization, and the implied cosines must stay in [-1, 1]."""
    import math

    import numpy as np

    from language_diversity_common_crawler_spark.functions import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        (r["label_a"], r["label_b"]): r
        for r in similarity.label_centroid_similarity(emb).collect()
    }
    from language_diversity_common_crawler_spark.functions.similarity import (
        CENTROID_QUANT,
    )

    def _round_half_away(v: float) -> int:
        # the engines round half AWAY from zero (Spark HALF_UP, DuckDB
        # std::round); Python's round() is banker's and would diverge on
        # exact .5 ties
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    rows = emb.select("label", "embedding").collect()
    cents: dict[int, np.ndarray] = {}
    for r in rows:
        q = np.array(
            [_round_half_away(float(np.float32(x)) * CENTROID_QUANT)
             for x in r["embedding"]],
            dtype=np.int64,
        )
        cents[r["label"]] = cents.get(r["label"], 0) + q
    labels = sorted(cents)
    n_pairs = len(labels) * (len(labels) - 1) // 2
    assert len(got) == n_pairs
    for i, la in enumerate(labels):
        for lb in labels[i + 1:]:
            r = got[(la, lb)]
            assert r["dot"] == int(cents[la] @ cents[lb]), (la, lb)
            assert r["norm_sq_a"] == int(cents[la] @ cents[la])
            assert r["norm_sq_b"] == int(cents[lb] @ cents[lb])
            cos = r["dot"] / math.sqrt(r["norm_sq_a"] * r["norm_sq_b"])
            assert -1.0 <= cos <= 1.0
