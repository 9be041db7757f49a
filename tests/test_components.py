"""Connected-components dedup clustering: ground truth vs a pure-Python
union-find, cross-engine parity vs the recursive-CTE DuckDB twin, and the
convergence guard."""

from __future__ import annotations

import duckdb
import pytest

from language_diversity_common_crawler_spark.functions import components


def _union_find(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min id reachable = root under min-union
    return {i: find(i) for i in n_ids}


# chain 1-2-3-4 (greedy one-hop would keep 1 AND 3; closure keeps only 1),
# star 10-{11,12,13}, singleton 20, two-cycle 30-31 plus redundant dup edge
EDGES = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13),
         (30, 31), (31, 30), (3, 2)]
DOC_IDS = [1, 2, 3, 4, 10, 11, 12, 13, 20, 30, 31]


def test_matches_union_find(spark):
    docs = spark.createDataFrame([(i,) for i in DOC_IDS], "doc_id long")
    pairs = spark.createDataFrame(EDGES, "a long, b long")
    got = {
        r["doc_id"]: (r["component"], r["cluster_size"], r["kept"])
        for r in components.dedup_clusters(docs, pairs).collect()
    }
    want = _union_find(DOC_IDS, EDGES)
    sizes = {}
    for i, c in want.items():
        sizes[c] = sizes.get(c, 0) + 1
    assert len(got) == len(DOC_IDS)
    for i in DOC_IDS:
        assert got[i] == (want[i], sizes[want[i]], i == want[i]), i
    # exactly one kept per component
    kept = [i for i, (_, _, k) in got.items() if k]
    assert sorted(kept) == sorted(set(want.values()))


def test_duckdb_twin_parity(spark):
    docs = spark.createDataFrame([(i,) for i in DOC_IDS], "doc_id long")
    pairs = spark.createDataFrame(EDGES, "a long, b long")
    got = sorted(
        tuple(r) for r in components.dedup_clusters(docs, pairs).collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?)",
                    [(i,) for i in DOC_IDS])
    values = ", ".join(f"({a}, {b})" for a, b in EDGES)
    sql = components.sql_dedup_clusters(
        f"SELECT a, b FROM (VALUES {values}) AS t(a, b)"
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_long_chain_converges(spark):
    """A 12-node chain needs ~11 propagation rounds — exercises the
    checkpointed deep-iteration path, not just 1-2 rounds."""
    n = 12
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    out = components.dedup_clusters(docs, pairs).collect()
    assert all(r["component"] == 0 and r["cluster_size"] == n for r in out)
    assert sum(r["kept"] for r in out) == 1


def test_unconverged_raises(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(9)],
                                  "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        components.connected_components(pairs, max_iter=2)


def test_empty_pairs(spark):
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    pairs = spark.createDataFrame([], "a long, b long")
    out = {r["doc_id"]: r for r in components.dedup_clusters(docs, pairs).collect()}
    assert out[1]["component"] == 1 and out[1]["kept"]
    assert out[2]["cluster_size"] == 1
