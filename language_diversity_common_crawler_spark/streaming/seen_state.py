"""Streaming URL-seen dedup as a custom stateful operator
(applyInPandasWithState) — the streaming form of the frontier's
partitioned bloom URL-seen set.

Built-in ``dropDuplicates`` on a stream keeps every key in exact state
forever (unbounded memory at 10^10 URLs). This operator instead keeps ONE
bloom bitset per hash-range partition as the group state — memory is fixed
at ``n_bits/8`` bytes per partition regardless of URL count, the bounded-
memory trade every real crawler makes (false positives drop a URL that was
never seen, at the configured fpp; false negatives cannot happen).

The grouping key is ``part_id = pmod(xxhash64(url), n_parts)`` — the SAME
partitioning as the batch seen-set (frontier/seen.py), so a batch-built
bloom snapshot could seed the stream state and vice versa. Bit math is
identical (Kirsch-Mitzenmacher double hashing, numpy-vectorized per Arrow
batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..frontier.seen import N_PARTS, _bit_indices, with_url_hashes

OUT_SCHEMA = StructType(
    [
        StructField("part_id", IntegerType(), False),
        StructField("url_canon", StringType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("bits", BinaryType(), True),
        StructField("n_keys", LongType(), True),
        StructField("n_bits", LongType(), True),
        StructField("n_hashes", IntegerType(), True),
    ]
)


def streaming_unseen_urls(
    url_stream: DataFrame,
    url_col: str = "url_canon",
    n_parts: int = N_PARTS,
    n_bits_per_part: int = 1 << 20,
    n_hashes: int = 7,
) -> DataFrame:
    """First occurrence of each URL across the whole stream, approximate
    (bloom): emits a row the first time a URL's bits were not all set.

    Deterministic for a given hash geometry — the same stream replayed
    yields the same output (exactly-once via the query checkpoint)."""
    hashed = with_url_hashes(url_stream, url_col=url_col, n_parts=n_parts)
    n_bytes = (n_bits_per_part + 7) // 8

    def _dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (bits_b, n_keys, st_bits, st_hashes) = state.get
            if st_bits != n_bits_per_part or st_hashes != n_hashes:
                raise ValueError(
                    "streaming_unseen_urls: checkpointed state was built "
                    f"with n_bits={st_bits}, n_hashes={st_hashes} but the "
                    f"query was restarted with n_bits={n_bits_per_part}, "
                    f"n_hashes={n_hashes} — geometry must not change "
                    "across restarts (membership would silently corrupt)"
                )
            bits = np.frombuffer(bits_b, dtype=np.uint8).copy()
        else:
            bits = np.zeros(n_bytes, dtype=np.uint8)
            n_keys = 0
        part_id = int(key[0])
        for pdf in pdfs:
            h1 = pdf["h1"].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = pdf["h2"].to_numpy(dtype=np.int64).view(np.uint64)
            # membership test then insert, row-vectorized per batch; rows
            # duplicated WITHIN the batch dedupe against each other through
            # sequential bit-set (stable original order preserved by a
            # first-occurrence mask on the url itself)
            first_in_batch = ~pdf[url_col].duplicated().to_numpy()
            maybe_seen = np.ones(len(pdf), dtype=bool)
            for i in range(n_hashes):
                idx = _bit_indices(h1, h2, i, n_bits_per_part)
                maybe_seen &= (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
            new_mask = (~maybe_seen) & first_in_batch
            for i in range(n_hashes):
                idx = _bit_indices(h1, h2, i, n_bits_per_part)
                np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
            n_keys += int(new_mask.sum())
            out = pdf.loc[new_mask, [url_col]]
            if len(out):
                yield pd.DataFrame(
                    {"part_id": part_id, "url_canon": out[url_col].values}
                )
        state.update((bits.tobytes(), n_keys, n_bits_per_part, n_hashes))

    return hashed.groupBy("part_id").applyInPandasWithState(
        _dedup,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
