"""Bloom-filter join pruning — cut the big side's shuffle volume.

A bucketed hash join moves EVERY row of both sides through the
exchange; when most big-side rows have no partner (selective dimension
filters, incremental loads), that movement is waste.  A Bloom filter
(Bloom 1970) built over the small side's keys is a fixed-size bit array
(``n_bits`` regardless of key count) that answers "possibly present" /
"definitely absent"; pre-filtering the big side against it drops the
guaranteed-partnerless rows BEFORE the shuffle.  False positives only
let some extra rows through — the exact join behind it removes them, so
the composed result is exactly the plain join.

vs `ops/join.semi_join`: the broadcast semi-join ships the small side's
distinct int64 key ARRAY (8 bytes/key) — exact but O(keys) memory per
worker.  The Bloom bits are O(n_bits) whatever the key count (1 MB
handles ~1M keys at ~2% fp with k=4), which is what survives when the
"small" side is merely smaller, not tiny.

Hashing: k salted splitmix64 probes per key, fully vectorized over the
batch (numpy uint64 lanes, no Python per row).  Build is a Ray-native
``AggregateFnV2``: per-block bit arrays OR-combined through the tree
reduce, so the only driver-side object is the final n_bits/8 bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import AggregateFnV2
from ray.data.block import BlockAccessor

_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    x = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15) * np.uint64(
        salt + 1
    )
    x = (x ^ (x >> np.uint64(30))) * _SM1
    x = (x ^ (x >> np.uint64(27))) * _SM2
    return x ^ (x >> np.uint64(31))


def _positions(vals: np.ndarray, n_bits: int, k: int):
    for salt in range(k):
        yield (_mix(vals, salt) % np.uint64(n_bits)).astype(np.int64)


class BloomBuild(AggregateFnV2):
    """Fold a Bloom bit array over an int64 key column."""

    def __init__(self, on: str, n_bits: int = 1 << 23, k: int = 4):
        self._n_bits = n_bits
        self._k = k
        super().__init__(
            f"bloom({on})",
            zero_factory=lambda: np.zeros(n_bits // 8, dtype=np.uint8),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> np.ndarray:
        col = BlockAccessor.for_block(block).to_arrow()[
            self.get_target_column()
        ]
        vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
        bits = np.zeros(self._n_bits // 8, dtype=np.uint8)
        for pos in _positions(vals, self._n_bits, self._k):
            np.bitwise_or.at(
                bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
            )
        return bits

    def combine(self, acc: np.ndarray, new: np.ndarray) -> np.ndarray:
        return acc | new

    def finalize(self, acc: np.ndarray) -> np.ndarray:
        return acc


def bloom_prefilter(
    big: "ray.data.Dataset",
    small: "ray.data.Dataset",
    on: str,
    small_on: str = None,
    n_bits: int = 1 << 23,
    k: int = 4,
) -> "ray.data.Dataset":
    """Keep ``big`` rows whose ``on`` key is POSSIBLY in ``small``'s
    ``small_on`` key set (definitely-absent rows dropped; false
    positives pass — follow with the exact join).  Keys must be
    integers."""
    agg = small.aggregate(BloomBuild(small_on or on, n_bits=n_bits, k=k))
    bits = None if agg is None else agg[f"bloom({small_on or on})"]
    if bits is None:
        # Dataset.aggregate yields None for an empty dataset (version-
        # dependent: None result or None cell); an empty small side means
        # NO key can match — every big row drops.
        return big.limit(0)
    bits_ref = ray.put(bits)

    def filt(batch: pa.Table, bits_ref=bits_ref) -> pa.Table:
        b = ray.get(bits_ref)
        vals = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.ones(len(vals), dtype=bool)
        for pos in _positions(vals, n_bits, k):
            keep &= (
                b[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))
            ) != 0
        return batch.filter(pa.array(keep))

    return big.map_batches(filt, batch_format="pyarrow")
