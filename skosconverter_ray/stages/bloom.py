"""Bloom-filter semi-join: prefilter a corpus-sized Dataset against a
small key set WITHOUT shuffling the big side.

At 100 TB the classic semi-join (`big ⋈ semi small`) pays an all-to-all
exchange of the big side's join column. A Bloom filter replaces that
with a broadcast: build an m-bit filter from the small side (per-block
partial filters OR-merged — OR is associative/commutative, so the
build is one map + a tiny reduce), ``ray.put`` the bits once, and drop
non-matching big-side rows inside ``map_batches`` at ~k bit probes per
row. False positives (rate ``fpp``) are removed by an EXACT verify:

- ``verify="broadcast"`` (default): the small side is dimension-sized —
  membership is checked against an exact broadcast hash-set of the
  keys. The Bloom probe is then a fast-reject in front of the set
  lookup (at scale the set may be a shard map; the bits stay tiny).
- ``verify=None``: filter-only (keep the ~fpp overshoot) — the shape
  used in front of a downstream shuffle join that is exact anyway;
  the Bloom just cuts the exchanged volume by the miss rate.

Vectorized throughout: 64-bit seeded key hashing (functions/hashing),
double hashing ``idx_j = (h1 + j·h2) mod m`` (Kirsch–Mitzenmacher),
numpy bit ops; no per-row Python.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash_strings, mix64

_SEED1, _SEED2 = 0xB10001, 0xB10002


def _key_hashes(arr, seed: int) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        v = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        return mix64(v + np.uint64(seed))
    return hash_strings(arr.cast(pa.string()), seed=seed)


class BloomFilter:
    """m-bit filter with k double-hash probes, numpy-vectorized."""

    def __init__(self, n_expected: int, fpp: float = 0.01,
                 bits: np.ndarray | None = None):
        n = max(1, n_expected)
        m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
        self.m = (m + 7) // 8 * 8          # byte-aligned
        self.k = max(1, round(self.m / n * math.log(2)))
        self.bits = (bits if bits is not None
                     else np.zeros(self.m // 8, np.uint8))

    def _idx(self, arr) -> np.ndarray:
        """(k, n) probe positions for an Arrow array of keys."""
        h1 = _key_hashes(arr, _SEED1)
        h2 = _key_hashes(arr, _SEED2) | np.uint64(1)
        j = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + j * h2[None, :])
                % np.uint64(self.m)).astype(np.int64)

    def add(self, arr) -> None:
        idx = self._idx(arr).ravel()
        np.bitwise_or.at(self.bits, idx >> 3,
                         np.uint8(1) << (idx & 7).astype(np.uint8))

    def contains(self, arr) -> np.ndarray:
        """-> bool mask; no false negatives, ~fpp false positives."""
        idx = self._idx(arr)
        probes = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return probes.all(axis=0)


def build_bloom(small_ds, col: str, *, n_expected: int,
                fpp: float = 0.01) -> BloomFilter:
    """Distributed build: per-block partial filters, OR-merged.

    The per-block partial is the full m/8-byte bit array (zero-init is
    cheap; only the OR of all partials ships). Returns the merged
    filter on the driver — callers ``ray.put`` it once for probing.
    """
    proto = BloomFilter(n_expected, fpp)

    def partial(batch: pa.Table) -> pa.Table:
        f = BloomFilter(n_expected, fpp)
        f.add(batch[col])
        return pa.table({"bits": pa.array([f.bits.tobytes()], pa.binary())})

    merged = np.zeros_like(proto.bits)
    for b in (small_ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=256)):
        for blob in b["bits"].to_pylist():
            merged |= np.frombuffer(blob, np.uint8)
    return BloomFilter(n_expected, fpp, bits=merged)


def semi_join_bloom(big_ds, small_ds, *, on: str, small_on: str | None = None,
                    n_expected: int, fpp: float = 0.01,
                    verify: str | None = "broadcast"):
    """Rows of ``big_ds`` whose ``on`` key appears in ``small_ds``.

    ``verify="broadcast"`` gives EXACT semi-join output (Bloom
    fast-reject + broadcast exact set); ``verify=None`` keeps Bloom
    false positives (filter-only prefilter mode).
    """
    import ray

    small_on = small_on or on
    # materialize once: the Bloom build and the exact-verify pass both
    # consume this lazy pipeline, and a lazy Dataset re-executes its
    # whole upstream per consumer
    keyed = small_ds.select_columns([small_on]).materialize()
    bloom = build_bloom(keyed, small_on, n_expected=n_expected, fpp=fpp)

    exact: pa.Array | None = None
    if verify == "broadcast":
        batches = list(keyed.iter_batches(batch_format="pyarrow",
                                          batch_size=65536))
        exact = (pa.concat_tables(batches)[small_on]
                 .combine_chunks().unique() if batches
                 else pa.array([], pa.string()))
    elif verify is not None:
        raise ValueError(f"unknown verify mode: {verify!r}")

    ref = ray.put((bloom, exact))

    def filt(batch: pa.Table, _ref=ref) -> pa.Table:
        import pyarrow.compute as pc

        bl, ex = ray.get(_ref)
        mask = bl.contains(batch[on])
        if ex is not None and mask.any():
            in_set = pc.is_in(batch[on].combine_chunks()
                              if isinstance(batch[on], pa.ChunkedArray)
                              else batch[on], value_set=ex)
            mask &= in_set.to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(mask))

    return big_ds.map_batches(filt, batch_format="pyarrow")
