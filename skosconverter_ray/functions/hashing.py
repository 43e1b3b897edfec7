"""Vectorized string hashing for hot-path content identities.

Every dedup / bucket-cogroup stage needs a 64-bit hash per row over a
string key. A Python ``hashlib`` loop costs ~0.9 s per million rows and
was the dominant Python-object cost in the two most expensive pipelines
(triple dedup, MinHash shingling). ``polars``' vectorized ``.hash``
(ahash, seeded) does the same million rows in ~0.05 s and is
deterministic across processes for a fixed seed + polars version — all
workers in one Ray job share the venv, so cross-worker agreement holds
(the property hash-partitioning needs). A pure-Python blake2b fallback
keeps the module importable without polars; both paths are seeded,
never Python's salted ``hash()``.

Collision posture: these are high-quality 64-bit non-cryptographic
hashes of *non-adversarial* data. Identities that must survive corpus
scale (10^12 rows) combine TWO independently-seeded 64-bit hashes into
a 126-bit key (see stages/triples.py), putting the birthday bound near
2^-60 — far below hardware error rates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

try:  # vectorized path
    import polars as pl

    _HAS_POLARS = True
except ImportError:  # pragma: no cover - polars is baked into the env
    _HAS_POLARS = False


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Strings (pa.Array / pa.ChunkedArray / list) -> uint64 hashes.

    Nulls hash like empty strings on the fallback path; polars hashes
    them to a fixed per-seed value — both are deterministic, which is
    all bucket/dedup keys require.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if _HAS_POLARS:
        if not isinstance(values, pa.Array):
            values = pa.array(list(values), pa.string())
        s = pl.from_arrow(values)
        return s.hash(seed=seed).to_numpy().astype(np.uint64, copy=False)
    if isinstance(values, pa.Array):
        values = values.to_pylist()
    out = np.empty(len(values), dtype=np.uint64)
    salt = seed.to_bytes(8, "little", signed=False)
    for i, v in enumerate(values):
        d = hashlib.blake2b((v or "").encode(), digest_size=8,
                            salt=salt).digest()
        out[i] = int.from_bytes(d, "big")
    return out


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized — full-avalanche mix of uint64
    lanes (used to combine word hashes into shingle identities)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def bucket_of(values, n_buckets: int) -> pa.Array:
    """Strings -> int32 bucket ids (hash % n_buckets), vectorized.

    The bucket assignment is internal layout (cogroup routing), so the
    only requirement is determinism within a run — both sides of a
    cogroup hash with the same function.
    """
    h = hash_strings(values, seed=0)
    return pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32())


def content_hash_algo() -> str:
    """Identity string of the content_hash64 implementation actually
    running (algorithm + library version + seed). Anything that
    PERSISTS content hashes across runs (stages/incremental) must
    stamp shards with this and refuse mismatches at load time: polars'
    ahash is only stable for a fixed polars version, and the blake2b
    fallback is a different function entirely — a silent mismatch
    would re-admit every previously-ingested document."""
    if _HAS_POLARS:
        return f"polars-ahash-{pl.__version__}-seed7-shr1"
    return "blake2b8-seed7-shr1"


def content_hash64(texts) -> np.ndarray:
    """Canonical 64-bit document-content identity (seed 7, top bit
    cleared so it fits int64). In-run exact dedup
    (queries.doc_dedup_exact) and cross-RUN dedup (stages/incremental)
    both key on THIS function — one definition, so the two can never
    silently disagree on identity."""
    return (hash_strings(texts, seed=7) >> np.uint64(1)).astype(np.int64)


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length (== DuckDB ``length(bin(x))`` for
    x >= 1; 0 -> 0). Binary-shift descent instead of
    ``floor(log2(x))``, whose double rounding can misreport just below
    large powers of two."""
    x = x.astype(np.uint64, copy=True)
    r = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        r[m] += s
        x[m] >>= np.uint64(s)
    return r + (x > 0)
