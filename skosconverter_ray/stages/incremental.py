"""Incremental ingest: dedup a new document batch against a persisted
fingerprint store (cross-RUN exact dedup).

A 100 TB corpus is not ingested once — every crawl round must drop
documents already absorbed by earlier rounds WITHOUT rescanning the
old corpus. The store holds only 8-byte content hashes as append-only
parquet shards (one per ingest round — resumable, no rewrite):

- **filter**: store hashes load as a Bloom filter (bits broadcast
  once) plus an exact hash set for the verify step — the same
  fast-reject + exact-confirm shape as stages/bloom.semi_join_bloom,
  here as an ANTI-join (keep rows whose hash is NOT in the store).
  At store sizes beyond one node's memory the exact set shards by
  hash range and the verify becomes a bucket-cogroup anti-join; the
  Bloom bits stay broadcastable far longer (12 bits/key at 1% fpp).
- **append**: the surviving batch's hashes are written as ONE new
  shard; a crashed run can re-append idempotently because re-ingesting
  the same docs yields zero survivors next round.

Hash = functions/hashing.content_hash64 — the SAME function
queries.doc_dedup_exact keys on, so in-run and cross-run dedup agree
on identity by construction. Because that hash is only stable for a
fixed polars version (ADVICE r02), every shard is stamped with
``content_hash_algo()`` in its parquet schema metadata and
``load_store`` REFUSES a store written under a different algorithm
(clear error naming both identities) instead of silently re-admitting
previously-ingested documents.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

def _hash_batch(batch: pa.Table, text_col: str) -> np.ndarray:
    from ..functions.hashing import content_hash64

    return content_hash64(batch[text_col])


_ALGO_META = b"skos_fp_algo"


class StoreAlgoMismatch(RuntimeError):
    """A fingerprint shard was written under a different content-hash
    implementation than the one running — its identities are
    incomparable. Rebuild the store (re-ingest) or pin the library."""


def _check_shard_algo(path: str) -> None:
    from ..functions.hashing import content_hash_algo

    meta = pq.read_schema(path).metadata or {}
    got = meta.get(_ALGO_META, b"<unstamped>").decode()
    want = content_hash_algo()
    if got != want:
        raise StoreAlgoMismatch(
            f"fingerprint shard {path} was written with hash algo "
            f"'{got}' but this runtime computes '{want}'; cross-run "
            f"identities would silently disagree — rebuild the store")


def load_store(store_dir: str) -> np.ndarray:
    """All fingerprint shards -> sorted unique int64 hash array.
    Raises StoreAlgoMismatch if any shard's stamped hash algorithm
    differs from the running one."""
    if not os.path.isdir(store_dir):
        return np.empty(0, np.int64)
    parts = [os.path.join(store_dir, f) for f in sorted(os.listdir(store_dir))
             if f.endswith(".parquet")]
    if not parts:
        return np.empty(0, np.int64)
    for p in parts:
        _check_shard_algo(p)
    tabs = [pq.read_table(p, columns=["h"]) for p in parts]
    hs = pa.concat_tables(tabs)["h"].to_numpy(zero_copy_only=False)
    return np.unique(hs)


def filter_new(docs_ds, store_dir: str, *, text_col: str = "text"):
    """-> Dataset of rows whose content hash is NOT in the store,
    with the hash attached as ``_h`` (so append_fingerprints never
    re-hashes)."""
    import ray

    from .bloom import BloomFilter

    known = load_store(store_dir)
    bloom = BloomFilter(max(len(known), 1), fpp=0.01)
    if len(known):
        bloom.add(pa.array(known, pa.int64()))
    ref = ray.put((bloom, pa.array(known, pa.int64())))

    def filt(batch: pa.Table, _ref=ref) -> pa.Table:
        import pyarrow.compute as pc

        bl, exact = ray.get(_ref)
        h = _hash_batch(batch, text_col)
        harr = pa.array(h, pa.int64())
        maybe = bl.contains(harr) if len(exact) else \
            np.zeros(len(h), bool)
        seen = np.zeros(len(h), bool)
        if maybe.any():
            hit = pc.is_in(harr, value_set=exact) \
                .to_numpy(zero_copy_only=False)
            seen = maybe & hit
        return batch.append_column("_h", harr).filter(pa.array(~seen))

    return docs_ds.map_batches(filt, batch_format="pyarrow")


def append_fingerprints(new_ds, store_dir: str) -> str:
    """Write the surviving rows' ``_h`` hashes as one new store shard;
    returns the shard path. Distinct-per-shard; shards may overlap
    after crashes — load_store uniques across shards."""
    os.makedirs(store_dir, exist_ok=True)
    hs: list[np.ndarray] = []
    for b in new_ds.select_columns(["_h"]).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        hs.append(b["_h"].to_numpy(zero_copy_only=False))
    uniq = (np.unique(np.concatenate(hs)) if hs
            else np.empty(0, np.int64))
    from ..functions.hashing import content_hash_algo

    path = os.path.join(store_dir, f"shard-{uuid.uuid4().hex}.parquet")
    tbl = pa.table({"h": pa.array(uniq, pa.int64())}).replace_schema_metadata(
        {_ALGO_META: content_hash_algo().encode()})
    pq.write_table(tbl, path)
    return path


def ingest_round(docs_ds, store_dir: str, *, text_col: str = "text"):
    """One incremental round: filter vs store, append survivors'
    fingerprints, return the surviving Dataset (materialized — it is
    consumed twice: fingerprint append + caller)."""
    new = filter_new(docs_ds, store_dir, text_col=text_col).materialize()
    append_fingerprints(new, store_dir)
    return new.drop_columns(["_h"])
