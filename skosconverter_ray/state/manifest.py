"""Checkpoint manifest: per-partition lineage + metrics, resumable runs.

Ray Data has no mid-shuffle checkpointing, so resumability is
implemented at *stage boundaries* (SURVEY.md §7.3): output is written
as one directory per hash partition, and a ``manifest.jsonl`` records
``(partition_id, stage, row_count, input_lineage, status, wall_s)``.
A rerun loads the manifest, filters already-``done`` partitions out of
the dataset *before* the write, and only produces the missing ones —
idempotent because partition assignment is a pure function of the key.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def partitioner_algo() -> str:
    """Identity of the partition hash actually running. Manifests
    persist partition assignments across runs, so every manifest row
    stamps this and ``done_partitions`` REFUSES to resume under a
    different partitioner — a silent mismatch would route rows of a
    "done" partition into an unfinished one. (Format bump, round 4:
    earlier manifests used a per-row ``zlib.crc32(str(key))`` loop —
    the write path's dominant Python cost; they carry no ``hasher``
    field and are refused the same way.)"""
    from ..functions.hashing import _HAS_POLARS

    if _HAS_POLARS:
        import polars as pl

        return f"polars-ahash-{pl.__version__}-seed41"
    return "blake2b8-seed41"


def partition_id_array(keys: pa.ChunkedArray | pa.Array, n_parts: int) -> pa.Array:
    """Deterministic partition id: vectorized 64-bit string hash
    (functions/hashing.hash_strings, seed 41) % n_parts — never Python
    ``hash`` (salted per process). ~17x the old per-row crc32 loop;
    cross-run stability is guarded by the ``partitioner_algo`` stamp."""
    from ..functions.hashing import hash_strings

    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    if not isinstance(arr, pa.Array):
        arr = pa.array([str(v) for v in arr], pa.string())
    else:
        arr = pc.cast(arr, pa.string())
    h = hash_strings(arr, seed=41)
    # top 32 bits -> int64 before the modulo: numpy's uint64 % has no
    # SIMD path and costs more than the hash itself at 1M rows
    h32 = (h >> np.uint64(32)).astype(np.int64)
    return pa.array((h32 % n_parts).astype(np.int32), pa.int32())


class Manifest:
    def __init__(self, out_dir: str, stage: str):
        # '_'-prefixed so Arrow/Ray parquet dataset discovery over
        # out_dir skips it (default ignore_prefixes ['.', '_'])
        self.path = os.path.join(out_dir, "_manifest.jsonl")
        self.stage = stage
        os.makedirs(out_dir, exist_ok=True)

    def done_partitions(self) -> set[int]:
        done = set()
        algo = partitioner_algo()
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["stage"] != self.stage:
                        continue
                    if rec.get("hasher", "zlib-crc32") != algo:
                        raise ValueError(
                            f"manifest {self.path} was written with "
                            f"partitioner {rec.get('hasher', 'zlib-crc32')!r}"
                            f" but this build uses {algo!r}; resuming "
                            "would mix partition layouts — rerun from "
                            "scratch or restore the matching build")
                    if rec["status"] == "done":
                        done.add(rec["partition_id"])
        return done

    def record(self, partition_id: int, row_count: int, lineage: str,
               status: str, wall_s: float) -> None:
        rec = {
            "partition_id": partition_id,
            "stage": self.stage,
            "row_count": row_count,
            "input_lineage": lineage,
            "status": status,
            "wall_s": round(wall_s, 4),
            "hasher": partitioner_algo(),
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def write_partitioned(ds, out_dir: str, *, key_col: str, n_parts: int,
                      stage: str, lineage: str = ""):
    """Adjacency-partitioned, resumable sink.

    Adds ``part = crc32(key) % n_parts``, drops partitions already in
    the manifest, writes ``part=<i>/`` parquet directories, then
    appends manifest rows (counts from a small groupby). Returns the
    manifest path.
    """
    from ray.data.aggregate import Count

    mani = Manifest(out_dir, stage)
    done = mani.done_partitions()

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part", partition_id_array(batch[key_col], n_parts))

    parted = ds.map_batches(add_part, batch_format="pyarrow")
    if done:
        done_arr = pa.array(sorted(done), pa.int32())

        def drop_done(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(pc.is_in(batch["part"], value_set=done_arr)))

        parted = parted.map_batches(drop_done, batch_format="pyarrow")

    t0 = time.monotonic()
    parted.write_parquet(out_dir, partition_cols=["part"])
    wall = time.monotonic() - t0

    counts = parted.groupby("part").aggregate(Count(alias_name="n")).take_all()
    for rec in counts:
        mani.record(int(rec["part"]), int(rec["n"]), lineage, "done",
                    wall / max(1, len(counts)))
    return mani.path
