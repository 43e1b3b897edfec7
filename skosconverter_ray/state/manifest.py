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
import zlib

import pyarrow as pa
import pyarrow.compute as pc


def partition_id_array(keys: pa.ChunkedArray | pa.Array, n_parts: int) -> pa.Array:
    """Deterministic partition id: crc32(key) % n_parts (never Python
    ``hash``, which is salted per process)."""
    vals = keys.to_pylist() if hasattr(keys, "to_pylist") else list(keys)
    return pa.array([zlib.crc32(str(v).encode()) % n_parts for v in vals],
                    pa.int32())


class Manifest:
    def __init__(self, out_dir: str, stage: str):
        # '_'-prefixed so Arrow/Ray parquet dataset discovery over
        # out_dir skips it (default ignore_prefixes ['.', '_'])
        self.path = os.path.join(out_dir, "_manifest.jsonl")
        self.stage = stage
        os.makedirs(out_dir, exist_ok=True)

    def done_partitions(self) -> set[int]:
        done = set()
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["stage"] == self.stage and rec["status"] == "done":
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
