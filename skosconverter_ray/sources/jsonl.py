"""Gzip-compressed JSONL shard sink/source — the interchange format of
crawl pipelines (Common-Crawl-style corpora ship as *.jsonl.gz shards).

The sink is a map_batches stage: each block serializes to NDJSON with
polars' vectorized writer and gzips with the stdlib (mtime pinned to 0
so identical content gives identical bytes), one shard per block —
the write parallelizes with the pipeline and nothing corpus-sized
transits the driver. The source is Ray's own read_json told to
decompress (arrow_open_stream_args) and to accept the .gz extension.
"""

from __future__ import annotations

import gzip
import os
import uuid

import pyarrow as pa


def write_jsonl_gz(ds, path: str) -> int:
    """Write a Dataset as gzip JSONL shards under ``path`` (one shard
    per block, content-addressed-unique names). Returns rows
    written. Blocks write from the map tasks themselves; the driver
    only folds the per-shard row counts."""
    import polars as pl

    os.makedirs(path, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        text = pl.from_arrow(batch).write_ndjson()
        name = f"shard-{uuid.uuid4().hex}.jsonl.gz"
        tmp = os.path.join(path, f".{name}.tmp")
        with open(tmp, "wb") as f:
            with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                gz.write(text.encode("utf-8"))
        os.rename(tmp, os.path.join(path, name))  # atomic publish
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    total = 0
    for b in ds.map_batches(dump, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        total += sum(b["rows"].to_pylist())
    return total


def read_jsonl_gz(path: str):
    """Read a directory of *.jsonl.gz shards back as a Dataset."""
    import ray.data as rd

    return rd.read_json(path, file_extensions=["gz"],
                        arrow_open_stream_args={"compression": "gzip"})
