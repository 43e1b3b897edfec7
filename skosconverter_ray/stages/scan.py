"""Distributed prefix sum (exclusive scan) in global key order.

The classic two-phase scan, Ray-Data-shaped: range-partition rows by an
integer key into ``num_buckets`` contiguous key ranges, fold per-bucket
sums small-side, exclusive-scan THOSE on the driver (num_buckets
scalars — never the rows), then one coarse cogroup pass adds each
bucket's base offset to a local vectorized cumsum. Every row moves
exactly once; driver state is O(num_buckets).

This is the primitive behind sequence packing (concatenate the corpus,
cut every ``cap`` tokens), global row numbering, and cumulative
training-mix accounting. At 100 TB raise ``num_buckets`` so a bucket's
rows fit one task (it is the reduce-side parallelism), exactly like
``bucket_aggregate``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def keyed_prefix_sum(ds, *, key: str, value: str,
                     key_range: tuple[int, int],
                     num_buckets: int = 32, out_col: str = "off"):
    """Add ``out_col``: the sum of ``value`` over all rows with a
    strictly smaller ``key`` (exclusive prefix sum in key order).
    Keys must be unique integers within ``key_range`` (inclusive)."""
    lo, hi = key_range
    width = max(1, (hi - lo) // num_buckets + 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_pb", pa.array(((k - lo) // width).astype(np.int32)))

    # materialized: consumed by the bucket-sum fold AND the scan pass
    tagged = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .materialize()

    # per-bucket sums, folded on the driver from map-side partials
    # (num_buckets scalars — no exchange)
    sums = np.zeros(num_buckets + 1, dtype=np.int64)
    for b in tagged.map_batches(
            lambda b: pa.Table.from_pydict(
                {"_pb": b["_pb"], "_s": b[value]}).group_by("_pb")
            .aggregate([("_s", "sum")]),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        pb = b["_pb"].to_numpy(zero_copy_only=False)
        np.add.at(sums, pb, b["_s_sum"].to_numpy(zero_copy_only=False))
    base = np.concatenate(([0], np.cumsum(sums[:-1])))[:num_buckets + 1]
    import ray
    base_ref = ray.put(base)

    def scan_bucket(group: pa.Table, _ref=base_ref) -> pa.Table:
        bases = ray.get(_ref)
        pb = int(group["_pb"][0].as_py())
        k = group[key].to_numpy(zero_copy_only=False)
        v = group[value].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        excl = np.zeros(len(v), dtype=np.int64)
        excl[order] = np.cumsum(v[order]) - v[order]
        out = group.drop_columns(["_pb"]).append_column(
            out_col, pa.array(excl + bases[pb], pa.int64()))
        return out

    return tagged.groupby("_pb").map_groups(scan_bucket,
                                            batch_format="pyarrow")


def keyed_prefix_max(ds, *, key: str, value: str,
                     key_range: tuple[int, int],
                     num_buckets: int = 32, out_col: str = "runmax"):
    """Add ``out_col``: the INCLUSIVE running maximum of ``value`` in
    ``key`` order (max over all rows with key <= this row's key). Keys
    must be unique integers within ``key_range``.

    Same two-phase scan as keyed_prefix_sum with (max, -inf) replacing
    (sum, 0): per-bucket maxima fold on the driver (num_buckets
    scalars), an exclusive scan of THOSE gives each bucket's base, and
    one pass computes the local inclusive cummax + base. This is the
    event-time WATERMARK primitive: with key = arrival sequence and
    value = event timestamp, out_col is the watermark after each
    element."""
    lo, hi = key_range
    width = max(1, (hi - lo) // num_buckets + 1)
    NEG = np.iinfo(np.int64).min

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_pb", pa.array(((k - lo) // width).astype(np.int32)))

    tagged = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .materialize()

    maxes = np.full(num_buckets + 1, NEG, dtype=np.int64)
    for b in tagged.map_batches(
            lambda b: pa.Table.from_pydict(
                {"_pb": b["_pb"], "_m": b[value]}).group_by("_pb")
            .aggregate([("_m", "max")]),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        pb = b["_pb"].to_numpy(zero_copy_only=False)
        np.maximum.at(maxes, pb, b["_m_max"].to_numpy(zero_copy_only=False))
    base = np.full(num_buckets + 1, NEG, dtype=np.int64)
    base[1:] = np.maximum.accumulate(maxes[:-1])
    import ray
    base_ref = ray.put(base)

    def scan_bucket(group: pa.Table, _ref=base_ref) -> pa.Table:
        bases = ray.get(_ref)
        pb = int(group["_pb"][0].as_py())
        k = group[key].to_numpy(zero_copy_only=False)
        v = group[value].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        incl = np.empty(len(v), dtype=np.int64)
        incl[order] = np.maximum.accumulate(v[order])
        out = group.drop_columns(["_pb"]).append_column(
            out_col, pa.array(np.maximum(incl, bases[pb]), pa.int64()))
        return out

    return tagged.groupby("_pb").map_groups(scan_bucket,
                                            batch_format="pyarrow")
