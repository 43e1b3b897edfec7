"""Shared plumbing for bucket-actor (Pregel-tier) stages.

``split_dataset_by_bucket`` scatters a materialized Dataset's blocks
into per-bucket table refs: one remote split task per block, data
moving block → split task → shard actor (twice, setup only). Shard
actors then ``ray.get`` exactly their column of refs — the driver
relays refs, never rows. Used by the PageRank shard engine
(stages/graph.py) and the tree-order propagation shards
(stages/hierarchy.py)."""

from __future__ import annotations

import pyarrow as pa


def split_dataset_by_bucket(ds, col: str, n_buckets: int) -> list[list]:
    """Materialized Dataset -> ``n_buckets`` lists of table refs,
    bucketed by ``bucket_of(col)``. Schema-less empty blocks (the
    groupby/map_groups pitfall) yield zero-row parts that loaders
    drop."""
    import ray

    from ..functions.hashing import bucket_of

    B = n_buckets

    @ray.remote(num_returns=B)
    def split(tbl: pa.Table):
        if col not in tbl.column_names or tbl.num_rows == 0:
            parts = tuple(tbl.slice(0, 0) for _ in range(B))
        else:
            bk = bucket_of(tbl[col].combine_chunks(), B) \
                .to_numpy(zero_copy_only=False)
            parts = tuple(tbl.filter(pa.array(bk == t))
                          for t in range(B))
        return parts if B > 1 else parts[0]

    cols: list[list] = [[] for _ in range(B)]
    for ref in ds.to_arrow_refs():
        out = split.remote(ref)
        if B == 1:
            out = [out]
        for t, part in enumerate(out):
            cols[t].append(part)
    return cols
