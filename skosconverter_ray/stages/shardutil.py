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


def scatter_apply_by_value(ds, bucket_col: str, n_buckets: int, fn,
                           empty_result: pa.Table | None = None):
    """Task-level hash exchange: materialized Dataset -> per-bucket
    ``fn(concat(bucket tables))`` -> Dataset, with NO sort.

    Ray's ``groupby(bucket).map_groups`` runs a SORT-based all-to-all
    (sample + range partition + per-partition sort) that dominated the
    flagship dedup wall at 1M docs (41 s of a 60 s run at 16 cpus).
    When rows already carry an int bucket column in [0, n_buckets),
    grouping needs none of that: one split task per block scatters
    rows by bucket value, one gather task per bucket concatenates its
    parts and applies ``fn``. Every row moves once through the object
    store; wall is max(split) + max(gather). ``fn`` must be
    serializable and accept one ``pa.Table``.

    ``empty_result``: schema-correct empty output returned for empty
    buckets INSTEAD of calling ``fn`` — pass it when ``fn`` assumes
    non-empty input (``groupby().map_groups`` never delivered empty
    groups; this exchange otherwise calls ``fn`` on a schema-carrying
    empty table)."""
    import numpy as np
    import ray
    import ray.data as rd

    B = n_buckets
    # unified schema up front: upstream map_groups can leave EMPTY
    # schema-less blocks in a materialized dataset — their slices must
    # not define any bucket's schema, and the all-empty gather path
    # needs a real schema to hand fn
    sch = ds.schema()
    if sch is None:
        # fully-empty materialized dataset (schema() is None): nothing
        # to scatter and no input schema to hand fn
        if empty_result is not None:
            import ray.data as rd

            return rd.from_arrow(empty_result)
        return ds
    schema = pa.schema(list(zip(sch.names, sch.types)))

    @ray.remote(num_returns=B)
    def split(tbl: pa.Table):
        if tbl.num_rows == 0 or bucket_col not in tbl.column_names:
            parts = tuple(schema.empty_table() for _ in range(B))
        else:
            bk = tbl[bucket_col].to_numpy(zero_copy_only=False)
            parts = tuple(tbl.filter(pa.array(bk == t))
                          for t in range(B))
        return parts if B > 1 else parts[0]

    @ray.remote
    def gather(*parts):
        tbls = [p for p in parts if p.num_rows]
        if not tbls:
            if empty_result is not None:
                return empty_result
            return fn(schema.empty_table())
        return fn(pa.concat_tables(tbls).combine_chunks())

    in_refs = ds.to_arrow_refs()
    if not in_refs:
        # zero-block input: fn still defines the output schema (e.g. a
        # join's output differs from its tagged input) — apply it to a
        # schema-carrying empty table on the driver
        if empty_result is not None:
            return rd.from_arrow(empty_result)
        return rd.from_arrow(fn(schema.empty_table()))
    cols: list[list] = [[] for _ in range(B)]
    for ref in in_refs:
        out = split.remote(ref)
        if B == 1:
            out = [out]
        for t, part in enumerate(out):
            cols[t].append(part)

    # gather outputs are driver-owned task returns (refs only — rows
    # never land on the driver)
    return rd.from_arrow_refs([gather.remote(*cols[t]) for t in range(B)])
