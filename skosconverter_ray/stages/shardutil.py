"""Shared plumbing for bucket-actor (Pregel-tier) stages.

``split_dataset_by_bucket`` scatters a materialized Dataset's blocks
into per-bucket table refs: one remote split task per block, data
moving block → split task → shard actor (twice, setup only). Shard
actors then ``ray.get`` exactly their column of refs — the driver
relays refs, never rows. Used by the PageRank/PPR and HITS shard
engines (stages/graph.py), the tree-order propagation shards
(stages/hierarchy.py), the union-find shards (canonicalize.py), and
the label-propagation shards (communities.py).

Fault model (deliberate): shard actors are assumed live for the
duration of ONE stage run — they hold in-memory iteration state that
Ray could not transparently rebuild, so the engines do NOT set
max_restarts. Recovery is re-running the stage: its inputs are always
MATERIALIZED datasets (pinned blocks / lineage), the actors are
created per run and ``ray.kill``-ed in ``finally``, and the stage is
deterministic, so a re-run is bit-identical. At cluster scale that
re-run is bounded by one stage, never the whole pipeline — the same
contract Ray Data itself offers for a failed all-to-all."""

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


def cogroup_scatter(a_ds, a_key, b_ds, b_key, n_buckets: int, fn,
                    key_to_bucket=None, empty_result: pa.Table = None):
    """Two-sided task-level hash cogroup: ``fn(a_tbl, b_tbl)`` per
    bucket, with NO sort, NO tagged-union re-materialize.

    Both inputs must be materialized (``from_arrow_refs`` outputs — as
    scatter_apply_by_value and the banding gathers produce — qualify
    for free: ``to_arrow_refs`` returns their existing refs). One
    split task per block hashes its OWN key column; one gather task
    per bucket concatenates each side and applies ``fn``. Compared to
    routing the same cogroup through two map_batches tags + a union +
    a materialize + an exchange, this is one barrier instead of three.

    ``key_to_bucket``: vectorized ``values -> int bucket ids`` (default
    functions.hashing.bucket_of over stringified keys — both sides MUST
    use the same function for co-location).
    """
    import ray
    import ray.data as rd

    import pyarrow.compute as pc

    from ..functions.hashing import bucket_of

    B = n_buckets
    if key_to_bucket is None:
        def key_to_bucket(values):
            import numpy as np

            if pa.types.is_integer(values.type):
                # int keys: one vectorized mix — casting millions of
                # ids to strings for the polars hash cost more than
                # the exchange itself (measured on the 5.5M-row
                # banding-pair scatter)
                v = values.to_numpy(zero_copy_only=False) \
                    .astype(np.uint64)
                h = v * np.uint64(0x9E3779B97F4A7C15)
                return ((h >> np.uint64(32)).astype(np.int64)
                        % B).astype(np.int32)
            if not pa.types.is_string(values.type):
                values = pc.cast(values, pa.string())
            return bucket_of(values, B).to_numpy(zero_copy_only=False)

    @ray.remote(num_returns=B)
    def split(tbl: pa.Table, key: str):
        if tbl.num_rows == 0 or key not in tbl.column_names:
            return tuple(None for _ in range(B)) if B > 1 else None
        bk = key_to_bucket(tbl[key].combine_chunks())
        parts = tuple(tbl.filter(pa.array(bk == t)) for t in range(B))
        return parts if B > 1 else parts[0]

    @ray.remote
    def gather(a_refs, b_refs):
        a_parts = [t for t in ray.get(list(a_refs))
                   if t is not None and t.num_rows]
        b_parts = [t for t in ray.get(list(b_refs))
                   if t is not None and t.num_rows]
        if not a_parts and not b_parts and empty_result is not None:
            return empty_result
        a = (pa.concat_tables(a_parts).combine_chunks() if a_parts
             else None)
        b = (pa.concat_tables(b_parts).combine_chunks() if b_parts
             else None)
        return fn(a, b)

    def _cols(ds, key):
        cols: list[list] = [[] for _ in range(B)]
        for ref in ds.to_arrow_refs():
            out = split.remote(ref, key)
            if B == 1:
                out = [out]
            for t, part in enumerate(out):
                cols[t].append(part)
        return cols

    a_cols, b_cols = _cols(a_ds, a_key), _cols(b_ds, b_key)
    return rd.from_arrow_refs(
        [gather.remote(a_cols[t], b_cols[t]) for t in range(B)])


def multiway_cogroup_scatter(sides, n_buckets: int, fn,
                             key_to_bucket=None,
                             empty_result: pa.Table = None):
    """N-ary task-level hash cogroup (round 5): ``fn(t0, …, tN-1)``
    per bucket over ANY number of materialized sides, each given as
    ``(dataset, key_column)``. The composition shape: k sequential
    binary cogroup joins on ONE shared key pay k exchange barriers
    for what is a single co-partitioned local join — this pays one.
    Sides hash with the SAME bucket function (int mix for integer
    keys, bucket_of otherwise), so co-location holds across all of
    them; a side's table arrives as ``None`` in ``fn`` when its
    bucket is empty. Same materialized-inputs contract as
    cogroup_scatter."""
    import ray
    import ray.data as rd

    import pyarrow.compute as pc

    from ..functions.hashing import bucket_of

    B = n_buckets
    if key_to_bucket is None:
        def key_to_bucket(values):
            import numpy as np

            if pa.types.is_integer(values.type):
                v = values.to_numpy(zero_copy_only=False) \
                    .astype(np.uint64)
                h = v * np.uint64(0x9E3779B97F4A7C15)
                return ((h >> np.uint64(32)).astype(np.int64)
                        % B).astype(np.int32)
            if not pa.types.is_string(values.type):
                values = pc.cast(values, pa.string())
            return bucket_of(values, B).to_numpy(zero_copy_only=False)

    @ray.remote(num_returns=B)
    def split(tbl: pa.Table, key: str):
        if tbl.num_rows == 0 or key not in tbl.column_names:
            return tuple(None for _ in range(B)) if B > 1 else None
        bk = key_to_bucket(tbl[key].combine_chunks())
        parts = tuple(tbl.filter(pa.array(bk == t)) for t in range(B))
        return parts if B > 1 else parts[0]

    @ray.remote
    def gather(*ref_lists):
        tbls = []
        any_rows = False
        for refs in ref_lists:
            parts = [t for t in ray.get(list(refs))
                     if t is not None and t.num_rows]
            any_rows = any_rows or bool(parts)
            tbls.append(pa.concat_tables(parts).combine_chunks()
                        if parts else None)
        if not any_rows and empty_result is not None:
            return empty_result
        return fn(*tbls)

    all_cols = []
    for ds, key in sides:
        cols: list[list] = [[] for _ in range(B)]
        for ref in ds.to_arrow_refs():
            out = split.remote(ref, key)
            if B == 1:
                out = [out]
            for t, part in enumerate(out):
                cols[t].append(part)
        all_cols.append(cols)
    return rd.from_arrow_refs(
        [gather.remote(*[c[t] for c in all_cols]) for t in range(B)])
