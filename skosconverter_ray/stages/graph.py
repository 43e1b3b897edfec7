"""Iterative graph computation: distributed PageRank.

The iterative-algorithm operator class (power iteration with
synchronous barriers), built from the same primitives as the rest of
the engine — every round is one cogroup join (edges ⋈ ranks on src)
plus one coarse-bucket aggregate (contribution sum per dst); the
driver sees only per-round scalars (dangling mass, delta), never a
node→rank map.

Scale shape: edges and ranks stay distributed; per-round shuffle
volume is |edges| contribution rows (compact: dst + one double).
``repartition(num_buckets)`` before each groupby keeps block counts
flat across rounds (the measured compounding pitfall from the
canonicalization loop — BASELINE.md optimization log). Out-degrees
are computed ONCE and joined into the edge table up front, so the
per-round join ships (src, dst, inv_deg) — no degree recomputation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pagerank(edges_ds, *, damping: float = 0.85, n_iter: int = 20,
             num_buckets: int = 32, src_col: str = "src",
             dst_col: str = "dst"):
    """(src, dst) string-keyed edge Dataset -> (node, rank) Dataset.

    Standard PageRank power iteration (Page et al. 1999; damping d):
    ``r'(v) = (1-d)/N + d·(Σ_{u→v} r(u)/deg(u) + dangling/N)`` where
    ``dangling`` is the rank mass of nodes without out-edges. Exactly
    ``n_iter`` synchronous rounds; Σ rank = 1 preserved every round.
    """
    import ray.data as rd

    from ..config import use_hash_shuffle
    from .skew import bucket_aggregate

    use_hash_shuffle()

    def sym_nodes(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[src_col], pa.string())
        d = pc.cast(batch[dst_col], pa.string())
        return pa.table({"node": pa.concat_arrays(
            [s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s,
             d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d])})

    nodes = bucket_aggregate(
        edges_ds.map_batches(sym_nodes, batch_format="pyarrow"),
        ["node"], [("count", None, "_n")],
        num_buckets=num_buckets).drop_columns(["_n"]).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.string()),
                                       "rank": pa.array([], pa.float64())}))

    # out-degree folded into the edges once: (src, dst, inv_deg)
    def src_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": pc.cast(batch[src_col], pa.string())})

    deg = bucket_aggregate(
        edges_ds.map_batches(src_rows, batch_format="pyarrow"),
        ["node"], [("count", None, "deg")], num_buckets=num_buckets)

    from .joinutil import cogroup_join

    def edge_norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(batch[src_col], pa.string()),
            "dst": pc.cast(batch[dst_col], pa.string()),
        })

    edges = cogroup_join(
        edges_ds.map_batches(edge_norm, batch_format="pyarrow"),
        deg.map_batches(
            lambda b: pa.table({"node": b["node"],
                                "inv_deg": pc.divide(
                                    pa.scalar(1.0),
                                    pc.cast(b["deg"], pa.float64()))}),
            batch_format="pyarrow"),
        left_on="src", right_on="node", num_buckets=num_buckets,
        left_schema=pa.schema([("src", pa.string()), ("dst", pa.string())]),
        right_schema=pa.schema([("node", pa.string()),
                                ("inv_deg", pa.float64())]),
    ).materialize()

    # dangling flag folded into the rank table ONCE (a node absent
    # from deg has no out-edges); per round its mass is then a single
    # scan-aggregate over ranks — no extra join
    flagged = cogroup_join(
        nodes, deg.map_batches(
            lambda b: pa.table({"dnode": b["node"],
                                "deg": pc.cast(b["deg"], pa.int64())}),
            batch_format="pyarrow"),
        left_on="node", right_on="dnode", join_type="left outer",
        num_buckets=num_buckets,
        left_schema=pa.schema([("node", pa.string())]),
        right_schema=pa.schema([("dnode", pa.string()),
                                ("deg", pa.int64())]))

    r0 = 1.0 / n_nodes
    ranks_schema = pa.schema([("node", pa.string()),
                              ("rank", pa.float64()),
                              ("dang", pa.int8())])

    def init_rank(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"],
            "rank": pa.array(np.full(batch.num_rows, r0), pa.float64()),
            "dang": pc.cast(pc.is_null(batch["deg"]), pa.int8()),
        }, schema=ranks_schema)

    ranks = (flagged.map_batches(init_rank, batch_format="pyarrow")
             .repartition(num_buckets).materialize())

    from ray.data.aggregate import Sum

    # small graphs: the per-round dangling-mass scalar is a driver fold
    # over the pinned blocks (object fetch — saves one fixed-latency
    # exchange per round); large graphs keep it a distributed aggregate
    driver_fold = n_nodes <= 5_000_000

    for _ in range(n_iter):
        if driver_fold:
            dmass = 0.0
            for b in ranks.iter_batches(batch_format="pyarrow",
                                        batch_size=65536):
                dmass += float(np.dot(
                    b["rank"].to_numpy(zero_copy_only=False),
                    b["dang"].to_numpy(zero_copy_only=False)
                    .astype(np.float64)))
        else:
            dj = ranks.map_batches(
                lambda b: pa.table({"dm": pc.multiply(
                    b["rank"], pc.cast(b["dang"], pa.float64()))}),
                batch_format="pyarrow")
            dmass = float(dj.aggregate(Sum("dm", alias_name="s"))["s"]
                          or 0.0)

        contrib = cogroup_join(
            edges, ranks.map_batches(
                lambda b: pa.table({"rnode": b["node"], "rank": b["rank"]}),
                batch_format="pyarrow"),
            left_on="src", right_on="rnode", num_buckets=num_buckets,
            left_schema=pa.schema([("src", pa.string()),
                                   ("dst", pa.string()),
                                   ("inv_deg", pa.float64())]),
            right_schema=pa.schema([("rnode", pa.string()),
                                    ("rank", pa.float64())]))

        def msg(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch["dst"],
                "m": pc.multiply(batch["rank"], batch["inv_deg"]),
            })

        sums = bucket_aggregate(
            contrib.map_batches(msg, batch_format="pyarrow"),
            ["node"], [("sum", "m", "m")], num_buckets=num_buckets)

        base = (1.0 - damping) / n_nodes + damping * dmass / n_nodes

        # left-outer onto the rank table (IS the node set, carries the
        # dangling flag): nodes with no in-edges keep base mass only
        joined = cogroup_join(
            ranks.drop_columns(["rank"]), sums.map_batches(
                lambda b: pa.table({"mnode": b["node"], "m": b["m"]}),
                batch_format="pyarrow"),
            left_on="node", right_on="mnode", join_type="left outer",
            num_buckets=num_buckets,
            left_schema=pa.schema([("node", pa.string()),
                                   ("dang", pa.int8())]),
            right_schema=pa.schema([("mnode", pa.string()),
                                    ("m", pa.float64())]))

        def new_rank(batch: pa.Table, _base=base) -> pa.Table:
            m = pc.fill_null(pc.cast(batch["m"], pa.float64()), 0.0)
            return pa.table({
                "node": batch["node"],
                "rank": pc.add(pa.scalar(_base),
                               pc.multiply(pa.scalar(damping), m)),
                "dang": batch["dang"],
            }, schema=ranks_schema)

        # repartition before materialize is LOAD-BEARING: the cogroup
        # join's map_groups splits group output into many small blocks
        # (measured 576 blocks by round 2 without this), and iterated
        # shuffle cost compounds with block count (same pitfall as the
        # canonicalization loop — BASELINE.md optimization log)
        ranks = (joined.map_batches(new_rank, batch_format="pyarrow")
                 .repartition(num_buckets).materialize())

    return ranks.drop_columns(["dang"])
