"""Iterative graph computation: distributed PageRank.

The iterative-algorithm operator class (power iteration with
synchronous barriers). Three engines behind one contract:

- **driver** (≤ ``max_driver_edges``): vectorized numpy folds.
- **actors** (default above the gate): Pregel-style shard actors —
  rank partitions co-located with their out-edges by key hash, one
  emit + one apply RPC wave per round, per-dst pre-aggregated message
  tables moving actor→actor through the object store. Zero Dataset
  exchanges per round (measured 5.3 s vs 46 s for the Dataset loop on
  the 60k-edge gate graph, bit-identical ranks). This is the
  "raw Ray actors where the Dataset API can't express it" tier: a
  synchronous iteration over mutable sharded state.
- **dataset** (``engine="dataset"``): every round is one cogroup join
  (edges ⋈ ranks on src) plus one coarse-bucket aggregate
  (contribution sum per dst); kept for lineage-pure environments and
  its own parity tests. The driver sees only per-round scalars
  (dangling mass, delta), never a node→rank map.

Scale shape: edges and ranks stay distributed; per-round shuffle
volume is |edges| contribution rows (compact: dst + one double).
``repartition(num_buckets)`` before each groupby keeps block counts
flat across rounds (the measured compounding pitfall from the
canonicalization loop — BASELINE.md optimization log). Out-degrees
are computed ONCE and joined into the edge table up front, so the
per-round join ships (src, dst, inv_deg) — no degree recomputation.

Size-gated fast path (same pattern as the canonicalization
union-find, stages/canonicalize.py): when the edge list fits the
driver (``max_driver_edges``, default 4M rows ≈ a few hundred MB of
int indices) the iteration runs as vectorized numpy bincount folds —
each distributed round costs two fixed-latency exchanges (~1.5 s on
this box regardless of data size), so for small/medium graphs the
driver path is orders of magnitude faster with identical semantics.
The distributed path stays exercised by forced-path parity tests
(``max_driver_edges=0``). The normalized edge list is materialized
ONCE up front: both paths (and the distributed path's three
consumers: node set, degrees, per-round join) read the pinned copy,
never re-executing upstream lineage (the shared-lineage pitfall,
BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _reset_vector(nodes, seeds) -> np.ndarray:
    """Teleport distribution over ``nodes``: uniform when ``seeds`` is
    None, else 1/k on the k seed nodes present (personalized PageRank
    / random walk with restart — Page et al. 1999 §6; the seed SET is
    dimension-sized by assumption and rides in task closures)."""
    n = len(nodes)
    if seeds is None:
        return np.full(n, 1.0 / max(1, n))
    if isinstance(nodes, (pa.Array, pa.ChunkedArray)):
        mask = pc.is_in(nodes, value_set=pa.array(
            sorted(seeds), pa.string())).to_numpy(zero_copy_only=False)
    else:
        mask = np.isin(np.asarray(nodes, dtype=object),
                       np.asarray(sorted(seeds), dtype=object))
    k = int(mask.sum())
    if k == 0:
        raise ValueError("personalized pagerank: no seed node "
                         "present in the graph")
    return np.where(mask, 1.0 / k, 0.0)


def resolve_engine(engine: str, n_edges: int, max_driver_edges: int,
                   extra: tuple = ()) -> str:
    """Shared gate for the iterative operators' ``engine`` kwarg
    (round 5 — pagerank/hits/kcore/label_propagation/
    components_min_label previously each had their own convention):
    ``"auto"`` routes by the driver gate (numpy fast path at or below
    ``max_driver_edges`` edge rows, shard actors above); an explicit
    name picks that engine unconditionally; anything else is rejected
    loudly instead of silently running some default."""
    valid = ("auto", "driver", "actors") + tuple(extra)
    if engine not in valid:
        raise ValueError(f"unknown engine {engine!r}; expected one "
                         f"of {valid}")
    if engine == "auto":
        return "driver" if n_edges <= max_driver_edges else "actors"
    return engine


def encode_node_codes(cols) -> tuple[pa.Array, np.ndarray]:
    """Concatenated string columns -> (lexicographically sorted unique
    node array, int64 codes over the concatenation, with integer order
    == string order so index-based tie rules match string tie rules).

    One Arrow ``dictionary_encode`` replaces ``np.unique`` over
    object-dtype numpy at the iterative operators' driver gates
    (round 5): at the 4M-edge gate the object arrays held GBs of
    PyStr; dictionary codes peel/propagate at int64 speed and the
    strings materialize exactly once, in the dictionary."""
    arrs: list[pa.Array] = []
    for c in cols:
        if isinstance(c, pa.ChunkedArray):
            arrs.extend(c.chunks)
        elif c is not None:
            arrs.append(c)
    arrs = [a for a in arrs if len(a)]
    if not arrs:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    enc = pa.concat_arrays(arrs).dictionary_encode()
    d = enc.dictionary
    order = pc.sort_indices(d).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    rank = np.empty(len(d), np.int64)
    rank[order] = np.arange(len(d), dtype=np.int64)
    codes = rank[enc.indices.to_numpy(zero_copy_only=False)
                 .astype(np.int64)]
    return d.take(pa.array(order, pa.int64())), codes


def _pagerank_driver(norm_ds, *, damping: float, n_iter: int,
                     tol: float | None, seeds=None):
    """Vectorized driver-side power iteration over a pinned (src, dst)
    Dataset that fits the gate (``max_driver_edges``). Multi-edge
    semantics identical to the distributed path: out-degree counts
    edge ROWS, each row contributes rank/deg. ``seeds`` switches the
    teleport vector from uniform to the personalized 1/k-on-seeds
    distribution; dangling mass redistributes by the SAME vector, so
    the update is r' = ((1-d) + d*dangling) * reset + d * M r in both
    modes."""
    import ray.data as rd

    srcs, dsts = [], []
    for b in norm_ds.iter_batches(batch_format="pyarrow",
                                  batch_size=262144):
        srcs.append(b["src"])
        dsts.append(b["dst"])
    nodes, codes = encode_node_codes(srcs + dsts)
    m = len(codes) // 2
    src_i, dst_i = codes[:m], codes[m:]
    n = len(nodes)
    deg = np.bincount(src_i, minlength=n).astype(np.float64)
    dangling = deg == 0.0
    inv_deg = np.zeros(n)
    np.divide(1.0, deg, out=inv_deg, where=~dangling)
    reset = _reset_vector(nodes, seeds)
    r = reset.copy()
    for _ in range(n_iter):
        contrib = r[src_i] * inv_deg[src_i]
        nxt = np.bincount(dst_i, weights=contrib, minlength=n)
        dmass = float(r[dangling].sum())
        scale = (1.0 - damping) + damping * dmass
        new = scale * reset + damping * nxt
        delta = float(np.abs(new - r).max())
        r = new
        if tol is not None and delta < tol:
            break
    return rd.from_arrow(pa.table({
        "node": nodes,
        "rank": pa.array(r, pa.float64())}))


class _PRShard:
    """One Pregel-style rank shard (decorated ``ray.remote`` at use).

    Holds the rank partition for nodes with ``bucket_of(node) == b``
    plus every edge whose SRC hashes to ``b`` — so message emission is
    entirely local (a node's rank and its out-edges co-locate by
    construction). Per round the shard pre-aggregates its messages per
    destination and ships ONE compact (dst, m) table ref per peer;
    message tables move actor→actor through the object store, the
    driver only relays refs and scalars."""

    def __init__(self, bucket: int, n_buckets: int, damping: float,
                 seeds=None):
        self.b, self.B, self.d = bucket, n_buckets, damping
        self.seeds = seeds

    def load(self, src_edge_refs, dst_edge_refs) -> int:
        """Zero-exchange setup (round 4): the shard derives its OWN
        node set from two task-level splits of the raw edges — srcs of
        the src-sharded split and dsts of the dst-sharded split both
        hash to this bucket, and every node appears in one of them.
        Edge shards hash by src with the same hash, so out-degree,
        per-edge 1/deg and the dangling flag are all LOCAL too. (This
        replaced a distinct-nodes aggregate, a deg aggregate and two
        cogroup joins of driver-side setup — every pre-actor
        exchange.) Returns the local node count; the driver folds the
        total and calls ``init`` with it — returns (local nodes,
        local seeds) so the personalized mode folds both scalars."""
        import ray

        from ..functions.hashing import bucket_of

        etbls = [t for t in ray.get(list(src_edge_refs)) if t.num_rows]
        edges = (pa.concat_tables(etbls) if etbls
                 else pa.table({"src": pa.array([], pa.string()),
                                "dst": pa.array([], pa.string())}))
        dtbls = [t for t in ray.get(list(dst_edge_refs)) if t.num_rows]
        local_dsts = (pa.concat_tables(dtbls)["dst"].combine_chunks()
                      if dtbls else pa.array([], pa.string()))
        src_col = edges["src"].combine_chunks()
        self.nodes = pa.array(np.unique(np.concatenate((
            src_col.to_numpy(zero_copy_only=False),
            local_dsts.to_numpy(zero_copy_only=False)))), pa.string())
        n = len(self.nodes)

        src_idx = pc.index_in(src_col, value_set=self.nodes)
        if edges.num_rows and pc.any(pc.is_null(src_idx)).as_py():
            raise AssertionError("edge src outside its rank shard")
        self.src_idx = src_idx.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        deg = np.bincount(self.src_idx, minlength=n) if n else \
            np.zeros(0, np.int64)
        self.dang = deg == 0
        self.inv_deg = 1.0 / np.maximum(deg[self.src_idx], 1) \
            if len(self.src_idx) else np.empty(0, np.float64)
        dst = edges["dst"].combine_chunks()
        dst_np = np.asarray(dst.to_pylist(), dtype=object)
        dbk = bucket_of(dst, self.B).to_numpy(zero_copy_only=False) \
            if edges.num_rows else np.empty(0, np.int32)
        # per peer: emission order + unique dsts + reduceat offsets,
        # precomputed ONCE so a round is pure vectorized arithmetic
        self.route = []
        for t in range(self.B):
            sel = np.where(dbk == t)[0]
            if sel.size == 0:
                self.route.append(None)
                continue
            order = sel[np.argsort(dst_np[sel], kind="stable")]
            uniq, starts = np.unique(dst_np[order], return_index=True)
            self.route.append(
                (order, pa.array(uniq.tolist(), pa.string()), starts))
        nodes_np = self.nodes.to_numpy(zero_copy_only=False)
        self._seed_mask = (np.isin(
            nodes_np, np.asarray(sorted(self.seeds), dtype=object))
            if self.seeds is not None else None)
        k_local = int(self._seed_mask.sum()) \
            if self._seed_mask is not None else 0
        return len(self.nodes), k_local

    def init(self, n_nodes: int, k_seeds: int = 0) -> None:
        """Second setup wave: teleport/reset weights once the driver
        has folded the global node and seed counts from load() —
        uniform 1/N, or 1/k on the shard's seed nodes (personalized
        mode); rank starts AT the reset distribution in both modes."""
        if self._seed_mask is None:
            self.reset = np.full(len(self.nodes), 1.0 / max(1, n_nodes))
        else:
            self.reset = np.where(self._seed_mask,
                                  1.0 / max(1, k_seeds), 0.0)
        self.rank = self.reset.copy()

    def emit(self):
        import ray

        m_all = self.rank[self.src_idx] * self.inv_deg
        refs = []
        for r in self.route:
            if r is None:
                refs.append(None)
                continue
            order, uniq, starts = r
            sums = np.add.reduceat(m_all[order], starts)
            refs.append(ray.put(pa.table({"dst": uniq,
                                          "m": sums})))
        dang_local = float(self.rank[self.dang].sum())
        return dang_local, refs

    def apply(self, scale: float, msg_refs) -> float:
        """``scale`` = (1-d) + d*dangling_mass; the teleport term is
        scale * reset(v), which reduces to the old uniform base when
        reset is 1/N."""
        import ray

        acc = np.zeros(len(self.nodes))
        for tbl in ray.get(list(msg_refs)):
            idx = pc.index_in(tbl["dst"].combine_chunks(),
                              value_set=self.nodes)
            np.add.at(acc, idx.to_numpy(zero_copy_only=False)
                      .astype(np.int64),
                      tbl["m"].to_numpy(zero_copy_only=False))
        new = scale * self.reset + self.d * acc
        delta = float(np.abs(new - self.rank).max()) if len(new) else 0.0
        self.rank = new
        return delta

    def result(self) -> pa.Table:
        return pa.table({"node": self.nodes,
                         "rank": pa.array(self.rank, pa.float64())})


def _pagerank_actors(norm, *,
                     damping: float, n_iter: int, tol: float | None,
                     num_shards: int, seeds=None):
    """Actor-sharded power iteration (the >driver-gate engine).

    Zero Dataset exchanges per round: B long-lived shard actors hold
    rank partitions + co-located out-edges; a round is one emit wave
    (per-dst pre-aggregated message tables, B² refs relayed by the
    driver) and one apply wave. The Dataset-loop engine pays 3
    fixed-latency all-to-alls per round (~9 s/round at gate scale);
    this pays 2 actor RPC waves (~0.1 s/round) and moves each message
    table once."""
    import ray
    import ray.data as rd

    from .shardutil import split_dataset_by_bucket

    B = num_shards

    # splits before actor creation + zero-CPU actors: reserving
    # B x num_cpus would starve the split tasks (actor-pool live-lock).
    # Raw (src, dst) edges split twice — by src (emission locality)
    # and by dst (node discovery) — both task-level passes, no
    # exchange; nodes/deg/inv_deg/dangling derive locally in load.
    src_cols = split_dataset_by_bucket(norm, "src", B)
    dst_cols = split_dataset_by_bucket(norm, "dst", B)

    Shard = ray.remote(num_cpus=0)(_PRShard)
    shards = [Shard.remote(b, B, damping, seeds) for b in range(B)]
    try:
        loads = ray.get([s.load.remote(src_cols[b], dst_cols[b])
                         for b, s in enumerate(shards)])
        n_nodes = sum(l[0] for l in loads)
        k_seeds = sum(l[1] for l in loads)
        if seeds is not None and k_seeds == 0:
            raise ValueError("personalized pagerank: no seed node "
                             "present in the graph")
        ray.get([s.init.remote(n_nodes, k_seeds) for s in shards])
        for _ in range(n_iter):
            outs = ray.get([s.emit.remote() for s in shards])
            dmass = sum(o[0] for o in outs)
            scale = (1.0 - damping) + damping * dmass
            inbox = [[outs[b][1][t] for b in range(B)
                      if outs[b][1][t] is not None] for t in range(B)]
            deltas = ray.get([s.apply.remote(scale, inbox[t])
                              for t, s in enumerate(shards)])
            if tol is not None and max(deltas) < tol:
                break
        out = rd.from_arrow_refs(
            [s.result.remote() for s in shards]).materialize()
    finally:
        for s in shards:
            ray.kill(s)
    return out


def pagerank(edges_ds, *, damping: float = 0.85, n_iter: int = 20,
             num_buckets: int = 32, src_col: str = "src",
             dst_col: str = "dst", max_driver_edges: int = 4_000_000,
             tol: float | None = None, engine: str = "auto",
             seeds=None):
    """(src, dst) string-keyed edge Dataset -> (node, rank) Dataset.

    Standard PageRank power iteration (Page et al. 1999; damping d):
    ``r'(v) = (1-d)/N + d·(Σ_{u→v} r(u)/deg(u) + dangling/N)`` where
    ``dangling`` is the rank mass of nodes without out-edges. Up to
    ``n_iter`` synchronous rounds (early exit when the max |Δrank|
    drops below ``tol``, if given); Σ rank = 1 preserved every round.

    ``max_driver_edges`` gates the numpy fast path (module docstring);
    pass 0 to force a distributed engine (parity tests do).
    ``seeds`` (an iterable of node ids, dimension-sized by assumption)
    switches to PERSONALIZED PageRank / random walk with restart: the
    teleport vector becomes 1/k on the seed nodes (0 elsewhere) and
    dangling mass redistributes to the seeds — ranks then measure
    proximity to the seed set. All three engines honor it.
    ``engine`` picks the distributed implementation above the gate:
    ``"auto"``/``"actors"`` = Pregel-style shard actors (zero Dataset
    exchanges per round — see _pagerank_actors), ``"dataset"`` = the
    cogroup-join/aggregate loop kept for lineage-pure environments and
    covered by its own parity tests.
    """
    import ray.data as rd

    from ..config import use_hash_shuffle
    from .skew import bucket_aggregate

    use_hash_shuffle()

    def edge_norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(batch[src_col], pa.string()),
            "dst": pc.cast(batch[dst_col], pa.string()),
        })

    norm = (edges_ds.map_batches(edge_norm, batch_format="pyarrow")
            .materialize())
    n_edges = norm.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.string()),
                                       "rank": pa.array([], pa.float64())}))
    seeds = frozenset(str(s) for s in seeds) if seeds is not None \
        else None
    engine = resolve_engine(engine, n_edges, max_driver_edges,
                            extra=("dataset",))
    if engine == "driver":
        return _pagerank_driver(norm, damping=damping, n_iter=n_iter,
                                tol=tol, seeds=seeds)

    def sym_nodes(batch: pa.Table) -> pa.Table:
        s = batch["src"].combine_chunks() if isinstance(
            batch["src"], pa.ChunkedArray) else batch["src"]
        d = batch["dst"].combine_chunks() if isinstance(
            batch["dst"], pa.ChunkedArray) else batch["dst"]
        return pa.table({"node": pa.concat_arrays([s, d])})

    if engine == "actors":
        # zero-exchange setup: the shards derive node sets, degrees
        # and dangling flags locally from two task-level edge splits
        # (by src and by dst) — none of the nodes/deg/edges/flagged
        # exchanges below are needed
        return _pagerank_actors(
            norm, damping=damping, n_iter=n_iter, tol=tol,
            num_shards=max(2, min(num_buckets, 8)), seeds=seeds)

    nodes = bucket_aggregate(
        norm.map_batches(sym_nodes, batch_format="pyarrow"),
        ["node"], [("count", None, "_n")],
        num_buckets=num_buckets).drop_columns(["_n"]).materialize()
    n_nodes = nodes.count()

    deg = bucket_aggregate(
        norm.select_columns(["src"]).map_batches(
            lambda b: pa.table({"node": b["src"]}),
            batch_format="pyarrow"),
        ["node"], [("count", None, "deg")], num_buckets=num_buckets)

    from .joinutil import cogroup_join

    edges = cogroup_join(
        norm,
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

    if seeds is not None:
        # global seed count: one tiny distributed fold over the node
        # table (the seed set itself is dimension-sized)
        seed_arr = pa.array(sorted(seeds), pa.string())
        k_seeds = 0
        for b in nodes.map_batches(
                lambda b, _s=seed_arr: pa.table({"k": [pc.sum(
                    pc.cast(pc.is_in(b["node"], value_set=_s),
                            pa.int64())).as_py() or 0]}),
                batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"):
            k_seeds += int(pc.sum(b["k"]).as_py() or 0)
        if k_seeds == 0:
            raise ValueError("personalized pagerank: no seed node "
                             "present in the graph")
    r0 = 1.0 / n_nodes
    ranks_schema = pa.schema([("node", pa.string()),
                              ("rank", pa.float64()),
                              ("dang", pa.int8()),
                              ("rw", pa.float64())])

    def init_rank(batch: pa.Table) -> pa.Table:
        if seeds is None:
            rw = pa.array(np.full(batch.num_rows, r0), pa.float64())
        else:
            m = pc.is_in(batch["node"], value_set=seed_arr)
            rw = pc.if_else(m, pa.scalar(1.0 / k_seeds), pa.scalar(0.0))
        return pa.table({
            "node": batch["node"],
            "rank": pc.cast(rw, pa.float64()),
            "dang": pc.cast(pc.is_null(batch["deg"]), pa.int8()),
            "rw": pc.cast(rw, pa.float64()),
        }, schema=ranks_schema)

    from ray.data.aggregate import Max  # noqa: F401  (distributed Δ fold)

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

        scale = (1.0 - damping) + damping * dmass

        # left-outer onto the rank table (IS the node set, carries the
        # dangling flag AND the previous rank, so |Δ| is computable
        # without another exchange): nodes with no in-edges keep base
        # mass only
        joined = cogroup_join(
            ranks.select_columns(["node", "rank", "dang", "rw"]),
            sums.map_batches(
                lambda b: pa.table({"mnode": b["node"], "m": b["m"]}),
                batch_format="pyarrow"),
            left_on="node", right_on="mnode", join_type="left outer",
            num_buckets=num_buckets,
            left_schema=ranks_schema,
            right_schema=pa.schema([("mnode", pa.string()),
                                    ("m", pa.float64())]))

        def new_rank(batch: pa.Table, _scale=scale) -> pa.Table:
            m = pc.fill_null(pc.cast(batch["m"], pa.float64()), 0.0)
            new = pc.add(pc.multiply(pa.scalar(_scale), batch["rw"]),
                         pc.multiply(pa.scalar(damping), m))
            return pa.table({
                "node": batch["node"],
                "rank": pc.cast(new, pa.float64()),
                "dang": batch["dang"],
                "rw": batch["rw"],
            }, schema=ranks_schema).append_column(
                "_delta", pc.cast(pc.abs(pc.subtract(new, batch["rank"])),
                                  pa.float64()))

        # repartition before materialize is LOAD-BEARING: the cogroup
        # join's map_groups splits group output into many small blocks
        # (measured 576 blocks by round 2 without this), and iterated
        # shuffle cost compounds with block count (same pitfall as the
        # canonicalization loop — BASELINE.md optimization log)
        with_delta = (joined.map_batches(new_rank, batch_format="pyarrow")
                      .repartition(num_buckets).materialize())
        ranks = with_delta
        if tol is not None:
            # Δ fold reads the SAME pinned blocks (object fetch, no
            # extra pass); distributed Max only above the driver gate
            if driver_fold:
                delta = 0.0
                for b in with_delta.iter_batches(batch_format="pyarrow",
                                                 batch_size=65536):
                    if b.num_rows:
                        delta = max(delta, float(
                            pc.max(b["_delta"]).as_py() or 0.0))
            else:
                delta = float(with_delta.aggregate(
                    Max("_delta", alias_name="d"))["d"] or 0.0)
            if delta < tol:
                break

    return ranks.select_columns(["node", "rank"])


def triangle_count(edges_ds, *, num_buckets: int = 16,
                   a_col: str = "a", b_col: str = "b"):
    """Exact triangle count over an undirected simple graph given as
    int64 ``(a, b)`` edge rows (duplicates and self-loops tolerated —
    normalized and deduped here).

    The skew-resistant MapReduce shape (Suri & Vassilvitskii's
    "last reducer" fix): orient every edge from its lower-(degree, id)
    endpoint to the higher one, generate length-2 paths (wedges) only
    at each edge's SOURCE — so a hub of degree D that would naively
    emit C(D, 2) wedges emits at most C(arboricity-bounded outdeg, 2)
    — and count wedges whose closing edge exists via one bucket-
    cogroup join on the packed pair key. Every stage is a vectorized
    map or a bucket cogroup; nothing graph-sized lands on the driver.

    Returns ``(n_triangles, n_edges)``.
    """
    from .joinutil import cogroup_join
    from .skew import bucket_aggregate

    _SHIFT = np.int64(32)  # packed pair key: a << 32 | b (ids < 2^31)

    def norm(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        if len(lo) and (hi >> np.int64(31)).any():
            raise ValueError("triangle_count: node ids must be < 2^31")
        return pa.table({"key": (lo << _SHIFT) | hi})

    # distinct undirected edges, keyed once
    edges = bucket_aggregate(
        edges_ds.map_batches(norm, batch_format="pyarrow"),
        ["key"], [("count", None, "_c")],
        num_buckets=num_buckets).drop_columns(["_c"]).materialize()
    n_edges = edges.count()

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch["key"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": k >> _SHIFT,
                         "hi": k & np.int64(0xFFFFFFFF),
                         "key": k})

    flat = edges.map_batches(unpack, batch_format="pyarrow")

    # degree per node: one bucket aggregate over the flattened ends
    deg = bucket_aggregate(
        flat.map_batches(
            lambda b: pa.table({"node": pa.concat_arrays(
                [b["lo"].combine_chunks(), b["hi"].combine_chunks()])}),
            batch_format="pyarrow"),
        ["node"], [("count", None, "deg")], num_buckets=num_buckets)

    # orient: u -> v iff (deg(u), u) < (deg(v), v); two cogroup joins
    # attach the endpoint degrees
    e1 = cogroup_join(
        flat, deg.map_batches(
            lambda b: pa.table({"node": b["node"], "dlo": b["deg"]}),
            batch_format="pyarrow"),
        left_on="lo", right_on="node", num_buckets=num_buckets,
        left_schema=pa.schema([("lo", pa.int64()), ("hi", pa.int64()),
                               ("key", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()),
                                ("dlo", pa.int64())]))
    e2 = cogroup_join(
        e1, deg.map_batches(
            lambda b: pa.table({"node2": b["node"], "dhi": b["deg"]}),
            batch_format="pyarrow"),
        left_on="hi", right_on="node2", num_buckets=num_buckets,
        left_schema=pa.schema([("lo", pa.int64()), ("hi", pa.int64()),
                               ("key", pa.int64()), ("dlo", pa.int64())]),
        right_schema=pa.schema([("node2", pa.int64()),
                                ("dhi", pa.int64())]))

    def orient(batch: pa.Table) -> pa.Table:
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        dlo = batch["dlo"].to_numpy(zero_copy_only=False)
        dhi = batch["dhi"].to_numpy(zero_copy_only=False)
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        return pa.table({"u": np.where(lo_first, lo, hi),
                         "v": np.where(lo_first, hi, lo)})

    oriented = e2.map_batches(orient, batch_format="pyarrow")

    # wedges at each source u: all out-neighbor pairs, emitted as the
    # packed key of their (normalized) closing edge. One bucket
    # cogroup on u; fully vectorized triangular expansion per group.
    def tag(batch: pa.Table) -> pa.Table:
        # int mix, not bucket_of(cast-to-string): co-location by u is
        # all the wedge expansion needs, and hashing millions of ids
        # as strings costs more than the exchange (round 5)
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = u * np.uint64(0x9E3779B97F4A7C15)
        bk = ((h >> np.uint64(32)).astype(np.int64)
              % num_buckets).astype(np.int32)
        return batch.append_column("_bucket", pa.array(bk, pa.int32()))

    def wedges(group: pa.Table) -> pa.Table:
        u = group["u"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u_s, v_s = u[order], v[order]
        _uu, starts = np.unique(u_s, return_index=True)
        lens = np.diff(np.append(starts, len(u_s)))
        # per element: its rank r within the segment pairs with the
        # (L - 1 - r) elements after it
        ranks = np.arange(len(u_s)) - np.repeat(starts, lens)
        cnt = np.repeat(lens, lens) - 1 - ranks
        total = int(cnt.sum())
        if not total:
            return pa.table({"key": pa.array([], pa.int64())})
        first = np.repeat(np.arange(len(u_s)), cnt)
        second = first + 1 + (np.arange(total)
                              - np.repeat(np.cumsum(cnt) - cnt, cnt))
        x, y = v_s[first], v_s[second]
        lo, hi = np.minimum(x, y), np.maximum(x, y)
        return pa.table({"key": (lo << _SHIFT) | hi})

    from .shardutil import cogroup_scatter, scatter_apply_by_value

    wedge_schema = pa.schema([("key", pa.int64())])
    cand = scatter_apply_by_value(
        oriented.map_batches(tag, batch_format="pyarrow").materialize(),
        "_bucket", num_buckets,
        lambda g: wedges(g.drop_columns(["_bucket"])),
        empty_result=wedge_schema.empty_table())

    # close wedges against the edge set in ONE cogroup: each bucket
    # counts its wedge rows whose closing-edge key exists (every
    # closed wedge is one triangle — distinct u's closing through the
    # same edge each count). Round 5: this replaces a per-key
    # bucket_aggregate PLUS a semi join (two exchanges) with one; the
    # driver folds num_buckets scalar counts, never key rows.
    cnt_schema = pa.schema([("n", pa.int64())])

    def close_count(w_tbl: pa.Table | None, e_tbl: pa.Table | None):
        if w_tbl is None or e_tbl is None or not w_tbl.num_rows:
            return cnt_schema.empty_table()
        hit = pc.is_in(w_tbl["key"],
                       value_set=e_tbl["key"].combine_chunks())
        n = pc.sum(pc.cast(hit, pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([n], pa.int64())})

    closed = cogroup_scatter(cand, "key", edges, "key", num_buckets,
                             close_count,
                             empty_result=cnt_schema.empty_table())
    n_tri = 0
    for b in closed.iter_batches(batch_format="pyarrow",
                                 batch_size=65536):
        n_tri += pc.sum(b["n"]).as_py() or 0
    return int(n_tri), int(n_edges)


# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg 1999, "Authoritative sources in a
# hyperlinked environment") — the mutual-reinforcement iterative pair:
# a(v) = Σ_{u→v} h(u), h(u) = Σ_{u→v} a(v), each L2-normalized per
# round. Two engines sharing one update rule: a driver numpy path
# under the edge gate and a Pregel shard-actor path above it.
# ---------------------------------------------------------------------------

def _hits_driver(norm_ds, *, n_iter: int):
    import ray.data as rd

    srcs, dsts = [], []
    for b in norm_ds.iter_batches(batch_format="pyarrow",
                                  batch_size=262144):
        srcs.append(b["src"])
        dsts.append(b["dst"])
    nodes, codes = encode_node_codes(srcs + dsts)
    m = len(codes) // 2
    src_i, dst_i = codes[:m], codes[m:]
    n = len(nodes)
    h = np.full(n, 1.0 / np.sqrt(max(1, n)))
    a = h.copy()
    for _ in range(n_iter):
        a = np.bincount(dst_i, weights=h[src_i], minlength=n)
        na = np.sqrt(float((a * a).sum()))
        if na > 0:
            a /= na
        h = np.bincount(src_i, weights=a[dst_i], minlength=n)
        nh = np.sqrt(float((h * h).sum()))
        if nh > 0:
            h /= nh
    return rd.from_arrow(pa.table({
        "node": nodes,
        "hub": pa.array(h, pa.float64()),
        "auth": pa.array(a, pa.float64())}))


class _HITSShard:
    """One hubs/authorities shard (``ray.remote`` at use). Owns the
    (hub, auth) state for nodes hashing to its bucket plus BOTH edge
    splits: src-sharded edges emit hub mass toward dsts (the auth
    half-round), dst-sharded edges emit auth mass toward srcs (the hub
    half-round) — each half-round's messages read only LOCAL state, so
    a round is two emit/apply RPC waves and two scalar folds (the L2
    norms), zero Dataset exchanges. Route tables for both directions
    precompute once in load(), same shape as _PRShard."""

    def __init__(self, bucket: int, n_buckets: int):
        self.b, self.B = bucket, n_buckets

    @staticmethod
    def _routes(key_np, n_buckets):
        from ..functions.hashing import bucket_of

        if len(key_np) == 0:
            return [None] * n_buckets
        bk = bucket_of(pa.array(key_np.tolist(), pa.string()),
                       n_buckets).to_numpy(zero_copy_only=False)
        routes = []
        for t in range(n_buckets):
            sel = np.where(bk == t)[0]
            if sel.size == 0:
                routes.append(None)
                continue
            order = sel[np.argsort(key_np[sel], kind="stable")]
            uniq, starts = np.unique(key_np[order], return_index=True)
            routes.append(
                (order, pa.array(uniq.tolist(), pa.string()), starts))
        return routes

    def load(self, src_edge_refs, dst_edge_refs) -> int:
        import ray

        def cat(refs, schema_cols):
            tbls = [t for t in ray.get(list(refs)) if t.num_rows]
            return (pa.concat_tables(tbls) if tbls
                    else pa.table({c: pa.array([], pa.string())
                                   for c in schema_cols}))

        se = cat(src_edge_refs, ("src", "dst"))   # src hashes here
        de = cat(dst_edge_refs, ("src", "dst"))   # dst hashes here
        s_src = se["src"].combine_chunks()
        d_dst = de["dst"].combine_chunks()
        self.nodes = pa.array(np.unique(np.concatenate((
            s_src.to_numpy(zero_copy_only=False),
            d_dst.to_numpy(zero_copy_only=False)))), pa.string())
        # auth half-round: hub mass flows src -> dst over src-sharded
        # edges; h(src) is local
        si = pc.index_in(s_src, value_set=self.nodes)
        self.h_src_idx = si.to_numpy(zero_copy_only=False) \
            .astype(np.int64) if se.num_rows else np.empty(0, np.int64)
        self.auth_routes = self._routes(
            np.asarray(se["dst"].to_pylist(), dtype=object), self.B)
        # hub half-round: auth mass flows dst -> src over dst-sharded
        # edges; a(dst) is local
        di = pc.index_in(d_dst, value_set=self.nodes)
        self.a_dst_idx = di.to_numpy(zero_copy_only=False) \
            .astype(np.int64) if de.num_rows else np.empty(0, np.int64)
        self.hub_routes = self._routes(
            np.asarray(de["src"].to_pylist(), dtype=object), self.B)
        return len(self.nodes)

    def init(self, n_nodes: int) -> None:
        v = 1.0 / np.sqrt(max(1, n_nodes))
        self.h = np.full(len(self.nodes), v)
        self.a = np.full(len(self.nodes), v)

    def _emit(self, state, idx, routes):
        import ray

        m_all = state[idx]
        refs = []
        for r in routes:
            if r is None:
                refs.append(None)
                continue
            order, uniq, starts = r
            refs.append(ray.put(pa.table(
                {"node": uniq,
                 "m": np.add.reduceat(m_all[order], starts)})))
        return refs

    def emit_auth(self):
        return self._emit(self.h, self.h_src_idx, self.auth_routes)

    def emit_hub(self):
        return self._emit(self.a, self.a_dst_idx, self.hub_routes)

    def _apply(self, msg_refs) -> tuple[float, np.ndarray]:
        import ray

        acc = np.zeros(len(self.nodes))
        for tbl in ray.get(list(msg_refs)):
            idx = pc.index_in(tbl["node"].combine_chunks(),
                              value_set=self.nodes)
            np.add.at(acc, idx.to_numpy(zero_copy_only=False)
                      .astype(np.int64),
                      tbl["m"].to_numpy(zero_copy_only=False))
        return float((acc * acc).sum()), acc

    def apply_auth(self, msg_refs) -> float:
        ssq, acc = self._apply(msg_refs)
        self.a = acc
        return ssq

    def apply_hub(self, msg_refs) -> float:
        ssq, acc = self._apply(msg_refs)
        self.h = acc
        return ssq

    def scale_auth(self, norm: float) -> None:
        if norm > 0:
            self.a /= norm

    def scale_hub(self, norm: float) -> None:
        if norm > 0:
            self.h /= norm

    def result(self) -> pa.Table:
        return pa.table({"node": self.nodes,
                         "hub": pa.array(self.h, pa.float64()),
                         "auth": pa.array(self.a, pa.float64())})


def _hits_actors(norm, *, n_iter: int, num_shards: int):
    import ray
    import ray.data as rd

    from .shardutil import split_dataset_by_bucket

    B = num_shards
    src_cols = split_dataset_by_bucket(norm, "src", B)
    dst_cols = split_dataset_by_bucket(norm, "dst", B)
    Shard = ray.remote(num_cpus=0)(_HITSShard)
    shards = [Shard.remote(b, B) for b in range(B)]
    try:
        n_nodes = sum(ray.get([s.load.remote(src_cols[b], dst_cols[b])
                               for b, s in enumerate(shards)]))
        ray.get([s.init.remote(n_nodes) for s in shards])
        for _ in range(n_iter):
            outs = ray.get([s.emit_auth.remote() for s in shards])
            inbox = [[outs[b][t] for b in range(B)
                      if outs[b][t] is not None] for t in range(B)]
            ssq = sum(ray.get([s.apply_auth.remote(inbox[t])
                               for t, s in enumerate(shards)]))
            ray.get([s.scale_auth.remote(float(np.sqrt(ssq)))
                     for s in shards])
            outs = ray.get([s.emit_hub.remote() for s in shards])
            inbox = [[outs[b][t] for b in range(B)
                      if outs[b][t] is not None] for t in range(B)]
            ssq = sum(ray.get([s.apply_hub.remote(inbox[t])
                               for t, s in enumerate(shards)]))
            ray.get([s.scale_hub.remote(float(np.sqrt(ssq)))
                     for s in shards])
        out = rd.from_arrow_refs(
            [s.result.remote() for s in shards]).materialize()
    finally:
        for s in shards:
            ray.kill(s)
    return out


def hits(edges_ds, *, n_iter: int = 20, src_col: str = "src",
         dst_col: str = "dst", max_driver_edges: int = 4_000_000,
         num_shards: int = 8, engine: str = "auto"):
    """(src, dst) string-keyed edges -> (node, hub, auth) Dataset.
    ``max_driver_edges`` gates the numpy fast path; pass 0 to force
    the shard-actor engine (parity tests do). The L2 normalization
    scalars fold on the driver each half-round — two floats per wave,
    never rank-table-sized state."""
    import ray.data as rd

    def edge_norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(batch[src_col], pa.string()),
            "dst": pc.cast(batch[dst_col], pa.string()),
        })

    norm = (edges_ds.map_batches(edge_norm, batch_format="pyarrow")
            .materialize())
    n_edges = norm.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "hub": pa.array([], pa.float64()),
            "auth": pa.array([], pa.float64())}))
    if resolve_engine(engine, n_edges, max_driver_edges) == "driver":
        return _hits_driver(norm, n_iter=n_iter)
    return _hits_actors(norm, n_iter=n_iter,
                        num_shards=max(2, min(num_shards, 8)))


# ---------------------------------------------------------------------------
# k-core membership (Seidman 1983; peeling/deletion iteration — a
# different Pregel shape from rank/label propagation: state only ever
# SHRINKS, messages are degree decrements from dying nodes)
# ---------------------------------------------------------------------------

def _kcore_driver(src: np.ndarray, dst: np.ndarray, k: int):
    """Vectorized peel over int64 endpoint arrays (both directions
    present). Returns (nodes, in_core bool)."""
    nodes, inv = np.unique(np.concatenate([src, dst]),
                           return_inverse=True)
    m = len(src)
    s_i, d_i = inv[:m], inv[m:]
    n = len(nodes)
    deg = np.bincount(s_i, minlength=n)
    alive = np.ones(n, bool)
    # CSR over outgoing (== all incident, both directions present)
    order = np.argsort(s_i, kind="stable")
    s_s, d_s = s_i[order], d_i[order]
    starts = np.searchsorted(s_s, np.arange(n))
    ends = np.searchsorted(s_s, np.arange(n), side="right")
    while True:
        dying = np.flatnonzero(alive & (deg < k))
        if dying.size == 0:
            break
        alive[dying] = False
        # each dying node decrements every neighbor once
        nbr_parts = [d_s[starts[u]:ends[u]] for u in dying]
        if nbr_parts:
            nbrs = np.concatenate(nbr_parts)
            dec = np.bincount(nbrs, minlength=n)
            deg = deg - dec
    return nodes, alive


class _KCoreShard:
    """Deletion-Pregel shard: owns alive/degree state for nodes
    hashing to its bucket plus ALL incident edges (the undirected
    graph ships both directions, sharded by source — so a node's full
    adjacency is local). A round: locally find nodes dying (alive,
    degree < k), emit per-peer decrement counts for their neighbors,
    apply incoming decrements. State only shrinks, so the fixpoint
    (no shard reports deaths) is reached in at most n rounds and
    usually a handful."""

    def __init__(self, bucket: int, n_buckets: int, k: int):
        self.b, self.B, self.k = bucket, n_buckets, k

    def load(self, edge_refs) -> int:
        """Arrow-native loader (round 5 — the object-dtype rewrite
        that _TreeShard/_CCShard got in round 4): neighbor strings
        live ONCE in a local dictionary; adjacency, per-edge target
        buckets and every emit wave work on int32/int64 codes."""
        import ray

        from ..functions.hashing import bucket_of

        tbls = [t for t in ray.get(list(edge_refs)) if t.num_rows]
        edges = (pa.concat_tables(tbls) if tbls
                 else pa.table({"src": pa.array([], pa.string()),
                                "dst": pa.array([], pa.string())}))
        src = edges["src"].combine_chunks()
        uniq = pc.unique(src)
        self.nodes = uniq.take(pc.sort_indices(uniq))
        n = len(self.nodes)
        si = pc.index_in(src, value_set=self.nodes) \
            .to_numpy(zero_copy_only=False).astype(np.int64) \
            if edges.num_rows else np.empty(0, np.int64)
        denc = edges["dst"].combine_chunks().dictionary_encode()
        self.d_dict = denc.dictionary
        d_codes = denc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64) if edges.num_rows else \
            np.empty(0, np.int64)
        order = np.argsort(si, kind="stable")
        self.s_s, self.d_c = si[order], d_codes[order]
        self.starts = np.searchsorted(self.s_s, np.arange(n))
        self.ends = np.searchsorted(self.s_s, np.arange(n),
                                    side="right")
        self.deg = np.bincount(si, minlength=n) if n else \
            np.zeros(0, np.int64)
        self.alive = np.ones(n, bool)
        # one hash per DISTINCT neighbor, broadcast to edges by code
        dict_bk = (bucket_of(self.d_dict, self.B)
                   .to_numpy(zero_copy_only=False)
                   if len(self.d_dict) else np.empty(0, np.int32))
        self.dbk = dict_bk[self.d_c] if len(self.d_c) else \
            np.empty(0, np.int32)
        return n

    def step_emit(self):
        """-> (n_dying, per-peer decrement-table refs)."""
        import ray

        dying = np.flatnonzero(self.alive & (self.deg < self.k))
        refs = [None] * self.B
        if dying.size:
            self.alive[dying] = False
            parts = [slice(self.starts[u], self.ends[u]) for u in dying]
            nbrs = np.concatenate([self.d_c[p] for p in parts]) \
                if parts else np.empty(0, np.int64)
            bks = np.concatenate([self.dbk[p] for p in parts]) \
                if parts else np.empty(0, np.int32)
            for t in range(self.B):
                sel = nbrs[bks == t]
                if sel.size == 0:
                    continue
                uniq_c, cnt = np.unique(sel, return_counts=True)
                refs[t] = ray.put(pa.table({
                    "node": self.d_dict.take(
                        pa.array(uniq_c, pa.int64())),
                    "dec": pa.array(cnt, pa.int64())}))
        return int(dying.size), refs

    def apply(self, msg_refs) -> None:
        import ray

        for tbl in ray.get(list(msg_refs)):
            idx = pc.index_in(tbl["node"].combine_chunks(),
                              value_set=self.nodes)
            ix = idx.to_numpy(zero_copy_only=False).astype(np.int64)
            np.subtract.at(self.deg, ix,
                           tbl["dec"].to_numpy(zero_copy_only=False))

    def result(self) -> pa.Table:
        return pa.table({"node": self.nodes,
                         "in_core": pa.array(self.alive)})


def link_prediction_topk(edges_ds, *, k: int = 20,
                         num_buckets: int = 16, a_col: str = "a",
                         b_col: str = "b"):
    """Common-neighbor link prediction over undirected int64 edges:
    the top-``k`` NON-adjacent pairs by shared-neighbor count (ties
    by (a, b)), with both endpoint degrees attached — the candidate
    generator for proposing new relations in a knowledge graph (new
    skos:related edges between co-occurring concepts). All-integer:
    nothing here can flap on float ULPs.

    Shape mirrors triangle_count's skew discipline: wedge pairs
    generate per CENTER inside one task scatter (a hub of degree D
    emits C(D,2) candidate pairs — the quadratic step, bounded per
    bucket), one pair-count aggregate, one packed-key anti cogroup
    drops existing edges, two cogroup joins attach degrees, local
    top-k per block with a bounded driver merge."""
    from .joinutil import cogroup_join
    from .skew import bucket_aggregate

    _SHIFT = np.int64(32)

    def norm(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        if len(a) and ((np.maximum(a, b) >> np.int64(31)).any()):
            raise ValueError("link_prediction: node ids must be < 2^31")
        return pa.table({"x": np.concatenate([a, b]),
                         "y": np.concatenate([b, a])})

    sym = edges_ds.map_batches(norm, batch_format="pyarrow") \
        .materialize()
    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("common", pa.int64()),
                            ("deg_a", pa.int64()),
                            ("deg_b", pa.int64())])
    if sym.count() == 0:
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())

    deg = bucket_aggregate(
        sym.map_batches(lambda t: pa.table({"node": t["x"]}),
                        batch_format="pyarrow"),
        ["node"], [("count", None, "d")], num_buckets=num_buckets)

    # wedge pairs per center: co-locate each center's neighbor list,
    # emit every unordered neighbor pair
    from .shardutil import scatter_apply_by_value

    def tag(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = x * np.uint64(0x9E3779B97F4A7C15)
        bk = ((h >> np.uint64(32)).astype(np.int64)
              % num_buckets).astype(np.int32)
        return batch.append_column("_bucket", pa.array(bk, pa.int32()))

    pair_schema = pa.schema([("key", pa.int64())])

    def wedge_pairs(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        order = np.lexsort((y, x))
        x_s, y_s = x[order], y[order]
        _u, starts = np.unique(x_s, return_index=True)
        lens = np.diff(np.append(starts, len(x_s)))
        ranks = np.arange(len(x_s)) - np.repeat(starts, lens)
        cnt = np.repeat(lens, lens) - 1 - ranks
        total = int(cnt.sum())
        if not total:
            return pair_schema.empty_table()
        first = np.repeat(np.arange(len(x_s)), cnt)
        second = first + 1 + (np.arange(total)
                              - np.repeat(np.cumsum(cnt) - cnt, cnt))
        u, v = y_s[first], y_s[second]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        ne = lo != hi
        return pa.table({"key": (lo[ne] << _SHIFT) | hi[ne]})

    cand = scatter_apply_by_value(
        sym.map_batches(tag, batch_format="pyarrow").materialize(),
        "_bucket", num_buckets, wedge_pairs,
        empty_result=pair_schema.empty_table())
    counts = bucket_aggregate(cand, ["key"],
                              [("count", None, "common")],
                              num_buckets=num_buckets)

    # drop already-adjacent pairs (packed-key anti cogroup)
    def pack_edges(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(x, y), np.maximum(x, y)
        return pa.table({"ekey": (lo << _SHIFT) | hi})

    novel = cogroup_join(
        counts, sym.map_batches(pack_edges, batch_format="pyarrow"),
        left_on="key", right_on="ekey", join_type="left anti",
        num_buckets=num_buckets,
        left_schema=pa.schema([("key", pa.int64()),
                               ("common", pa.int64())]),
        right_schema=pa.schema([("ekey", pa.int64())]))

    def unpack(t: pa.Table) -> pa.Table:
        kk = t["key"].to_numpy(zero_copy_only=False)
        return pa.table({"a": kk >> _SHIFT,
                         "b": kk & np.int64(0xFFFFFFFF),
                         "common": t["common"]})

    flat = novel.map_batches(unpack, batch_format="pyarrow")
    j1 = cogroup_join(
        flat, deg.map_batches(
            lambda t: pa.table({"n1": t["node"], "deg_a": t["d"]}),
            batch_format="pyarrow"),
        left_on="a", right_on="n1", num_buckets=num_buckets,
        left_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                               ("common", pa.int64())]),
        right_schema=pa.schema([("n1", pa.int64()),
                                ("deg_a", pa.int64())]))
    j2 = cogroup_join(
        j1, deg.map_batches(
            lambda t: pa.table({"n2": t["node"], "deg_b": t["d"]}),
            batch_format="pyarrow"),
        left_on="b", right_on="n2", num_buckets=num_buckets,
        left_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                               ("common", pa.int64()),
                               ("deg_a", pa.int64())]),
        right_schema=pa.schema([("n2", pa.int64()),
                                ("deg_b", pa.int64())]))

    def local_topk(t: pa.Table, _k=k) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        c = t["common"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -c))[:_k]
        return t.take(pa.array(order, pa.int64())).select(
            ["a", "b", "common", "deg_a", "deg_b"])

    parts = [b for b in j2.map_batches(
        local_topk, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow")]
    allc = (pa.concat_tables(parts).combine_chunks() if parts
            else out_schema.empty_table())
    a = allc["a"].to_numpy(zero_copy_only=False)
    b = allc["b"].to_numpy(zero_copy_only=False)
    c = allc["common"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a, -c))[:k]
    import ray.data as rd

    return rd.from_arrow(allc.take(pa.array(order, pa.int64()))
                         .cast(out_schema))


def bfs_hops(edges_ds, *, n_seeds: int = 3, max_hops: int = 4,
             a_col: str = "a", b_col: str = "b",
             max_driver_edges: int = 4_000_000, num_buckets: int = 16,
             engine: str = "auto"):
    """Bounded multi-source BFS over undirected int64 ``(a, b)`` edge
    rows: hop distance from the ``n_seeds`` SMALLEST node ids, out to
    ``max_hops``. Returns (node, hops) for reached nodes only —
    exactly a bounded recursive-CTE transitive closure with min-hop
    semantics, so DuckDB can verify it row-for-row.

    Engines (graph.resolve_engine contract): ``driver`` runs a numpy
    frontier sweep over dictionary codes under the edge gate;
    ``actors`` (the distributed path — BFS is bounded-round, so here
    it is a Dataset-loop rather than a long-lived Pregel shard: one
    frontier⋈edges cogroup plus one frontier-dedup anti pass per
    round, ``max_hops`` rounds total, nothing node-set-sized on the
    driver)."""
    import ray.data as rd

    from .joinutil import cogroup_join
    from .skew import bucket_aggregate

    def norm(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"x": np.concatenate([a, b]),
                         "y": np.concatenate([b, a])})

    sym = edges_ds.map_batches(norm, batch_format="pyarrow") \
        .materialize()
    n_edges = sym.count()
    out_schema = pa.schema([("node", pa.int64()), ("hops", pa.int64())])
    if n_edges == 0:
        return rd.from_arrow(out_schema.empty_table())

    # seeds: the n smallest node ids — per-block partial mins folded
    # on the driver (num_blocks × n rows, never the node set)
    partial = [b for b in sym.map_batches(
        lambda t: pa.table({"x": pa.array(np.sort(np.unique(
            t["x"].to_numpy(zero_copy_only=False)))[:n_seeds],
            pa.int64())}),
        batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    seeds = np.sort(np.unique(np.concatenate(
        [p["x"].to_numpy(zero_copy_only=False) for p in partial
         if p.num_rows])))[:n_seeds]

    if resolve_engine(engine, n_edges, max_driver_edges) == "driver":
        xs, ys = [], []
        for b in sym.iter_batches(batch_format="pyarrow",
                                  batch_size=262144):
            xs.append(b["x"].to_numpy(zero_copy_only=False))
            ys.append(b["y"].to_numpy(zero_copy_only=False))
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        nodes, inv_x = np.unique(x, return_inverse=True)
        iy = np.searchsorted(nodes, y)
        dist = np.full(len(nodes), -1, np.int64)
        dist[np.searchsorted(nodes, seeds)] = 0
        frontier = dist == 0
        for h in range(1, max_hops + 1):
            hit = frontier[inv_x]
            cand = np.unique(iy[hit])
            new = cand[dist[cand] < 0]
            if new.size == 0:
                break
            dist[new] = h
            frontier = np.zeros(len(nodes), bool)
            frontier[new] = True
        reached = dist >= 0
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes[reached], pa.int64()),
            "hops": pa.array(dist[reached], pa.int64())}))

    # Dataset-loop engine: bounded rounds, every exchange task-level
    reach = rd.from_arrow(pa.table({
        "node": pa.array(seeds, pa.int64()),
        "h": pa.array(np.zeros(seeds.size, np.int64))})).materialize()
    frontier = reach
    parts = [reach]
    for h in range(1, max_hops + 1):
        nbr = cogroup_join(
            frontier.map_batches(
                lambda t: pa.table({"f_node": t["node"]}),
                batch_format="pyarrow"),
            sym, left_on="f_node", right_on="x", join_type="inner",
            num_buckets=num_buckets,
            left_schema=pa.schema([("f_node", pa.int64())]),
            right_schema=pa.schema([("x", pa.int64()),
                                    ("y", pa.int64())]))
        cand = bucket_aggregate(
            nbr.map_batches(lambda t: pa.table({"node": t["y"]}),
                            batch_format="pyarrow"),
            ["node"], [("count", None, "_n")],
            num_buckets=num_buckets).drop_columns(["_n"])
        seen = rd.from_arrow_refs(
            [r for p in parts for r in p.to_arrow_refs()])
        new = cogroup_join(
            cand, seen.map_batches(
                lambda t: pa.table({"s_node": t["node"]}),
                batch_format="pyarrow"),
            left_on="node", right_on="s_node", join_type="left anti",
            num_buckets=num_buckets,
            left_schema=pa.schema([("node", pa.int64())]),
            right_schema=pa.schema([("s_node", pa.int64())]))
        frontier = new.map_batches(
            lambda t, _h=h: t.append_column(
                "h", pa.array(np.full(t.num_rows, _h, np.int64))),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
        parts.append(frontier)
    allr = rd.from_arrow_refs(
        [r for p in parts for r in p.to_arrow_refs()])
    out = bucket_aggregate(allr, ["node"], [("min", "h", "hops")],
                           num_buckets=num_buckets)
    return out


def _kcore_actors(norm, *, k: int, num_shards: int):
    import ray
    import ray.data as rd

    from .shardutil import split_dataset_by_bucket

    B = num_shards
    cols = split_dataset_by_bucket(norm, "src", B)
    Shard = ray.remote(num_cpus=0)(_KCoreShard)
    shards = [Shard.remote(b, B, k) for b in range(B)]
    try:
        ray.get([s.load.remote(cols[b]) for b, s in enumerate(shards)])
        while True:
            outs = ray.get([s.step_emit.remote() for s in shards])
            died = sum(o[0] for o in outs)
            if died == 0:
                break
            inbox = [[outs[b][1][t] for b in range(B)
                      if outs[b][1][t] is not None] for t in range(B)]
            ray.get([s.apply.remote(inbox[t])
                     for t, s in enumerate(shards)])
        out = rd.from_arrow_refs(
            [s.result.remote() for s in shards]).materialize()
    finally:
        for s in shards:
            ray.kill(s)
    return out


def kcore(edges_ds, *, k: int, a_col: str = "a", b_col: str = "b",
          max_driver_edges: int = 4_000_000, num_shards: int = 8,
          engine: str = "auto"):
    """Undirected (a, b) edge rows -> (node, in_core) Dataset: the
    maximal subgraph where every member keeps >= k neighbors after
    iterative peeling. Self-loops dropped; duplicate edge rows COUNT
    toward degree on both engines (normalize upstream if multi-edges
    should collapse)."""
    import ray.data as rd

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch[a_col], pa.string()).combine_chunks()
        b = pc.cast(batch[b_col], pa.string()).combine_chunks()
        keep = pc.invert(pc.equal(a, b))
        a, b = a.filter(keep), b.filter(keep)
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    norm = (edges_ds.map_batches(both_dirs, batch_format="pyarrow")
            .materialize())
    n_edges = norm.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.string()),
                                       "in_core": pa.array([], pa.bool_())}))
    if resolve_engine(engine, n_edges, max_driver_edges) == "driver":
        srcs, dsts = [], []
        for b in norm.iter_batches(batch_format="pyarrow",
                                   batch_size=262144):
            srcs.append(b["src"])
            dsts.append(b["dst"])
        nodes_pa, codes = encode_node_codes(srcs + dsts)
        m = len(codes) // 2
        node_c, alive = _kcore_driver(codes[:m], codes[m:], k)
        return rd.from_arrow(pa.table({
            "node": nodes_pa.take(pa.array(node_c, pa.int64())),
            "in_core": pa.array(alive)}))
    return _kcore_actors(norm, k=k,
                         num_shards=max(2, min(num_shards, 8)))
