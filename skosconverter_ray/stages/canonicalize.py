"""URI canonicalization: distributed union-find over owl:sameAs /
skos:exactMatch clusters (graft A8; seed semantics from the reference's
``get_same_as`` read, skos_converter.py:644-647).

Algorithm: hash-min label propagation. Each node's label starts as
itself; every round each node takes the min of its own label and its
neighbors' labels (``groupby(node).min(label)`` — a shuffle over the
*equivalence graph only*, which is vocabulary-sized, not corpus-sized).
Converges in O(diameter) rounds; chains built by the vocab generator
have small diameter, and rounds are capped. The canonical URI of a
cluster is its lexicographic min — deterministic on every worker
(same tiebreak discipline as SURVEY.md D5).

The rewrite (J7) is applied to the *corpus-sized* triples table as a
broadcast map — canon_map is dimension-sized, shipped once via
``ray.put`` — so no corpus-wide shuffle join is needed.
"""

from __future__ import annotations

import os
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import OWL_SAME_AS, SKOS_EXACT_MATCH

_EQUIV_PREDS = (OWL_SAME_AS, SKOS_EXACT_MATCH)


def equivalence_edges(triples_ds):
    """Filter sameAs/exactMatch triples -> symmetric (node, peer) pairs."""

    def emit(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(batch["pred"], value_set=pa.array(list(_EQUIV_PREDS))),
            pc.invert(batch["obj_is_literal"]),
        )
        t = batch.filter(mask)
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t["subj"].combine_chunks(), t["obj"].combine_chunks()]
                ),
                "peer": pa.concat_arrays(
                    [t["obj"].combine_chunks(), t["subj"].combine_chunks()]
                ),
            }
        )

    return triples_ds.map_batches(emit, batch_format="pyarrow")


def _rank_array(uris, preferred_ns: str | None) -> pa.Array:
    """Vectorized rank prefix: '0|uri' (preferred ns) < '1|uri'."""
    if isinstance(uris, pa.ChunkedArray):
        uris = uris.combine_chunks()
    if preferred_ns:
        pref = pc.starts_with(uris, pattern=preferred_ns)
        prefix = pc.if_else(pref, "0|", "1|")
    else:
        prefix = pa.array(["1|"] * len(uris), pa.string())
    return pc.binary_join_element_wise(prefix, uris, "")


def canonical_map(triples_ds, *, max_rounds: int = 64,
                  preferred_ns: str | None = None,
                  num_buckets: int = 64, engine: str = "auto"):
    """-> canon_map Dataset (uri, canonical_uri), non-trivial rows only.

    Distributed hash-min label propagation. Labels stay DISTRIBUTED
    throughout: each round is (1) a bucket-cogroup join
    ``edges ⋈ labels`` on the peer endpoint (neighbors' labels become
    candidates) and (2) a bucket-cogroup min+change-detect on the node
    endpoint. The driver sees only the changed-count scalar per round —
    never a node→label dict — so the path is bounded by per-bucket
    memory (|graph| / num_buckets), not driver memory.

    Each round ALSO unions pointer-jump edges (node → its current
    label) into the propagate step, so a node adopts its label's label
    — classic pointer doubling. Convergence is O(log diameter) rounds
    instead of O(diameter), which matters because per-round cost is
    dominated by fixed shuffle latency, not data volume.
    ``max_rounds`` caps pathological graphs.

    Above the driver gate two engines exist: ``"auto"``/``"actors"``
    (default) runs the same hash-min + pointer jumping on Pregel-tier
    shard actors (stages/shardutil; zero Dataset exchanges per round),
    ``"dataset"`` keeps the cogroup-join loop described above, covered
    by engine-parametrized parity tests.

    ``preferred_ns``: URIs under this namespace outrank foreign URIs as
    cluster representatives (so an ``owl:sameAs`` alias never replaces
    a real vocabulary concept). Implemented by rank-prefixing the
    propagated labels ("0|uri" < "1|uri"), which keeps the whole
    algorithm a plain string-min.
    """
    return components_min_label(equivalence_edges(triples_ds),
                                max_rounds=max_rounds,
                                preferred_ns=preferred_ns,
                                num_buckets=num_buckets, engine=engine)


class _CCShard:
    """One connected-components shard (``ray.remote`` at use; see
    components_min_label). Holds the label state and adjacency for
    nodes with ``bucket_of(node) == b``. A round is hash-min with
    pointer jumping, three RPC waves:

    - **emit**: changed nodes push their label to every neighbor
      (labels only decrease, so unchanged nodes have nothing new to
      say), and the shard requests ``label(label(node))`` for each of
      its DISTINCT current labels (pointer doubling);
    - **serve**: answer incoming jump requests from local labels;
    - **apply**: min-merge neighbor candidates + jump answers,
      returning the changed count for the driver's termination fold.

    Candidate sets per round are a superset-equivalent of the Dataset
    loop's (min is idempotent; resends from unchanged nodes can never
    lower a min the receiver hasn't already seen), so the fixpoint is
    identical — pinned by the engine-parametrized parity tests."""

    def __init__(self, bucket: int, n_buckets: int,
                 preferred_ns: str | None):
        self.b, self.B, self.ns = bucket, n_buckets, preferred_ns

    def _rank_arr(self, arr: pa.Array) -> pa.Array:
        """Vectorized rank prefix: "0|uri" for the preferred namespace,
        "1|uri" otherwise (string order == (rank, uri) order)."""
        if self.ns:
            pref = pc.if_else(pc.starts_with(arr, self.ns),
                              pa.scalar("0|"), pa.scalar("1|"))
        else:
            pref = pa.array(["1|"] * len(arr), pa.string())
        return pc.binary_join_element_wise(pref, arr, pa.scalar(""))

    def load(self, edge_refs) -> int:
        """Arrow/numpy shard state (round-4 rewrite of the dict-of-
        tuple-lists loader, which held ~5-10x the Arrow footprint and
        loaded single-threaded): one sort of the edge table into CSR
        adjacency — object-dtype numpy views share the PyStr objects,
        no per-edge tuples/lists. Peer routing buckets are hashed on
        the SAME flattened (CSR) order they are emitted in."""
        import ray

        from ..functions.hashing import bucket_of

        tbls = [t for t in ray.get(list(edge_refs)) if t.num_rows]
        t = pa.concat_tables(tbls) if tbls else pa.table(
            {"node": pa.array([], pa.string()),
             "peer": pa.array([], pa.string())})
        node = t["node"].combine_chunks()
        order = pc.sort_indices(node)
        node_s = node.take(order)
        peer_s = t["peer"].combine_chunks().take(order)
        node_np = node_s.to_numpy(zero_copy_only=False)
        self.nodes_np, starts = np.unique(node_np, return_index=True)
        n = len(self.nodes_np)
        self.nodes = pa.array(self.nodes_np, pa.string())
        self.off = np.append(starts.astype(np.int64), len(node_np))
        self.peers = peer_s.to_numpy(zero_copy_only=False)
        self.peer_bk = (bucket_of(peer_s, self.B)
                        .to_numpy(zero_copy_only=False)
                        if len(self.peers) else np.empty(0, np.int32))
        # seed: min(rank(self), min rank(peer)) per CSR segment —
        # segments are non-empty by construction (nodes come from edges)
        self_rank = self._rank_arr(self.nodes) \
            .to_numpy(zero_copy_only=False)
        if n:
            peer_rank = self._rank_arr(peer_s) \
                .to_numpy(zero_copy_only=False)
            seg_min = np.minimum.reduceat(peer_rank, self.off[:-1])
            self.label = np.minimum(self_rank, seg_min)
        else:
            self.label = self_rank
        self.changed = np.arange(n, dtype=np.int64)
        return n

    def emit(self):
        import ray

        from ..functions.hashing import bucket_of

        msgs = [None] * self.B
        ch = self.changed
        cnt = self.off[ch + 1] - self.off[ch] if ch.size else \
            np.empty(0, np.int64)
        total = int(cnt.sum()) if ch.size else 0
        if total:
            # CSR expansion: flat edge indices of every changed node
            idx = (np.repeat(self.off[ch], cnt)
                   + np.arange(total)
                   - np.repeat(np.cumsum(cnt) - cnt, cnt))
            dsts = self.peers[idx]
            labs = np.repeat(self.label[ch], cnt)
            bks = self.peer_bk[idx]
            for b in range(self.B):
                sel = np.where(bks == b)[0]
                if not sel.size:
                    continue
                d, l = dsts[sel], labs[sel]
                # pre-aggregate min label per dst before shipping
                o = np.lexsort((l, d))
                uniq, st = np.unique(d[o], return_index=True)
                msgs[b] = ray.put(pa.table({
                    "node": pa.array(uniq, pa.string()),
                    "cand": pa.array(l[o][st], pa.string())}))
        self.changed = np.empty(0, np.int64)
        # jump requests: one per DISTINCT label, routed to the label's
        # owner shard; answers broadcast back to every local holder
        reqs = [None] * self.B
        uniq_lab = np.unique(self.label)
        if uniq_lab.size:
            lab_pa = pa.array(uniq_lab, pa.string())
            tb = bucket_of(pc.utf8_slice_codeunits(lab_pa, 2), self.B) \
                .to_numpy(zero_copy_only=False)
            for b in range(self.B):
                sel = np.where(tb == b)[0]
                if sel.size:
                    reqs[b] = ray.put(pa.array(uniq_lab[sel], pa.string()))
        return msgs, reqs

    def serve(self, req_refs):
        import ray

        # answers are keyed by the label string itself (requesters are
        # anonymous), so ONE (lab -> label(lab)) table is put once and
        # its ref broadcast to every shard — one row per distinct
        # label per round
        parts = [np.asarray(a.to_numpy(zero_copy_only=False))
                 for a in ray.get(list(req_refs))]
        labs = np.unique(np.concatenate(parts)) if parts else \
            np.empty(0, object)
        if not labs.size:
            return [None] * self.B
        lab_pa = pa.array(labs, pa.string())
        iv = pc.index_in(pc.utf8_slice_codeunits(lab_pa, 2),
                         value_set=self.nodes)
        valid = pc.is_valid(iv).to_numpy(zero_copy_only=False)
        if not valid.any():
            return [None] * self.B
        ivn = iv.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
        ref = ray.put(pa.table({
            "lab": pa.array(labs[valid], pa.string()),
            "lab2": pa.array(self.label[ivn], pa.string())}))
        return [ref] * self.B

    def apply(self, msg_refs, ans_refs) -> int:
        import ray

        n = len(self.nodes_np)
        changed = np.zeros(n, bool)
        for tbl in ray.get(list(msg_refs)):
            iv = pc.index_in(tbl["node"].combine_chunks(),
                             value_set=self.nodes)
            ivn = iv.to_numpy(zero_copy_only=False)
            valid = pc.is_valid(iv).to_numpy(zero_copy_only=False)
            cand = tbl["cand"].combine_chunks() \
                .to_numpy(zero_copy_only=False)
            sel = np.where(valid)[0]
            ii = ivn[sel].astype(np.int64)
            take = cand[sel] < self.label[ii]
            self.label[ii[take]] = cand[sel][take]
            changed[ii[take]] = True
        # pointer jumping: label -> min label(label) over all answers
        la_parts, l2_parts = [], []
        for tbl in ray.get(list(ans_refs)):
            la_parts.append(tbl["lab"].combine_chunks()
                            .to_numpy(zero_copy_only=False))
            l2_parts.append(tbl["lab2"].combine_chunks()
                            .to_numpy(zero_copy_only=False))
        if la_parts:
            la = np.concatenate(la_parts)
            l2 = np.concatenate(l2_parts)
            o = np.lexsort((l2, la))
            u, st = np.unique(la[o], return_index=True)
            best = l2[o][st]
            pos = np.searchsorted(u, self.label)
            inb = pos < len(u)
            hit = np.where(inb)[0]
            hit = hit[u[pos[hit]] == self.label[hit]]
            cand = best[pos[hit]]
            upd = cand < self.label[hit]
            self.label[hit[upd]] = cand[upd]
            changed[hit[upd]] = True
        self.changed = np.where(changed)[0].astype(np.int64)
        return int(changed.sum())

    def result(self) -> pa.Table:
        lab_pa = pa.array(self.label, pa.string())
        canon = pc.utf8_slice_codeunits(lab_pa, 2)
        keep = pc.not_equal(canon, self.nodes)
        return pa.table({"uri": self.nodes.filter(keep),
                         "canonical_uri": canon.filter(keep)})


def _components_actors(edges, *, max_rounds: int, preferred_ns,
                       num_buckets: int):
    """Shard-actor engine for components_min_label (same Pregel tier
    as stages/graph._PRShard): zero Dataset exchanges per round, the
    driver relays refs and folds the changed-count scalar."""
    import ray
    import ray.data as rd

    from .shardutil import split_dataset_by_bucket

    B = max(2, min(num_buckets, 8))
    # splits run BEFORE actor creation, and the shard actors reserve no
    # CPUs: B x num_cpus actors reserving the whole machine would
    # starve the split/materialize tasks they wait on (the actor-pool
    # live-lock pitfall) — these actors work in short serialized waves
    edge_cols = split_dataset_by_bucket(edges, "node", B)
    Shard = ray.remote(num_cpus=0)(_CCShard)
    shards = [Shard.remote(b, B, preferred_ns) for b in range(B)]
    try:
        ray.get([s.load.remote(edge_cols[b])
                 for b, s in enumerate(shards)])
        for _ in range(max_rounds):
            outs = ray.get([s.emit.remote() for s in shards])
            msg_in = [[outs[b][0][t] for b in range(B)
                       if outs[b][0][t] is not None] for t in range(B)]
            req_in = [[outs[b][1][t] for b in range(B)
                       if outs[b][1][t] is not None] for t in range(B)]
            answers = ray.get([s.serve.remote(req_in[t])
                               for t, s in enumerate(shards)])
            ans_in = [[answers[b][t] for b in range(B)
                       if answers[b][t] is not None] for t in range(B)]
            n_changed = sum(ray.get(
                [s.apply.remote(msg_in[t], ans_in[t])
                 for t, s in enumerate(shards)]))
            if os.environ.get("GRAFT_UF_DEBUG"):
                print(f"[canonical_map/actors] round changed="
                      f"{n_changed}", flush=True)
            if n_changed == 0:
                break
        out = rd.from_arrow_refs(
            [s.result.remote() for s in shards]).materialize()
    finally:
        for s in shards:
            ray.kill(s)
    return out


def components_min_label(edges_ds, *, max_rounds: int = 64,
                         preferred_ns: str | None = None,
                         num_buckets: int = 64, engine: str = "auto"):
    """Connected components over symmetric (node, peer) string edges ->
    (uri, canonical_uri) non-trivial member rows; representative = min
    by (rank, value). The general primitive behind
    :func:`canonical_map` — near-dup cluster assignment reuses it with
    padded numeric ids. Driver union-find fast path below
    ``GRAFT_UF_DRIVER_MAX`` edges; distributed pointer-doubling
    hash-min propagation (bounded driver memory) above it."""
    from ray.data.aggregate import Min, Sum

    from ..functions.hashing import bucket_of

    def _rank(uri: str) -> str:
        if preferred_ns and uri.startswith(preferred_ns):
            return "0|" + uri
        return "1|" + uri

    edges = edges_ds.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"uri": pa.array([], pa.string()),
                      "canonical_uri": pa.array([], pa.string())})
        )

    # Fast path: a dimension-sized equivalence graph is solved exactly
    # on the driver (no per-round scheduling latency). Above the
    # threshold, the distributed propagation below runs with bounded
    # driver memory. Engine contract shared with the other iterative
    # operators (graph.resolve_engine).
    from .graph import resolve_engine

    engine = resolve_engine(engine, n_edges, _DRIVER_UF_MAX,
                            extra=("dataset",))
    if engine == "driver":
        return _driver_union_find(edges, _rank)

    if engine == "actors":
        return _components_actors(edges, max_rounds=max_rounds,
                                  preferred_ns=preferred_ns,
                                  num_buckets=num_buckets)

    # seed labels: node -> min rank-prefixed candidate over
    # {node} ∪ neighbors — one groupby-min over the symmetric edges
    def seed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"].combine_chunks(),
            "cand": _rank_array(batch["peer"], preferred_ns),
        })

    def self_seed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"].combine_chunks(),
            "cand": _rank_array(batch["node"], preferred_ns),
        })

    labels = (
        edges.map_batches(seed, batch_format="pyarrow")
        .union(edges.map_batches(self_seed, batch_format="pyarrow"))
        .groupby("node").aggregate(Min("cand", alias_name="label"))
        .materialize()
    )

    lookup_schema = pa.schema([("_bucket", pa.int32()), ("_side", pa.int8()),
                               ("key", pa.string()), ("node", pa.string()),
                               ("label", pa.string())])

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.table({
            "_bucket": bucket_of(batch["peer"], num_buckets),
            "_side": pa.array(np.zeros(batch.num_rows, np.int8)),
            "key": batch["peer"].combine_chunks(),
            "node": batch["node"].combine_chunks(),
            "label": pa.nulls(batch.num_rows, pa.string()),
        }, schema=lookup_schema)

    def tag_labels(batch: pa.Table) -> pa.Table:
        return pa.table({
            "_bucket": bucket_of(batch["node"], num_buckets),
            "_side": pa.array(np.ones(batch.num_rows, np.int8)),
            "key": batch["node"].combine_chunks(),
            "node": pa.nulls(batch.num_rows, pa.string()),
            "label": batch["label"].combine_chunks(),
        }, schema=lookup_schema)

    def propagate(group: pa.Table) -> pa.Table:
        """edges ⋈ labels on the peer endpoint, local per bucket."""
        side = group["_side"]
        e = group.filter(pc.equal(side, 0)).select(["key", "node"])
        lab = group.filter(pc.equal(side, 1)).select(["key", "label"])
        if e.num_rows == 0 or lab.num_rows == 0:
            return pa.schema([("node", pa.string()),
                              ("cand", pa.string())]).empty_table()
        j = e.join(lab, keys=["key"], join_type="inner")
        return pa.table({"node": j["node"],
                         "cand": j["label"]})

    combine_schema = pa.schema([("node", pa.string()),
                                ("label", pa.string()),
                                ("changed", pa.int64())])

    def tag_old(batch: pa.Table) -> pa.Table:
        return pa.table({
            "_bucket": bucket_of(batch["node"], num_buckets),
            "node": batch["node"].combine_chunks(),
            "cand": batch["label"].combine_chunks(),
            "is_old": pa.array(np.ones(batch.num_rows, np.int8)),
        })

    def tag_cand(batch: pa.Table) -> pa.Table:
        return pa.table({
            "_bucket": bucket_of(batch["node"], num_buckets),
            "node": batch["node"].combine_chunks(),
            "cand": batch["cand"].combine_chunks(),
            "is_old": pa.array(np.zeros(batch.num_rows, np.int8)),
        })

    def combine(group: pa.Table) -> pa.Table:
        """per-node min over {old label} ∪ {candidates} + change flag.

        Vectorized: arrow sort by (node, cand), run-head detection on
        dictionary codes; every node has exactly one old row (labels
        covers all nodes after seeding)."""
        order = pc.sort_indices(
            group, sort_keys=[("node", "ascending"), ("cand", "ascending")])
        g = group.take(order)
        codes = pc.dictionary_encode(g["node"].combine_chunks()) \
                  .indices.to_numpy(zero_copy_only=False)
        head = np.concatenate(([True], codes[1:] != codes[:-1]))
        firsts = g.filter(pa.array(head))
        olds = g.filter(pc.equal(g["is_old"], 1))
        # olds sorted by node too; align row-for-row with firsts
        changed = pc.invert(pc.equal(firsts["cand"], olds["cand"]))
        return pa.table({
            "node": firsts["node"],
            "label": firsts["cand"],
            "changed": pc.cast(changed, pa.int64()),
        }, schema=combine_schema)

    def chase_edges(batch: pa.Table) -> pa.Table:
        """labels -> pointer-jump edges (node, peer=unrank(label)):
        joining these through the same propagate cogroup yields
        label(label(node)) — pointer doubling for free."""
        return pa.table({
            "node": batch["node"].combine_chunks(),
            "peer": pc.utf8_slice_codeunits(
                batch["label"].combine_chunks(), 2, None),
        })

    for _ in range(max_rounds):
        jump = labels.map_batches(chase_edges, batch_format="pyarrow")
        # repartition(num_buckets) before each groupby: iterated
        # union+groupby otherwise COMPOUNDS block counts round over
        # round and the sort-shuffle cost (map_blocks x
        # reduce_partitions) grows superlinearly — measured 0.2s ->
        # 54s per round by round 5 without it, flat ~1.7s with it
        cand = (
            edges.union(jump)
            .map_batches(tag_edges, batch_format="pyarrow")
            .union(labels.map_batches(tag_labels, batch_format="pyarrow"))
            .repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(propagate, batch_format="pyarrow")
        )
        merged = (
            labels.map_batches(tag_old, batch_format="pyarrow")
            .union(cand.map_batches(tag_cand, batch_format="pyarrow"))
            .repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(combine, batch_format="pyarrow")
            .materialize()
        )
        n_changed = merged.aggregate(Sum("changed", alias_name="s"))["s"]
        if os.environ.get("GRAFT_UF_DEBUG"):
            print(f"[canonical_map] round changed={n_changed}", flush=True)
        labels = merged.drop_columns(["changed"])
        if not n_changed:
            break

    def finish(batch: pa.Table) -> pa.Table:
        canon = pc.utf8_slice_codeunits(
            batch["label"].combine_chunks(), 2, None)
        t = pa.table({"uri": batch["node"], "canonical_uri": canon})
        return t.filter(pc.invert(pc.equal(t["uri"], t["canonical_uri"])))

    return labels.map_batches(finish, batch_format="pyarrow")


_DRIVER_UF_MAX = int(os.environ.get("GRAFT_UF_DRIVER_MAX", "4000000"))


def canonical_map_table(vocab_triples: pa.Table, *,
                        preferred_ns: str | None = None) -> pa.Table:
    """Pure in-memory canonical_map for an already-materialized
    vocabulary table: same representative rule (min by (rank, uri))
    as the Dataset paths, but zero Ray jobs. Use when the equivalence
    source is dimension-sized and already on the driver (e.g. the
    flagship's vocab table), saving the fixed per-job scheduling
    latency of materialize/count/iter_batches round-trips."""
    def rank_fn(uri: str):
        pref = preferred_ns is not None and uri.startswith(preferred_ns)
        return (0 if pref else 1, uri)

    mask = pc.and_(
        pc.is_in(vocab_triples["pred"],
                 value_set=pa.array(list(_EQUIV_PREDS))),
        pc.invert(pc.cast(vocab_triples["obj_is_literal"], pa.bool_())
                  .fill_null(False)),
    )
    t = vocab_triples.filter(mask)

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(t["subj"].to_pylist(), t["obj"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb), key=rank_fn)
            parent[hi] = lo

    uris, canons = [], []
    for x in list(parent):
        r = find(x)
        if r != x:
            uris.append(x)
            canons.append(r)
    return pa.table({"uri": pa.array(uris, pa.string()),
                     "canonical_uri": pa.array(canons, pa.string())})


def _driver_union_find(edges_ds, rank_fn):
    """Exact in-memory union-find over a dimension-sized edge set.

    Representative = min over the component by (rank, uri), identical
    to what converged hash-min propagation computes, so both paths are
    interchangeable. Returns the non-trivial (uri, canonical_uri) rows
    as a Dataset."""
    import ray.data as rd

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for batch in edges_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=65536):
        for a, b in zip(batch["node"].to_pylist(),
                        batch["peer"].to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb), key=rank_fn)
                parent[hi] = lo

    uris, canons = [], []
    for x in list(parent):
        r = find(x)
        if r != x:
            uris.append(x)
            canons.append(r)
    return rd.from_arrow(
        pa.table({"uri": pa.array(uris, pa.string()),
                  "canonical_uri": pa.array(canons, pa.string())})
    )


def _broadcast_map(ds, key_col: str, val_col: str):
    """Small Dataset -> ray.put dict (broadcast-side lookup).

    The equivalence graph is vocabulary-sized; at 10^12-doc scale it is
    still ≪ corpus. If it ever outgrew one node, replace with a
    bucketed hash join (guide §Joins)."""
    import ray

    d: dict[str, str] = {}
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        d.update(zip(batch[key_col].to_pylist(), batch[val_col].to_pylist()))
    return ray.put(d)


def apply_canonicalization(triples_ds, canon_map_ds):
    """Rewrite subj and non-literal obj through canon_map (graft J7).

    Broadcast map application per batch — zero shuffles on the big
    side. Equivalence triples collapse to self-loops and are dropped;
    callers should dedup afterwards. ``canon_map_ds`` may be a Dataset
    or an in-memory ``pa.Table`` (from ``canonical_map_table``)."""
    import ray

    if isinstance(canon_map_ds, pa.Table):
        ref = ray.put(dict(zip(canon_map_ds["uri"].to_pylist(),
                               canon_map_ds["canonical_uri"].to_pylist())))
    else:
        ref = _broadcast_map(canon_map_ds, "uri", "canonical_uri")

    def rewrite(batch: pa.Table, _ref=ref) -> pa.Table:
        cmap = ray.get(_ref)
        if not cmap:
            return batch
        keys = pa.array(list(cmap.keys()), pa.string())
        vals = pa.array(list(cmap.values()), pa.string())

        def remap(col: pa.ChunkedArray, keep_mask=None) -> pa.Array:
            # vectorized dict substitution: index_in + take, original
            # value where the key is absent (or masked out)
            col = col.combine_chunks()
            idx = pc.index_in(col, value_set=keys)
            hit = pc.is_valid(idx)
            if keep_mask is not None:
                hit = pc.and_(hit, keep_mask)
            mapped = pc.take(vals, pc.fill_null(idx, 0))
            return pc.if_else(hit, mapped, col)

        not_lit = pc.invert(pc.cast(batch["obj_is_literal"], pa.bool_())
                            .combine_chunks().fill_null(False))
        out = batch.set_column(
            batch.schema.get_field_index("subj"), "subj",
            remap(batch["subj"]))
        out = out.set_column(
            out.schema.get_field_index("obj"), "obj",
            remap(batch["obj"], keep_mask=not_lit))
        # drop equivalence self-loops created by the rewrite
        mask = pc.invert(
            pc.and_(
                pc.equal(out["subj"], out["obj"]),
                pc.is_in(out["pred"], value_set=pa.array(list(_EQUIV_PREDS))),
            )
        )
        return out.filter(mask)

    return triples_ds.map_batches(rewrite, batch_format="pyarrow")
