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


def canonical_map(triples_ds, *, max_rounds: int = 32,
                  preferred_ns: str | None = None):
    """-> canon_map Dataset (uri, canonical_uri), non-trivial rows only.

    Distributed hash-min propagation with a driver-side convergence
    loop: each iteration is one groupby-min shuffle over the
    equivalence graph plus a cheap changed-count aggregate.

    ``preferred_ns``: URIs under this namespace outrank foreign URIs as
    cluster representatives (so an ``owl:sameAs`` alias never replaces
    a real vocabulary concept). Implemented by rank-prefixing the
    propagated labels ("0|uri" < "1|uri"), which keeps the whole
    algorithm a plain string-min.
    """
    from ray.data.aggregate import Min, Sum

    def _rank(uri: str) -> str:
        if preferred_ns and uri.startswith(preferred_ns):
            return "0|" + uri
        return "1|" + uri

    def _unrank(label: str) -> str:
        return label[2:]

    edges = equivalence_edges(triples_ds).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"uri": pa.array([], pa.string()),
                      "canonical_uri": pa.array([], pa.string())})
        )

    # Fast path: the equivalence graph is dimension-sized (every round
    # below already broadcasts the full node->label dict to the driver,
    # so driver memory is not a new assumption). Under the threshold,
    # run exact union-find on the driver instead of paying ~1s of
    # scheduling latency per distributed round. Above it, fall through
    # to hash-min propagation, which scales to graphs that don't fit
    # one node.
    if n_edges <= _DRIVER_UF_MAX:
        return _driver_union_find(edges, _rank)

    # labels: node -> current best (min) rank-prefixed candidate
    def seed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"],
            "cand": pa.array([_rank(p) for p in batch["peer"].to_pylist()],
                             pa.string()),
        })

    def self_seed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"],
            "cand": pa.array([_rank(n) for n in batch["node"].to_pylist()],
                             pa.string()),
        })

    labels = (
        edges.map_batches(seed, batch_format="pyarrow")
        .union(edges.map_batches(self_seed, batch_format="pyarrow"))
        .groupby("node").aggregate(Min("cand", alias_name="label"))
        .materialize()
    )

    for _ in range(max_rounds):
        # propagate: node's label flows to each neighbor as a candidate
        label_ref = _broadcast_map(labels, "node", "label")

        def push(batch: pa.Table, _ref=label_ref) -> pa.Table:
            import ray

            lookup = ray.get(_ref)
            cands = [lookup.get(p) or _rank(p)
                     for p in batch["peer"].to_pylist()]
            return pa.table({"node": batch["node"],
                             "cand": pa.array(cands, pa.string())})

        new_labels = (
            edges.map_batches(push, batch_format="pyarrow")
            .union(labels.map_batches(
                lambda b: pa.table({"node": b["node"], "cand": b["label"]}),
                batch_format="pyarrow"))
            .groupby("node").aggregate(Min("cand", alias_name="label"))
            .materialize()
        )
        # convergence check: any label changed?
        old_ref = _broadcast_map(labels, "node", "label")

        def diff(batch: pa.Table, _ref=old_ref) -> pa.Table:
            import ray

            old = ray.get(_ref)
            changed = sum(
                1
                for n, l in zip(batch["node"].to_pylist(),
                                batch["label"].to_pylist())
                if old.get(n) != l
            )
            return pa.table({"changed": pa.array([changed], pa.int64())})

        n_changed = (
            new_labels.map_batches(diff, batch_format="pyarrow")
            .aggregate(Sum("changed", alias_name="s"))["s"]
        )
        labels = new_labels
        if not n_changed:
            break

    def finish(batch: pa.Table) -> pa.Table:
        canon = pa.array([_unrank(l) for l in batch["label"].to_pylist()],
                         pa.string())
        t = pa.table({"uri": batch["node"], "canonical_uri": canon})
        return t.filter(pc.invert(pc.equal(t["uri"], t["canonical_uri"])))

    return labels.map_batches(finish, batch_format="pyarrow")


import os

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
        subs = [cmap.get(s, s) for s in batch["subj"].to_pylist()]
        objs = batch["obj"].to_pylist()
        lits = batch["obj_is_literal"].to_pylist()
        objs = [o if lit else cmap.get(o, o) for o, lit in zip(objs, lits)]
        out = batch.set_column(
            batch.schema.get_field_index("subj"), "subj",
            pa.array(subs, pa.string()))
        out = out.set_column(
            out.schema.get_field_index("obj"), "obj",
            pa.array(objs, pa.string()))
        # drop equivalence self-loops created by the rewrite
        mask = pc.invert(
            pc.and_(
                pc.equal(out["subj"], out["obj"]),
                pc.is_in(out["pred"], value_set=pa.array(list(_EQUIV_PREDS))),
            )
        )
        return out.filter(mask)

    return triples_ds.map_batches(rewrite, batch_format="pyarrow")
