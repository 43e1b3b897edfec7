"""Flagship pipeline: interleaved documents -> canonical knowledge graph.

The BASELINE.json north-star pipeline, end to end:

1. **mention detection + entity linking** — ``map_batches`` actor pool
   over zero-copy Arrow document batches, probing span text against a
   broadcast prefLabel/altLabel/hiddenLabel index (stages/linker.py).
2. **triple emission** — each linked mention yields a provenance triple
   ``(doc_uri, engine:mentions, concept)`` plus the vocabulary subgraph
   of the mentioned concept (skos:broader / narrower / related /
   exactMatch + notation / definition, per the north star), stamped
   with ``source_doc``. The subgraph lookup is a broadcast dict
   (vocabulary is dimension-sized).
3. **set-semantics dedup** (one hash shuffle).
4. **canonicalization** — union-find over owl:sameAs / skos:exactMatch
   (stages/canonicalize.py), applied as a broadcast rewrite.
5. **inverse-relation consistency** — broader⇔narrower etc.
   (reference's paired emission, skos_converter.py:1540-1546),
   applied by closing the dimension-sized vocabulary subgraph on the
   driver before emission (see _vocab_subgraph) — the general
   corpus-scale closure operator lives in stages/triples.py.
6. **adjacency-partitioned materialization** with a checkpoint manifest
   (state/manifest.py) when ``out_dir`` is given.

Everything stays a lazy Dataset until the caller consumes it.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import (
    OWL_SAME_AS,
    SKOS_BROADER,
    SKOS_DEFINITION,
    SKOS_EXACT_MATCH,
    SKOS_NARROWER,
    SKOS_NOTATION,
    SKOS_RELATED,
)
from ..stages.canonicalize import apply_canonicalization, canonical_map_table
from ..stages.linker import build_label_index, link_documents
from ..stages.triples import dedup_triples

ENGINE_NS = "http://skosconverter-ray.example.org/ns#"
PRED_MENTIONS = ENGINE_NS + "mentions"

# the vocabulary subgraph projected per mentioned concept (north star)
EMITTED_PREDS = (
    SKOS_BROADER,
    SKOS_NARROWER,
    SKOS_RELATED,
    SKOS_EXACT_MATCH,
    OWL_SAME_AS,
    SKOS_NOTATION,
    SKOS_DEFINITION,
)


def _vocab_subgraph(vocab_triples: pa.Table) -> dict[str, list[tuple]]:
    """uri -> [(subj, pred, obj, obj_is_literal, lang)] for
    EMITTED_PREDS, CLOSED under inverse/symmetric pairs.

    The closure (broader⇔narrower, hasTopConcept⇔topConceptOf,
    related/sameAs/exactMatch mirrored — the reference's paired
    emission, skos_converter.py:1540-1546) is applied HERE, on the
    driver, because every hierarchical edge in the flagship graph
    originates from this dimension-sized vocabulary: closing ~10^5
    dict entries once replaces an entire corpus-wide
    inverse-consistency shuffle+materialize downstream (~25% of
    flagship wall at 4 cpus). The closure commutes with URI
    canonicalization (flip of a rewrite = rewrite of the flip) and
    dedup, so the output graph is identical to running
    stages/triples.inverse_consistency after the fact — pinned by
    test_flagship.test_vocab_closure_matches_inverse_pass. A flipped
    edge is attached to the MENTIONED concept's entry so it is
    emitted whenever the original edge is."""
    from ..config import INVERSE_PAIRS, SYMMETRIC_PREDS

    keep = set(EMITTED_PREDS)
    inv_map = dict(INVERSE_PAIRS)
    sym = set(SYMMETRIC_PREDS)
    out: dict[str, list[tuple]] = {}
    for subj, pred, obj, lit, lang in zip(
        vocab_triples["subj"].to_pylist(),
        vocab_triples["pred"].to_pylist(),
        vocab_triples["obj"].to_pylist(),
        vocab_triples["obj_is_literal"].to_pylist(),
        vocab_triples["lang"].to_pylist(),
    ):
        if pred not in keep:
            continue
        entry = out.setdefault(subj, [])
        entry.append((subj, pred, obj, lit, lang))
        if not lit:
            flip = inv_map.get(pred) or (pred if pred in sym else None)
            if flip is not None:
                entry.append((obj, flip, subj, lit, lang))
    return out


class EmitTriples:
    """mentions batch -> triples batch.

    Usable both as an actor-pool class (``map_batches(EmitTriples,
    fn_constructor_args=...)``) and as a serialized task callable: the
    broadcast subgraph rides as an ObjectRef (tiny to ship) and is
    ray.get-resolved lazily on first use in the worker — never
    materialized into the serialized closure."""

    def __init__(self, subgraph_ref, doc_ns: str):
        self._ref = subgraph_ref
        self._sub = None
        self.doc_ns = doc_ns

    @property
    def sub(self):
        if self._sub is None:
            import ray

            self._sub = (ray.get(self._ref)
                         if isinstance(self._ref, ray.ObjectRef)
                         else self._ref)
        return self._sub

    def __getstate__(self):
        # never pickle the resolved dict into task closures
        return {"_ref": self._ref, "_sub": None, "doc_ns": self.doc_ns}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .. import schemas

        n = batch.num_rows
        doc_ids = batch["doc_id"].combine_chunks() \
            if isinstance(batch["doc_id"], pa.ChunkedArray) \
            else batch["doc_id"]
        uris = batch["concept_uri"]
        # mention edges: fully vectorized (this is the per-row bulk)
        mentions = pa.table(
            {
                "subj": pc.binary_join_element_wise(
                    pa.scalar(self.doc_ns), doc_ids, pa.scalar("")),
                "pred": pa.array([PRED_MENTIONS] * n, pa.string()),
                "obj": uris,
                "obj_is_literal": pa.array([False] * n, pa.bool_()),
                "lang": pa.nulls(n, pa.string()),
                "source_doc": doc_ids,
            },
            schema=schemas.TRIPLES,
        )
        # Per-batch combiner: the subgraph of a concept is emitted ONCE
        # per batch (not once per mentioning doc), attributed to the
        # batch-MIN mentioning doc. min is associative, so the global
        # dedup's min-source_doc tiebreak still lands on the overall
        # min mentioning doc — identical output, ~4-5x fewer rows into
        # the object store and the dedup shuffle. The loop below is
        # over DISTINCT batch concepts (vectorized group_by min), not
        # mention rows.
        mins = (batch.select(["concept_uri", "doc_id"])
                .group_by("concept_uri").aggregate([("doc_id", "min")]))
        rows = {k: [] for k in
                ("subj", "pred", "obj", "obj_is_literal", "lang",
                 "source_doc")}
        for uri, doc_id in zip(mins["concept_uri"].to_pylist(),
                               mins["doc_id_min"].to_pylist()):
            for subj, pred, obj, lit, lang in self.sub.get(uri, ()):
                rows["subj"].append(subj)
                rows["pred"].append(pred)
                rows["obj"].append(obj)
                rows["obj_is_literal"].append(lit)
                rows["lang"].append(lang)
                rows["source_doc"].append(doc_id)
        subgraph = pa.table(
            {
                "subj": pa.array(rows["subj"], pa.string()),
                "pred": pa.array(rows["pred"], pa.string()),
                "obj": pa.array(rows["obj"], pa.string()),
                "obj_is_literal": pa.array(rows["obj_is_literal"],
                                           pa.bool_()),
                "lang": pa.array(rows["lang"], pa.string()),
                "source_doc": pa.array(rows["source_doc"], pa.string()),
            },
            schema=schemas.TRIPLES,
        )
        return pa.concat_tables([mentions, subgraph])


def run_flagship(docs_ds, vocab_triples: pa.Table, *,
                 doc_ns: str = "http://skosconverter-ray.example.org/doc/",
                 preferred_ns: str | None = None,
                 link_concurrency="auto", batch_size: int = 1024,
                 materialize_before_dedup: bool | None = None,
                 out_dir: str | None = None, n_parts: int = 32):
    """documents Dataset + vocabulary triples -> canonical graph Dataset.

    When ``out_dir`` is set, also materializes the graph as
    adjacency-partitioned parquet (``part=<crc32(subj)%n_parts>``) with
    a resumable manifest, and returns the written dataset path info.

    ``link_concurrency``: "auto" (default) picks the measured-best
    physical plan (elastic tasks vs autoscaling actor pool) from the
    index size and session width; any other value — ``None`` (tasks)
    or an int / ``(min, max)`` pool spec — is passed straight to the
    linker stage as an explicit override.
    """
    import ray
    import ray.data as rd

    from ..config import use_hash_shuffle
    use_hash_shuffle()

    label_index = build_label_index(vocab_triples)
    index_ref = ray.put(label_index)
    sub_ref = ray.put(_vocab_subgraph(vocab_triples))

    # CPU budgeting: fixed full-width actor pools live-lock — actors
    # RESERVE their CPUs, and two full-width pools plus the downstream
    # shuffle tasks starve each other (observed: 4+4 actors on 8 CPUs
    # = zero progress). So (a) only the linker is an actor pool; the
    # triple emission runs as elastic tasks (its state is the broadcast
    # subgraph ref, cheap to re-get per task), and (b) the pool
    # AUTOSCALES between 1 and (cpus - 2): linking dominates the
    # pipeline's compute, so it deserves nearly the full width, and
    # autoscaling releases actors when the pool idles so the dedup
    # shuffle gets the CPUs back (a fixed half-width pool left ~45% of
    # the cluster idle in the 16-cpu utilization trace).
    total_cpus = int(ray.cluster_resources().get("CPU", 8))
    # min = half width (autoscale-up hysteresis otherwise idles the
    # pool at 1 actor on narrow sessions), max = width - 2
    pool = (max(1, total_cpus // 2), max(2, total_cpus - 2))
    # physical-plan choice, measured at 1M docs: on WIDE sessions a
    # small index runs best as elastic tasks (full-width scheduling;
    # 16 cpus: 42s tasks vs 63s pool), on NARROW ones the actor pool
    # wins via stage overlap (4 cpus: 118s pool vs 261s fused tasks).
    # A big index always uses the pool (per-worker load amortization).
    if link_concurrency == "auto":
        link_concurrency = (None if len(label_index) < 50_000
                            and total_cpus >= 8 else pool)

    mentions = link_documents(docs_ds, index_ref,
                              concurrency=link_concurrency,
                              batch_size=batch_size)
    emit = EmitTriples(sub_ref, doc_ns)
    # larger emit batches amortize the per-batch subgraph emission
    # (one copy per distinct concept per batch — see EmitTriples)
    triples = mentions.map_batches(
        emit,
        batch_format="pyarrow",
        batch_size=max(batch_size, 4096),
    )
    # Canonicalize BEFORE the dedup shuffle: the URI rewrite can merge
    # distinct triples into duplicates (e.g. exactMatch aliases sharing
    # a broader edge), so running the set-semantics dedup downstream of
    # it removes those at zero extra cost — the alternative (dedup
    # first, then rewrite) would need a SECOND full dedup to restore
    # the U4 invariant. vocab_triples is already on the driver: solve
    # union-find in-memory (no Ray round-trips; see canonical_map_table).
    canon_tbl = canonical_map_table(vocab_triples, preferred_ns=preferred_ns)
    triples = apply_canonicalization(triples, canon_tbl)
    # Physical-plan choice, measured at 300k docs: on WIDE sessions,
    # materializing the rewritten triples before the dedup shuffle
    # beats the fully-fused DAG (16 cpus: 8.6s split vs 12.7s fused —
    # the long fused map chain delays shuffle inputs and contends with
    # reduce tasks); on NARROW sessions fusion wins via stage overlap
    # with the half-width linker pool (4 cpus: 36s fused vs 47s split).
    # None = auto by width; small-corpus callers (e.g. the sf-dir
    # query harness) pass False to skip the extra exchange, which only
    # pays off when the rewritten triples are corpus-scale
    if materialize_before_dedup is None:
        materialize_before_dedup = total_cpus >= 8
    if materialize_before_dedup:
        triples = triples.materialize()
    # the vocab subgraph is already inverse-closed (see _vocab_subgraph)
    # and mention triples have no inverse, so post-dedup the graph IS
    # the inverse-consistency fixpoint — no corpus-wide closure pass
    graph = dedup_triples(triples, coalesce=True)
    canon = rd.from_arrow(canon_tbl)

    if out_dir is not None:
        from ..state.manifest import write_partitioned

        write_partitioned(graph, out_dir, key_col="subj", n_parts=n_parts,
                          stage="graph", lineage=doc_ns)
    return {"mentions": mentions, "graph": graph, "canon_map": canon}
