"""Pipeline configuration (live equivalent of the reference's
``ConverterConfig``, skos_converter.py:40-60).

Only the fields the reference actually *consumes* are kept (namespace,
prefix, language preferences — skos_converter.py:437-451, 1290-1294);
its dead knobs (batch_size/memory_limit_mb/max_hierarchy_depth/
validation_level, SURVEY.md D4) are replaced with knobs the Ray engine
really uses.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# SKOS / RDF vocabulary the engine reads and writes (SURVEY.md §1.2).
SKOS = "http://www.w3.org/2004/02/skos/core#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"

RDF_TYPE = RDF + "type"
RDFS_LABEL = RDFS + "label"
SKOS_CONCEPT = SKOS + "Concept"
SKOS_CONCEPT_SCHEME = SKOS + "ConceptScheme"
SKOS_PREF_LABEL = SKOS + "prefLabel"
SKOS_ALT_LABEL = SKOS + "altLabel"
SKOS_HIDDEN_LABEL = SKOS + "hiddenLabel"
SKOS_DEFINITION = SKOS + "definition"
SKOS_SCOPE_NOTE = SKOS + "scopeNote"
SKOS_NOTATION = SKOS + "notation"
SKOS_BROADER = SKOS + "broader"
SKOS_NARROWER = SKOS + "narrower"
SKOS_RELATED = SKOS + "related"
SKOS_IN_SCHEME = SKOS + "inScheme"
SKOS_HAS_TOP_CONCEPT = SKOS + "hasTopConcept"
SKOS_TOP_CONCEPT_OF = SKOS + "topConceptOf"
SKOS_EXACT_MATCH = SKOS + "exactMatch"
OWL_SAME_AS = OWL + "sameAs"

# Inverse pairs kept consistent by the inverse-relation pass
# (reference pair emission: skos_converter.py:1540-1541, 1545-1546;
# validator: 209-238).
INVERSE_PAIRS = {
    SKOS_BROADER: SKOS_NARROWER,
    SKOS_NARROWER: SKOS_BROADER,
    SKOS_HAS_TOP_CONCEPT: SKOS_TOP_CONCEPT_OF,
    SKOS_TOP_CONCEPT_OF: SKOS_HAS_TOP_CONCEPT,
}

# Symmetric properties (a R b implies b R a).
SYMMETRIC_PREDS = {SKOS_RELATED, SKOS_EXACT_MATCH, OWL_SAME_AS}


@dataclass
class EngineConfig:
    """Threaded by value into UDF closures and actor constructors."""

    namespace_uri: str = "http://example.org/"
    prefix: str = "ex"
    preferred_language: str = "en"
    fallback_languages: tuple[str, ...] = ("en",)

    # Ray execution knobs (the live replacements for the dead D4 knobs).
    batch_size: int = 4096
    linker_concurrency: int = 4
    shuffle_partitions: int = 32
    salt_buckets: int = 16          # A9 two-phase salted aggregation
    max_hierarchy_depth: int = 32   # O1/O3 iteration bound (cycle guard)

    extra: dict = field(default_factory=dict)


def use_hash_shuffle() -> None:
    """Switch the session's groupby/join exchange to Ray's hash
    shuffle. The default sort-based shuffle degrades superlinearly
    with input block count on low-cardinality keys (measured: the
    64-bucket triple dedup at 32 cpus: 28s sort-based vs 5s hash) —
    pre-aggregation-friendly hash exchange is the right physical plan
    for every bucketed cogroup in this engine. Called by the pipeline
    entry points; idempotent and safe on any Ray >= 2.46."""
    try:
        import ray
        from ray.data.context import DataContext, ShuffleStrategy

        import os

        if not ray.is_initialized():
            return
        # OPT-IN only (RAY_GRAFT_HASH_SHUFFLE=1). Hash shuffle beat
        # the sort shuffle 5x on an isolated materialized groupby
        # (64-bucket triple dedup, 32 cpus: 28s sort vs 5s hash), but
        # inside a streaming pipeline its aggregator ACTORS contend
        # with the linker actor pool for CPUs and the executor stalls
        # waiting for them (min_hash_shuffle_aggregator_wait_time_in_s
        # = 300). The robust default is sort shuffle + bounding the
        # block count entering each groupby (see dedup_triples) —
        # sort-shuffle cost grows with map_blocks x reduce_partitions.
        if os.environ.get("RAY_GRAFT_HASH_SHUFFLE") != "1":
            return
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        if ncpu < 16:
            return
        ctx = DataContext.get_current()
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # default max_hash_shuffle_aggregators=64 spawns 100+ worker
        # processes per groupby; one aggregator per CPU is plenty
        ctx.max_hash_shuffle_aggregators = max(2, min(ncpu, 64))
    except Exception:  # pragma: no cover - older Ray without the enum
        pass
