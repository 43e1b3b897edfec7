"""Deterministic synthetic SKOS vocabulary generator (FIXTURES.md §2).

Produces the ``triples`` IR table for a vocabulary with schemes, a
broader/narrower hierarchy, multilingual labels, altLabels,
hiddenLabels, notations, definitions, sameAs/exactMatch clusters and —
optionally — every pathology the reference's validator checks for
(SURVEY.md §2.5/§2.4). Seeded and content-addressed: the same seed
yields byte-identical tables on every worker.

No external data; label text is synthesized from a fixed word pool.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import pyarrow as pa

from . import schemas
from .config import (
    OWL_SAME_AS,
    RDF_TYPE,
    SKOS_ALT_LABEL,
    SKOS_BROADER,
    SKOS_CONCEPT,
    SKOS_CONCEPT_SCHEME,
    SKOS_DEFINITION,
    SKOS_EXACT_MATCH,
    SKOS_HAS_TOP_CONCEPT,
    SKOS_HIDDEN_LABEL,
    SKOS_IN_SCHEME,
    SKOS_NARROWER,
    SKOS_NOTATION,
    SKOS_PREF_LABEL,
    SKOS_RELATED,
    SKOS_SCOPE_NOTE,
    SKOS_TOP_CONCEPT_OF,
)

_WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor iris juniper "
    "krill lumen mesa nimbus onyx prairie quartz reef summit tundra "
    "umbra vertex willow xenon yonder zephyr alloy brook cairn dune "
    "ester flint grove heath inlet knoll ledge marsh notch orchard "
    "pike quarry ridge shoal thicket upland vale wharf yarrow zenith"
).split()

_LANGS = ("en", "fr", "de", "")


@dataclass
class VocabSpec:
    n_schemes: int = 2
    n_concepts: int = 60
    max_depth: int = 4
    seed: int = 42
    namespace: str = "http://example.org/vocab/"
    # pathology switches (FIXTURES.md §2) — off by default for clean fixtures
    pathologies: bool = False
    # skew: fraction of concepts hanging directly off scheme-root #0
    hub_fraction: float = 0.0


@dataclass
class Vocab:
    """Generated vocabulary: the triples table plus linking ground truth."""

    triples: pa.Table
    # label catalog rows: (label, norm_label, uri, kind in pref|alt|hidden)
    labels: list[tuple[str, str, str, str]] = field(default_factory=list)
    concept_uris: list[str] = field(default_factory=list)
    scheme_uris: list[str] = field(default_factory=list)


def _label(rng: random.Random, used: set[str]) -> str:
    for _ in range(100):
        n = rng.choice((1, 2, 2, 3))
        cand = " ".join(rng.choice(_WORDS) for _ in range(n)).title()
        if cand not in used:
            used.add(cand)
            return cand
    cand = f"Concept {len(used)}"
    used.add(cand)
    return cand


def generate_vocab(spec: VocabSpec | None = None) -> Vocab:
    spec = spec or VocabSpec()
    rng = random.Random(spec.seed)
    ns = spec.namespace
    used: set[str] = set()

    rows: list[tuple] = []  # (subj, pred, obj, obj_is_literal, lang)

    def add(subj, pred, obj, lit=False, lang=None):
        rows.append((subj, pred, obj, lit, lang))

    labels: list[tuple[str, str, str, str]] = []
    from .functions.text import normalize_surface

    def reg_label(label: str, uri: str, kind: str):
        labels.append((label, normalize_surface(label), uri, kind))

    scheme_uris = []
    concept_uris: list[str] = []
    # concept bookkeeping for hierarchy: per scheme, a list of (uri, depth)
    for s in range(spec.n_schemes):
        s_label = _label(rng, used) + " Scheme"
        s_uri = f"{ns}scheme/{s}"
        scheme_uris.append(s_uri)
        add(s_uri, RDF_TYPE, SKOS_CONCEPT_SCHEME)
        add(s_uri, SKOS_PREF_LABEL, s_label, True, "en")

    per_scheme = max(1, spec.n_concepts // spec.n_schemes)
    cidx = 0
    nodes_by_scheme: list[list[tuple[str, int]]] = [[] for _ in scheme_uris]
    for s, s_uri in enumerate(scheme_uris):
        n_here = per_scheme if s < len(scheme_uris) - 1 else spec.n_concepts - cidx
        for k in range(n_here):
            label = _label(rng, used)
            uri = f"{ns}c/{cidx}"
            cidx += 1
            concept_uris.append(uri)
            add(uri, RDF_TYPE, SKOS_CONCEPT)
            add(uri, SKOS_PREF_LABEL, label, True, "en")
            reg_label(label, uri, "pref")
            # multilingual prefLabels exercise the preference chain
            # (ref: skos_converter.py:437-451)
            for lang in _LANGS[1:]:
                if rng.random() < 0.3:
                    add(uri, SKOS_PREF_LABEL, f"{label} ({lang or 'x'})",
                        True, lang or None)
            for _ in range(rng.randint(0, 2)):
                alt = _label(rng, used)
                add(uri, SKOS_ALT_LABEL, alt, True, "en")
                reg_label(alt, uri, "alt")
            if rng.random() < 0.3:
                hid = _label(rng, used)
                add(uri, SKOS_HIDDEN_LABEL, hid, True, "en")
                reg_label(hid, uri, "hidden")
            if rng.random() < 0.6:
                add(uri, SKOS_DEFINITION, f"Definition of {label}.", True, "en")
            elif rng.random() < 0.5:
                # scopeNote-only: exercises the definition fallback
                # (ref: skos_converter.py:633-636)
                add(uri, SKOS_SCOPE_NOTE, f"Scope of {label}.", True, "en")
            if rng.random() < 0.5:
                add(uri, SKOS_NOTATION, f"N{cidx:04d}", True)
            add(uri, SKOS_IN_SCHEME, s_uri)

            # hierarchy placement
            nodes = nodes_by_scheme[s]
            hub = spec.hub_fraction > 0 and nodes and rng.random() < spec.hub_fraction
            if hub:
                parent, pdepth = nodes[0]
                add(uri, SKOS_BROADER, parent)
                add(parent, SKOS_NARROWER, uri)
                nodes.append((uri, pdepth + 1))
            elif not nodes or rng.random() < 0.25:
                # top concept: emit BOTH inverse directions
                # (ref pair emission: skos_converter.py:1540-1541)
                add(s_uri, SKOS_HAS_TOP_CONCEPT, uri)
                add(uri, SKOS_TOP_CONCEPT_OF, s_uri)
                nodes.append((uri, 1))
            else:
                cands = [nd for nd in nodes if nd[1] < spec.max_depth]
                parent, pdepth = rng.choice(cands or nodes)
                add(uri, SKOS_BROADER, parent)
                add(parent, SKOS_NARROWER, uri)
                nodes.append((uri, pdepth + 1))

    # related edges (symmetric emission not required of input)
    for uri in concept_uris:
        if rng.random() < 0.15:
            other = rng.choice(concept_uris)
            if other != uri:
                add(uri, SKOS_RELATED, other)

    # sameAs / exactMatch clusters seeding union-find (A8): alias URIs
    # in a foreign namespace pointing at real concepts, chained so
    # transitive closure is non-trivial.
    n_alias = max(1, len(concept_uris) // 6)
    for a in range(n_alias):
        target = rng.choice(concept_uris)
        alias1 = f"http://alias.example.com/a/{a}"
        alias2 = f"http://alias.example.com/b/{a}"
        add(alias1, OWL_SAME_AS, target)
        pred = SKOS_EXACT_MATCH if rng.random() < 0.5 else OWL_SAME_AS
        add(alias2, pred, alias1)

    if spec.pathologies:
        _add_pathologies(add, ns, rng, concept_uris, scheme_uris)

    tbl = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_is_literal": [r[3] for r in rows],
            "lang": [r[4] for r in rows],
            "source_doc": [None] * len(rows),
        },
        schema=schemas.TRIPLES,
    )
    return Vocab(triples=tbl, labels=labels,
                 concept_uris=concept_uris, scheme_uris=scheme_uris)


def _add_pathologies(add, ns, rng, concept_uris, scheme_uris):
    """One instance of each validator-visible defect (FIXTURES.md §2)."""
    s_uri = scheme_uris[0]
    # one-sided hasTopConcept / one-sided topConceptOf (ref: 209-238)
    p1, p2 = f"{ns}path/onesided_htc", f"{ns}path/onesided_tco"
    for u in (p1, p2):
        add(u, RDF_TYPE, SKOS_CONCEPT)
        add(u, SKOS_PREF_LABEL, f"Pathology {u.rsplit('_', 1)[-1]}", True, "en")
        add(u, SKOS_IN_SCHEME, s_uri)
    add(s_uri, SKOS_HAS_TOP_CONCEPT, p1)          # no inverse
    add(p2, SKOS_TOP_CONCEPT_OF, s_uri)           # no inverse
    # two prefLabels same language (ref: 189-207)
    dup = f"{ns}path/dup_pref"
    add(dup, RDF_TYPE, SKOS_CONCEPT)
    add(dup, SKOS_PREF_LABEL, "Duplicate Pref A", True, "en")
    add(dup, SKOS_PREF_LABEL, "Duplicate Pref B", True, "en")
    add(dup, SKOS_IN_SCHEME, s_uri)
    # duplicate labels across concepts (ref: 272-291)
    for i in (1, 2):
        u = f"{ns}path/shared_label_{i}"
        add(u, RDF_TYPE, SKOS_CONCEPT)
        add(u, SKOS_PREF_LABEL, "Shared Label", True, "en")
        add(u, SKOS_IN_SCHEME, s_uri)
    # polyhierarchy: child with 2 broaders (ref: 293-309)
    poly = f"{ns}path/poly_child"
    add(poly, RDF_TYPE, SKOS_CONCEPT)
    add(poly, SKOS_PREF_LABEL, "Poly Child", True, "en")
    add(poly, SKOS_IN_SCHEME, s_uri)
    add(poly, SKOS_BROADER, concept_uris[0])
    add(poly, SKOS_BROADER, concept_uris[1])
    # self-reference broader (ref: 240-253)
    selfref = f"{ns}path/self_broader"
    add(selfref, RDF_TYPE, SKOS_CONCEPT)
    add(selfref, SKOS_PREF_LABEL, "Self Broader", True, "en")
    add(selfref, SKOS_BROADER, selfref)
    # 3-node broader cycle (ref: 157-187)
    cyc = [f"{ns}path/cycle_{i}" for i in range(3)]
    for i, u in enumerate(cyc):
        add(u, RDF_TYPE, SKOS_CONCEPT)
        add(u, SKOS_PREF_LABEL, f"Cycle {i}", True, "en")
        add(u, SKOS_BROADER, cyc[(i + 1) % 3])
    # orphan-in-scheme and orphan-no-scheme (ref: 255-270, 311-338)
    orph1 = f"{ns}path/orphan_in_scheme"
    add(orph1, RDF_TYPE, SKOS_CONCEPT)
    add(orph1, SKOS_PREF_LABEL, "Orphan In Scheme", True, "en")
    add(orph1, SKOS_IN_SCHEME, s_uri)
    orph2 = f"{ns}path/orphan_no_scheme"
    add(orph2, RDF_TYPE, SKOS_CONCEPT)
    add(orph2, SKOS_PREF_LABEL, "Orphan No Scheme", True, "en")
    # label-less concept (ref: 141-155)
    add(f"{ns}path/no_label", RDF_TYPE, SKOS_CONCEPT)
    # >7-deep chain (ref: 340-374)
    chain_parent = None
    for i in range(9):
        u = f"{ns}path/deep_{i}"
        add(u, RDF_TYPE, SKOS_CONCEPT)
        add(u, SKOS_PREF_LABEL, f"Deep {i}", True, "en")
        add(u, SKOS_IN_SCHEME, s_uri)
        if chain_parent is None:
            add(s_uri, SKOS_HAS_TOP_CONCEPT, u)
            add(u, SKOS_TOP_CONCEPT_OF, s_uri)
        else:
            add(u, SKOS_BROADER, chain_parent)
            add(chain_parent, SKOS_NARROWER, u)
        chain_parent = u
