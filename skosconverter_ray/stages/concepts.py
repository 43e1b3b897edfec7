"""Concept pivot + label resolution (SURVEY.md A5/A6/J4).

Replaces the reference's per-concept getter cluster
(skos_converter.py:623-657) and its language-preference chain
(437-451) with ONE groupby-pivot over the triples table: shuffle on
``subj``, then a per-group aggregation that applies the reference's
selection rules deterministically.

Reference "first" semantics (``definitions[0]`` at 631, first-wins
scheme assignment at 711) are nondeterministic under rdflib iteration;
here every "first" is min() under an explicit total order
(SURVEY.md D5 discipline).

Label fallback chain (ref 420-451, 376-394):
prefLabel@preferred > prefLabel@fallback_i > prefLabel@any >
altLabel > rdfs:label > URI tail.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import (
    RDF_TYPE,
    RDFS_LABEL,
    SKOS_ALT_LABEL,
    SKOS_CONCEPT,
    SKOS_CONCEPT_SCHEME,
    SKOS_DEFINITION,
    SKOS_HIDDEN_LABEL,
    SKOS_IN_SCHEME,
    SKOS_NOTATION,
    SKOS_PREF_LABEL,
    SKOS_RELATED,
    SKOS_SCOPE_NOTE,
    SKOS_TOP_CONCEPT_OF,
    OWL_SAME_AS,
    EngineConfig,
)
from ..functions.text import normalize_surface  # noqa: F401  (re-export convenience)


def _lang_rank(lang, cfg: EngineConfig) -> int:
    if lang == cfg.preferred_language:
        return 0
    if lang in cfg.fallback_languages:
        return 1 + cfg.fallback_languages.index(lang)
    if lang is None or lang == "":
        return 98
    return 99


def _uri_tail(uri: str) -> str:
    return uri.rsplit("/", 1)[-1].rsplit("#", 1)[-1]


def pivot_concepts(triples_ds, cfg: EngineConfig | None = None,
                   *, num_buckets: int = 32):
    """triples Dataset -> concepts wide Dataset (schema CONCEPTS plus
    ``is_scheme``). The one wide shuffle is a groupby on
    ``crc32(subj) % num_buckets``: all of one subject's rows land in
    one cogroup (like a groupby(subj)) but the per-group Python cost is
    paid num_buckets times, not once per concept."""
    cfg = cfg or EngineConfig()

    def per_subject(subj: str, rows: list[tuple]) -> pa.Table:
        rows = sorted(rows, key=lambda r: (r[0], r[2] or "", r[1]))
        is_concept = is_scheme = is_top = False
        pref_cands: list[tuple[int, str, str]] = []  # (lang_rank, label, lang)
        alt, hidden, same_as, related, defs, scopes, notations = \
            [], [], [], [], [], [], []
        rdfs_labels = []
        schemes = []
        top_schemes = []  # topConceptOf wins over inScheme (ref 685-714)
        for pred, obj, lang in rows:
            if pred == RDF_TYPE:
                is_concept |= obj == SKOS_CONCEPT
                is_scheme |= obj == SKOS_CONCEPT_SCHEME
            elif pred == SKOS_PREF_LABEL:
                pref_cands.append((_lang_rank(lang, cfg), obj, lang or ""))
            elif pred == SKOS_ALT_LABEL:
                alt.append(obj)
            elif pred == SKOS_HIDDEN_LABEL:
                hidden.append(obj)
            elif pred == RDFS_LABEL:
                rdfs_labels.append(obj)
            elif pred == SKOS_DEFINITION:
                defs.append(obj)
            elif pred == SKOS_SCOPE_NOTE:
                scopes.append(obj)
            elif pred == SKOS_NOTATION:
                notations.append(obj)
            elif pred == OWL_SAME_AS:
                same_as.append(obj)
            elif pred == SKOS_RELATED:
                related.append(obj)
            elif pred == SKOS_IN_SCHEME:
                schemes.append(obj)
            elif pred == SKOS_TOP_CONCEPT_OF:
                is_top = True
                top_schemes.append(obj)
        # label fallback chain; deterministic min at every step
        if pref_cands:
            pref = min(pref_cands)[1]
        elif alt:
            pref = min(alt)
        elif rdfs_labels:
            pref = min(rdfs_labels)
        else:
            pref = _uri_tail(subj)
        # definition falls back to scopeNote (ref 633-636); first ->
        # deterministic min
        definition = min(defs) if defs else (min(scopes) if scopes else "")
        return pa.table({
            "uri": pa.array([subj], pa.string()),
            "pref_label": pa.array([pref], pa.string()),
            "alt_labels": pa.array([sorted(set(alt))], pa.list_(pa.string())),
            "hidden_labels": pa.array([sorted(set(hidden))],
                                      pa.list_(pa.string())),
            "definition": pa.array([definition], pa.string()),
            "notation": pa.array([min(notations) if notations else ""],
                                 pa.string()),
            "same_as": pa.array([sorted(set(same_as))], pa.list_(pa.string())),
            "related": pa.array([sorted(set(related))], pa.list_(pa.string())),
            "scheme": pa.array(
                [min(top_schemes) if top_schemes
                 else (min(schemes) if schemes else "")], pa.string()),
            "is_top": pa.array([is_top], pa.bool_()),
            "is_concept": pa.array([is_concept], pa.bool_()),
            "is_scheme": pa.array([is_scheme], pa.bool_()),
        })

    import zlib

    from ..config import use_hash_shuffle
    use_hash_shuffle()

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = pa.array([zlib.crc32(s.encode()) % num_buckets
                      for s in batch["subj"].to_pylist()], pa.int32())
        return batch.append_column("_bucket", b)

    def per_bucket(group: pa.Table) -> pa.Table:
        by_subj: dict[str, list[tuple]] = {}
        for s, p, o, lang in zip(group["subj"].to_pylist(),
                                 group["pred"].to_pylist(),
                                 group["obj"].to_pylist(),
                                 group["lang"].to_pylist()):
            by_subj.setdefault(s, []).append((p, o, lang))
        tables = [per_subject(s, rows)
                  for s, rows in sorted(by_subj.items())]
        return pa.concat_tables(tables)

    bucketed = triples_ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("_bucket").map_groups(
        per_bucket, batch_format="pyarrow")
