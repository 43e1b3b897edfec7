"""JSON-LD subset reader (SURVEY.md S2; rdflib unavailable, §4.3).

Covers the expanded/compacted shapes SKOS vocabularies ship in
(reference loads via rdflib ``format='json-ld'``,
skos_converter.py:566-582): a top-level node object, a list of nodes,
or ``{"@context": ..., "@graph": [...]}``. Supported term forms:

- ``@context``: prefix -> IRI strings and term definitions
  ``{"@id": ..., "@type": "@id"|"@language": ...}`` (nested maps
  ignored beyond @id)
- node objects: ``@id``, ``@type`` (string or list), property keys
  (absolute IRI, prefixed name, or context term)
- values: plain strings, ``{"@id": ...}`` refs, ``{"@value": ...,
  "@language": ...}`` literals, lists of any of these, nested node
  objects (recursed; must carry @id)

Per-document parse, file-parallel — same shape as the Turtle reader.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .. import schemas
from .turtle import triples_to_table

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _build_context(ctx) -> dict:
    """context -> {term: (iri, is_ref)}; prefix entries end with /#:."""
    out: dict[str, tuple[str, bool]] = {}
    if isinstance(ctx, list):
        for c in ctx:
            out.update(_build_context(c))
        return out
    if not isinstance(ctx, dict):
        return out
    for term, spec in ctx.items():
        if term.startswith("@"):
            continue
        if isinstance(spec, str):
            out[term] = (spec, False)
        elif isinstance(spec, dict) and "@id" in spec:
            out[term] = (spec["@id"], spec.get("@type") == "@id")
    return out


def _expand_key(key: str, ctx: dict) -> str | None:
    if key.startswith("@"):
        return None
    if key in ctx:
        return ctx[key][0]
    if ":" in key:
        pfx, local = key.split(":", 1)
        if pfx in ctx and not local.startswith("//"):
            return ctx[pfx][0] + local
        return key  # absolute IRI (http://...) or unknown curie as-is
    return None  # bare term with no context entry: skip


def _expand_ref(val: str, ctx: dict) -> str:
    if ":" in val:
        pfx, local = val.split(":", 1)
        if pfx in ctx and not local.startswith("//"):
            return ctx[pfx][0] + local
    return val


def _walk_node(node: dict, ctx: dict, triples: list, strict: bool) -> str | None:
    subj = node.get("@id")
    if subj is None:
        if strict:
            raise ValueError("node object without @id")
        return None
    subj = _expand_ref(subj, ctx)
    for key, val in node.items():
        if key == "@type":
            for t in (val if isinstance(val, list) else [val]):
                triples.append((subj, _RDF_TYPE, _expand_ref(t, ctx),
                                False, None))
            continue
        pred = _expand_key(key, ctx)
        if pred is None:
            continue
        is_ref_term = key in ctx and ctx[key][1]
        for v in (val if isinstance(val, list) else [val]):
            if isinstance(v, dict):
                if "@value" in v:
                    triples.append((subj, pred, str(v["@value"]), True,
                                    v.get("@language")))
                elif "@id" in v and len(v) == 1:
                    triples.append((subj, pred, _expand_ref(v["@id"], ctx),
                                    False, None))
                else:  # nested node object: edge + recurse
                    child = _walk_node(v, ctx, triples, strict)
                    if child is not None:
                        triples.append((subj, pred, child, False, None))
            elif isinstance(v, str):
                if is_ref_term:
                    triples.append((subj, pred, _expand_ref(v, ctx),
                                    False, None))
                else:
                    triples.append((subj, pred, v, True, None))
            elif isinstance(v, (int, float, bool)):
                triples.append((subj, pred, json.dumps(v), True, None))
    return subj


def parse_jsonld_doc(text: str) -> list[tuple]:
    """One JSON-LD document -> [(subj, pred, obj, is_literal, lang)]."""
    data = json.loads(text)
    ctx: dict = {}
    nodes: list
    if isinstance(data, dict):
        ctx = _build_context(data.get("@context"))
        if "@graph" in data:
            nodes = data["@graph"]
        else:
            nodes = [data]
    elif isinstance(data, list):
        nodes = data
    else:
        raise ValueError("top-level JSON-LD must be object or array")
    triples: list[tuple] = []
    for node in nodes:
        if isinstance(node, dict):
            _walk_node(node, ctx, triples, strict=False)
    return triples


def parse_jsonld_dataset(docs_ds, *, text_col: str = "text",
                         id_col: str = "doc_id"):
    """(doc_id, text) Dataset of JSON-LD docs -> triples Dataset
    (per-file continue-on-error, like the Turtle reader)."""

    def parse(batch: pa.Table) -> pa.Table:
        import logging

        tables = []
        for doc_id, text in zip(batch[id_col].to_pylist(),
                                batch[text_col].to_pylist()):
            try:
                tables.append(
                    triples_to_table(parse_jsonld_doc(text or ""), doc_id))
            except (ValueError, json.JSONDecodeError) as e:
                logging.getLogger(__name__).warning(
                    "json-ld parse failed for %s: %s", doc_id, e)
        if not tables:
            return schemas.TRIPLES.empty_table()
        return pa.concat_tables(tables)

    return docs_ds.map_batches(parse, batch_format="pyarrow")
