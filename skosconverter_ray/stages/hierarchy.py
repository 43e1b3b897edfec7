"""Hierarchy materialization: schemes, display parents, orphans,
containers, and the globally-ordered ``tree_rows`` render IR
(SURVEY.md J1-J3, O1, U1; reference ``build_hierarchy``
skos_converter.py:664-762 and the recursive row builders 764-888).

Scale design: the *hierarchy skeleton* (uri, label, parent, scheme,
flags — one short row per vocabulary concept) is dimension-sized even
at the 10^12-document design point; only the corpus is huge. So the
skeleton is aggregated with Ray (pivot shuffle on subj, edge groupby on
child), streamed to the driver, ordered with an exact
reference-faithful DFS, and the resulting ``uri -> (seq, level, ...)``
map is broadcast back for a single ``map_batches`` join. No
corpus-scale table ever enters this module. (An iterative
level-propagation variant would replace the driver DFS if vocabularies
outgrew driver memory; see SURVEY.md §7.3.)

Determinism decisions (SURVEY.md D5): display parent = min(parent URI);
sibling order = (label, uri); schemes ordered by (label, uri);
containers render after regular subtrees, [UNASSIGNED CONCEPTS] last
(reference emission order 825-879), unassigned concepts render flat
(ref 866-879).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import SKOS_BROADER, SKOS_NARROWER, EngineConfig
from .. import schemas
from .concepts import pivot_concepts

OTHER_DEF = "Concepts in this scheme without broader relations"
UNASSIGNED_DEF = "Concepts not associated with any concept scheme"
UNASSIGNED_TITLE = "[UNASSIGNED CONCEPTS]"


def display_parents(triples_ds):
    """child -> deterministic display parent (min parent URI), from the
    union of broader edges and inverted narrower edges (ref 716-733)."""
    from ray.data.aggregate import Min

    def edges(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["pred"], SKOS_BROADER))
        n = batch.filter(pc.equal(batch["pred"], SKOS_NARROWER))
        child = pa.concat_arrays(
            [b["subj"].combine_chunks(), n["obj"].combine_chunks()])
        parent = pa.concat_arrays(
            [b["obj"].combine_chunks(), n["subj"].combine_chunks()])
        return pa.table({"child": child, "parent": parent})

    e = triples_ds.map_batches(edges, batch_format="pyarrow")
    return e.groupby("child").aggregate(Min("parent", alias_name="parent"))


def _collect_skeleton(concepts_ds, parents_ds):
    """Stream the dimension-sized skeleton to the driver."""
    skel = {}
    for b in concepts_ds.iter_batches(batch_format="pyarrow",
                                      batch_size=65536):
        for i in range(b.num_rows):
            skel[b["uri"][i].as_py()] = {
                "label": b["pref_label"][i].as_py(),
                "scheme": b["scheme"][i].as_py(),
                "is_top": b["is_top"][i].as_py(),
                "is_concept": b["is_concept"][i].as_py(),
                "is_scheme": b["is_scheme"][i].as_py(),
                "parent": None,
            }
    for b in parents_ds.iter_batches(batch_format="pyarrow",
                                     batch_size=65536):
        for child, parent in zip(b["child"].to_pylist(),
                                 b["parent"].to_pylist()):
            if child in skel:
                skel[child]["parent"] = parent
    return skel


def _order_skeleton(skel: dict, max_depth: int = 32):
    """Reference-faithful DFS -> uri/synthetic-row placement list.

    Returns ``(placements, synth_rows)``: placements maps uri ->
    (seq, level, parent_title, scheme_label); synth_rows are the
    scheme / container / unassigned header rows.
    """
    children: dict[str, list[str]] = {}
    for uri, rec in skel.items():
        if rec["is_concept"] and rec["parent"]:
            children.setdefault(rec["parent"], []).append(uri)

    def by_label(uris):
        return sorted(uris, key=lambda u: (skel[u]["label"] or "", u))

    schemes = by_label([u for u, r in skel.items() if r["is_scheme"]])
    visited: set[str] = set()
    placements: dict[str, tuple] = {}
    synth_rows: list[dict] = []
    seq = [0]

    def nxt() -> str:
        seq[0] += 1
        return f"{seq[0]:010d}"

    def place(uri, level, parent_title, scheme_label):
        visited.add(uri)
        placements[uri] = (nxt(), level, parent_title, scheme_label)

    def dfs(uri, level, parent_title, scheme_label, depth):
        if uri in visited or depth > max_depth:
            return
        place(uri, level, parent_title, scheme_label)
        for ch in by_label(children.get(uri, [])):
            if ch not in visited:
                dfs(ch, level + 1, skel[uri]["label"], scheme_label, depth + 1)

    for s_uri in schemes:
        s_label = skel[s_uri]["label"]
        s_title = f"[SCHEME] {s_label}"
        synth_rows.append({
            "sort_key": nxt(), "title": s_title, "parent": "",
            "scheme": s_label, "definition": "", "alt_labels": "",
            "notation": "", "uri": s_uri, "level": 0,
        })
        tops = by_label([
            u for u, r in skel.items()
            if r["is_concept"] and r["is_top"] and r["scheme"] == s_uri
            and u not in visited
        ])
        for t in tops:
            dfs(t, 1, s_title, s_label, 1)
        orphans = by_label([
            u for u, r in skel.items()
            if r["is_concept"] and r["scheme"] == s_uri
            and u not in visited and not r["parent"]
        ])
        if orphans:
            c_title = f"[Other Concepts in {s_label}]"
            synth_rows.append({
                "sort_key": nxt(), "title": c_title, "parent": s_title,
                "scheme": s_label, "definition": OTHER_DEF,
                "alt_labels": "", "notation": "", "uri": "", "level": 1,
            })
            for o in orphans:
                dfs(o, 2, c_title, s_label, 1)

    unassigned = by_label([
        u for u, r in skel.items() if r["is_concept"] and u not in visited
    ])
    if unassigned:
        synth_rows.append({
            "sort_key": nxt(), "title": UNASSIGNED_TITLE, "parent": "",
            "scheme": "", "definition": UNASSIGNED_DEF, "alt_labels": "",
            "notation": "", "uri": "", "level": 0,
        })
        for u in unassigned:
            # flat, like the reference (866-879): cycles and detached
            # subtrees land here without recursion
            place(u, 1, UNASSIGNED_TITLE, "")
    return placements, synth_rows


def build_tree_rows(triples_ds, cfg: EngineConfig | None = None):
    """triples -> globally ordered tree_rows Dataset (schema TREE_ROWS).

    Pipeline: pivot (shuffle on subj) + display-parent groupby (shuffle
    on child) -> driver DFS over the dimension-sized skeleton ->
    broadcast placement map -> one map_batches join -> union with the
    synthetic header rows -> global sort on sort_key.
    """
    import ray
    import ray.data as rd

    cfg = cfg or EngineConfig()
    concepts = pivot_concepts(triples_ds, cfg).materialize()
    parents = display_parents(triples_ds)
    skel = _collect_skeleton(concepts, parents)
    placements, synth_rows = _order_skeleton(skel, cfg.max_hierarchy_depth)
    # parent display titles need label lookups; build a title map
    place_ref = ray.put(placements)

    def join(batch: pa.Table) -> pa.Table:
        pl = ray.get(place_ref)
        rows = {k: [] for k in ("sort_key", "title", "parent", "scheme",
                                "definition", "alt_labels", "notation",
                                "uri", "level", "same_as", "related")}
        for i in range(batch.num_rows):
            uri = batch["uri"][i].as_py()
            p = pl.get(uri)
            if p is None:
                continue
            seq, level, parent_title, scheme_label = p
            rows["sort_key"].append(seq)
            rows["title"].append(batch["pref_label"][i].as_py())
            rows["parent"].append(parent_title)
            rows["scheme"].append(scheme_label)
            rows["definition"].append(batch["definition"][i].as_py())
            rows["alt_labels"].append(
                ", ".join(batch["alt_labels"][i].as_py() or []))
            rows["notation"].append(batch["notation"][i].as_py())
            rows["uri"].append(uri)
            rows["level"].append(level)
            rows["same_as"].append(
                ", ".join(batch["same_as"][i].as_py() or []))
            rows["related"].append(
                ", ".join(batch["related"][i].as_py() or []))
        return pa.table(
            {k: pa.array(v, schemas.TREE_ROWS.field(k).type)
             for k, v in rows.items()},
            schema=schemas.TREE_ROWS,
        )

    concept_rows = concepts.map_batches(join, batch_format="pyarrow")
    synth = rd.from_arrow(pa.table(
        {f.name: pa.array([r.get(f.name, "") for r in synth_rows], f.type)
         for f in schemas.TREE_ROWS},
        schema=schemas.TREE_ROWS,
    )) if synth_rows else None
    out = concept_rows.union(synth) if synth is not None else concept_rows
    return out.sort("sort_key")
