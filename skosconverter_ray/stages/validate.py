"""Validator suite (SURVEY.md A1-A4, J5, O3, M12; reference
``SKOSValidator`` skos_converter.py:104-411).

Every check emits rows into one ``issues`` table
``(severity, check, subject, detail)`` instead of printed strings —
the distributed replacement for the reference's issue/warning lists
(101-102). The conversion gate (ref 1788-1798) becomes: count rows
with severity == "error" and branch.

Check inventory (reference file:line):
- duplicate_uri        concept typed as both Concept and Scheme (129-139)
- missing_label        typed concept without any prefLabel (141-155)
- cycle                broader cycles incl. self-reference (157-187, 240-253)
- multiple_pref_labels >1 prefLabel per (concept, lang) (189-207)
- topconcept_onesided  hasTopConcept without topConceptOf and vice versa (209-238)
- orphan_in_scheme     inScheme but no broader and not top (255-270)
- duplicate_label      same prefLabel on several concepts (272-291)
- polyhierarchy        child with >1 broader (293-309) [warning]
- orphan_no_scheme     concept with no scheme at all (311-338)
- depth_exceeded       hierarchy deeper than 7 levels (340-374) [warning]

Shuffle keys: prefLabel checks on (subj,lang)/label; pair checks on
edge endpoints. Cycle/depth run on the dimension-sized edge skeleton
(driver-side Tarjan-style walk — same scale argument as
stages/hierarchy.py: the vocabulary graph is not the corpus).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import (
    RDF_TYPE,
    SKOS_BROADER,
    SKOS_CONCEPT,
    SKOS_CONCEPT_SCHEME,
    SKOS_HAS_TOP_CONCEPT,
    SKOS_IN_SCHEME,
    SKOS_NARROWER,
    SKOS_PREF_LABEL,
    SKOS_TOP_CONCEPT_OF,
)

ISSUES_SCHEMA = pa.schema([
    ("severity", pa.string()),   # "error" | "warning"
    ("check", pa.string()),
    ("subject", pa.string()),
    ("detail", pa.string()),
])


def _issues_table(rows: list[tuple]) -> pa.Table:
    return pa.table(
        {
            "severity": pa.array([r[0] for r in rows], pa.string()),
            "check": pa.array([r[1] for r in rows], pa.string()),
            "subject": pa.array([r[2] for r in rows], pa.string()),
            "detail": pa.array([r[3] for r in rows], pa.string()),
        },
        schema=ISSUES_SCHEMA,
    )


def _filter_pred(ds, pred: str):
    return ds.map_batches(
        lambda b, _p=pred: b.filter(pc.equal(b["pred"], _p)),
        batch_format="pyarrow")


def validate(triples_ds):
    """triples Dataset -> issues Dataset. Groupby-shaped checks run as
    Ray aggregations; graph-shaped checks (cycles, depth) run on the
    collected dimension-sized edge list."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    issue_parts: list[pa.Table] = []

    # ---- typed sets (small: one row per vocab node after groupby)
    types = _filter_pred(triples_ds, RDF_TYPE)
    concept_set: set[str] = set()
    scheme_set: set[str] = set()
    for b in types.iter_batches(batch_format="pyarrow", batch_size=65536):
        for s, o in zip(b["subj"].to_pylist(), b["obj"].to_pylist()):
            if o == SKOS_CONCEPT:
                concept_set.add(s)
            elif o == SKOS_CONCEPT_SCHEME:
                scheme_set.add(s)

    # duplicate_uri (ref 129-139): same URI typed Concept AND Scheme
    issue_parts.append(_issues_table([
        ("error", "duplicate_uri", u, "typed as both Concept and ConceptScheme")
        for u in sorted(concept_set & scheme_set)
    ]))

    # ---- prefLabel checks (distributed groupbys)
    labels = _filter_pred(triples_ds, SKOS_PREF_LABEL)

    def label_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "subj": b["subj"],
            "lang": b["lang"].combine_chunks().fill_null("")
            if isinstance(b["lang"], pa.ChunkedArray) else
            pc.fill_null(b["lang"], ""),
            "label": b["obj"],
        })

    lab = labels.map_batches(label_rows, batch_format="pyarrow")

    # multiple_pref_labels per (subj, lang) (ref 189-207)
    multi = lab.groupby(["subj", "lang"]).aggregate(
        Count(alias_name="n")).filter(lambda r: r["n"] > 1)
    rows = [("error", "multiple_pref_labels", r["subj"],
             f"{r['n']} prefLabels for lang '{r['lang']}'")
            for r in multi.take_all()]
    issue_parts.append(_issues_table(rows))

    # duplicate_label across concepts (ref 272-291)
    dup = lab.groupby("label").aggregate(
        Count(alias_name="n"), Min("subj", alias_name="subj")
    ).filter(lambda r: r["n"] > 1)
    rows = [("warning", "duplicate_label", r["subj"],
             f"label '{r['label']}' used by {r['n']} subjects")
            for r in dup.take_all()]
    issue_parts.append(_issues_table(rows))

    # missing_label (ref 141-155): typed concept with no prefLabel
    labeled = set()
    for b in lab.iter_batches(batch_format="pyarrow", batch_size=65536):
        labeled.update(b["subj"].to_pylist())
    issue_parts.append(_issues_table([
        ("error", "missing_label", u, "concept has no prefLabel")
        for u in sorted(concept_set - labeled)
    ]))

    # ---- hierarchical edge checks
    broader: list[tuple[str, str]] = []   # (child, parent)
    for b in _filter_pred(triples_ds, SKOS_BROADER).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        broader.extend(zip(b["subj"].to_pylist(), b["obj"].to_pylist()))
    narrower: list[tuple[str, str]] = []  # (parent, child)
    for b in _filter_pred(triples_ds, SKOS_NARROWER).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        narrower.extend(zip(b["subj"].to_pylist(), b["obj"].to_pylist()))

    # polyhierarchy (ref 293-309): >1 broader per child
    from collections import Counter, defaultdict

    n_broader = Counter(c for c, _ in broader)
    issue_parts.append(_issues_table([
        ("warning", "polyhierarchy", c, f"{n} broader concepts")
        for c, n in sorted(n_broader.items()) if n > 1
    ]))

    # topconcept_onesided (ref 209-238): full outer diff of pair sets
    htc = set()
    for b in _filter_pred(triples_ds, SKOS_HAS_TOP_CONCEPT).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        htc.update(zip(b["subj"].to_pylist(), b["obj"].to_pylist()))
    tco = set()
    for b in _filter_pred(triples_ds, SKOS_TOP_CONCEPT_OF).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        tco.update((o, s) for s, o in
                   zip(b["subj"].to_pylist(), b["obj"].to_pylist()))
    rows = []
    for scheme, c in sorted(htc - tco):
        rows.append(("warning", "topconcept_onesided", c,
                     f"hasTopConcept from {scheme} without topConceptOf"))
    for scheme, c in sorted(tco - htc):
        rows.append(("warning", "topconcept_onesided", c,
                     f"topConceptOf {scheme} without hasTopConcept"))
    issue_parts.append(_issues_table(rows))

    # orphans (ref 255-270, 311-338)
    in_scheme: dict[str, str] = {}
    for b in _filter_pred(triples_ds, SKOS_IN_SCHEME).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        for s, o in zip(b["subj"].to_pylist(), b["obj"].to_pylist()):
            in_scheme.setdefault(s, o)
    has_broader = {c for c, _ in broader} | {c for _, c in narrower}
    tops = {c for _, c in htc} | {c for _, c in tco}
    rows = []
    for u in sorted(concept_set):
        if u in in_scheme and u not in has_broader and u not in tops:
            rows.append(("warning", "orphan_in_scheme", u,
                         f"in scheme {in_scheme[u]} without broader"))
        if u not in in_scheme and u not in tops and u not in has_broader:
            rows.append(("warning", "orphan_no_scheme", u,
                         "concept not associated with any scheme"))
    issue_parts.append(_issues_table(rows))

    # ---- cycles incl. self-reference (ref 157-187, 240-253)
    adj: dict[str, list[str]] = defaultdict(list)
    for c, p in broader:
        adj[c].append(p)
    for p, c in narrower:
        adj[c].append(p)
    rows = []
    color: dict[str, int] = {}  # 0=visiting 1=done

    def on_cycle(u):
        rows.append(("error", "cycle", u, "broader cycle detected"))

    for start in sorted(adj):
        if start in color:
            continue
        stack = [(start, iter(sorted(set(adj.get(start, [])))))]
        color[start] = 0
        while stack:
            node, it = stack[-1]
            found = False
            for nb in it:
                if nb == node:
                    on_cycle(node)  # self-reference (ref 240-253)
                    continue
                c = color.get(nb)
                if c == 0:
                    on_cycle(nb)
                elif c is None:
                    color[nb] = 0
                    stack.append((nb, iter(sorted(set(adj.get(nb, []))))))
                    found = True
                    break
            if not found:
                color[node] = 1
                stack.pop()
    issue_parts.append(_issues_table(rows))

    # ---- depth_exceeded (ref 340-374): BFS from tops, warn > 7
    child_of: dict[str, list[str]] = defaultdict(list)
    for c, p in broader:
        child_of[p].append(c)
    for p, c in narrower:
        child_of[p].append(c)
    rows = []
    for root in sorted(tops):
        depth, frontier, seen = 1, [root], {root}
        while frontier and depth <= 40:
            nxt = [c for f in frontier for c in child_of.get(f, [])
                   if c not in seen]
            if not nxt:
                break
            seen.update(nxt)
            depth += 1
            frontier = nxt
        if depth > 7:
            rows.append(("warning", "depth_exceeded", root,
                         f"hierarchy depth {depth} exceeds 7"))
    issue_parts.append(_issues_table(rows))

    merged = pa.concat_tables([t for t in issue_parts])
    return rd.from_arrow(merged)


def gate(issues_ds, *, force: bool = False) -> bool:
    """Conversion gate (ref 1788-1798): False (abort) when errors exist
    and not forced."""
    n_err = issues_ds.filter(lambda r: r["severity"] == "error").count()
    return force or n_err == 0
