"""Validator suite against the pathology-laden generated vocabulary
(FIXTURES.md §2: one instance of each defect)."""

from __future__ import annotations

import pytest

from skosconverter_ray import vocab
from skosconverter_ray.stages.validate import gate, validate

NS = "http://example.org/vocab/"


@pytest.fixture(scope="module")
def issues():
    import ray.data as rd

    voc = vocab.generate_vocab(
        vocab.VocabSpec(n_schemes=2, n_concepts=30, seed=7, pathologies=True))
    ds = validate(rd.from_arrow(voc.triples))
    df = ds.to_pandas()
    return df


def _subjects(df, check):
    return set(df.loc[df["check"] == check, "subject"])


def test_onesided_topconcepts(issues):
    subs = _subjects(issues, "topconcept_onesided")
    assert NS + "path/onesided_htc" in subs
    assert NS + "path/onesided_tco" in subs


def test_multiple_pref_labels(issues):
    assert NS + "path/dup_pref" in _subjects(issues, "multiple_pref_labels")


def test_duplicate_label(issues):
    # min(subj) of the two sharers is reported
    assert NS + "path/shared_label_1" in _subjects(issues, "duplicate_label")


def test_polyhierarchy(issues):
    assert NS + "path/poly_child" in _subjects(issues, "polyhierarchy")


def test_cycles(issues):
    subs = _subjects(issues, "cycle")
    assert NS + "path/self_broader" in subs
    assert subs & {NS + f"path/cycle_{i}" for i in range(3)}


def test_orphans(issues):
    assert NS + "path/orphan_in_scheme" in _subjects(issues, "orphan_in_scheme")
    assert NS + "path/orphan_no_scheme" in _subjects(issues, "orphan_no_scheme")


def test_missing_label(issues):
    assert NS + "path/no_label" in _subjects(issues, "missing_label")


def test_depth_exceeded(issues):
    assert NS + "path/deep_0" in _subjects(issues, "depth_exceeded")


def test_gate(issues):
    import ray.data as rd

    voc = vocab.generate_vocab(
        vocab.VocabSpec(n_schemes=1, n_concepts=10, seed=3))
    clean = validate(rd.from_arrow(voc.triples))
    assert gate(clean)
    dirty = vocab.generate_vocab(
        vocab.VocabSpec(n_schemes=1, n_concepts=10, seed=3, pathologies=True))
    bad = validate(rd.from_arrow(dirty.triples))
    assert not gate(bad)
    assert gate(bad, force=True)


def test_golden_rows_pathology_fixture(issues):
    """Pin the exact issue-row set on the pathology fixture: the
    distributed set logic must reproduce the sequential semantics
    row for row (severity, check, subject, detail)."""
    P = NS + "path/"
    S0 = NS + "scheme/0"
    golden = {
        ("error", "cycle", P + "cycle_0", "broader cycle detected"),
        ("error", "cycle", P + "self_broader", "broader cycle detected"),
        ("error", "missing_label", P + "no_label", "concept has no prefLabel"),
        ("error", "multiple_pref_labels", P + "dup_pref",
         "2 prefLabels for lang 'en'"),
        ("warning", "depth_exceeded", P + "deep_0",
         "hierarchy depth 9 exceeds 7"),
        ("warning", "duplicate_label", P + "shared_label_1",
         "label 'Shared Label' used by 2 subjects"),
        ("warning", "orphan_in_scheme", P + "dup_pref",
         f"in scheme {S0} without broader"),
        ("warning", "orphan_in_scheme", P + "orphan_in_scheme",
         f"in scheme {S0} without broader"),
        ("warning", "orphan_in_scheme", P + "shared_label_1",
         f"in scheme {S0} without broader"),
        ("warning", "orphan_in_scheme", P + "shared_label_2",
         f"in scheme {S0} without broader"),
        ("warning", "orphan_no_scheme", P + "no_label",
         "concept not associated with any scheme"),
        ("warning", "orphan_no_scheme", P + "orphan_no_scheme",
         "concept not associated with any scheme"),
        ("warning", "polyhierarchy", P + "poly_child", "2 broader concepts"),
        ("warning", "topconcept_onesided", P + "onesided_htc",
         f"hasTopConcept from {S0} without topConceptOf"),
        ("warning", "topconcept_onesided", P + "onesided_tco",
         f"topConceptOf {S0} without hasTopConcept"),
    }
    got = set(map(tuple,
                  issues[["severity", "check", "subject", "detail"]].values))
    assert got == golden


def test_missing_label_accepts_rdfs_label(ray_session):
    """ref 145-148: rdfs:label satisfies the label requirement — a
    concept labeled only via rdfs:label must NOT be flagged."""
    import pyarrow as pa
    import ray.data as rd

    from skosconverter_ray import schemas
    from skosconverter_ray.config import RDF_TYPE, RDFS_LABEL, SKOS_CONCEPT

    A, B = NS + "rdfs_labeled", NS + "unlabeled"
    rows = [
        (A, RDF_TYPE, SKOS_CONCEPT, False, None),
        (A, RDFS_LABEL, "via rdfs", True, "en"),
        (B, RDF_TYPE, SKOS_CONCEPT, False, None),
    ]
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
            "obj_is_literal": pa.array([r[3] for r in rows], pa.bool_()),
            "lang": pa.array([r[4] for r in rows], pa.string()),
            "source_doc": pa.array([None] * len(rows), pa.string()),
        },
        schema=schemas.TRIPLES,
    )
    df = validate(rd.from_arrow(t)).to_pandas()
    flagged = set(df.loc[df["check"] == "missing_label", "subject"])
    assert flagged == {B}
