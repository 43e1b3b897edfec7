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
