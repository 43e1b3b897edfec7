"""Decontamination: both physical plans against a brute-force oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from skosconverter_ray.stages.decontam import decontaminate

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu"]


def _mk_docs(rng, n_docs, n_words):
    docs = []
    for i in range(n_docs):
        k = int(rng.integers(0, n_words + 1))
        docs.append((i, " ".join(rng.choice(WORDS, size=k))))
    return docs


def _brute(corpus, bench, n):
    def grams(t):
        w = t.split()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    bg = set()
    for _, t in bench:
        bg |= grams(t)
    out = {}
    for i, t in corpus:
        g = grams(t)
        if g:
            out[i] = (len(g & bg), len(g))
    return out


@pytest.mark.parametrize("limit", [4_000_000, 0])
def test_decontaminate_both_plans(ray_session, limit):
    rng = np.random.default_rng(7)
    corpus = _mk_docs(rng, 60, 12)
    bench = [(1000 + i, t) for i, t in _mk_docs(rng, 8, 12)]
    want = _brute(corpus, bench, n=3)

    c_ds = ray.data.from_arrow(pa.table(
        {"doc_id": [i for i, _ in corpus],
         "text": [t for _, t in corpus]})).repartition(5)
    b_ds = ray.data.from_arrow(pa.table(
        {"doc_id": [i for i, _ in bench],
         "text": [t for _, t in bench]})).repartition(2)

    out = decontaminate(c_ds, b_ds, n=3, broadcast_limit=limit,
                        num_buckets=4)
    got = {r["doc_id"]: (r["n_hits"], r["n_grams"])
           for r in out.take_all()}
    assert got == want


@pytest.mark.parametrize("limit", [4_000_000, 0])
def test_decontaminate_string_ids_both_plans(ray_session, limit):
    """String doc ids through BOTH plans — the distributed plan derives
    the id field type from the corpus schema instead of pinning int64."""
    rng = np.random.default_rng(11)
    corpus = [(f"doc-{i:03d}", t) for i, t in _mk_docs(rng, 40, 12)]
    bench = [(f"ev-{i}", t) for i, t in _mk_docs(rng, 6, 12)]
    want = _brute(corpus, bench, n=3)

    c_ds = ray.data.from_arrow(pa.table(
        {"doc_id": [i for i, _ in corpus],
         "text": [t for _, t in corpus]})).repartition(4)
    b_ds = ray.data.from_arrow(pa.table(
        {"doc_id": [i for i, _ in bench],
         "text": [t for _, t in bench]})).repartition(2)

    out = decontaminate(c_ds, b_ds, n=3, broadcast_limit=limit,
                        num_buckets=4, id_type=pa.string())
    got = {r["doc_id"]: (r["n_hits"], r["n_grams"])
           for r in out.take_all()}
    assert got == want


def test_decontaminate_short_and_empty_docs(ray_session):
    c_ds = ray.data.from_items([
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "one two"},
        {"doc_id": 3, "text": "alpha beta gamma delta"},
    ]).map_batches(lambda b: b, batch_format="pyarrow")
    b_ds = ray.data.from_items(
        [{"doc_id": 9, "text": "alpha beta gamma zeta"}]
    ).map_batches(lambda b: b, batch_format="pyarrow")
    out = {r["doc_id"]: (r["n_hits"], r["n_grams"])
           for r in decontaminate(c_ds, b_ds, n=3).take_all()}
    # docs 1-2 have no 3-gram and must be absent; doc 3 shares exactly
    # "alpha beta gamma" out of its two distinct 3-grams
    assert out == {3: (1, 2)}
