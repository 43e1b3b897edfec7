"""Round-4 operators: distributed k-means and triangle counting,
each pinned to an in-memory sequential oracle."""

import numpy as np
import pyarrow as pa
import ray

from skosconverter_ray.stages.graph import triangle_count
from skosconverter_ray.stages.similarity import kmeans, kmeans_sequential


def test_kmeans_matches_sequential_oracle(ray_session):
    rng = np.random.default_rng(3)
    # 3 well-separated blobs + noise, shuffled ids
    mat = np.concatenate([
        rng.normal(0, 0.3, (80, 6)),
        rng.normal(5, 0.3, (70, 6)),
        rng.normal(-4, 0.3, (50, 6)),
    ])
    ids = rng.permutation(len(mat)).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([row.tolist() for row in mat],
                              pa.list_(pa.float64())),
    })).repartition(7)

    cd, nd, inert_d = kmeans(ds, k=4, n_iter=6)
    cs, ns, inert_s = kmeans_sequential(mat, ids, k=4, n_iter=6)
    assert np.abs(cd - cs).max() < 1e-9
    assert (nd == ns).all()
    assert np.allclose(inert_d, inert_s, rtol=1e-9)
    # Lloyd's invariant: inertia never increases
    assert all(b <= a * (1 + 1e-12) for a, b in zip(inert_d, inert_d[1:]))


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    # k > distinct points: some clusters stay empty and must keep
    # their seed centroid (no NaNs)
    mat = np.array([[0.0, 0.0], [0.0, 0.0], [9.0, 9.0]])
    ids = np.array([2, 0, 1], np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in mat],
                              pa.list_(pa.float64())),
    }))
    cd, nd, _ = kmeans(ds, k=3, n_iter=3)
    cs, ns, _ = kmeans_sequential(mat, ids, k=3, n_iter=3)
    assert np.isfinite(cd).all()
    assert np.abs(cd - cs).max() < 1e-12
    assert (nd == ns).all()


def _brute_triangles(edges):
    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        es.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    # triangle a<b<c is counted exactly once: at edge (a, b) via the
    # common neighbor c > b
    n = sum(1 for a, b in es for c in (adj[a] & adj[b]) if c > b)
    return n, len(es)


def test_triangle_count_matches_brute_force(ray_session):
    rng = np.random.default_rng(11)
    edges = []
    for _ in range(500):
        a, b = rng.integers(0, 60, 2).tolist()
        edges.append((int(a), int(b)))
    # duplicates + self-loops included on purpose (normalized away)
    want_tri, want_edges = _brute_triangles(edges)
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([e[0] for e in edges], pa.int64()),
        "b": pa.array([e[1] for e in edges], pa.int64()),
    })).repartition(6)
    got_tri, got_edges = triangle_count(ds, num_buckets=4)
    assert (got_tri, got_edges) == (want_tri, want_edges)


def test_triangle_count_hub_graph(ray_session):
    # star + one closing rim cycle: hub h connects to 0..19, rim edges
    # i-(i+1): every rim edge closes exactly one triangle with h
    edges = [(100, i) for i in range(20)] + [(i, i + 1) for i in range(19)]
    ds = ray.data.from_items([{"a": a, "b": b} for a, b in edges])
    tri, ne = triangle_count(ds, num_buckets=3)
    assert (tri, ne) == (19, 39)


def _emb_ds(mat, ids, parts=5):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in mat],
                              pa.list_(pa.float64())),
    })).repartition(parts)


def test_semantic_dedup_known_duplicates(ray_session):
    """Hand-built corpus: exact expected survivors. Two blobs; inside
    blob A, vectors 10/11/12 are near-identical (cosine ~1), 13 points
    elsewhere; blob B has one dup pair (20, 21)."""
    from skosconverter_ray.stages.similarity import kmeans, semantic_dedup

    base_a = np.array([1.0, 0.0, 0.0, 0.0])
    base_b = np.array([0.0, 0.0, 1.0, 0.0])
    rows = {
        10: base_a, 11: base_a * 3.0,          # scaled copy: cosine 1
        12: base_a + np.array([0.0, 1e-3, 0, 0]),
        13: np.array([0.6, 0.8, 0.0, 0.0]),    # cosine 0.6 to base_a
        20: base_b, 21: base_b + np.array([0, 0, 0, 1e-3]),
        22: np.array([0.0, 0.0, 0.6, 0.8]),
    }
    ids = np.array(sorted(rows), np.int64)
    mat = np.stack([rows[i] for i in ids])
    ds = _emb_ds(mat, ids, parts=3)
    # hand-chosen centroids: one per blob (kmeans itself is pinned by
    # its own parity tests; this test pins the dedup semantics)
    cent = np.stack([base_a, base_b])
    out = {r["vec_id"]: r["keep"]
           for r in semantic_dedup(ds, centroids=cent, threshold=0.95)
           .take_all()}
    assert out == {10: True, 11: False, 12: False, 13: True,
                   20: True, 21: False, 22: True}


def test_semantic_dedup_parity_random(ray_session):
    """Randomized engine-vs-sequential keep-mask parity with shared
    centroids (the same contract the gate query pins on real data)."""
    from skosconverter_ray.stages.similarity import (
        kmeans, semantic_dedup, semantic_dedup_sequential)

    rng = np.random.default_rng(11)
    mat = np.concatenate([
        rng.normal(0, 1.0, (120, 8)),
        rng.normal(4, 0.5, (90, 8)),
    ])
    # inject duplicates: copies of random rows with tiny jitter
    dup_src = rng.integers(0, len(mat), size=40)
    mat = np.concatenate([mat, mat[dup_src] * 1.001])
    ids = rng.permutation(len(mat)).astype(np.int64)
    ds = _emb_ds(mat, ids, parts=6)
    cent, _, _ = kmeans(ds, k=5, n_iter=4)
    got = {r["vec_id"]: r["keep"]
           for r in semantic_dedup(ds, centroids=cent, threshold=0.9,
                                   num_buckets=3).take_all()}
    keep_seq = semantic_dedup_sequential(mat, ids, cent, threshold=0.9)
    assert len(got) == len(ids)
    assert all(got[int(i)] == bool(k) for i, k in zip(ids, keep_seq))
    # duplicates actually removed: fewer survivors than rows
    assert sum(got.values()) < len(ids)
