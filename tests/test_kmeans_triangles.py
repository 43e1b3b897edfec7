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
