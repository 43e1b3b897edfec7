"""Interval-join index: overlap fan-out, [lo, hi) edges, misses."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from skosconverter_ray.stages.rangejoin import IntervalIndex, interval_join


def _pairs(idx, values):
    r, i = idx.probe(np.array(values, np.float64))
    return sorted(zip(r.tolist(), i.tolist()))


def test_probe_overlaps_and_edges():
    # 0:[0,10) 1:[5,20) 2:[10,30)
    idx = IntervalIndex(np.array([0.0, 5.0, 10.0]),
                        np.array([10.0, 20.0, 30.0]))
    # v=7 -> 0,1; v=10 -> 1,2 (lo inclusive, hi exclusive); v=0 -> 0
    assert _pairs(idx, [7.0]) == [(0, 0), (0, 1)]
    assert _pairs(idx, [10.0]) == [(0, 1), (0, 2)]
    assert _pairs(idx, [0.0]) == [(0, 0)]
    # misses: below, at hi-max, above
    assert _pairs(idx, [-1.0]) == []
    assert _pairs(idx, [30.0]) == []
    assert _pairs(idx, [99.0]) == []


def test_probe_brute_force_random():
    rng = np.random.RandomState(7)
    lo = rng.uniform(0, 80, 25)
    hi = lo + rng.uniform(1, 40, 25)
    idx = IntervalIndex(lo, hi)
    vals = rng.uniform(-10, 140, 400)
    got = set(zip(*(a.tolist() for a in idx.probe(vals))))
    want = {(r, i) for r, v in enumerate(vals)
            for i in range(25) if lo[i] <= v < hi[i]}
    assert got == want


def test_interval_join_dataset(ray_session):
    bands = pa.table({"band": ["a", "b"],
                      "lo": pa.array([0.0, 5.0], pa.float64()),
                      "hi": pa.array([10.0, 15.0], pa.float64())})
    ds = rd.from_items([{"x": 1.0}, {"x": 7.0}, {"x": 12.0},
                        {"x": 99.0}])
    rows = sorted((r["x"], r["band"]) for r in
                  interval_join(ds, bands, on="x").take_all())
    assert rows == [(1.0, "a"), (7.0, "a"), (7.0, "b"), (12.0, "b")]


def test_overlap_join(ray_session):
    camp = pa.table({"name": ["a", "b"],
                     "lo": pa.array([10.0, 15.0], pa.float64()),
                     "hi": pa.array([20.0, 30.0], pa.float64())})
    from skosconverter_ray.stages.rangejoin import overlap_join

    rows = [
        {"id": 1, "s": 5.0, "e": 9.0},     # before both
        {"id": 2, "s": 5.0, "e": 10.0},    # touches a.lo (e >= lo)
        {"id": 3, "s": 12.0, "e": 16.0},   # overlaps a and b
        {"id": 4, "s": 19.9, "e": 40.0},   # overlaps a (s < 20) and b
        {"id": 5, "s": 20.0, "e": 22.0},   # b only (a.hi exclusive)
        {"id": 6, "s": 30.0, "e": 31.0},   # after both (hi exclusive)
    ]
    got = sorted((r["id"], r["name"]) for r in
                 overlap_join(rd.from_items(rows), camp, start_col="s",
                              end_col="e").take_all())
    assert got == [(2, "a"), (3, "a"), (3, "b"), (4, "a"), (4, "b"),
                   (5, "b")]
