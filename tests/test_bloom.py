"""Bloom filter: no false negatives, bounded false positives, exact
semi-join output in verify mode, fan-in build merge."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from skosconverter_ray.stages.bloom import (BloomFilter, build_bloom,
                                            semi_join_bloom)


def test_no_false_negatives_and_fpp_bound():
    rng = np.random.RandomState(11)
    members = pa.array(np.unique(rng.randint(0, 10**9, 6000))[:5000]
                       .astype(np.int64))
    f = BloomFilter(5000, fpp=0.01)
    f.add(members)
    assert f.contains(members).all()
    probe = pa.array((np.arange(50_000) + 2 * 10**9).astype(np.int64))
    fp_rate = f.contains(probe).mean()
    assert fp_rate < 0.03, fp_rate


def test_string_keys():
    keys = pa.array([f"user-{i}" for i in range(1000)])
    f = BloomFilter(1000)
    f.add(keys)
    assert f.contains(keys).all()
    other = pa.array([f"nope-{i}" for i in range(1000)])
    assert f.contains(other).mean() < 0.05


def test_distributed_build_equals_single(ray_session):
    keys = [{"k": int(i) * 7 + 1} for i in range(3000)]
    ds = rd.from_items(keys).repartition(8)
    f = build_bloom(ds, "k", n_expected=3000)
    single = BloomFilter(3000)
    single.add(pa.array([r["k"] for r in keys], pa.int64()))
    assert np.array_equal(f.bits, single.bits)


def test_semi_join_exact(ray_session):
    big = rd.from_items([{"id": i, "x": i % 7} for i in range(500)])
    small = rd.from_items([{"key": k} for k in (2, 5)])
    got = sorted(r["id"] for r in
                 semi_join_bloom(big, small, on="x", small_on="key",
                                 n_expected=10).take_all())
    assert got == [i for i in range(500) if i % 7 in (2, 5)]
