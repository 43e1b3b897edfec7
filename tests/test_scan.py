"""Distributed exclusive prefix scan vs a numpy oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from skosconverter_ray.stages.scan import keyed_prefix_sum


@pytest.mark.parametrize("num_buckets", [1, 3, 16])
def test_keyed_prefix_sum(ray_session, num_buckets):
    rng = np.random.default_rng(3)
    keys = rng.permutation(np.arange(100, 1100, dtype=np.int64))
    vals = rng.integers(0, 50, size=keys.size).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})) \
        .repartition(7)
    out = keyed_prefix_sum(ds, key="k", value="v",
                           key_range=(100, 1099),
                           num_buckets=num_buckets)
    got = {r["k"]: r["off"] for r in out.take_all()}

    order = np.argsort(keys)
    excl = np.cumsum(vals[order]) - vals[order]
    want = dict(zip(keys[order].tolist(), excl.tolist()))
    assert got == want


def test_keyed_prefix_sum_sparse_buckets(ray_session):
    # most key-range buckets are empty; bases must still line up
    keys = np.array([5, 900, 901, 5000], dtype=np.int64)
    vals = np.array([10, 7, 3, 1], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals}))
    out = keyed_prefix_sum(ds, key="k", value="v", key_range=(0, 5000),
                           num_buckets=8)
    got = {r["k"]: r["off"] for r in out.take_all()}
    assert got == {5: 0, 900: 10, 901: 17, 5000: 20}
