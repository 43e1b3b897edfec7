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


def test_keyed_prefix_max_inclusive_across_buckets(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from skosconverter_ray.stages.scan import keyed_prefix_max

    rng = np.random.default_rng(5)
    n = 500
    keys = rng.permutation(n)
    vals = rng.integers(-1000, 1000, n)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })).repartition(7)
    out = {r["k"]: r["runmax"]
           for r in keyed_prefix_max(ds, key="k", value="v",
                                     key_range=(0, n - 1),
                                     num_buckets=6).take_all()}
    by_key = vals[np.argsort(keys)]
    want = np.maximum.accumulate(by_key)
    assert all(out[k] == want[k] for k in range(n))


def test_watermark_late_classification(ray_session, tmp_path):
    """Hand-crafted stream: event 8 (the second arrival-block's first
    arrival under the (id%8)*3+1 permutation is id 13... easier to
    assert through the public query) — craft timestamps so exactly the
    rows whose block-predecessors-by-arrival run >10 min ahead are
    late."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from skosconverter_ray.queries import events_watermark_windows

    t0 = dt.datetime(2026, 1, 1)
    # 16 events, one per minute EXCEPT event 2 which lags 30 minutes
    # behind (an event-time straggler). Under the (id%8)*3+1 arrival
    # permutation id 2 arrives LAST in its block, so by then the
    # watermark has advanced ~37 min past its event time -> late.
    # (An early-arriving straggler would be on time: lateness is a
    # property of arrival order, which is the point of the test.)
    rows = []
    for eid in range(16):
        ts = t0 + dt.timedelta(minutes=eid)
        if eid == 2:
            ts = t0 - dt.timedelta(minutes=30)
        rows.append((eid, ts))
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([0] * 16, pa.int64()),
        "event_type": pa.array(["x"] * 16, pa.string()),
        "value": pa.array([0.0] * 16, pa.float64()),
    }), tmp_path / "events.parquet")

    got = {r["window_id"]: (r["n_ontime"], r["n_late"])
           for r in events_watermark_windows(str(tmp_path)).to_pylist()}
    # sequential oracle with the same permutation + watermark rule
    arrival = sorted(range(16),
                     key=lambda e: (e // 8) * 8 + ((e % 8) * 3 + 1) % 8)
    ts_us = {e: int(t.timestamp() * 1e6) for e, t in rows}
    wm, want = -10**18, {}
    for e in arrival:
        wm = max(wm, ts_us[e])
        w = ts_us[e] // 3_600_000_000
        ot, lt = want.get(w, (0, 0))
        if wm - ts_us[e] > 600_000_000:
            want[w] = (ot, lt + 1)
        else:
            want[w] = (ot + 1, lt)
    assert got == want
    # the straggler (event 2, 30 min behind, last arrival of its
    # block) must be the one late row
    assert sum(l for _, l in got.values()) == 1
