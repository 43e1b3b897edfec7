"""As-of join vs a sequential oracle."""

import datetime as dt

import ray.data as rd

from skosconverter_ray.stages.asof import asof_join


def _mk():
    t0 = dt.datetime(2024, 1, 1)

    def t(s):
        return t0 + dt.timedelta(seconds=s)

    left = [
        {"eid": 1, "k": 1, "ts": t(100)},
        {"eid": 2, "k": 1, "ts": t(50)},    # matches right @50 (equal ts)
        {"eid": 3, "k": 1, "ts": t(10)},    # before any right -> drops
        {"eid": 4, "k": 2, "ts": t(500)},
        {"eid": 5, "k": 3, "ts": t(500)},   # key with no right rows
    ]
    right = [
        {"k": 1, "ts": t(50), "val": 1.0},
        {"k": 1, "ts": t(80), "val": 2.0},
        {"k": 1, "ts": t(200), "val": 3.0},
        {"k": 2, "ts": t(400), "val": 9.0},
    ]
    return left, right


def test_asof_join_semantics(ray_session):
    left, right = _mk()
    out = asof_join(rd.from_items(left), rd.from_items(right),
                    key="k", ts="ts", right_cols=["ts", "val"],
                    num_buckets=4, prefix="r_")
    rows = {r["eid"]: r for r in out.take_all()}
    assert set(rows) == {1, 2, 4}          # 3 has no prior, 5 no right key
    assert rows[1]["r_val"] == 2.0         # latest <= t100 is t80
    assert rows[2]["r_val"] == 1.0         # equal timestamp matches
    assert rows[4]["r_val"] == 9.0


def test_asof_bucket_invariance(ray_session):
    left, right = _mk()

    def run(b):
        out = asof_join(rd.from_items(left), rd.from_items(right),
                        key="k", ts="ts", right_cols=["val"],
                        num_buckets=b)
        return sorted((r["eid"], r["r_val"]) for r in out.take_all())

    assert run(1) == run(16)


def test_asof_explicit_schemas_never_infer(ray_session):
    """With explicit schemas, asof_join must never call .schema() on
    its inputs — on a lazy multi-stage pipeline that call executes a
    partial upstream pass (the repo's documented pitfall)."""
    import pyarrow as pa

    left, right = _mk()
    lds = rd.from_items(left).map_batches(lambda b: b,
                                          batch_format="pyarrow")
    rds = rd.from_items(right).map_batches(lambda b: b,
                                           batch_format="pyarrow")

    def boom(*a, **k):
        raise AssertionError("asof_join called Dataset.schema() despite "
                             "explicit schemas")

    lds.schema = boom
    rds.schema = boom
    ts_t = pa.timestamp("us")
    out = asof_join(
        lds, rds, key="k", ts="ts", right_cols=["ts", "val"],
        num_buckets=4, prefix="r_",
        left_schema=pa.schema([("eid", pa.int64()), ("k", pa.int64()),
                               ("ts", ts_t)]),
        right_schema=pa.schema([("k", pa.int64()), ("ts", ts_t),
                                ("val", pa.float64())]))
    rows = {r["eid"]: r for r in out.take_all()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["r_val"] == 2.0
