"""HLL sketch: accuracy vs exact distinct counts, merge associativity."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from skosconverter_ray.stages.sketch import (distinct_count_hll,
                                             hll_estimate,
                                             hll_merge_blobs,
                                             hll_partial_batch)


def test_hll_pipeline_within_tolerance(ray_session):
    rng = np.random.RandomState(3)
    n = 120_000
    keys = np.array(["alpha", "beta", "gamma"])[rng.randint(0, 3, n)]
    vals = rng.randint(0, 30_000, n).astype(np.int64)
    exact = {k: len(set(vals[keys == k])) for k in ("alpha", "beta", "gamma")}
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(16)
    got = {r["k"]: r["n_distinct_est"]
           for r in distinct_count_hll(ds, "k", "v", num_buckets=8)
           .take_all()}
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert abs(got[k] - e) / e < 0.05, (k, got[k], e)


def test_hll_string_values_and_small_range(ray_session):
    # linear-counting regime: tiny cardinality must be near-exact
    rows = [{"k": "only", "v": f"user-{i % 40}"} for i in range(5000)]
    ds = rd.from_items(rows).repartition(8)
    got = distinct_count_hll(ds, "k", "v", num_buckets=4).take_all()
    assert len(got) == 1 and abs(got[0]["n_distinct_est"] - 40) <= 1


def test_hll_merge_order_invariant():
    rng = np.random.RandomState(9)
    t = pa.table({"k": ["x"] * 9000,
                  "v": rng.randint(0, 5000, 9000).astype(np.int64)})
    parts = [hll_partial_batch(t.slice(i * 3000, 3000), "k", "v")
             .to_pylist()[0]["hll_regs"] for i in range(3)]
    a = hll_merge_blobs([parts[0], parts[1], parts[2]])
    b = hll_merge_blobs([parts[2], parts[0], parts[1]])
    assert np.array_equal(a, b)
    est = hll_estimate(a)
    exact = len(set(t["v"].to_pylist()))
    assert abs(est - exact) / exact < 0.05


# ---------------------------------------------------------------------------
# frequent_items (Misra-Gries heavy hitters)
# ---------------------------------------------------------------------------

from skosconverter_ray.stages.sketch import (frequent_items,  # noqa: E402
                                             mg_partial_counts)


def test_mg_partial_bound():
    """est <= true and true - est <= n/(capacity+1) after truncation."""
    rng = np.random.RandomState(17)
    items = rng.zipf(1.5, 20000).astype(str)
    true = {}
    for x in items:
        true[x] = true.get(x, 0) + 1
    t = mg_partial_counts(pa.array(items), 64)
    got = dict(zip(t["item"].to_pylist(), t["est"].to_pylist()))
    assert len(got) <= 64
    bound = len(items)  # truncation subtracts the 65th count once
    for item, est in got.items():
        assert est <= true[item]
        assert true[item] - est <= bound
    # every item with true count > subtracted threshold survives:
    # the top heavy hitter must be present and near-exact
    top = max(true, key=true.get)
    assert top in got
    assert true[top] - got[top] <= sorted(true.values())[-65] \
        if len(true) > 64 else True


def test_frequent_items_exact_under_capacity(ray_session):
    rows = [{"t": w} for w in
            ["apple"] * 50 + ["pear"] * 30 + ["plum"] * 5]
    ds = rd.from_items(rows).repartition(6)
    got = {r["item"]: r["est"]
           for r in frequent_items(ds, "t", capacity=100,
                                   num_buckets=4).take_all()}
    assert got == {"apple": 50, "pear": 30, "plum": 5}


def test_frequent_items_heavy_hitters_past_capacity(ray_session):
    """Over capacity: heavy hitters survive the merge with one-sided
    error <= N/(capacity+1) summed per block."""
    rng = np.random.RandomState(23)
    light = [f"w{i}" for i in rng.randint(0, 5000, 30000)]
    heavy = ["HOT-A"] * 4000 + ["HOT-B"] * 2500
    allw = np.array(light + heavy)
    rng.shuffle(allw)
    ds = rd.from_items([{"t": w} for w in allw.tolist()]).repartition(8)
    got = {r["item"]: r["est"]
           for r in frequent_items(ds, "t", capacity=256,
                                   num_buckets=4).take_all()}
    n = len(allw)
    for hot, true in (("HOT-A", 4000), ("HOT-B", 2500)):
        assert hot in got
        assert got[hot] <= true
        assert true - got[hot] <= n / 257 + 1


def test_cms_linear_merge_and_one_sided_bound():
    import numpy as np
    import pyarrow as pa

    from skosconverter_ray.stages.sketch import cms_estimate, cms_partial

    rng = np.random.default_rng(7)
    # zipf-ish stream with known exact counts
    items = [f"t{int(v)}" for v in rng.zipf(1.3, size=20000) if v < 5000]
    from collections import Counter
    exact = Counter(items)

    width = 2048
    half = len(items) // 2
    a = cms_partial(pa.array(items[:half]), None, width=width)
    b = cms_partial(pa.array(items[half:]), None, width=width)
    whole = cms_partial(pa.array(items), None, width=width)
    # linearity: partials merge by addition, any split
    assert (a + b == whole).all()

    keys = list(exact)
    est = cms_estimate(whole, pa.array(keys))
    ex = np.array([exact[k] for k in keys])
    assert (est >= ex).all()  # deterministic one-sided guarantee
    # expected overcount per row is N/width; min over 4 rows stays
    # well inside 16x that on any non-adversarial stream
    assert (est - ex <= 16 * (len(items) // width + 1)).all()


def test_cms_weighted_counts():
    import numpy as np
    import pyarrow as pa

    from skosconverter_ray.stages.sketch import cms_estimate, cms_partial

    m = cms_partial(pa.array(["x", "y"]), np.array([10, 3], np.int64),
                    width=64)
    est = cms_estimate(m, pa.array(["x", "y"]))
    assert est[0] >= 10 and est[1] >= 3 and m[0].sum() == 13
