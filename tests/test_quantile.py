"""Per-key quantiles: quantile_disc index parity vs DuckDB on random
data, bucket invariance, duplicate values."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from skosconverter_ray.stages.quantile import per_key_quantiles


def _run(rows, qs, num_buckets=8):
    got = per_key_quantiles(rd.from_items(rows).repartition(4),
                            "k", "v", qs,
                            num_buckets=num_buckets).take_all()
    return {r["k"]: tuple(r[a] for a in qs) for r in got}


def test_matches_duckdb_random(ray_session):
    rng = np.random.RandomState(21)
    rows = [{"k": f"k{rng.randint(0, 6)}",
             "v": float(np.round(rng.uniform(0, 100), 2))}
            for _ in range(4000)]
    qs = {"p10": 0.1, "p50": 0.5, "p90": 0.9, "p99": 0.99}
    got = _run(rows, qs)
    t = pa.table({"k": [r["k"] for r in rows],
                  "v": [r["v"] for r in rows]})
    want = {k: (a, b, c, d) for k, a, b, c, d in duckdb.sql(
        """SELECT k, quantile_disc(v, 0.1), quantile_disc(v, 0.5),
                  quantile_disc(v, 0.9), quantile_disc(v, 0.99)
           FROM t GROUP BY k""").fetchall()}
    assert got == want


def test_duplicates_and_tiny_groups(ray_session):
    rows = ([{"k": "dup", "v": 5.0}] * 9
            + [{"k": "one", "v": 3.25}]
            + [{"k": "two", "v": v} for v in (1.0, 2.0)])
    got = _run(rows, {"p50": 0.5, "p99": 0.99}, num_buckets=2)
    assert got == {"dup": (5.0, 5.0), "one": (3.25, 3.25),
                   "two": (1.0, 2.0)}


# ---------------------------------------------------------------------------
# dd_quantiles (mergeable DDSketch scale path)
# ---------------------------------------------------------------------------


def test_ddsketch_within_relative_error(ray_session):
    from skosconverter_ray.stages.sketch import dd_quantiles

    rng = np.random.RandomState(31)
    rows = [{"k": f"k{rng.randint(0, 4)}",
             "v": float(rng.lognormal(2.0, 1.5))} for _ in range(20000)]
    # a key with zeros exercises the exact zero bin
    rows += [{"k": "zeroes", "v": 0.0}] * 50 + [{"k": "zeroes", "v": 8.0}]
    qs = {"p50": 0.5, "p95": 0.95}
    got = {r["k"]: {a: r[a] for a in qs}
           for r in dd_quantiles(rd.from_items(rows).repartition(8),
                                 "k", "v", qs, rel_err=0.01).take_all()}
    vals = {}
    for r in rows:
        vals.setdefault(r["k"], []).append(r["v"])
    for k, vs in vals.items():
        vs = np.sort(vs)
        for a, q in qs.items():
            exact = vs[int(np.ceil(q * len(vs))) - 1]
            est = got[k][a]
            if exact == 0.0:
                assert est == 0.0
            else:
                assert abs(est - exact) / exact <= 0.0101, (k, a, est, exact)


def test_ddsketch_negative_rejected(ray_session):
    from skosconverter_ray.stages.sketch import dd_quantiles

    import pytest
    import ray

    ds = rd.from_items([{"k": "a", "v": -1.0}])
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        dd_quantiles(ds, "k", "v", {"p50": 0.5}).take_all()


# ---------------------------------------------------------------------------
# ntile_per_key
# ---------------------------------------------------------------------------


def test_ntile_matches_duckdb(ray_session):
    from skosconverter_ray.stages.quantile import ntile_per_key

    rng = np.random.RandomState(41)
    rows = [{"k": f"g{rng.randint(0, 5)}", "id": i,
             "v": float(rng.randint(0, 50))} for i in range(1777)]
    got = {r["id"]: r["q"]
           for r in ntile_per_key(rd.from_items(rows).repartition(4),
                                  "k", "v", "id", 7,
                                  id_cols=["id"]).take_all()}
    t = pa.table({"k": [r["k"] for r in rows],
                  "id": [r["id"] for r in rows],
                  "v": [r["v"] for r in rows]})
    want = dict(duckdb.sql(
        "SELECT id, ntile(7) OVER (PARTITION BY k ORDER BY v, id) "
        "FROM t").fetchall())
    assert got == want
