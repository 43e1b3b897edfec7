"""Skew-aware join: identical output to a plain join, both paths hit."""

import pyarrow as pa
import ray.data as rd

from skosconverter_ray.stages.skewjoin import skew_aware_join


def _run(hot_min_est):
    # one hot key (700 rows) + 50 cold keys (2 rows each)
    left_rows = ([{"k": 999, "x": i} for i in range(700)]
                 + [{"k": k, "x": k} for k in range(50) for _ in range(2)])
    right_rows = [{"rk": k, "tag": f"t{k}"} for k in range(50)] + \
                 [{"rk": 999, "tag": "hot"}]
    joined = skew_aware_join(
        rd.from_items(left_rows).repartition(8),
        rd.from_items(right_rows),
        left_on="k", right_on="rk",
        left_schema=pa.schema([("k", pa.int64()), ("x", pa.int64())]),
        right_schema=pa.schema([("rk", pa.int64()),
                                ("tag", pa.string())]),
        hot_min_est=hot_min_est, num_buckets=4)
    return sorted((r["k"], r["x"], r["tag"]) for r in joined.take_all())


def _expected():
    out = [(999, i, "hot") for i in range(700)]
    out += [(k, k, f"t{k}") for k in range(50) for _ in range(2)]
    return sorted(out)


def test_hot_and_cold_paths_match_plain_join(ray_session):
    # threshold 100: key 999 routes hot, the rest cold
    assert _run(100) == _expected()


def test_all_cold_when_threshold_high(ray_session):
    # threshold high enough that no key is hot -> pure cogroup path
    assert _run(10_000) == _expected()


def test_same_named_keys_keep_key_column(ray_session):
    """left_on == right_on: the key must survive in BOTH paths."""
    left = rd.from_items([{"k": 1, "x": 10}] * 30
                         + [{"k": 2, "x": 20}] * 2).repartition(4)
    right = rd.from_items([{"k": 1, "tag": "hot"}, {"k": 2, "tag": "c"}])
    joined = skew_aware_join(
        left, right, left_on="k", right_on="k",
        left_schema=pa.schema([("k", pa.int64()), ("x", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()),
                                ("tag", pa.string())]),
        hot_min_est=10, num_buckets=4)
    rows = joined.take_all()
    assert all(set(r) == {"k", "x", "tag"} for r in rows)
    got = sorted((r["k"], r["x"], r["tag"]) for r in rows)
    assert got == sorted([(1, 10, "hot")] * 30 + [(2, 20, "c")] * 2)
