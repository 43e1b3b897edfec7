"""top_k_per_key vs a pandas window-function oracle."""
import random

import pandas as pd
import pytest
import ray.data as rd

from skosconverter_ray.stages.topk import top_k_per_key


def _oracle(df, keys, order_col, k, descending, tiebreak):
    df = df.sort_values([*keys, order_col, tiebreak],
                        ascending=[True] * len(keys) + [not descending, True])
    return (df.groupby(keys, sort=False).head(k)
            .sort_values([*keys, tiebreak]).reset_index(drop=True))


@pytest.mark.parametrize("descending", [True, False])
def test_topk_matches_window_oracle(ray_session, descending):
    rng = random.Random(13)
    rows = [{"g": f"grp{rng.randrange(40)}", "v": rng.randrange(100),
             "id": i} for i in range(3000)]
    # a hot key: 30% of rows in one group (the skew case)
    rows += [{"g": "hot", "v": rng.randrange(100), "id": 10_000 + i}
             for i in range(900)]
    ds = rd.from_items(rows).repartition(16)
    got = pd.DataFrame(
        top_k_per_key(ds, ["g"], "v", 5, descending=descending,
                      tiebreak="id", num_buckets=8).take_all())
    got = got.sort_values(["g", "id"]).reset_index(drop=True)[["g", "v", "id"]]
    want = _oracle(pd.DataFrame(rows), ["g"], "v", 5, descending,
                   "id")[["g", "v", "id"]]
    pd.testing.assert_frame_equal(got, want)


def test_topk_multikey_and_k_exceeds_group(ray_session):
    rows = [{"a": i % 3, "b": f"x{i % 2}", "v": i * 7 % 11, "id": i}
            for i in range(200)]
    ds = rd.from_items(rows).repartition(8)
    got = pd.DataFrame(
        top_k_per_key(ds, ["a", "b"], "v", 50, descending=True,
                      tiebreak="id", num_buckets=4).take_all())
    got = (got.sort_values(["a", "b", "id"]).reset_index(drop=True)
           [["a", "b", "v", "id"]])
    want = _oracle(pd.DataFrame(rows), ["a", "b"], "v", 50, True,
                   "id")[["a", "b", "v", "id"]]
    pd.testing.assert_frame_equal(got, want)
