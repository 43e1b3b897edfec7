"""cogroup_join semantics vs a sequential oracle."""

import ray.data as rd

from skosconverter_ray.stages.joinutil import cogroup_join


def _sides():
    left = [{"k": i % 7, "lv": i} for i in range(40)]
    right = [{"rk": k, "rv": f"r{k}"} for k in (0, 1, 2, 3, 9)]
    return left, right


def test_inner_join(ray_session):
    left, right = _sides()
    out = cogroup_join(rd.from_items(left), rd.from_items(right),
                       left_on="k", right_on="rk", num_buckets=4)
    rows = out.take_all()
    expect = [(l["k"], l["lv"], f"r{l['k']}")
              for l in left if l["k"] in (0, 1, 2, 3)]
    got = [(r["k"], r["lv"], r["rv"]) for r in rows]
    assert sorted(got) == sorted(expect)
    # key echo: right key column carries the join key
    assert all(r["rk"] == r["k"] for r in rows)


def test_left_outer_join(ray_session):
    left, right = _sides()
    out = cogroup_join(rd.from_items(left), rd.from_items(right),
                       left_on="k", right_on="rk", num_buckets=4,
                       join_type="left outer")
    rows = out.take_all()
    assert len(rows) == len(left)
    unmatched = [r for r in rows if r["k"] in (4, 5, 6)]
    assert unmatched and all(r["rv"] is None for r in unmatched)
    # unmatched rows carry a NULL right key (standard outer-join
    # output), never an echo of the left key
    assert all(r["rk"] is None for r in unmatched)
    matched = [r for r in rows if r["k"] not in (4, 5, 6)]
    assert all(r["rk"] == r["k"] for r in matched)


def test_bucket_invariance(ray_session):
    left, right = _sides()

    def run(b):
        out = cogroup_join(rd.from_items(left), rd.from_items(right),
                           left_on="k", right_on="rk", num_buckets=b)
        return sorted((r["k"], r["lv"], r["rv"]) for r in out.take_all())

    assert run(1) == run(16)
