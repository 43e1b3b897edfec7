"""Label-propagation communities: engines vs the sequential oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd
import pytest

from skosconverter_ray.stages.communities import (
    label_propagation, label_propagation_sequential)


def _edges_ds(src, dst, parts=4):
    return rd.from_arrow(pa.table({
        "src": pa.array(src, pa.string()),
        "dst": pa.array(dst, pa.string()),
    })).repartition(parts)


def _run(ds, engine, n_iter=5):
    out = label_propagation(ds, n_iter=n_iter, engine=engine,
                            max_driver_edges=0 if engine == "actors"
                            else 4_000_000, num_shards=3)
    return {r["node"]: r["label"] for r in out.take_all()}


@pytest.mark.parametrize("engine", ["driver", "actors"])
def test_lpa_two_cliques(ray_session, engine):
    # two 4-cliques bridged by one edge -> two communities, labels =
    # each clique's lexicographically smallest member
    src, dst = [], []
    for grp in ("a", "b"):
        mem = [f"{grp}{i}" for i in range(4)]
        for i in range(4):
            for j in range(i + 1, 4):
                src.append(mem[i])
                dst.append(mem[j])
    src.append("a0")
    dst.append("b0")
    got = _run(_edges_ds(src, dst), engine)
    seq = label_propagation_sequential(src, dst, n_iter=5)
    assert got == seq
    a_labels = {got[f"a{i}"] for i in range(4)}
    b_labels = {got[f"b{i}"] for i in range(1, 4)}
    assert len(a_labels) == 1 and len(b_labels) == 1


def test_lpa_engine_parity_random(ray_session):
    rng = np.random.default_rng(13)
    n, m = 60, 240
    src = [f"n{int(i):03d}" for i in rng.integers(0, n, m)]
    dst = [f"n{int(i):03d}" for i in rng.integers(0, n, m)]
    ds = _edges_ds(src, dst, parts=6)
    drv = _run(ds, "driver")
    act = _run(ds, "actors")
    seq = label_propagation_sequential(src, dst, n_iter=5)
    assert drv == seq
    assert act == seq


def test_lpa_multiedge_and_oscillation_determinism(ray_session):
    # star-ish graphs OSCILLATE under synchronous LPA (documented —
    # x/y swap labels every round); the contract is determinism at a
    # fixed round count, pinned for both parities, plus multi-edge
    # weighting (3 votes for x's label beat z/w's one each at odd
    # rounds)
    src = ["x", "x", "x", "y", "y"]
    dst = ["y", "y", "y", "z", "w"]
    for rounds in (9, 10):
        got = _run(_edges_ds(src, dst, parts=2), "driver", n_iter=rounds)
        seq = label_propagation_sequential(src, dst, n_iter=rounds)
        assert got == seq
    odd = label_propagation_sequential(src, dst, n_iter=9)
    assert odd["y"] == "x"

@pytest.mark.parametrize("engine", ["driver", "actors"])
def test_lpa_unicode_ids_tie_rule(ray_session, engine):
    """Non-ASCII node ids: the driver path's dictionary-code order
    (UTF-8 byte order via pc.sort_indices) and the actor path's
    Python-string min must pick the SAME community label — UTF-8
    byte order equals code-point order by construction, and this
    test pins it (round 5: the driver loaders moved from np.unique
    over PyStr to sorted-dictionary int codes)."""
    # clique of accented + CJK + plain ids (tie-break is the min id)
    mem = ["zèbre", "Ωmega", "你好", "apfel", "Übel"]
    src, dst = [], []
    for i in range(len(mem)):
        for j in range(i + 1, len(mem)):
            src.append(mem[i])
            dst.append(mem[j])
    got = _run(_edges_ds(src, dst), engine)
    seq = label_propagation_sequential(src, dst, n_iter=5)
    assert got == seq
    assert len(set(got.values())) == 1
