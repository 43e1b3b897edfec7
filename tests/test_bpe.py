"""Distributed BPE trainer vs the naive sequential oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from skosconverter_ray.stages.bpe import (apply_merge_batch, bpe_train,
                                          bpe_train_sequential)


def _wc_ds(counts: dict[str, int], parts=4):
    t = pa.table({"word": pa.array(list(counts), pa.string()),
                  "cnt": pa.array(list(counts.values()), pa.int64())})
    return rd.from_arrow(t).repartition(parts)


def test_bpe_textbook_example(ray_session):
    # Sennrich et al.'s canonical example: merges emerge by frequency
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(_wc_ds(counts), n_merges=4)
    seq = bpe_train_sequential(counts, 4)
    assert merges == seq
    # first merges must involve the dominant 'est' suffix family
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


def test_bpe_parity_random(ray_session):
    rng = np.random.default_rng(7)
    alpha = "abcdef"
    words = {"".join(rng.choice(list(alpha),
                                size=rng.integers(1, 12))): int(c)
             for c in rng.integers(1, 50, size=300)}
    merges = bpe_train(_wc_ds(words, parts=7), n_merges=20)
    seq = bpe_train_sequential(words, 20)
    assert merges == seq
    assert len(merges) == 20


def test_bpe_overlap_left_to_right():
    # 'aaaa' + merge (a,a): left-to-right gives [aa, aa], never 3 merges
    batch = pa.table({"syms": pa.array([["a", "a", "a", "a"],
                                        ["a", "a", "a"]],
                                       pa.list_(pa.string())),
                      "cnt": pa.array([1, 1], pa.int64())})
    out = apply_merge_batch(batch, "a", "a")
    assert out["syms"].to_pylist() == [["aa", "aa"], ["aa", "a"]]


def test_bpe_exhausts_pairs(ray_session):
    # single short word: only len-1 merges possible, then early stop
    counts = {"ab": 3}
    merges = bpe_train(_wc_ds(counts, parts=1), n_merges=10)
    assert merges == [("a", "b")]
