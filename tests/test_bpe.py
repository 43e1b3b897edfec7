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


def test_bpe_encoder_parity(ray_session):
    """Actor-pool encoder vs the independent scan-per-rank oracle,
    including the one-occurrence-vs-all-occurrences divergence case
    (merge enabling a lower-rank pair: 'abab' with (ab,a) rank 0)."""
    from skosconverter_ray.stages.bpe import (BpeEncoder,
                                              encode_word_sequential)

    merges = [("a", "b"), ("ab", "a"), ("c", "d"), ("ab", "ab")]
    # rank of (ab,a)=1 > (a,b)=0 here; also craft the reverse order
    merges2 = [("ab", "a"), ("a", "b"), ("e", "f")]
    for ms in (merges, merges2):
        enc = BpeEncoder(merges=ms)
        for w in ("abab", "ababa", "aabb", "cdcd", "abcdab",
                  "x", "", "efef", "aaaa"):
            got = enc._n_tokens(w)
            want = len(encode_word_sequential(w, ms))
            assert got == want, (ms, w, got, want)


def test_bpe_encoder_batch(ray_session):
    from skosconverter_ray.stages.bpe import (BpeEncoder,
                                              encode_word_sequential)

    merges = [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")]
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["low lowest low", "newest widest", "  "],
                         pa.string()),
    })
    out = rd.from_arrow(docs).map_batches(
        BpeEncoder, fn_constructor_kwargs={"merges": merges},
        concurrency=(1, 2), batch_size=2,
        batch_format="pyarrow").take_all()
    got = {r["doc_id"]: (r["n_words"], r["n_subtokens"]) for r in out}
    def seq(text):
        ws = [w for w in __import__("re").findall("[a-z]+", text.lower())]
        return (len(ws),
                sum(len(encode_word_sequential(w, merges)) for w in ws))
    assert got[1] == seq("low lowest low")
    assert got[2] == seq("newest widest")
    assert 3 not in got  # wordless doc emits no row
