"""Duplicated-span coverage accounting: exact interval-union arithmetic
vs a brute-force positional oracle, on a corpus with overlapping,
adjacent, and disjoint duplicated spans plus short docs with no grams."""

import re

import pyarrow as pa
import pyarrow.parquet as pq

from skosconverter_ray.queries import doc_span_dedup

_N = 5
_SHARED = "alpha bravo charlie delta echo foxtrot golf"  # 7 toks: 3 grams
_ROWS = [
    # doc 0 and 1 share a 7-token run -> overlapping dup grams
    (0, _SHARED + " uniq0a uniq0b uniq0c"),
    (1, "pre1a pre1b " + _SHARED),
    # doc 2 repeats a 5-gram INSIDE itself (corpus count >= 2 within
    # one doc) with a gap between occurrences
    (2, "one two three four five gap1 gap2 gap3 gap4 gap5 gap6 "
        "one two three four five"),
    # doc 3: all-unique tokens, no dup grams
    (3, "zeta eta theta iota kappa lambdaq mu nu xi omicron"),
    # doc 4: too short for any 5-gram
    (4, "tiny doc here"),
]


def _brute(rows):
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in rows}
    grams = []
    for d, ts in toks.items():
        for i in range(max(len(ts) - _N + 1, 0)):
            grams.append((d, i, " ".join(ts[i:i + _N])))
    from collections import Counter
    c = Counter(g for _, _, g in grams)
    out = {}
    for d, ts in toks.items():
        starts = [i for (dd, i, g) in grams if dd == d and c[g] >= 2]
        covered = set()
        for s in starts:
            covered.update(range(s, s + _N))
        out[d] = (len(ts), len(starts), len(covered))
    return out


def test_span_coverage_matches_brute_force(ray_session, tmp_path):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in _ROWS], pa.int64()),
        "text": pa.array([r[1] for r in _ROWS], pa.string()),
    }), tmp_path / "documents.parquet")

    got = {r["doc_id"]: (r["n_tokens"], r["dup_starts"],
                         r["covered_tokens"])
           for r in doc_span_dedup(str(tmp_path)).to_pylist()}
    assert got == _brute(_ROWS)
    # spot semantics: the shared 7-token run covers all 7 tokens of it
    # in both docs via 3 overlapping gram starts
    assert got[0][1] == 3 and got[0][2] == 7
    assert got[3] == (10, 0, 0)
    assert got[4] == (3, 0, 0)
