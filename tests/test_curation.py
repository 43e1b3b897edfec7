"""Curation pipeline: the loser families must leave through the
left-anti cogroup join (never a driver-side id set), and the survivor
set must match a sequential oracle on a corpus that is MOSTLY
duplicates (>50%) — the regime where a driver-collected loser set
would be corpus-sized."""

import pyarrow as pa
import ray

from skosconverter_ray.queries import curation_survivors

# 3 base texts, each duplicated 12x (36 dup rows of 56 total = 64%
# duplicates), plus 16 distinct texts and 4 quality-failing rows.
_BASES = [
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
    "kilo lima mike november oscar papa quebec romeo sierra tango",
    "uniform victor whiskey xray yankee zulu anchor binder copper delta",
]
_DISTINCT = [
    f"unique document number {i} with words w{i}a w{i}b w{i}c w{i}d "
    f"w{i}e w{i}f w{i}g token{i}" for i in range(16)
]
_BAD = [
    "x1 2345 6789 0!!! ???",      # alpha ratio < 0.5
    "short",                      # n_chars < 20
    "9" * 30,                     # alpha ratio 0
    "!! ?? .. ,, ;; :: () [] {}"  # alpha ratio 0
]


def _corpus():
    rows = []
    did = 0
    for b in _BASES:
        for _ in range(12):
            rows.append((did, b, "en" if did % 2 else "de"))
            did += 1
    for t in _DISTINCT:
        rows.append((did, t, "en" if did % 2 else "de"))
        did += 1
    for t in _BAD:
        rows.append((did, t, "en"))
        did += 1
    return rows


def _expected(rows):
    # sequential oracle: min-id per exact text group survives; every
    # other copy is a loser regardless of quality; quality gates the
    # survivor itself. (Distinct texts share no words, so near-dup
    # clusters coincide with the exact groups.)
    first = {}
    for did, text, _ in rows:
        first.setdefault(text, did)
    out = {}
    for did, text, lang in rows:
        if first[text] != did:
            continue
        alpha = sum(c.isalpha() for c in text)
        if len(text) < 20 or len(text) > 100000 or alpha / len(text) < 0.5:
            continue
        n, t = out.get(lang, (0, 0))
        out[lang] = (n + 1, t + len(text.split()))
    return out


def test_curation_anti_join_path_majority_duplicates(ray_session):
    rows = _corpus()
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })).repartition(5).materialize()

    kept = curation_survivors(docs).take_all()
    got = {}
    for r in kept:
        n, t = got.get(r["lang"], (0, 0))
        got[r["lang"]] = (n + 1, t + r["tok"])
    assert got == _expected(rows)

    # and the survivors are exactly the min-id representative of every
    # quality-passing text group
    want_ids = sorted(
        min(d for d, tx, _ in rows if tx == text)
        for text in {r[1] for r in rows}
        if (lambda t: len(t) >= 20 and
            sum(c.isalpha() for c in t) / len(t) >= 0.5)(text))
    assert sorted(r["doc_id"] for r in kept) == want_ids
