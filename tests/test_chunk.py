"""Chunking: window math vs a sequential oracle, edge cases."""

import ray.data as rd

from skosconverter_ray.stages.chunk import chunk_documents


def _oracle(text, size, stride):
    w = text.strip().split() or [""]
    out = []
    i = 0
    cid = 0
    while i < len(w) or cid == 0:
        win = w[i:i + size]
        if not win:
            break
        out.append((cid, " ".join(win), len(win)))
        i += stride
        cid += 1
    return out


def test_chunks_match_oracle(ray_session):
    docs = [
        {"doc_id": 1, "text": "a b c d e f g h i j"},   # 10 toks
        {"doc_id": 2, "text": "  one two  "},           # trim + 2 toks
        {"doc_id": 3, "text": "solo"},                  # 1 tok
        {"doc_id": 4, "text": "x " * 7},                # 7 toks, ragged tail
    ]
    got = {}
    for r in chunk_documents(rd.from_items(docs), size=4,
                             stride=3).take_all():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk"], r["n_tokens"]))
    for d in docs:
        want = _oracle(d["text"], 4, 3)
        assert sorted(got[d["doc_id"]]) == sorted(want), d["doc_id"]


def test_no_overlap_default(ray_session):
    docs = [{"doc_id": 9, "text": "a b c d e"}]
    rows = sorted((r["chunk_id"], r["chunk"]) for r in
                  chunk_documents(rd.from_items(docs), size=2).take_all())
    assert rows == [(0, "a b"), (1, "c d"), (2, "e")]
