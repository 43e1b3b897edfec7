"""Deterministic synthetic interleaved-documents corpus (FIXTURES.md §1).

Input shape per BASELINE.json ``input_hint``:
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.

Text spans embed vocabulary labels (prefLabel / altLabel / hiddenLabel,
exact and case-variant) at known positions plus non-mention decoys, so
entity-linking ground truth is exact and recomputable from
``(doc_index, seed, label catalog)`` alone — every worker derives the
same document for the same index with no shared state.

Generation is itself a Ray Data pipeline (``ray.data.range(n) →
map_batches``) so benchmark corpora of any size are produced in
parallel without materializing on the driver.
"""

from __future__ import annotations

import random
import zlib

import pyarrow as pa

from . import schemas
from .vocab import Vocab

_FILLER = (
    "the report describes measurements collected during the field survey "
    "and summarizes observations made across several distinct sites with "
    "notes on methodology instrumentation calibration and seasonal drift "
    "while appendices list raw values for archival reference purposes"
).split()

_DECOYS = ["Quantum Lattice", "Hollow Moon", "Paper Tiger", "Silent Meridian"]

_KINDS = ("image", "audio", "table")


def _doc_rng(seed: int, idx: int) -> random.Random:
    return random.Random((seed * 1_000_003 + idx) & 0x7FFFFFFF)


def generate_doc(idx: int, labels: list[tuple[str, str, str, str]], seed: int):
    """One document + its ground-truth mentions.

    Returns ``(doc_id, spans, mentions)`` where spans is a list of
    ``{kind,text,media_ref,offset}`` dicts and mentions is a list of
    ``(span_idx, surface, concept_uri, label_kind)``.
    """
    rng = _doc_rng(seed, idx)
    doc_id = f"doc-{idx:012d}"
    n_spans = rng.randint(3, 12)
    spans, mentions = [], []
    offset = 0
    for si in range(n_spans):
        if rng.random() < 0.8 or not labels:
            words = [rng.choice(_FILLER) for _ in range(rng.randint(8, 25))]
            # embed 0-2 vocabulary mentions at random word positions
            for _ in range(rng.randint(0, 2)):
                if not labels or rng.random() < 0.25:
                    words.insert(rng.randint(0, len(words)), rng.choice(_DECOYS))
                    continue
                label, _norm, uri, kind = rng.choice(labels)
                surface = label if rng.random() < 0.7 else label.lower()
                words.insert(rng.randint(0, len(words)), surface)
                mentions.append((si, surface, uri, kind))
            text = " ".join(words)
            spans.append({"kind": "text", "text": text,
                          "media_ref": "", "offset": offset})
        else:
            kind = rng.choice(_KINDS)
            cap_words = [rng.choice(_FILLER) for _ in range(rng.randint(2, 6))]
            if labels and rng.random() < 0.3:
                label, _norm, uri, lkind = rng.choice(labels)
                cap_words.append(label)
                mentions.append((si, label, uri, lkind))
            text = " ".join(cap_words)
            # zlib.crc32, not hash(): str hashing is salted per process
            ref = f"media://{zlib.crc32(f'{idx}/{si}/{kind}'.encode()):08x}"
            spans.append({"kind": kind, "text": text,
                          "media_ref": ref, "offset": offset})
        offset += len(spans[-1]["text"]) + 1
    return doc_id, spans, mentions


def _docs_batch(indices, labels, seed) -> pa.Table:
    doc_ids, span_lists = [], []
    for idx in indices:
        doc_id, spans, _ = generate_doc(int(idx), labels, seed)
        doc_ids.append(doc_id)
        span_lists.append(spans)
    return pa.table(
        {"doc_id": doc_ids,
         "spans": pa.array(span_lists, type=pa.list_(schemas.SPAN_STRUCT))},
        schema=schemas.DOCUMENTS,
    )


def generate_documents_table(n_docs: int, vocab: Vocab, seed: int = 42) -> pa.Table:
    """Small/in-memory corpus for unit tests."""
    return _docs_batch(range(n_docs), vocab.labels, seed)


def ground_truth_mentions(n_docs: int, vocab: Vocab, seed: int = 42) -> pa.Table:
    """Recompute the exact mention set the linker must find."""
    rows = {"doc_id": [], "span_idx": [], "surface": [],
            "concept_uri": [], "label_kind": []}
    for idx in range(n_docs):
        doc_id, _, mentions = generate_doc(idx, vocab.labels, seed)
        for si, surface, uri, kind in mentions:
            rows["doc_id"].append(doc_id)
            rows["span_idx"].append(si)
            rows["surface"].append(surface)
            rows["concept_uri"].append(uri)
            rows["label_kind"].append(kind)
    return pa.table(rows)


def from_flat_documents(ds):
    """Adapt a flat text table ``(doc_id, text, ...)`` into the
    interleaved ``(doc_id, spans)`` shape (single text span per doc).

    Lets the engine ingest plain-text corpora (e.g. the driver's
    ``documents.parquet``) through the same flagship pipeline."""

    def wrap(batch: pa.Table) -> pa.Table:
        ids = [str(v) for v in batch["doc_id"].to_pylist()]
        spans = [
            [{"kind": "text", "text": t or "", "media_ref": "", "offset": 0}]
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": pa.array(ids, pa.string()),
             "spans": pa.array(spans, type=pa.list_(schemas.SPAN_STRUCT))},
            schema=schemas.DOCUMENTS,
        )

    return ds.map_batches(wrap, batch_format="pyarrow")


def documents_dataset(n_docs: int, vocab: Vocab, seed: int = 42,
                      override_num_blocks: int | None = None):
    """Distributed corpus generation: one Ray task per index block.

    The label catalog rides in the task closure once per task (small:
    ~O(vocab) strings); documents never touch the driver.
    """
    import ray.data as rd

    labels = vocab.labels

    def gen(batch: pa.Table) -> pa.Table:
        return _docs_batch(batch["id"].to_pylist(), labels, seed)

    n_blocks = override_num_blocks or max(8, n_docs // 2000)
    ds = rd.range(n_docs, override_num_blocks=n_blocks)
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=2000)
