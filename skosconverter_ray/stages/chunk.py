"""Document chunking: overlapping token windows — the RAG / training
pre-tokenization staple.

A pure flat-map stage (zero shuffles): each batch's texts split into
token lists ONCE (vectorized RE2), then every output chunk is
assembled by ONE Arrow ``binary_join`` over a rebuilt ListArray — no
per-chunk Python string work. Output rows: (doc_id, chunk_id, chunk,
n_tokens) with ``chunk_id`` dense per doc.

Window semantics match the SQL spelling (1-based token positions
``1, 1+stride, … ≤ len``; a window is ``[i, min(i+size-1, len)]``), so
the operator is oracle-checkable exactly — including the ragged final
window and single-token tails.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_documents(ds, *, size: int = 128, stride: int | None = None,
                    text_col: str = "text", id_col: str = "doc_id"):
    """-> (doc_id, chunk_id, chunk, n_tokens); stride defaults to
    ``size`` (no overlap); ``stride < size`` overlaps windows."""
    stride = stride or size
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def chunks(batch: pa.Table) -> pa.Table:
        col = batch[text_col].combine_chunks() \
            if isinstance(batch[text_col], pa.ChunkedArray) \
            else batch[text_col]
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(col),
                                      r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy()
        doc_start = offs[:-1] - offs[0]
        lens = np.diff(offs)
        vals = toks.values
        ids = batch[id_col].to_numpy(zero_copy_only=False)

        # chunks per doc: ceil(len / stride), min 1 (empty split still
        # yields [''] so len >= 1)
        n_chunks = np.maximum((lens + stride - 1) // stride, 1)
        doc_idx = np.repeat(np.arange(len(lens)), n_chunks)
        # 0-based window start within each doc
        first = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        within = np.arange(len(doc_idx)) - first
        w_start = within * stride
        w_end = np.minimum(w_start + size, lens[doc_idx])
        c_lens = w_end - w_start

        # gather flat token indices for all windows (CSR expansion)
        total = int(c_lens.sum())
        flat_start = doc_start[doc_idx] + w_start
        run = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(c_lens)[:-1])), c_lens)
        gather = np.repeat(flat_start, c_lens) + run

        new_offsets = np.concatenate(
            ([0], np.cumsum(c_lens))).astype(np.int32)
        chunk_lists = pa.ListArray.from_arrays(
            pa.array(new_offsets),
            vals.take(pa.array(gather, pa.int64())))
        joined = pc.binary_join(chunk_lists, " ")
        return pa.table({
            "doc_id": pa.array(ids[doc_idx], pa.int64()),
            "chunk_id": pa.array(within, pa.int64()),
            "chunk": joined,
            "n_tokens": pa.array(c_lens, pa.int64()),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")
