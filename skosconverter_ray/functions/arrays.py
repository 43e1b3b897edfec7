"""Arrow list-column -> numpy matrix without per-row Python objects.

Embedding columns arrive as ``list<float>``; ``to_pylist()`` builds one
Python list per row before numpy re-packs them. For uniform-length,
null-free lists (the embedding-table invariant) the child values
buffer can be viewed flat and reshaped — one dtype cast, no row
objects.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """``list<T>`` column/array -> ``(n, d)`` ndarray.

    Zero-copy through the Arrow child buffer (plus one cast to
    ``dtype``). Ragged or nulled columns fall back to ``np.asarray``
    over ``to_pylist`` — which, exactly like the per-row conversion
    this helper replaces, raises ``ValueError`` when the rows cannot
    form a rectangular matrix (ragged embeddings are invalid input).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if isinstance(col, pa.FixedSizeListArray):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return (flat.astype(dtype, copy=False)
                .reshape(n, col.type.list_size))
    offsets = col.offsets.to_numpy()
    widths = np.diff(offsets)
    d = int(widths[0]) if n else 0
    if col.null_count or not np.all(widths == d):
        return np.asarray(col.to_pylist(), dtype=dtype)
    flat = col.values.to_numpy(zero_copy_only=False)
    return (flat[offsets[0]:offsets[-1]]
            .astype(dtype, copy=False).reshape(n, d))
