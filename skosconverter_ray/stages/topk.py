"""Per-key top-k selection (stratified sampling / best-N-per-group).

A training-data pipeline constantly needs "the k best rows per group"
— k highest-quality docs per language, k most recent events per user,
k largest orders per customer. SQL spells it ``row_number() OVER
(PARTITION BY key ORDER BY ...) <= k``; a naive distributed plan sorts
the whole corpus. This operator never does:

1. **map-side partial top-k**: within each batch, one ``np.lexsort``
   over (key codes, order value, tiebreak) and a run-boundary rank
   keeps at most k rows per (batch, group) — the shuffle input shrinks
   from |rows| to ≤ k × groups-per-batch rows.
2. **coarse cogroup**: partials hash to ``num_buckets`` buckets on the
   key (same co-location hash as ``bucket_aggregate``), so the final
   pass is one ~num_buckets-task exchange, not a corpus sort.
3. **final re-rank**: the identical vectorized rank runs once per
   bucket over ≤ k × |groups in bucket| × upstream-blocks rows.

Determinism: ``tiebreak`` (required) makes the selected set and its
order unique, so results are reproducible and oracle-checkable.

At 100 TB: per-task final input is bounded by k × |groups| /
num_buckets (× surviving partials); raise ``num_buckets`` with group
count. Skewed hot keys cost k × blocks partial rows, not their full
row count — the partial pass is the skew guard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .skew import bucket_codes


def _rank_select(t: pa.Table, keys: list[str], order_col: str, k: int,
                 descending: bool, tiebreak: str) -> pa.Table:
    """Vectorized per-group rank-and-keep on one in-memory table."""
    n = t.num_rows
    if n == 0:
        return t
    # group identity as integer codes (per-table dictionary encode);
    # codes differ between tables but equal-key rows share a code,
    # which is all run detection needs
    codes = []
    for kcol in keys:
        enc = pc.dictionary_encode(t[kcol])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes.append(enc.indices.to_numpy(zero_copy_only=False)
                     .astype(np.int64))
    o = t[order_col].to_numpy(zero_copy_only=False)
    if descending:
        o = -o if np.issubdtype(o.dtype, np.number) else o
    tb = t[tiebreak].to_numpy(zero_copy_only=False)
    if descending and not np.issubdtype(o.dtype, np.number):
        raise TypeError("descending top-k needs a numeric order column")
    # lexsort: last key = primary sort key
    idx = np.lexsort((tb, o, *reversed(codes)))
    sorted_codes = np.stack([c[idx] for c in codes])
    boundary = np.concatenate((
        [True], (sorted_codes[:, 1:] != sorted_codes[:, :-1]).any(axis=0)))
    starts = np.flatnonzero(boundary)
    lengths = np.diff(np.concatenate((starts, [n])))
    rank = np.arange(n) - np.repeat(starts, lengths)
    return t.take(pa.array(np.sort(idx[rank < k])))


def top_k_per_key(ds, keys: list[str], order_col: str, k: int, *,
                  descending: bool = True, tiebreak: str,
                  num_buckets: int = 64, bucket_key: str | None = None):
    """``row_number() OVER (PARTITION BY keys ORDER BY order_col
    [DESC], tiebreak) <= k`` as a partial-top-k + one coarse cogroup.

    Returns the selected ROWS (all input columns), no rank column.
    """
    bkey = bucket_key or keys[0]

    def partial(batch: pa.Table) -> pa.Table:
        out = _rank_select(batch, keys, order_col, k, descending, tiebreak)
        b = bucket_codes(out[bkey], num_buckets)
        return out.append_column("_bucket", pa.array(b, pa.int32()))

    def final(group: pa.Table) -> pa.Table:
        return _rank_select(group.drop_columns(["_bucket"]), keys,
                            order_col, k, descending, tiebreak)

    from .shardutil import scatter_apply_by_value

    return scatter_apply_by_value(
        ds.map_batches(partial, batch_format="pyarrow").materialize(),
        "_bucket", num_buckets, final)
