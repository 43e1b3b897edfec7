"""Per-key exact quantiles (discrete / order-statistic semantics).

``per_key_quantiles`` computes ``quantile_disc``-compatible order
statistics per key: the element at sorted index ``ceil(q·n) - 1`` —
bit-identical to the SQL aggregate because an ELEMENT is picked, never
interpolated.

Scale shape: one coarse-bucket cogroup keyed on the group key (all
rows of a key meet in one task — the documented partitioning
assumption of every order-statistic operator here); inside a bucket
the work is ONE lexsort over (key, value) plus vectorized per-segment
index picks — no per-key Python. A key whose rows exceed task memory
needs the sketch path instead (stages/sketch.py HLL is the
cardinality analogue; a KLL/t-digest quantile sketch is the drop-in —
same bucket cogroup, mergeable blobs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def per_key_quantiles(ds, key_col: str, val_col: str,
                      qs: dict[str, float], *, num_buckets: int = 16):
    """-> one row per key: ``key_col`` + one column per ``qs`` alias.

    ``qs``: alias -> quantile in (0, 1]. Ties and index arithmetic
    follow SQL ``quantile_disc`` (ascending sort, ``ceil(q·n)-1``).
    """
    from ..functions.hashing import bucket_of

    aliases = list(qs)
    qvals = np.array([qs[a] for a in aliases], np.float64)

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "_bucket": bucket_of(batch[key_col], num_buckets),
            key_col: batch[key_col],
            "v": batch[val_col],
        })

    def pick(group: pa.Table) -> pa.Table:
        keys = group[key_col]
        enc = keys.combine_chunks().dictionary_encode() \
            if isinstance(keys, pa.ChunkedArray) else keys.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = group["v"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((v, codes))
        c_s, v_s = codes[order], v[order]
        seg_start = np.concatenate(([True], c_s[1:] != c_s[:-1]))
        starts = np.flatnonzero(seg_start)
        ends = np.concatenate((starts[1:], [len(c_s)]))
        n = (ends - starts).astype(np.float64)
        cols = {key_col: enc.dictionary.take(
            pa.array(c_s[starts], pa.int64()))}
        for a, q in zip(aliases, qvals):
            idx = starts + np.ceil(q * n).astype(np.int64) - 1
            cols[a] = pa.array(v_s[idx], pa.float64())
        return pa.table(cols)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(pick, batch_format="pyarrow"))
