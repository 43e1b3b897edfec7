"""Broadcast interval (range) join — a non-equi join operator Ray Data
lacks natively.

``interval_join`` matches each row of a corpus-sized Dataset against a
dimension-sized table of ``[lo, hi)`` intervals that MAY OVERLAP (a row
matches every covering interval — true join semantics, not binning).

Scale shape: the interval table is preprocessed ONCE on the driver into
an elementary-segment index (sorted unique endpoints + CSR
segment→interval-ids arrays, O(K log K) build, ≤ 2K segments) and
broadcast via ``ray.put``; each batch then does ONE ``np.searchsorted``
against the endpoint array plus a repeat/take gather — O(B log K +
matches) per batch, zero shuffles on the big side. This is the
"broadcast small side, compose inside map_batches" recipe (SURVEY.md
§2 custom-operator rule (a)); the interval table being driver-sized is
the documented partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class IntervalIndex:
    """Elementary-segment decomposition of possibly-overlapping
    ``[lo, hi)`` intervals.

    ``bounds``: sorted unique endpoints. Segment ``i`` spans
    ``[bounds[i], bounds[i+1])``; ``seg_off``/``seg_ids`` form a CSR
    listing of the interval ids covering each segment.
    """

    def __init__(self, lo: np.ndarray, hi: np.ndarray):
        lo = np.asarray(lo, np.float64)
        hi = np.asarray(hi, np.float64)
        if np.any(hi <= lo):
            raise ValueError("empty interval (hi <= lo)")
        self.bounds = np.unique(np.concatenate([lo, hi]))
        n_seg = len(self.bounds) - 1
        seg_lists: list[list[int]] = [[] for _ in range(n_seg)]
        starts = np.searchsorted(self.bounds, lo, side="left")
        ends = np.searchsorted(self.bounds, hi, side="left")
        for iv, (s, e) in enumerate(zip(starts, ends)):
            for seg in range(s, e):
                seg_lists[seg].append(iv)
        counts = np.array([len(x) for x in seg_lists], np.int64)
        self.seg_off = np.concatenate(([0], np.cumsum(counts)))
        self.seg_ids = np.array(
            [i for lst in seg_lists for i in lst], np.int64)

    def probe(self, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """values -> (row_idx, interval_id) match pairs (vectorized)."""
        v = np.asarray(values, np.float64)
        seg = np.searchsorted(self.bounds, v, side="right") - 1
        inside = (seg >= 0) & (seg < len(self.bounds) - 1)
        seg_in = seg[inside]
        rows_in = np.flatnonzero(inside)
        n_match = self.seg_off[seg_in + 1] - self.seg_off[seg_in]
        row_idx = np.repeat(rows_in, n_match)
        # gather CSR slices: offsets expanded via cumulative trick
        total = int(n_match.sum())
        if total == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        flat_start = np.repeat(self.seg_off[seg_in], n_match)
        within = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(n_match)[:-1])), n_match)
        ids = self.seg_ids[flat_start + within]
        return row_idx, ids


def interval_join(ds, intervals: pa.Table, *, on: str,
                  lo_col: str = "lo", hi_col: str = "hi"):
    """Dataset ⋈ intervals on ``intervals.lo <= ds[on] < intervals.hi``.

    Output = input columns + the interval table's payload columns
    (everything except lo/hi), one row per (row, covering interval).
    """
    import ray

    idx = IntervalIndex(
        intervals[lo_col].to_numpy(zero_copy_only=False),
        intervals[hi_col].to_numpy(zero_copy_only=False))
    payload = intervals.drop_columns([lo_col, hi_col])
    ref = ray.put((idx, payload))

    def join_batch(batch: pa.Table, _ref=ref) -> pa.Table:
        index, pay = ray.get(_ref)
        v = batch[on].to_numpy(zero_copy_only=False)
        row_idx, ids = index.probe(v)
        left = batch.take(pa.array(row_idx, pa.int64()))
        right = pay.take(pa.array(ids, pa.int64()))
        for name in right.column_names:
            left = left.append_column(name, right[name])
        return left

    return ds.map_batches(join_batch, batch_format="pyarrow")


def overlap_join(ds, intervals: pa.Table, *, start_col: str,
                 end_col: str, lo_col: str = "lo", hi_col: str = "hi"):
    """Interval-overlap join: row [start, end] (closed) matches every
    broadcast interval [lo, hi) with ``start < hi AND end >= lo``.

    The broadcast side is dimension-sized (campaign windows, promo
    periods): per batch the match is K vectorized comparisons —
    O(K·B), no shuffle on the big side. For corpus-sized interval
    tables on BOTH sides the shape changes to a time-bucketed cogroup
    (split each interval across the coarse time buckets it spans) —
    out of scope for this helper, documented here as the scale path.
    """
    import ray

    lo = intervals[lo_col].to_numpy(zero_copy_only=False)
    hi = intervals[hi_col].to_numpy(zero_copy_only=False)
    payload = intervals.drop_columns([lo_col, hi_col])
    ref = ray.put((lo, hi, payload))

    def join_batch(batch: pa.Table, _ref=ref) -> pa.Table:
        ilo, ihi, pay = ray.get(_ref)
        s = batch[start_col].to_numpy(zero_copy_only=False)
        e = batch[end_col].to_numpy(zero_copy_only=False)
        rows, ids = [], []
        for k in range(len(ilo)):
            m = (s < ihi[k]) & (e >= ilo[k])
            hit = np.flatnonzero(m)
            rows.append(hit)
            ids.append(np.full(len(hit), k, np.int64))
        row_idx = np.concatenate(rows) if rows else np.empty(0, np.int64)
        id_idx = np.concatenate(ids) if ids else np.empty(0, np.int64)
        left = batch.take(pa.array(row_idx, pa.int64()))
        right = pay.take(pa.array(id_idx, pa.int64()))
        for name in right.column_names:
            left = left.append_column(name, right[name])
        return left

    return ds.map_batches(join_batch, batch_format="pyarrow")
