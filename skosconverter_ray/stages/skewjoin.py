"""Skew-aware join: hot keys broadcast, cold keys cogroup.

A hash join dies on skew: every row of a hot key lands in one reduce
task. This operator measures the left side's key distribution with the
mergeable Misra-Gries sketch (stages/sketch.frequent_items — one cheap
map + a tiny merge, never a full groupby), then routes:

- **hot keys** (estimated count ≥ ``hot_min_est``): the RIGHT side's
  matching rows broadcast once via ``ray.put`` and the join happens
  map-side inside ``map_batches`` — a hot key's rows never meet in one
  task, so the hottest key costs the same as any other;
- **cold keys**: the normal bucket-cogroup hash join
  (stages/joinutil.cogroup_join).

The output is the exact inner join either way (routing only changes
the physical plan), so the operator is oracle-checkable against plain
SQL. Partitioning assumption, documented: the right side's hot-key
rows must fit on the driver/object store (true whenever the right side
is dimension-sized or hot keys are few — the skew case by definition).
The left side is consumed THREE times (sketch pass + hot pass + cold
pass), so it is materialized up front (pinned blocks, object-store
fetches per pass) — re-running a lazy upstream three times would both
waste compute and, for any non-deterministic upstream, split rows
inconsistently between the hot and cold passes (ADVICE r02)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def skew_aware_join(left_ds, right_ds, *, left_on: str, right_on: str,
                    left_schema: pa.Schema, right_schema: pa.Schema,
                    hot_min_est: int = 50_000, hot_capacity: int = 256,
                    num_buckets: int = 32):
    """Inner join with MG-sketch hot-key routing. Column sets must be
    disjoint apart from the keys (cogroup_join's contract)."""
    import ray

    from .joinutil import cogroup_join
    from .sketch import frequent_items

    # pin the left side ONCE: three consumers below (sketch, hot,
    # cold) read the same blocks instead of re-executing lineage
    left_ds = left_ds.materialize()
    n_left = left_ds.count()

    # 1. measure the left key distribution. Small materialized left
    # (≤4M rows): exact per-batch value_counts folded on the driver —
    # zero exchanges, strictly better estimates than the sketch. Big
    # left: the mergeable MG sketch (one map + tiny merge exchange).
    hot_vals = []
    if n_left <= 4_000_000:
        parts = []
        for b in left_ds.select_columns([left_on]).iter_batches(
                batch_format="pyarrow", batch_size=262_144):
            vc = pc.value_counts(b[left_on].combine_chunks())
            parts.append(pa.table({"item": vc.field("values"),
                                   "c": vc.field("counts")}))
        if parts:
            tot = pa.concat_tables(parts).group_by("item") \
                .aggregate([("c", "sum")])
            hot_vals = tot.filter(
                pc.greater_equal(tot["c_sum"], hot_min_est)
            )["item"].to_pylist()
    else:
        est = frequent_items(left_ds.select_columns([left_on]), left_on,
                             capacity=hot_capacity,
                             num_buckets=max(4, num_buckets // 4))
        for b in est.iter_batches(batch_format="pyarrow",
                                  batch_size=4096):
            keep = pc.greater_equal(b["est"], hot_min_est)
            hot_vals.extend(b.filter(keep)["item"].to_pylist())

    # size the cold-pass exchange to the data actually flowing: tiny
    # inputs drown in per-bucket dispatch at the default width
    num_buckets = max(4, min(num_buckets, n_left // 2000 + 1))

    key_type = left_schema.field(left_on).type
    hot_arr = pa.array(hot_vals, key_type)

    # 2. split the right side once (materialized: consumed twice)
    right_ds = right_ds.materialize()
    if len(hot_arr):
        hot_right = pa.concat_tables(
            b.filter(pc.is_in(b[right_on], value_set=hot_arr))
            for b in right_ds.iter_batches(batch_format="pyarrow",
                                           batch_size=65536))
        hot_ref = ray.put((hot_arr, hot_right))
    else:
        hot_ref = None

    cold_right = right_ds.map_batches(
        lambda b, _h=hot_arr: b.filter(
            pc.invert(pc.is_in(b[right_on], value_set=_h)))
        if len(_h) else b,
        batch_format="pyarrow")

    # 3. hot pass: map-side broadcast join on the left stream
    out_parts = []
    if hot_ref is not None:
        def hot_join(batch: pa.Table, _ref=hot_ref) -> pa.Table:
            keys, rtab = ray.get(_ref)
            lcol = batch[left_on].combine_chunks() \
                if isinstance(batch[left_on], pa.ChunkedArray) \
                else batch[left_on]
            lhot = batch.filter(pc.is_in(lcol, value_set=keys))
            if lhot.num_rows == 0 or rtab.num_rows == 0:
                fields = list(left_schema) + [
                    f for f in right_schema if f.name != right_on]
                return pa.schema(fields).empty_table()
            return lhot.join(rtab, keys=[left_on],
                             right_keys=[right_on], join_type="inner")

        out_parts.append(left_ds.map_batches(hot_join,
                                             batch_format="pyarrow"))

    # 4. cold pass: classic cogroup hash join on the rest
    cold_left = left_ds.map_batches(
        lambda b, _h=hot_arr: b.filter(
            pc.invert(pc.is_in(b[left_on], value_set=_h)))
        if len(_h) else b,
        batch_format="pyarrow")
    # cogroup_join echoes the right key column (when distinctly named);
    # the hot-path pa.Table.join merges it into the left key — align by
    # dropping the echo. With same-named keys there is no echo to drop.
    cold = cogroup_join(
        cold_left, cold_right, left_on=left_on, right_on=right_on,
        num_buckets=num_buckets, left_schema=left_schema,
        right_schema=right_schema)
    if right_on != left_on:
        cold = cold.drop_columns([right_on])
    out_parts.append(cold)

    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out
