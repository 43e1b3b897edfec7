"""Salted two-phase aggregation — hub-key skew handling (A9).

The north rule calls out hub concepts (scheme roots with millions of
narrower edges / mentions) as the skew hazard: a plain ``groupby(key)``
sends every row of a hot key to ONE reduce task, which then dominates
the stage wall-clock. The classic fix (SURVEY.md §2.5 A9):

1. **salt**: extend the key to ``(key, salt)`` where salt is a
   deterministic per-row value in ``[0, S)`` — here ``row_index % S``
   within each block, which is both deterministic and uniform without
   hashing anything.
2. **partial aggregate** on the salted key: a hot key's rows now fan
   out across S reduce tasks, each producing one partial row.
3. **final aggregate** on the bare key over the (tiny, <= S rows per
   key) partials, with the combining op per aggregate kind
   (sum-of-sums, sum-of-counts, min-of-mins, max-of-maxes).

Only algebraic aggregates compose this way; that covers everything the
engine shuffles at scale (counts, sums in integer cents, min/max).

Ray Data's own groupby does partial combining per block already, but
its reduce of a single key is still single-task; salting bounds the
per-task reduce input for pathological keys regardless of the number
of blocks a hot key spans.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# spec ops -> (partial Ray aggregate, final Ray aggregate)
_ALGEBRAIC = {"sum", "count", "min", "max"}


def salted_aggregate(ds, keys: list[str], specs: list[tuple[str, str, str]],
                     *, salt_buckets: int = 16):
    """``specs`` is ``[(op, col, alias)]`` with op in sum|count|min|max
    (count ignores ``col``). Returns a Dataset grouped by ``keys`` with
    one column per alias — same result as a direct groupby-aggregate,
    but skew-resistant."""
    from ray.data.aggregate import Max, Min, Sum

    from ..config import use_hash_shuffle
    use_hash_shuffle()

    for op, _, _ in specs:
        if op not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate {op!r} cannot be salted")

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = np.arange(batch.num_rows, dtype=np.int32) % salt_buckets
        return batch.append_column("_salt", pa.array(salt, pa.int32()))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")

    partial_aggs, final_aggs = [], []
    for op, col, alias in specs:
        if op == "sum":
            partial_aggs.append(Sum(col, alias_name=alias))
            final_aggs.append(Sum(alias, alias_name=alias))
        elif op == "count":
            # count partials = per-salt-bucket counts summed at final
            from ray.data.aggregate import Count

            partial_aggs.append(Count(alias_name=alias))
            final_aggs.append(Sum(alias, alias_name=alias))
        elif op == "min":
            partial_aggs.append(Min(col, alias_name=alias))
            final_aggs.append(Min(alias, alias_name=alias))
        elif op == "max":
            partial_aggs.append(Max(col, alias_name=alias))
            final_aggs.append(Max(alias, alias_name=alias))

    partial = salted.groupby(keys + ["_salt"]).aggregate(*partial_aggs)
    partial = partial.drop_columns(["_salt"])
    return partial.groupby(keys).aggregate(*final_aggs)
