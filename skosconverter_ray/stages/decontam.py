"""Benchmark decontamination: score every corpus document by how many
of its word n-grams also occur in a benchmark/eval document set (the
GPT-3/PaLM-style n-gram overlap check used to keep eval data out of
training corpora). Output is one row per corpus document that has at
least one n-gram: ``(id, n_hits, n_grams)`` where ``n_hits`` counts the
document's DISTINCT n-grams that appear anywhere in the benchmark set
and ``n_grams`` its distinct n-gram total — the caller picks the
contamination threshold (``n_hits > 0``, or a fraction).

Two physical plans behind one exact semantics:

- **broadcast** (distinct benchmark gram count ≤ ``broadcast_limit``):
  the benchmark's sorted gram-hash array ships ONCE via ``ray.put``;
  the corpus pass counts per-doc overlap with a vectorized
  ``searchsorted`` — zero shuffles. This is the realistic 100-TB shape:
  benchmarks are MBs, corpora are TBs.
- **distributed** (above the limit): corpus docs flat-map to
  ``(id, gram, n_grams)`` rows, one bucket-cogroup LEFT OUTER join
  marks benchmark grams, one bucket aggregate folds per-doc counts.
  Every gram row moves once; nothing is collected on the driver.

Gram hashes are the same 64-bit shingle hashes the dedup stages use
(stages/dedup.shingle_sets_batch); collision probability per gram pair
is ~2^-64 — the documented engine-wide discipline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EMPTY_U64 = np.empty(0, dtype=np.uint64)


def _doc_gram_sets(batch: pa.Table, text_col: str, n: int):
    """Per-doc distinct gram hashes + flat/len views for the batch."""
    from .dedup import shingle_sets_batch

    sets = shingle_sets_batch(batch[text_col].to_pylist(), n=n)
    lens = np.fromiter((s.size for s in sets), np.int64, count=len(sets))
    flat = np.concatenate(sets) if sets else _EMPTY_U64
    return flat.astype(np.uint64, copy=False), lens


def decontaminate(corpus_ds, bench_ds, *, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 8,
                  broadcast_limit: int = 4_000_000,
                  num_buckets: int = 16,
                  id_type: pa.DataType | None = None):
    """(id, n_hits, n_grams) per corpus doc with ≥1 distinct n-gram."""
    import ray

    from .joinutil import cogroup_join
    from .skew import bucket_aggregate

    # benchmark grams, per-batch distinct, pinned once (the fallback
    # plan must not re-execute the benchmark lineage)
    def bench_grams(batch: pa.Table) -> pa.Table:
        flat, _ = _doc_gram_sets(batch, text_col, n)
        return pa.table({"g": np.unique(flat)})

    bg_ds = bench_ds.map_batches(bench_grams,
                                 batch_format="pyarrow").materialize()

    # adaptive gate on the per-batch-distinct count (an upper bound on
    # the true distinct count, so it can only demote to the safe plan)
    if bg_ds.count() <= broadcast_limit:
        parts = [b["g"].to_numpy(zero_copy_only=False)
                 for b in bg_ds.iter_batches(batch_format="pyarrow",
                                             batch_size=1 << 20)]
        bg = np.unique(np.concatenate(parts)) if parts else _EMPTY_U64
        ref = ray.put(bg)

        def score(batch: pa.Table, _ref=ref) -> pa.Table:
            bgl = ray.get(_ref)
            flat, lens = _doc_gram_sets(batch, text_col, n)
            hit = np.zeros(flat.size, dtype=np.int64)
            if bgl.size and flat.size:
                idx = np.searchsorted(bgl, flat)
                inb = idx < bgl.size
                hit[inb] = (bgl[idx[inb]] == flat[inb]).astype(np.int64)
            csum = np.concatenate(([0], np.cumsum(hit)))
            ends = np.cumsum(lens)
            n_hits = csum[ends] - csum[ends - lens]
            keep = lens > 0
            ids = batch[id_col].combine_chunks() \
                if isinstance(batch[id_col], pa.ChunkedArray) \
                else batch[id_col]
            return pa.table({id_col: ids.filter(pa.array(keep)),
                             "n_hits": n_hits[keep],
                             "n_grams": lens[keep]})

        return corpus_ds.map_batches(score, batch_format="pyarrow")

    # distributed plan: grams as rows, one outer join + one aggregate.
    # The cogroup join needs an explicit left schema (lazy .schema()
    # re-executes upstream), so the id type must be declared: take it
    # from the caller, else from the corpus dataset (cheap for a
    # read_parquet root — metadata only; pass id_type explicitly when
    # corpus_ds has mapped lineage). String and int ids both work.
    if id_type is None:
        sch = corpus_ds.schema()  # ray.data.Schema: .names / .types
        id_type = sch.types[sch.names.index(id_col)]

    def gram_rows(batch: pa.Table, _t=id_type) -> pa.Table:
        flat, lens = _doc_gram_sets(batch, text_col, n)
        ids = batch[id_col].combine_chunks() \
            if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col]
        rep = pa.array(np.repeat(np.arange(len(ids)), lens), pa.int64())
        return pa.table({
            id_col: pc.cast(ids.take(rep), _t),
            "g": flat,
            "n_grams": np.repeat(lens, lens),
        })

    flat_ds = corpus_ds.map_batches(gram_rows, batch_format="pyarrow")
    # global-distinct benchmark grams with a match marker (LEFT OUTER
    # against a non-distinct side would duplicate corpus gram rows)
    bg_distinct = bucket_aggregate(
        bg_ds, ["g"], [("count", None, "_c")],
        num_buckets=max(4, num_buckets // 2),
    ).map_batches(
        lambda b: pa.table({"g": b["g"],
                            "hit": np.ones(b.num_rows, np.int64)}),
        batch_format="pyarrow")

    gram_schema = pa.schema([(id_col, id_type), ("g", pa.uint64()),
                             ("n_grams", pa.int64())])
    bg_schema = pa.schema([("g", pa.uint64()), ("hit", pa.int64())])
    joined = cogroup_join(flat_ds, bg_distinct, left_on="g", right_on="g",
                          join_type="left outer", num_buckets=num_buckets,
                          left_schema=gram_schema, right_schema=bg_schema)
    agg = bucket_aggregate(joined, [id_col],
                           [("sum", "hit", "n_hits"),
                            ("max", "n_grams", "n_grams")],
                           num_buckets=num_buckets)
    return agg.map_batches(
        lambda b: pa.table({id_col: b[id_col],
                            "n_hits": pc.coalesce(
                                pc.cast(b["n_hits"], pa.int64()),
                                pa.scalar(0, pa.int64())),
                            "n_grams": b["n_grams"]}),
        batch_format="pyarrow")
