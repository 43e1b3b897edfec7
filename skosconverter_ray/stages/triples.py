"""Triple-table core ops: set-semantics dedup (U4) and the
inverse-relation consistency pass (the engine generalization of the
reference's paired emission at skos_converter.py:1540-1541, 1545-1546
and its one-sided-pair validator at 209-238).

All ops are Dataset -> Dataset; the only shuffle is the dedup groupby,
keyed on a single content-hash column so Ray hash-partitions evenly.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import INVERSE_PAIRS, SYMMETRIC_PREDS


_SEP = "\x1f"


def _key_batch(batch: pa.Table) -> pa.Table:
    """Add a composite dedup key column (subj/pred/obj/lang/literal)."""
    lang = batch["lang"].fill_null("") if "lang" in batch.column_names else None
    lit = batch["obj_is_literal"] if "obj_is_literal" in batch.column_names else None
    parts = [batch["subj"], pc.cast(batch["pred"], pa.string()), batch["obj"]]
    if lit is not None:
        parts.append(pc.cast(pc.cast(lit, pa.int8()), pa.string()))
    if lang is not None:
        parts.append(lang)
    key = pc.binary_join_element_wise(*[pc.cast(p, pa.string()) for p in parts], _SEP)
    return batch.append_column("_key", key)


def _first_per_key(t: pa.Table) -> pa.Table:
    """Vectorized 'min source_doc row per _key' (deterministic witness):
    sort by (_key, source_doc), keep each run's head."""
    sort_keys = [("_key", "ascending")]
    if "source_doc" in t.column_names:
        sort_keys.append(("source_doc", "ascending"))
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
    keys = np.asarray(t["_key"].to_pylist(), dtype=object)
    head = np.concatenate(([True], keys[1:] != keys[:-1]))
    return t.filter(pa.array(head))


def dedup_triples(triples_ds, *, num_buckets: int = 64):
    """RDF set semantics: identical triples collapse to one row
    (rdflib ``graph.add`` dedup, SURVEY.md U4); the surviving row's
    ``source_doc`` is the min over duplicates (deterministic witness).

    Two-phase: vectorized per-batch pre-dedup (shrinks the shuffle),
    then ONE groupby over ``crc32(_key) % num_buckets`` cogroups with a
    vectorized per-bucket dedup — O(num_buckets) Python calls, never
    one per distinct triple (a groupby(_key).map_groups costs a Python
    call per group and groups here are almost all singletons)."""

    def local(batch: pa.Table) -> pa.Table:
        t = _first_per_key(_key_batch(batch))
        buckets = pa.array(
            [zlib.crc32(k.encode()) % num_buckets
             for k in t["_key"].to_pylist()], pa.int32())
        return t.append_column("_bucket", buckets)

    keyed = triples_ds.map_batches(local, batch_format="pyarrow")
    out = keyed.groupby("_bucket").map_groups(
        lambda g: _first_per_key(g), batch_format="pyarrow")
    return out.drop_columns(["_key", "_bucket"])


def inverse_consistency(triples_ds):
    """Emit the inverse of every hierarchical edge and the mirror of
    every symmetric edge, then dedup — a one-pass, idempotent closure.

    broader⇔narrower + hasTopConcept⇔topConceptOf per INVERSE_PAIRS;
    related / exactMatch / sameAs mirrored per SYMMETRIC_PREDS. The
    pass is a per-batch flat emission (no shuffle) followed by the
    dedup shuffle.
    """
    inv_map = dict(INVERSE_PAIRS)
    sym = set(SYMMETRIC_PREDS)

    def emit(batch: pa.Table) -> pa.Table:
        preds = batch["pred"]
        mask_inv = pc.is_in(preds, value_set=pa.array(list(inv_map)))
        mask_sym = pc.is_in(preds, value_set=pa.array(list(sym)))
        mask = pc.and_(pc.or_(mask_inv, mask_sym),
                       pc.invert(batch["obj_is_literal"]))
        flipped = batch.filter(mask)
        if flipped.num_rows:
            new_pred = pa.array(
                [inv_map.get(p, p) for p in flipped["pred"].to_pylist()],
                pa.string(),
            )
            flipped = pa.table(
                {
                    "subj": flipped["obj"],
                    "pred": new_pred,
                    "obj": flipped["subj"],
                    "obj_is_literal": flipped["obj_is_literal"],
                    "lang": flipped["lang"],
                    "source_doc": flipped["source_doc"],
                },
                schema=batch.schema,
            )
            return pa.concat_tables([batch, flipped])
        return batch

    return dedup_triples(triples_ds.map_batches(emit, batch_format="pyarrow"))


def triple_counts(triples_ds):
    """Summary counts per predicate (reference's logged summaries,
    skos_converter.py:814-815, 1567-1573) — a small groupby."""
    from ray.data.aggregate import Count

    return triples_ds.groupby("pred").aggregate(Count(alias_name="n"))
