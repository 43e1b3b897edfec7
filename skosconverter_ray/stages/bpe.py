"""Distributed BPE-merge training (Sennrich et al. 2016, arXiv
1508.07909) — the classic tokenizer-trainer shape, Ray-Data-first.

Reference parity note: the reference CLI has no tokenizer; this is one
of the LLM-training-data operators the graft adds beyond it (SURVEY
§2.9b). The trainer follows the textbook algorithm exactly so a naive
sequential replay is a bit-exact oracle.

The 100-TB shape:

1. **One corpus pass + one exchange**: per-batch word counting
   (vectorized regex extract + np.unique) feeds the engine's
   bucket-aggregate; the corpus text is never touched again. The
   distinct-word table is DIMENSION-sized relative to the corpus
   (Heaps' law) and is the only thing the loop holds.
2. **M broadcast-merge passes, zero exchanges**: each iteration maps
   once over the word table emitting (pair, weighted count) partials
   whose key space is the set of distinct ADJACENT symbol pairs —
   bounded by the live vocabulary, folded on the driver (the same
   dimension assumption as kmeans centroids / PCA moments). The argmax
   pair (count desc, pair asc — deterministic) is broadcast and each
   word's symbol sequence is rewritten vectorized; the vectors of
   symbols never leave their blocks.

Merging is exact left-to-right: within a run of consecutive candidate
positions (only possible for self-pairs like ``(a, a)`` in ``aaa``),
even offsets win — identical to the sequential scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SEP = "\x1f"  # never appears in [a-z]+ words


def _flatten_words(batch: pa.Table):
    """(syms list<string>, cnt) batch -> flat numpy views."""
    col = batch["syms"]
    # list_flatten/list_value_length respect slice offsets (raw
    # .values/.offsets on a sliced ListArray do not)
    values = np.asarray(pc.list_flatten(col).to_pylist(), dtype=object)
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    word_of = np.repeat(np.arange(batch.num_rows), lengths)
    cnt = batch["cnt"].to_numpy(zero_copy_only=False)
    return values, word_of, lengths, cnt


def _pair_keys(syms: np.ndarray, word_of: np.ndarray):
    """Adjacent within-word pair keys 'a<SEP>b' + their positions."""
    if len(syms) < 2:
        return np.array([], object), np.array([], np.int64)
    same = word_of[:-1] == word_of[1:]
    pos = np.flatnonzero(same)
    keys = syms[pos] + _SEP + syms[pos + 1]  # object-array elementwise
    return keys, pos


def count_pairs_batch(batch: pa.Table) -> pa.Table:
    """Weighted adjacent-pair partial counts for one word-table batch."""
    syms, word_of, _lengths, cnt = _flatten_words(batch)
    keys, pos = _pair_keys(syms, word_of)
    if len(keys) == 0:
        return pa.table({"pair": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    uniq, inv = np.unique(keys, return_inverse=True)
    w = np.bincount(inv, weights=cnt[word_of[pos]].astype(np.float64))
    return pa.table({"pair": pa.array(uniq.tolist(), pa.string()),
                     "cnt": pa.array(w.astype(np.int64), pa.int64())})


def apply_merge_batch(batch: pa.Table, a: str, b: str) -> pa.Table:
    """Rewrite every occurrence of adjacent (a, b) to a+b, exact
    left-to-right overlap resolution, fully vectorized."""
    syms, word_of, lengths, _cnt = _flatten_words(batch)
    out_schema = pa.schema([("syms", pa.list_(pa.string())),
                            ("cnt", pa.int64())])
    if len(syms) >= 2:
        same = word_of[:-1] == word_of[1:]
        cand = same & (syms[:-1] == a) & (syms[1:] == b)
        idx = np.flatnonzero(cand)
    else:
        idx = np.array([], np.int64)
    if len(idx):
        run_start = np.r_[True, np.diff(idx) != 1]
        run_id = np.cumsum(run_start) - 1
        offset = idx - idx[run_start][run_id]
        sel = idx[offset % 2 == 0]
        keep = np.ones(len(syms), bool)
        keep[sel + 1] = False
        syms = syms.copy()
        syms[sel] = a + b
        merged_per_word = np.bincount(word_of[sel],
                                      minlength=batch.num_rows)
        syms = syms[keep]
        lengths = lengths - merged_per_word
    new_offsets = np.concatenate([[0], np.cumsum(lengths)])
    lst = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()),
        pa.array(syms.tolist(), pa.string()))
    return pa.table({"syms": lst, "cnt": batch["cnt"]}, schema=out_schema)


def words_to_symbol_table(word_counts_ds):
    """(word, cnt) Dataset -> (syms: list<string>, cnt) Dataset."""
    def split(batch: pa.Table) -> pa.Table:
        words = batch["word"].to_pylist()
        offs = np.concatenate([[0], np.cumsum([len(w) for w in words])])
        vals = pa.array([c for w in words for c in w], pa.string())
        lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), vals)
        return pa.table({"syms": lst,
                         "cnt": pc.cast(batch["cnt"], pa.int64())})

    return word_counts_ds.map_batches(split, batch_format="pyarrow")


def bpe_train(word_counts_ds, *, n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, cnt) Dataset.

    Returns the ordered merge list; stops early when no adjacent pair
    is left. Driver memory: one (pair -> count) dict per iteration,
    bounded by the live distinct-adjacent-pair vocabulary.

    Iteration runs as raw task waves over the word table's block refs
    (the same justification as the Pregel shard actors: an iterated
    broadcast-map with a driver scalar fold pays Ray Data's fixed
    per-execution latency twice per merge, ~0.5 s each, while a task
    wave is milliseconds). Each wave fuses "apply previous merge" and
    "count this round's pairs" into ONE pass per block; blocks never
    transit the driver — only the small pair-count partials do.
    """
    import ray

    tbl = words_to_symbol_table(word_counts_ds).materialize()
    refs = tbl.to_arrow_refs()

    word_schema = pa.schema([("syms", pa.list_(pa.string())),
                             ("cnt", pa.int64())])

    @ray.remote(num_returns=2)
    def step(block: pa.Table, a: str | None, b: str | None):
        # upstream groupbys can leave schema-less EMPTY blocks in a
        # materialized dataset — normalize them
        if block.num_rows == 0 or "syms" not in block.column_names:
            block = word_schema.empty_table()
        elif a is not None:
            block = apply_merge_batch(block, a, b)
        return block, count_pairs_batch(block)

    merges: list[tuple[str, str]] = []
    a = b = None
    for _ in range(n_merges):
        outs = [step.remote(r, a, b) for r in refs]
        refs = [o[0] for o in outs]
        counts: dict[str, int] = {}
        for ct in ray.get([o[1] for o in outs]):
            for k, v in zip(ct["pair"].to_pylist(),
                            ct["cnt"].to_pylist()):
                counts[k] = counts.get(k, 0) + v
        if not counts:
            break
        best = min(counts, key=lambda k: (-counts[k], k))
        a, b = best.split(_SEP)
        merges.append((a, b))
    return merges


def bpe_train_sequential(word_counts: dict[str, int],
                         n_merges: int) -> list[tuple[str, str]]:
    """Naive in-memory BPE trainer (independent implementation, plain
    dict/loop) with identical semantics — the parity oracle."""
    words = {w: list(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


class BpeEncoder:
    """Actor-pool encode stage: the trained merge table loads ONCE per
    actor (``__init__``), batches stream through ``__call__``.

    Encoding applies merges in rank order greedily (lowest-rank
    adjacent pair first — the standard BPE encode, matching what
    training produced for in-vocabulary words). Per-batch work is
    word-level: each DISTINCT word in the batch is encoded once
    (np.unique + a per-actor LRU-ish dict cache), counts map back via
    the unique inverse — Zipf makes distinct-per-batch tiny relative
    to positions."""

    def __init__(self, merges: list[tuple[str, str]]):
        self._ranks = {tuple(m): r for r, m in enumerate(merges)}
        self._cache: dict[str, int] = {}

    def _n_tokens(self, word: str) -> int:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        syms = list(word)
        ranks = self._ranks
        while len(syms) > 1:
            # lowest-rank pair present, then merge ALL its occurrences
            # left-to-right (standard BPE encode — one occurrence at a
            # time diverges when the merge enables a lower-rank pair)
            best_r, best = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_r, best = r, (syms[i], syms[i + 1])
            if best_r is None:
                break
            a, b = best
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        n = len(syms)
        if len(self._cache) < 1_000_000:  # bound per-actor memory
            self._cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        d = (df.with_columns(
            pl.col("text").str.to_lowercase()
              .str.extract_all(r"[a-z]+").alias("word"))
            .drop("text").explode("word")
            .filter(pl.col("word").is_not_null()))
        doc = d["doc_id"].to_numpy()
        words = d["word"].to_numpy()
        out_schema = pa.schema([("doc_id", pa.int64()),
                                ("n_words", pa.int64()),
                                ("n_subtokens", pa.int64())])
        if len(words) == 0:
            return out_schema.empty_table()
        uniq, inv = np.unique(words, return_inverse=True)
        per_uniq = np.array([self._n_tokens(w) for w in uniq], np.int64)
        toks = per_uniq[inv]
        uid, dinv = np.unique(doc, return_inverse=True)
        return pa.table({
            "doc_id": pa.array(uid, pa.int64()),
            "n_words": pa.array(np.bincount(dinv), pa.int64()),
            "n_subtokens": pa.array(
                np.bincount(dinv, weights=toks).astype(np.int64),
                pa.int64()),
        }, schema=out_schema)


def encode_word_sequential(word: str,
                           merges: list[tuple[str, str]]) -> list[str]:
    """Independent naive encode (scan per merge in rank order) — the
    parity oracle for BpeEncoder."""
    syms = list(word)
    changed = True
    while changed and len(syms) > 1:
        # find the lowest-rank pair present, then merge ALL its
        # occurrences left-to-right (equivalent to repeated single
        # lowest-rank merges because merging (a,b) can only create
        # pairs involving a+b, never a new earlier-rank (a,b))
        changed = False
        for a, b in merges:
            i, out = 0, []
            hit = False
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                    hit = True
                else:
                    out.append(syms[i])
                    i += 1
            if hit:
                syms = out
                changed = True
                break
    return syms
