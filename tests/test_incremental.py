"""Incremental-ingest fingerprint store: cross-run dedup semantics."""

import ray.data as rd

from skosconverter_ray.stages.incremental import (ingest_round,
                                                  load_store)


def _docs(texts, start=0):
    return rd.from_items([{"doc_id": start + i, "text": t}
                          for i, t in enumerate(texts)])


def test_ingest_rounds(ray_session, tmp_path):
    store = str(tmp_path / "fps")

    # round 1: everything is new (one in-batch duplicate text still
    # passes the CROSS-run filter; in-run dedup is a separate op)
    r1 = ingest_round(_docs(["alpha doc", "beta doc", "alpha doc"]),
                      store)
    assert r1.count() == 3
    assert len(load_store(store)) == 2          # distinct hashes stored

    # round 2: one repeat from round 1, one genuinely new
    r2 = ingest_round(_docs(["beta doc", "gamma doc"], start=10), store)
    rows = r2.take_all()
    assert [r["text"] for r in rows] == ["gamma doc"]
    assert len(load_store(store)) == 3

    # round 3: full replay of everything seen -> zero survivors
    r3 = ingest_round(_docs(["alpha doc", "beta doc", "gamma doc"],
                            start=20), store)
    assert r3.count() == 0
    assert len(load_store(store)) == 3


def test_empty_store_and_crash_idempotence(ray_session, tmp_path):
    store = str(tmp_path / "fps")
    assert len(load_store(store)) == 0
    ingest_round(_docs(["x y z"]), store)
    # simulate a crashed re-run appending an overlapping shard
    ingest_round(_docs(["x y z"]), store)
    assert len(load_store(store)) == 1          # unique across shards


def test_store_algo_mismatch_refused(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from skosconverter_ray.stages.incremental import (
        StoreAlgoMismatch, load_store)

    # a shard stamped by a different hash implementation must be
    # refused loudly, never silently merged (ADVICE r02: a polars
    # upgrade would otherwise re-admit every ingested document)
    t = pa.table({"h": pa.array([1, 2, 3], pa.int64())})
    pq.write_table(
        t.replace_schema_metadata({b"skos_fp_algo": b"polars-ahash-0.0.1"}),
        str(tmp_path / "shard-old.parquet"))
    with pytest.raises(StoreAlgoMismatch, match="rebuild the store"):
        load_store(str(tmp_path))
    # unstamped legacy shards are refused too
    pq.write_table(t, str(tmp_path / "shard-old.parquet"))
    with pytest.raises(StoreAlgoMismatch, match="unstamped"):
        load_store(str(tmp_path))
