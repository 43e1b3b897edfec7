"""Task-level exchange primitives: scatter_apply_by_value and
cogroup_scatter edge cases (empty buckets, schema-less empties,
zero-block inputs, int vs string keys)."""

import pyarrow as pa
import ray.data as rd

from skosconverter_ray.stages.shardutil import (cogroup_scatter,
                                                scatter_apply_by_value)


def test_scatter_groups_every_row_once(ray_session):
    t = pa.table({"_bucket": pa.array([i % 5 for i in range(1000)],
                                      pa.int32()),
                  "v": pa.array(range(1000), pa.int64())})
    ds = rd.from_arrow(t).repartition(7).materialize()

    # NOTE: fn must be a closure/lambda (pickled by value) — a test-
    # module-level function pickles by reference and Ray workers
    # cannot import test modules
    def count_per_bucket(tbl: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([tbl.num_rows], pa.int64())})

    out = scatter_apply_by_value(ds, "_bucket", 5, count_per_bucket)
    assert sorted(r["n"] for r in out.take_all()) == [200] * 5


def test_scatter_empty_bucket_calls_fn_with_schema(ray_session):
    t = pa.table({"_bucket": pa.array([0, 0, 2], pa.int32()),
                  "v": pa.array([1, 2, 3], pa.int64())})
    ds = rd.from_arrow(t).materialize()

    def fn(tbl: pa.Table) -> pa.Table:
        assert tbl.column_names == ["_bucket", "v"]  # schema-carrying
        return pa.table({"n": pa.array([tbl.num_rows], pa.int64())})

    out = scatter_apply_by_value(ds, "_bucket", 4, fn)
    assert sorted(r["n"] for r in out.take_all()) == [0, 0, 1, 2]


def test_scatter_empty_result_shortcut(ray_session):
    t = pa.table({"_bucket": pa.array([1], pa.int32()),
                  "v": pa.array([7], pa.int64())})
    ds = rd.from_arrow(t).materialize()
    empty = pa.schema([("x", pa.string())]).empty_table()

    def fn(tbl):
        return pa.table({"x": pa.array(["hit"] * tbl.num_rows)})

    out = scatter_apply_by_value(ds, "_bucket", 3, fn, empty_result=empty)
    rows = out.take_all()
    assert [r["x"] for r in rows] == ["hit"]


def test_cogroup_scatter_int_keys_joins_all_rows(ray_session):
    left = pa.table({"k": pa.array(range(100), pa.int64()),
                     "a": pa.array(range(100), pa.int64())})
    right = pa.table({"rk": pa.array([i for i in range(0, 100, 2)],
                                     pa.int64()),
                      "b": pa.array([i * 10 for i in range(0, 100, 2)],
                                    pa.int64())})
    lds = rd.from_arrow(left).repartition(4).materialize()
    rds = rd.from_arrow(right).repartition(3).materialize()
    out_schema = pa.schema([("k", pa.int64()), ("b", pa.int64())])

    def fn(a, b):
        if a is None or b is None:
            return out_schema.empty_table()
        return a.join(b, keys=["k"], right_keys=["rk"],
                      join_type="inner").select(["k", "b"]) \
            .cast(out_schema)

    out = cogroup_scatter(lds, "k", rds, "rk", 6, fn,
                          empty_result=out_schema.empty_table())
    rows = sorted((r["k"], r["b"]) for r in out.take_all())
    assert rows == [(i, i * 10) for i in range(0, 100, 2)]


def test_cogroup_scatter_string_keys(ray_session):
    left = pa.table({"k": pa.array([f"u{i}" for i in range(30)])})
    right = pa.table({"rk": pa.array([f"u{i}" for i in range(0, 30, 3)]),
                      "b": pa.array(list(range(0, 30, 3)), pa.int64())})
    out_schema = pa.schema([("k", pa.string()), ("b", pa.int64())])

    def fn(a, b):
        if a is None or b is None:
            return out_schema.empty_table()
        return a.join(b, keys=["k"], right_keys=["rk"],
                      join_type="inner").cast(out_schema)

    out = cogroup_scatter(rd.from_arrow(left).materialize(), "k",
                          rd.from_arrow(right).materialize(), "rk",
                          4, fn, empty_result=out_schema.empty_table())
    rows = sorted((r["k"], r["b"]) for r in out.take_all())
    assert rows == sorted((f"u{i}", i) for i in range(0, 30, 3))


def test_multiway_cogroup_scatter_three_sides(ray_session):
    """One exchange co-partitions ANY number of sides on a shared
    key; fn sees one table (or None) per side per bucket. Result
    must equal the sequential two-join composition."""
    from skosconverter_ray.stages.shardutil import \
        multiway_cogroup_scatter

    base = pa.table({"k": pa.array(list(range(40)), pa.int64())})
    evens = pa.table({"ek": pa.array(list(range(0, 40, 2)), pa.int64())})
    vals = pa.table({"vk": pa.array(list(range(0, 40, 5)), pa.int64()),
                     "v": pa.array([i * 7 for i in range(0, 40, 5)],
                                   pa.int64())})
    out_schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])

    def fn(b, e, v):
        import pyarrow.compute as pc

        if b is None or e is None or v is None:
            return out_schema.empty_table()
        t = b.filter(pc.is_in(b["k"],
                              value_set=e["ek"].combine_chunks()))
        return t.join(v, keys=["k"], right_keys=["vk"],
                      join_type="inner").cast(out_schema)

    out = multiway_cogroup_scatter(
        [(rd.from_arrow(base).repartition(3).materialize(), "k"),
         (rd.from_arrow(evens).repartition(2).materialize(), "ek"),
         (rd.from_arrow(vals).materialize(), "vk")],
        5, fn, empty_result=out_schema.empty_table())
    rows = sorted((r["k"], r["v"]) for r in out.take_all())
    assert rows == [(i, i * 7) for i in range(0, 40, 10)]
