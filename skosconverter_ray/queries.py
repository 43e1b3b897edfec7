"""Driver-checkable query registry: one entry per implemented operator
(SURVEY.md §2), each with a DuckDB oracle when SQL-expressible.

Contract: every callable takes ``sf_dir`` and returns a Dataset /
pandas DataFrame / pyarrow Table whose column NAMES match the oracle
SQL exactly. Floats that come out of aggregations are rounded
identically on both sides so the driver's value-hash is stable.

Scale discipline: reads prune columns; joins are either broadcast
(dimension-sized side) or ``Dataset.join`` hash joins; aggregates go
through Ray's combiner-based groupby; nothing materializes the full
input on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

QUERIES = {}
ORACLE_SQL = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round_col(tbl: pa.Table, col: str, ndigits: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, col, pc.round(tbl[col], ndigits=ndigits))


def _to_cents(arr) -> pa.Array:
    """double -> int64 hundredths via trunc. Summing integers
    distributes exactly, so Ray's reduction order can never diverge
    from the SQL oracle; trunc (not round) because Arrow rounds
    half-to-even while DuckDB rounds half-away — trunc is identical on
    identical doubles. SQL side: CAST(trunc(x * 100) AS BIGINT)."""
    return pc.cast(pc.trunc(pc.multiply(arr, pa.scalar(100.0))), pa.int64())


def _collect(ds, schema: pa.Schema) -> pa.Table:
    """Stream a (small, result-sized) Dataset into one Arrow table,
    preserving the schema even when empty."""
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=65536))
    if not batches:
        return schema.empty_table()
    return pa.concat_tables(batches).cast(schema)


def _from_cents(tbl: pa.Table, col: str) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(
        i, col, pc.divide(pc.cast(tbl[col], pa.float64()), pa.scalar(100.0)))


# ---------------------------------------------------------------------------
# Documents: exact dedup (training-data op; engine analogue of U4)
# ---------------------------------------------------------------------------

def _text_hash_batch(batch: pa.Table) -> pa.Table:
    """64-bit blake2b content hash (never Python hash(): salted)."""
    hashes = [
        int.from_bytes(hashlib.blake2b((t or "").encode(), digest_size=8).digest(),
                       "big") >> 1
        for t in batch["text"].to_pylist()
    ]
    return batch.append_column("_h", pa.array(hashes, pa.int64()))


@_q(
    "doc_dedup_exact",
    """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def doc_dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition on content hash, keep first
    (min doc_id) per group. The groupby key is the 64-bit hash, so the
    shuffle moves 16 bytes/row, not the text."""
    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(_text_hash_batch, batch_format="pyarrow")
    out = ds.groupby("_h").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
    return out.select_columns(["doc_id", "n_copies"])


# ---------------------------------------------------------------------------
# Documents: token counting per language (text-analysis op)
# ---------------------------------------------------------------------------

@_q(
    "doc_token_stats",
    """
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT)
             AS total_tokens
    FROM documents GROUP BY lang
    """,
)
def doc_token_stats(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def tokens(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], pattern="[A-Za-z0-9]+")
        return pa.table({"lang": batch["lang"],
                         "tok": pc.cast(n, pa.int64())})

    ds = ds.map_batches(tokens, batch_format="pyarrow")
    return ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("tok", alias_name="total_tokens"))


# ---------------------------------------------------------------------------
# Documents: quality scoring per source (text-analysis op)
# ---------------------------------------------------------------------------

@_q(
    "doc_quality",
    """
    SELECT source,
           count(*) AS n_docs,
           round(avg(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                     / nullif(length(text), 0)), 4) AS alpha_ratio
    FROM documents GROUP BY source
    """,
)
def doc_quality(sf_dir: str):
    from ray.data.aggregate import Count, Mean

    ds = _read(sf_dir, "documents", ["source", "text"])

    def quality(batch: pa.Table) -> pa.Table:
        total = pc.utf8_length(batch["text"])
        stripped = pc.replace_substring_regex(batch["text"], "[^A-Za-z]", "")
        alpha = pc.utf8_length(stripped)
        ratio = pc.divide(
            pc.cast(alpha, pa.float64()),
            pc.cast(pc.if_else(pc.equal(total, 0), pa.scalar(None, pa.int32()),
                               total), pa.float64()),
        )
        return pa.table({"source": batch["source"], "ratio": ratio})

    ds = ds.map_batches(quality, batch_format="pyarrow")
    out = ds.groupby("source").aggregate(
        Count(alias_name="n_docs"), Mean("ratio", alias_name="alpha_ratio"))
    return out.map_batches(lambda t: _round_col(t, "alpha_ratio", 4),
                           batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Lineitem: pricing-summary aggregate (A5/A6-style groupby pivot)
# ---------------------------------------------------------------------------

@_q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(trunc(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_qty,
           CAST(sum(CAST(trunc(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_base,
           CAST(sum(CAST(trunc(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_disc,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(sf_dir: str):
    """Money sums in integer cents so the distributed sum is exact and
    bit-identical to the oracle regardless of reduction order."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def cents(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(batch["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty_c": _to_cents(batch["l_quantity"]),
            "base_c": _to_cents(batch["l_extendedprice"]),
            "disc_c": _to_cents(disc),
        })

    ds = ds.map_batches(cents, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_c", alias_name="sum_qty"),
        Sum("base_c", alias_name="sum_base"),
        Sum("disc_c", alias_name="sum_disc"),
        Count(alias_name="n"),
    )

    def fin(t: pa.Table) -> pa.Table:
        for c in ("sum_qty", "sum_base", "sum_disc"):
            t = _from_cents(t, c)
        return t

    return out.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Lineitem ⋈ orders: top-k by aggregated revenue (join + sort + limit)
# ---------------------------------------------------------------------------

@_q(
    "top_orders_by_revenue",
    """
    SELECT o.o_orderkey, o.o_orderstatus,
           CAST(sum(CAST(trunc(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderstatus
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def top_orders_by_revenue(sf_dir: str):
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(batch: pa.Table) -> pa.Table:
        r = pc.multiply(batch["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "rev": _to_cents(r)})

    # pre-aggregate per order BEFORE the join: the join input shrinks
    # from |lineitem| to |orders| rows (scale discipline: A9-adjacent)
    per_order = (
        li.map_batches(rev, batch_format="pyarrow")
        .groupby("l_orderkey").aggregate(Sum("rev", alias_name="revenue"))
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    joined = per_order.join(orders, join_type="inner", num_partitions=8,
                            on=("l_orderkey",), right_on=("o_orderkey",))

    def fin(t: pa.Table) -> pa.Table:
        t = _from_cents(t, "revenue")
        return t.select(["l_orderkey", "o_orderstatus", "revenue"]).rename_columns(
            ["o_orderkey", "o_orderstatus", "revenue"])

    out = joined.map_batches(fin, batch_format="pyarrow")
    return out.sort(["revenue", "o_orderkey"], descending=[True, False]).limit(10)


# ---------------------------------------------------------------------------
# Events: per-user/day aggregate (streaming-shaped groupby)
# ---------------------------------------------------------------------------

@_q(
    "events_daily",
    """
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
           count(*) AS n_events,
           CAST(sum(CAST(trunc(value * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS total_value
    FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
    """,
)
def events_daily(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def day(batch: pa.Table) -> pa.Table:
        d = pc.strftime(batch["ts"], format="%Y-%m-%d")
        return pa.table({"user_id": batch["user_id"], "day": d,
                         "value": _to_cents(batch["value"])})

    ds = ds.map_batches(day, batch_format="pyarrow")
    out = ds.groupby(["user_id", "day"]).aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="total_value"))
    return out.map_batches(lambda t: _from_cents(t, "total_value"),
                           batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Anti-join: customers with no orders (J3-style orphan detection)
# ---------------------------------------------------------------------------

@_q(
    "customers_without_orders",
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders(sf_dir: str):
    """Anti-join via broadcast key set (guide §Joins: semi/anti =
    broadcast the key set and filter in map_batches). The distinct
    o_custkey set is customer-sized, not orders-sized; at a scale where
    even that won't fit, swap in Dataset.join(left_anti)."""
    import ray
    from ray.data.aggregate import Count

    keys = (
        _read(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey").aggregate(Count(alias_name="_n"))
    )
    keyset = set()
    for b in keys.iter_batches(batch_format="pyarrow", batch_size=65536):
        keyset.update(b["o_custkey"].to_pylist())
    key_ref = ray.put(keyset)

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def drop_known(batch: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        mask = pa.array([k not in ks for k in batch["c_custkey"].to_pylist()])
        return batch.filter(mask)

    out = cust.map_batches(drop_known, batch_format="pyarrow")
    # materialize as Arrow so an empty result keeps its schema (an
    # all-empty Dataset loses column names through to_pandas)
    return _collect(out, pa.schema([("c_custkey", pa.int64())]))


@_q(
    "customers_without_big_orders",
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 150000)
    """,
)
def customers_without_big_orders(sf_dir: str):
    """Filtered anti-join (non-empty at every sf): broadcast the set of
    custkeys having a >150k order, filter customers against it."""
    import ray

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def big(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["o_totalprice"], 150000.0)) \
                    .select(["o_custkey"])

    keys = orders.map_batches(big, batch_format="pyarrow").unique("o_custkey")
    key_ref = ray.put(set(keys))

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def drop_known(batch: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        mask = pa.array([k not in ks for k in batch["c_custkey"].to_pylist()])
        return batch.filter(mask)

    out = cust.map_batches(drop_known, batch_format="pyarrow")
    return _collect(out, pa.schema([("c_custkey", pa.int64())]))


# ---------------------------------------------------------------------------
# Broadcast dimension joins: customer -> nation -> region rollup
# ---------------------------------------------------------------------------

@_q(
    "region_customer_stats",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           count(*) AS n_customers, round(avg(c.c_acctbal), 2) AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def region_customer_stats(sf_dir: str):
    """nation/region are dimension-sized: broadcast dict lookup inside
    map_batches (ray.put once), no shuffle join (guide §Joins)."""
    import ray
    from ray.data.aggregate import Count, Mean

    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rmap = dict(zip(region["r_regionkey"].to_pylist(),
                    region["r_name"].to_pylist()))
    nmap = {
        k: (name, rmap[rk])
        for k, name, rk in zip(nation["n_nationkey"].to_pylist(),
                               nation["n_name"].to_pylist(),
                               nation["n_regionkey"].to_pylist())
    }
    nmap_ref = ray.put(nmap)

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def annotate(batch: pa.Table) -> pa.Table:
        m = ray.get(nmap_ref)
        pairs = [m[k] for k in batch["c_nationkey"].to_pylist()]
        return pa.table({
            "region": pa.array([p[1] for p in pairs], pa.string()),
            "nation": pa.array([p[0] for p in pairs], pa.string()),
            "c_acctbal": batch["c_acctbal"],
        })

    ds = cust.map_batches(annotate, batch_format="pyarrow")
    out = ds.groupby(["region", "nation"]).aggregate(
        Count(alias_name="n_customers"),
        Mean("c_acctbal", alias_name="avg_acctbal"))
    return out.map_batches(lambda t: _round_col(t, "avg_acctbal", 2),
                           batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Embeddings: brute-force cosine top-k ANN (similarity-search op)
# ---------------------------------------------------------------------------

@_q(
    "ann_topk_cosine",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, e.vec_id LIMIT 10
    """,
)
def ann_topk_cosine(sf_dir: str):
    """Brute-force baseline: broadcast the query vector, per-batch
    numpy matmul in float64, global top-k via sort+limit. The IVF/LSH
    scale path lives in stages/similarity.py."""
    import pyarrow.parquet as pq

    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "=", 0)])
    q = np.asarray(qtab["embedding"].to_pylist()[0], dtype=np.float64)
    qn = q / np.linalg.norm(q)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def cos(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mat = np.vstack(
            [np.asarray(v, dtype=np.float64)
             for v in batch["embedding"].to_pylist()])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qn) / norms
        keep = ids != 0
        return pa.table({
            "vec_id": pa.array(ids[keep]),
            "cos_sim": pa.array(np.round(sims[keep], 6), pa.float64()),
        })

    out = ds.map_batches(cos, batch_format="pyarrow")
    return out.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(10)


# ---------------------------------------------------------------------------
# Part: per-type stats (simple groupby over a second table)
# ---------------------------------------------------------------------------

@_q(
    "part_type_stats",
    """
    SELECT p_type, count(*) AS n,
           round(avg(p_retailprice), 2) AS avg_price, max(p_size) AS max_size
    FROM part GROUP BY p_type
    """,
)
def part_type_stats(sf_dir: str):
    from ray.data.aggregate import Count, Max, Mean

    ds = _read(sf_dir, "part", ["p_type", "p_retailprice", "p_size"])
    out = ds.groupby("p_type").aggregate(
        Count(alias_name="n"),
        Mean("p_retailprice", alias_name="avg_price"),
        Max("p_size", alias_name="max_size"))
    return out.map_batches(lambda t: _round_col(t, "avg_price", 2),
                           batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Non-SQL-expressible: flagship KG construction (rows-only check)
# ---------------------------------------------------------------------------

@_q("flagship_graph")
def flagship_graph(sf_dir: str):
    """Docs -> linked mentions -> canonical, inverse-consistent graph.
    Stateful linking + union-find: no SQL oracle (driver rows-only
    check); pytest covers it against sequential oracles."""
    import ray.data as rd

    from . import corpus, vocab
    from .pipelines.flagship import run_flagship

    voc = vocab.generate_vocab(vocab.VocabSpec(n_schemes=2, n_concepts=60, seed=42))
    synthetic = corpus.documents_dataset(300, voc, seed=42, override_num_blocks=8)
    flat = corpus.from_flat_documents(
        _read(sf_dir, "documents", ["doc_id", "text"]))
    out = run_flagship(synthetic.union(flat), voc.triples,
                       preferred_ns="http://example.org/vocab/",
                       concurrency=2, batch_size=512)
    return out["graph"]


# ---------------------------------------------------------------------------
# SKOS render / validate pipelines (rows-only: graph+order semantics
# beyond SQL; conformance is pytest-verified against golden outputs)
# ---------------------------------------------------------------------------

@_q("skos_tree_rows")
def skos_tree_rows(sf_dir: str):
    """Vocabulary triples -> inverse-closed, globally ordered tree_rows
    (the render IR behind the CSV/MD/XML/JSON sinks)."""
    import ray.data as rd

    from . import vocab
    from .pipelines.skos2notion import tree_rows_pipeline

    voc = vocab.generate_vocab(vocab.VocabSpec(n_schemes=3, n_concepts=120,
                                               seed=42))
    return tree_rows_pipeline(rd.from_arrow(voc.triples))


@_q("skos_validate")
def skos_validate(sf_dir: str):
    """Validator suite over the pathology fixture -> issues table."""
    import ray.data as rd

    from . import vocab
    from .stages.validate import validate

    voc = vocab.generate_vocab(vocab.VocabSpec(n_schemes=2, n_concepts=40,
                                               seed=7, pathologies=True))
    return validate(rd.from_arrow(voc.triples))


@_q("markdown_roundtrip")
def markdown_roundtrip(sf_dir: str):
    """vocab -> markdown -> triples (intended to-skos semantics,
    D2/D3-fixed); returns the recovered triple set."""
    import ray.data as rd

    from . import vocab
    from .pipelines.skos2notion import to_markdown
    from .sources.markdown import parse_markdown_dataset

    voc = vocab.generate_vocab(vocab.VocabSpec(n_schemes=2, n_concepts=50,
                                               seed=42))
    md = to_markdown(rd.from_arrow(voc.triples))
    docs = rd.from_items([{"doc_id": "roundtrip", "text": md}])
    return parse_markdown_dataset(docs, "http://example.org/vocab/")
