"""Unicode-normalization dedup: composed/decomposed accents and case
variants must collapse to one canonical doc; distinct texts must not.
Also pins Arrow/DuckDB agreement on the normalize+lower composition
for the cases the operator targets."""

import pyarrow as pa
import pyarrow.parquet as pq

from skosconverter_ray.queries import doc_normalize_dedup

_ROWS = [
    (0, "Café culture"),          # é composed (U+00E9)
    (1, "Café culture"),         # e + combining acute
    (2, "CAFÉ CULTURE"),          # case variant, composed
    (3, "cafe culture"),               # plain ascii — different text
    (4, "straße walk"),           # ß stays ß under lower()
    (5, "STRASSE WALK"),               # ss — NOT the same as ß
    (6, "unrelated document"),
]


def test_nfc_casefold_groups(ray_session, tmp_path):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in _ROWS], pa.int64()),
        "text": pa.array([r[1] for r in _ROWS], pa.string()),
    }), tmp_path / "documents.parquet")

    got = {r["doc_id"]: r["canonical_id"]
           for r in doc_normalize_dedup(str(tmp_path)).to_pylist()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 6}


def test_engine_matches_duckdb_on_unicode(ray_session, tmp_path):
    import duckdb

    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in _ROWS], pa.int64()),
        "text": pa.array([r[1] for r in _ROWS], pa.string()),
    }), tmp_path / "documents.parquet")
    mine = sorted((r["doc_id"], r["canonical_id"])
                  for r in doc_normalize_dedup(str(tmp_path)).to_pylist())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')")
    theirs = sorted(tuple(r) for r in con.sql(
        "WITH n AS (SELECT doc_id, lower(nfc_normalize(text)) AS norm "
        "FROM documents) SELECT doc_id, min(doc_id) OVER "
        "(PARTITION BY norm) FROM n").fetchall())
    assert mine == theirs
