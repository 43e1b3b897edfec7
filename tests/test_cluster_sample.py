"""Cluster-aware downsampling: ceil(sqrt(size)) survivors per
near-dup cluster, singletons always kept, survivor choice stable under
the multiplicative hash order."""

import math

import pyarrow as pa
import pyarrow.parquet as pq

from skosconverter_ray.queries import doc_cluster_sample

_NINE = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliet kilo lima")
_FOUR = ("mike november oscar papa quebec romeo sierra tango uniform "
         "victor whiskey xray")
_SINGLES = [
    f"solo{i}a solo{i}b solo{i}c solo{i}d solo{i}e solo{i}f solo{i}g "
    f"solo{i}h solo{i}i solo{i}j" for i in range(5)
]


def test_sqrt_quota_per_cluster(ray_session, tmp_path):
    rows = [(i, _NINE) for i in range(9)]
    rows += [(100 + i, _FOUR) for i in range(4)]
    rows += [(200 + i, t) for i, t in enumerate(_SINGLES)]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }), tmp_path / "documents.parquet")

    out = doc_cluster_sample(str(tmp_path)).to_pylist()
    assert len(out) == len(rows)
    by_rep = {}
    for r in out:
        by_rep.setdefault(r["rep_id"], []).append(r)
    sizes = sorted(len(v) for v in by_rep.values())
    assert sizes == [1, 1, 1, 1, 1, 4, 9]
    for rep, members in by_rep.items():
        s = len(members)
        assert all(m["cluster_size"] == s for m in members)
        kept = [m for m in members if m["kept"]]
        assert len(kept) == math.ceil(math.sqrt(s))
        # survivors are the hash-rank minima — recompute the order
        def hv(d):
            return ((abs(d) % 1000003) * 2654435761 % 1000003, d)
        want = sorted((m["doc_id"] for m in members), key=hv)
        want = set(want[:len(kept)])
        assert {m["doc_id"] for m in kept} == want
