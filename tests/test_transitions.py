"""Markov transition counts: per-user ordering (ts, then event_id for
ties), no cross-user pairs, and counts aggregated across buckets."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from skosconverter_ray.queries import events_transition_matrix

_T0 = dt.datetime(2026, 1, 1)


def _ev(eid, ts_s, uid, typ):
    return (eid, _T0 + dt.timedelta(seconds=ts_s), uid, typ)


def test_transitions_order_ties_and_user_isolation(ray_session, tmp_path):
    rows = [
        # user 1: a -> b -> c (same ts for b,c: event_id breaks the tie)
        _ev(1, 0, 1, "a"), _ev(2, 10, 1, "b"), _ev(3, 10, 1, "c"),
        # user 2: a -> b only; user 2's last must not pair with user 3
        _ev(4, 0, 2, "a"), _ev(5, 5, 2, "b"),
        _ev(6, 1, 3, "a"), _ev(7, 2, 3, "b"),
        # singleton user: contributes nothing
        _ev(8, 0, 4, "z"),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
    }), tmp_path / "events.parquet")

    got = {(r["event_type"], r["next_type"]): r["n"]
           for r in events_transition_matrix(str(tmp_path)).to_pylist()}
    assert got == {("a", "b"): 3, ("b", "c"): 1}
