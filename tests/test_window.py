"""Sessionization (windowed aggregate) vs a sequential oracle."""

import datetime as dt

import numpy as np

import ray.data as rd

from skosconverter_ray.stages.window import sessionize


def _events():
    """3 users, known session structure at gap=3600s."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: two sessions of 2 and 1 events
    for off in (0, 600, 7200):
        rows.append({"user_id": 1, "ts": t0 + dt.timedelta(seconds=off),
                     "value": 1.0})
    # user 2: one long session (each gap < 3600)
    for off in (0, 3000, 6000, 9000):
        rows.append({"user_id": 2, "ts": t0 + dt.timedelta(seconds=off),
                     "value": 2.5})
    # user 3: single event
    rows.append({"user_id": 3, "ts": t0, "value": 0.07})
    return rows


def _oracle(rows, gap_s):
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"])):
        by_user.setdefault(r["user_id"], []).append(r)
    out = {}
    for uid, evs in by_user.items():
        sess, last = 0, None
        for r in evs:
            if last is not None and (r["ts"] - last).total_seconds() > gap_s:
                sess += 1
            key = (uid, sess)
            agg = out.setdefault(key, {"n": 0, "v": 0, "start": r["ts"],
                                       "end": r["ts"]})
            agg["n"] += 1
            agg["v"] += int(r["value"] * 100)
            agg["start"] = min(agg["start"], r["ts"])
            agg["end"] = max(agg["end"], r["ts"])
            last = r["ts"]
    return out


def test_sessionize_matches_oracle(ray_session):
    rows = _events()
    got = sessionize(rd.from_items(rows), gap_s=3600.0,
                     num_buckets=4).take_all()
    want = _oracle(rows, 3600.0)
    assert len(got) == len(want)
    for r in got:
        w = want[(r["user_id"], r["sess"])]
        assert r["n_events"] == w["n"]
        assert r["total_value"] == w["v"] / 100.0
        assert r["session_start"] == w["start"].strftime("%Y-%m-%d %H:%M:%S")
        assert r["session_end"] == w["end"].strftime("%Y-%m-%d %H:%M:%S")


def test_sessionize_bucket_invariance(ray_session):
    """Session structure must not depend on bucket count."""
    rows = _events()
    a = sorted(map(tuple, (sorted(r.items()) for r in
                           sessionize(rd.from_items(rows), gap_s=3600.0,
                                      num_buckets=1).take_all())))
    b = sorted(map(tuple, (sorted(r.items()) for r in
                           sessionize(rd.from_items(rows), gap_s=3600.0,
                                      num_buckets=16).take_all())))
    assert a == b
