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


# ---------------------------------------------------------------------------
# rolling_window (trailing time-range aggregate)
# ---------------------------------------------------------------------------

from skosconverter_ray.stages.window import rolling_window  # noqa: E402


def _rolling_oracle(rows, win_s):
    """O(n^2) sequential RANGE-frame oracle (peers included)."""
    out = {}
    for r in rows:
        n = tot = 0
        for o in rows:
            if (o["user_id"] == r["user_id"]
                    and r["ts"] - dt.timedelta(seconds=win_s) <= o["ts"]
                    <= r["ts"]):
                n += 1
                tot += int(o["value"] * 100)
        out[r["event_id"]] = (n, tot / 100.0)
    return out


def _rolling_events():
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: events straddling the window edge, incl. an EXACT-edge
    # pair (3600s apart -> inclusive) and a timestamp TIE (peers)
    for off in (0, 1800, 3600, 3600, 3601, 9000):
        rows.append({"event_id": eid, "user_id": 1,
                     "ts": t0 + dt.timedelta(seconds=off),
                     "value": 1.0 + eid})
        eid += 1
    # user 2: sparse
    for off in (0, 50000):
        rows.append({"event_id": eid, "user_id": 2,
                     "ts": t0 + dt.timedelta(seconds=off),
                     "value": 0.33})
        eid += 1
    return rows


def test_rolling_window_matches_oracle(ray_session):
    rows = _rolling_events()
    got = {r["event_id"]: (r["win_n"], r["win_total"])
           for r in rolling_window(rd.from_items(rows), window_s=3600.0,
                                   num_buckets=4).take_all()}
    want = _rolling_oracle(rows, 3600.0)
    assert got == want
    # ties: the two events at +3600 are peers -> identical frames
    assert got[2] == got[3]


def test_rolling_window_chunked_domain(ray_session):
    """Force the anti-overflow chunking path (3 segments per chunk,
    many users in ONE bucket); results must be identical."""
    rng = np.random.RandomState(5)
    t0 = dt.datetime(2024, 1, 1)
    rows = [{"event_id": i, "user_id": int(rng.randint(0, 12)),
             "ts": t0 + dt.timedelta(seconds=int(rng.randint(0, 20000))),
             "value": float(rng.randint(0, 500)) / 100.0}
            for i in range(300)]
    got = {r["event_id"]: (r["win_n"], r["win_total"])
           for r in rolling_window(rd.from_items(rows), window_s=2000.0,
                                   num_buckets=1,
                                   _max_segs_per_chunk=3).take_all()}
    assert got == _rolling_oracle(rows, 2000.0)


# ---------------------------------------------------------------------------
# row_windows (ROWS-frame family)
# ---------------------------------------------------------------------------

from skosconverter_ray.stages.window import row_windows  # noqa: E402


def test_row_windows_matches_sequential(ray_session):
    rows = _rolling_events()
    got = {r["event_id"]: (r["run_total"], r["winr_total"],
                           r["prev_gap_us"])
           for r in row_windows(rd.from_items(rows), rows_preceding=2,
                                num_buckets=4).take_all()}
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"],
                                         r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rs in by_user.items():
        run = 0
        for i, r in enumerate(rs):
            run += int(r["value"] * 100)
            win = sum(int(x["value"] * 100) for x in rs[max(0, i - 2):i + 1])
            gap = (None if i == 0 else
                   int((r["ts"] - rs[i - 1]["ts"]).total_seconds() * 1e6))
            assert got[r["event_id"]] == (run / 100.0, win / 100.0, gap)


def test_funnel_sessions_ordered_stages(ray_session):
    """Stage order matters: a purchase BEFORE the first view does not
    count; one after a qualifying click does. Sessions split on gap."""
    import ray.data as rd
    import pyarrow as pa
    from skosconverter_ray.stages.window import funnel_sessions

    h = 3_600_000_000  # 1h in us
    rows = [
        # user 1, session 0: view -> click -> purchase (reaches all 3)
        (1, 0 * h, "view"), (1, 1 * h, "click"), (1, 2 * h, "purchase"),
        # user 1, session 1 (gap > 4h): purchase then view (view only)
        (1, 10 * h, "purchase"), (1, 11 * h, "view"),
        # user 2: click before view; view then click counts, no purchase
        (2, 0 * h, "click"), (2, 1 * h, "view"), (2, 2 * h, "click"),
        # user 3: view only
        (3, 0 * h, "view"),
        # user 4: no view at all -> reaches nothing
        (4, 0 * h, "click"), (4, 1 * h, "purchase"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    out = funnel_sessions(rd.from_arrow(t),
                          stages=("view", "click", "purchase"),
                          gap_s=4 * 3600.0, num_buckets=4)
    import collections
    agg = collections.Counter()
    for r in out.take_all():
        agg[r["stage"]] += r["n_sessions"]
    assert agg == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_sessions_random_parity(ray_session):
    """Randomized parity vs a brute per-session Python oracle
    (duplicate timestamps, exact 4h gaps, missing stages)."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from skosconverter_ray.stages.window import funnel_sessions

    rng = np.random.default_rng(31)
    stages = ("view", "click", "purchase")
    types = np.array(["view", "click", "purchase", "error"])
    gap_us = 4 * 3600 * 1_000_000

    for trial in range(3):
        n = int(rng.integers(50, 400))
        users = rng.integers(0, 12, size=n)
        # coarse grid => duplicate ts and exact-gap boundaries occur
        ts = rng.integers(0, 40, size=n) * (gap_us // 2)
        et = types[rng.integers(0, len(types), size=n)]

        # brute oracle
        per_user = collections.defaultdict(list)
        for u, t, e in zip(users, ts, et):
            per_user[u].append((t, e))
        want = collections.Counter()
        for u, evs in per_user.items():
            evs.sort()
            sessions, cur = [], [evs[0]]
            for prev, nxt in zip(evs, evs[1:]):
                if nxt[0] - prev[0] > gap_us:
                    sessions.append(cur)
                    cur = []
                cur.append(nxt)
            sessions.append(cur)
            for s in sessions:
                thr = -1
                for k, st in enumerate(stages):
                    hits = [t for t, e in s if e == st and t >= thr]
                    if not hits:
                        break
                    thr = min(hits)
                    want[st] += 1

        t = pa.table({
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(et, pa.string()),
        })
        out = funnel_sessions(rd.from_arrow(t), stages=stages,
                              gap_s=4 * 3600.0, num_buckets=4)
        got = collections.Counter()
        for r in out.take_all():
            got[r["stage"]] += r["n_sessions"]
        got = {k: v for k, v in got.items() if v}
        assert got == {k: v for k, v in want.items() if v}, f"trial {trial}"
