"""Hot-key time-bucketing for ordered windows (functions/window_skew.py):
one user owning half the stream must produce EXACTLY the single-group
plan's results while never being processed as a single group."""

import datetime as dt

import numpy as np
import pyarrow as pa

import ray.data

from text_extraction_ray.functions.window_skew import (
    asof_join_bucketed,
    sessionize_bucketed,
)

HOUR_US = 3_600 * 1_000_000
BASE = dt.datetime(2024, 3, 1)


def _skewed_events() -> pa.Table:
    """User 7 owns ~55% of events spread over many hour-buckets (including
    purchase-free stretches); users 1..20 are cold."""
    rng = np.random.default_rng(42)
    rows = []
    eid = 0
    # hot user: 600 events over 50 hours; purchases only in the first
    # 10 hours — later buckets are click-only and must inherit the carry
    for i in range(600):
        ts = BASE + dt.timedelta(minutes=int(rng.integers(0, 50 * 60)))
        is_purchase = ts < BASE + dt.timedelta(hours=10) and i % 7 == 0
        rows.append((eid, 7, ts,
                     "purchase" if is_purchase else "click",
                     round(float(rng.uniform(1, 100)), 2)))
        eid += 1
    # cold users: ~25 events each
    for u in range(1, 21):
        for _ in range(25):
            ts = BASE + dt.timedelta(minutes=int(rng.integers(0, 50 * 60)))
            rows.append((eid, u, ts,
                         "purchase" if rng.random() < 0.3 else "click",
                         round(float(rng.uniform(1, 100)), 2)))
            eid += 1
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], type=pa.string()),
        "value": pa.array([r[4] for r in rows], type=pa.float64()),
    })


def _ref_sessions(tbl: pa.Table, gap: dt.timedelta) -> dict:
    out = {}
    by_user: dict = {}
    for uid, ts in zip(tbl.column("user_id").to_pylist(),
                       tbl.column("ts").to_pylist()):
        by_user.setdefault(uid, []).append(ts)
    for uid, tss in by_user.items():
        tss.sort()
        n_sessions = 1 + sum(1 for a, b in zip(tss, tss[1:]) if b - a > gap)
        out[uid] = (n_sessions, len(tss))
    return out


def _ref_asof(tbl: pa.Table) -> dict:
    rows = sorted(zip(tbl.column("user_id").to_pylist(),
                      tbl.column("ts").to_pylist(),
                      tbl.column("event_id").to_pylist(),
                      tbl.column("event_type").to_pylist(),
                      tbl.column("value").to_pylist()),
                  key=lambda r: (r[0], r[1], r[2]))
    out = {}
    last: dict = {}
    for uid, ts, eid, et, val in rows:
        if et == "purchase":
            last[uid] = val
        elif et == "click" and uid in last:
            out[eid] = (uid, last[uid])
    return out


def test_sessionize_bucketed_hot_key_exact(ray_session):
    tbl = _skewed_events()
    gap = dt.timedelta(minutes=30)
    got = sessionize_bucketed(
        ray.data.from_arrow(tbl), key_col="user_id", ts_col="ts", gap=gap,
        bucket_us=HOUR_US, sample_rows=10_000, hot_share=0.25,
    ).to_pandas().set_index("user_id")
    want = _ref_sessions(tbl, gap)
    assert len(got) == len(want)
    for uid, (ns, ne) in want.items():
        assert got.loc[uid, "n_sessions"] == ns, uid
        assert got.loc[uid, "n_events"] == ne, uid


def test_sessionize_hot_key_really_bucketed(ray_session):
    """The hot user must be split into many (key, bucket) sub-groups —
    the whole point of the fallback."""
    tbl = _skewed_events()
    from text_extraction_ray.functions.window_skew import (
        _detect_hot,
        _with_time_bucket,
    )

    ds = ray.data.from_arrow(tbl)
    hot = _detect_hot(ds, "user_id", 10_000, 0.25)
    assert hot == {7}
    b = _with_time_bucket(ds, "user_id", "ts", hot, HOUR_US).to_pandas()
    hot_buckets = b[b.user_id == 7]["bucket"].nunique()
    cold_buckets = b[b.user_id != 7]["bucket"].nunique()
    assert hot_buckets > 10          # sub-keyed in time
    assert cold_buckets == 1          # cold keys untouched (bucket 0)


def test_asof_bucketed_hot_key_exact(ray_session):
    tbl = _skewed_events()
    got = asof_join_bucketed(
        ray.data.from_arrow(tbl), key_col="user_id", ts_col="ts",
        id_col="event_id", type_col="event_type", value_col="value",
        left_type="click", right_type="purchase",
        bucket_us=HOUR_US, sample_rows=10_000, hot_share=0.25,
        out_col="last_purchase_value",
    ).to_pandas().set_index("event_id")
    want = _ref_asof(tbl)
    assert len(got) == len(want)
    for eid, (uid, val) in want.items():
        assert got.loc[eid, "user_id"] == uid
        assert got.loc[eid, "last_purchase_value"] == val, eid
    # the scenario genuinely exercises the carry: the hot user has
    # click-only buckets after hour 10 that must inherit earlier carries
    hot_clicks = [eid for eid, (uid, _) in want.items() if uid == 7]
    assert len(hot_clicks) > 300


def test_windows_random_property(ray_session):
    """Property sweep: for random event tables and every (bucket width,
    hot share) combination — including widths that chop streams into many
    tiny buckets and shares that mark everyone/no-one hot — both operators
    must equal the brute-force reference exactly."""
    rng = np.random.default_rng(7)
    gap = dt.timedelta(minutes=30)
    for trial in range(3):
        rows = []
        eid = 0
        n_users = int(rng.integers(3, 10))
        for u in range(n_users):
            n_ev = int(rng.integers(1, 120))
            for _ in range(n_ev):
                ts = BASE + dt.timedelta(
                    seconds=int(rng.integers(0, 3 * 86400)))
                rows.append((eid, u, ts,
                             "purchase" if rng.random() < 0.25 else "click",
                             round(float(rng.uniform(1, 9)), 2)))
                eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
        })
        want_sessions = _ref_sessions(tbl, gap)
        want_asof = _ref_asof(tbl)
        for bucket_us, hot_share in ((HOUR_US, 0.01), (HOUR_US // 4, 0.01),
                                     (86_400 * 1_000_000, 0.2),
                                     (HOUR_US, 2.0)):  # 2.0 = nobody hot
            got_s = sessionize_bucketed(
                ray.data.from_arrow(tbl), "user_id", "ts", gap,
                bucket_us=bucket_us, sample_rows=10_000,
                hot_share=hot_share).to_pandas().set_index("user_id")
            assert len(got_s) == len(want_sessions), (trial, bucket_us)
            for uid, (ns, ne) in want_sessions.items():
                assert got_s.loc[uid, "n_sessions"] == ns, (trial, uid)
                assert got_s.loc[uid, "n_events"] == ne, (trial, uid)
            got_a = asof_join_bucketed(
                ray.data.from_arrow(tbl), key_col="user_id", ts_col="ts",
                id_col="event_id", type_col="event_type",
                value_col="value", left_type="click",
                right_type="purchase", bucket_us=bucket_us,
                sample_rows=10_000, hot_share=hot_share,
            ).to_pandas()
            got_map = dict(zip(got_a["event_id"], got_a["last_value"]))
            assert got_map == {e: v for e, (_u, v) in want_asof.items()}, (
                trial, bucket_us, hot_share)
