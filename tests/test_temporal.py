"""Temporal operators: as-of join, tumbling windows, per-group top-k."""

import datetime as dt

import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.temporal import (
    asof_join,
    topk_per_group,
    tumbling_window,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_inclusive():
    left = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "user_id": pa.array([10, 10, 10, 99], pa.int64()),
                "ts": pa.array(
                    [_ts("2024-03-01"), _ts("2024-01-15"), _ts("2024-01-01"),
                     _ts("2024-06-01")],
                    pa.timestamp("us"),
                ),
            }
        )
    ).repartition(2)
    right = rd.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([10, 10, 10], pa.int64()),
                "o_orderdate": pa.array(
                    [_ts("2024-01-01"), _ts("2024-02-01"), _ts("2024-04-01")],
                    pa.timestamp("us"),
                ),
                "o_orderkey": pa.array([100, 200, 300], pa.int64()),
            }
        )
    )
    out = {
        r["event_id"]: r["o_orderkey"]
        for r in asof_join(
            left, right, on="user_id", right_on="o_custkey",
            left_ts="ts", right_ts="o_orderdate",
            right_payload=["o_orderkey"], num_partitions=3,
        ).take_all()
    }
    assert out[1] == 200   # 2024-03-01 -> latest at/before is 02-01
    assert out[2] == 100   # 01-15 -> 01-01
    assert out[3] == 100   # exact boundary (inclusive)
    assert out[4] is None  # key never seen on the right


def test_tumbling_window_hourly():
    events = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(
                    [_ts("2024-01-01T10:15"), _ts("2024-01-01T10:45"),
                     _ts("2024-01-01T11:05"), _ts("2024-01-01T10:59")],
                    pa.timestamp("us"),
                ),
                "event_type": ["a", "a", "a", "b"],
                "value": [1.25, 2.50, 4.00, 8.00],
            }
        )
    ).repartition(2)
    rows = {
        (r["window"], r["event_type"]): r
        for r in tumbling_window(events).take_all()
    }
    k10a = (_ts("2024-01-01T10:00"), "a")
    assert rows[k10a]["cnt"] == 2 and rows[k10a]["sum_value_c"] == 375
    assert rows[(_ts("2024-01-01T11:00"), "a")]["cnt"] == 1
    assert rows[(_ts("2024-01-01T10:00"), "b")]["sum_value_c"] == 800


def test_topk_per_group_exact_with_ties():
    t = pa.table(
        {
            "g": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "v": pa.array([5, 9, 9, 3, 1], pa.int64()),
            "id": pa.array([11, 12, 13, 21, 22], pa.int64()),
        }
    )
    out = topk_per_group(
        rd.from_arrow(t).repartition(3), group_col="g", order_col="v",
        k=2, tie_col="id", keep_cols=["id"],
    ).take_all()
    got = {(r["g"], r["rank"]): (r["id"], r["v"]) for r in out}
    assert got[(1, 1)] == (12, 9)  # tie on v=9 -> lower id first
    assert got[(1, 2)] == (13, 9)
    assert got[(2, 1)] == (21, 3)
    assert got[(2, 2)] == (22, 1)
    assert len(out) == 4


def test_running_total_segments_and_negatives():
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.stages.temporal import running_total

    t = pa.table(
        {
            "o_custkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "o_orderdate": pa.array(
                [3, 1, 2, 5, 5], pa.timestamp("us")
            ),
            "o_orderkey": pa.array([30, 10, 20, 51, 50], pa.int64()),
            "o_totalprice": pa.array([5.0, -2.0, 3.5, 1.0, 2.0], pa.float64()),
        }
    )
    out = {
        r["o_orderkey"]: r["running_cents"]
        for r in running_total(rd.from_arrow(t).repartition(3)).take_all()
    }
    # cust 1 ordered by date: 10 (-200), 20 (+350 -> 150), 30 (+500 -> 650)
    assert out[10] == -200 and out[20] == 150 and out[30] == 650
    # cust 2: same date, orderkey tie-break: 50 first (200), 51 second (300)
    assert out[50] == 200 and out[51] == 300


def test_range_join_window_vs_bruteforce():
    import itertools
    import random

    from record_matching_ray.stages.temporal import range_join

    rng = random.Random(7)
    n = 120
    lrows = [
        (i, rng.choice([1, 2, 3, 99]), _ts("2024-01-01")
         + dt.timedelta(minutes=rng.randrange(0, 600)))
        for i in range(n)
    ]
    rrows = [
        (1000 + i, rng.choice([1, 2, 3, 4]), _ts("2024-01-01")
         + dt.timedelta(minutes=rng.randrange(0, 600)), float(i))
        for i in range(n)
    ]
    left = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in lrows], pa.int64()),
                "user_id": pa.array([r[1] for r in lrows], pa.int64()),
                "ts": pa.array([r[2] for r in lrows], pa.timestamp("us")),
            }
        )
    ).repartition(3)
    right = rd.from_arrow(
        pa.table(
            {
                "rid": pa.array([r[0] for r in rrows], pa.int64()),
                "user_id": pa.array([r[1] for r in rrows], pa.int64()),
                "ts": pa.array([r[2] for r in rrows], pa.timestamp("us")),
                "value": pa.array([r[3] for r in rrows], pa.float64()),
            }
        )
    ).repartition(3)
    lo, hi = -60 * 60 * 1_000_000, 30 * 60 * 1_000_000  # [-1h, +30min]
    for closed in ("both", "left"):
        out = range_join(
            left,
            right,
            on="user_id",
            right_on="user_id",
            left_ts="ts",
            right_ts="ts",
            right_payload=["rid", "value"],
            lo_offset_us=lo,
            hi_offset_us=hi,
            closed=closed,
            num_partitions=4,
        ).take_all()
        got = sorted((r["event_id"], r["rid"]) for r in out)
        want = sorted(
            (l[0], r[0])
            for l, r in itertools.product(lrows, rrows)
            if l[1] == r[1]
            and r[2] >= l[2] + dt.timedelta(microseconds=lo)
            and (
                r[2] <= l[2] + dt.timedelta(microseconds=hi)
                if closed == "both"
                else r[2] < l[2] + dt.timedelta(microseconds=hi)
            )
        )
        assert got == want, closed
        # payload values ride along correctly
        vals = {(r["event_id"], r["rid"]): r["value"] for r in out}
        rv = {r[0]: r[3] for r in rrows}
        assert all(vals[k] == rv[k[1]] for k in vals)


def test_lag_delta_per_key():
    from record_matching_ray.stages.temporal import lag_delta

    t0 = _ts("2024-01-01")
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "user_id": pa.array([7, 7, 7, 8, 8], pa.int64()),
                "ts": pa.array(
                    [
                        t0,
                        t0 + dt.timedelta(seconds=90),
                        t0 + dt.timedelta(seconds=90),  # tie -> event_id order
                        t0,
                        t0 + dt.timedelta(days=1),
                    ],
                    pa.timestamp("us"),
                ),
            }
        )
    ).repartition(2)
    rows = {
        r["event_id"]: r
        for r in lag_delta(
            ds, key_col="user_id", ts_col="ts", tie_col="event_id",
            num_partitions=3,
        ).take_all()
    }
    assert rows[1]["prev_ts"] is None and rows[1]["delta_us"] is None
    assert rows[2]["delta_us"] == 90_000_000
    assert rows[3]["delta_us"] == 0  # tie resolved by event_id
    assert rows[4]["prev_ts"] is None  # new key
    assert rows[5]["delta_us"] == 86_400_000_000


def test_moving_window_sum_vs_bruteforce():
    import random

    from record_matching_ray.stages.temporal import moving_window_sum

    rng = random.Random(11)
    rows = [
        (rng.choice([1, 2, 3]), _ts("2024-01-01")
         + dt.timedelta(days=rng.randrange(60)), i, round(rng.uniform(1, 99), 2))
        for i in range(200)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_orderdate": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "o_orderkey": pa.array([r[2] for r in rows], pa.int64()),
                "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    ).repartition(3)
    w = 5
    got = {
        r["o_orderkey"]: (r["mov_sum_c"], r["win_n"])
        for r in moving_window_sum(ds, window=w, num_partitions=4).take_all()
    }
    for key in (1, 2, 3):
        seg = sorted((r for r in rows if r[0] == key), key=lambda r: (r[1], r[2]))
        cents = [round(r[3] * 100) for r in seg]
        for i, r in enumerate(seg):
            lo = max(0, i - w + 1)
            assert got[r[2]] == (sum(cents[lo : i + 1]), i + 1 - lo)


def test_ntile_per_group_sql_sizing():
    """NTILE sizing matches SQL: first n%k buckets one row larger;
    n<k gives each row its own tile; string keys use stable hashing."""
    from record_matching_ray.stages.temporal import ntile_per_group

    rows = []
    for key, n in (("A", 10), ("B", 7), ("C", 2)):
        for i in range(n):
            rows.append({"key": key, "val": (i * 37) % n, "tie": len(rows)})
    ds = rd.from_items(rows).repartition(3)
    out = ntile_per_group(ds, "key", "val", "tie", n_tiles=4,
                          num_partitions=4).take_all()
    got = {}
    for r in out:
        got.setdefault(r["key"], []).append((r["val"], r["tie"], r["tile"]))
    for key, n in (("A", 10), ("B", 7), ("C", 2)):
        seg = sorted(got[key])
        tiles = [t for _, _, t in seg]
        assert tiles == sorted(tiles), key  # monotone in rank order
        k = 4
        if n < k:
            assert tiles == list(range(1, n + 1))
        else:
            big, n_big = n // k + 1, n % k
            want = []
            for b in range(1, k + 1):
                want += [b] * (big if b <= n_big else n // k)
            assert tiles == want, (key, tiles, want)
        # ranked value rides along
        assert [v for v, _, _ in seg] == sorted(v for v, _, _ in seg)


def test_rank_per_group_sql_tie_semantics():
    """RANK/DENSE_RANK vs a brute-force reference: ties share a rank,
    RANK gaps after ties, DENSE_RANK doesn't; string keys hash stably."""
    from record_matching_ray.stages.temporal import rank_per_group

    rows = []
    vals = {"A": [5, 3, 5, 1, 3, 5], "B": [2, 2, 2], "C": [7]}
    for key, vs in vals.items():
        for v in vs:
            rows.append({"key": key, "val": v, "tie": len(rows)})
    ds = rd.from_items(rows).repartition(3)
    out = rank_per_group(ds, "key", "val", "tie", descending=True,
                         num_partitions=4).take_all()
    assert len(out) == len(rows)
    by_tie = {r["tie"]: r for r in out}
    for key, vs in vals.items():
        desc = sorted(vs, reverse=True)
        for r in (x for x in out if x["key"] == key):
            v = r["val"]
            assert r["rank"] == desc.index(v) + 1, r
            assert r["dense_rank"] == sorted(set(vs), reverse=True).index(v) + 1, r
    # gap after the triple-tie at 5 in A: next distinct value ranks 4
    a3 = [r for r in out if r["key"] == "A" and r["val"] == 3]
    assert all(r["rank"] == 4 and r["dense_rank"] == 2 for r in a3)
    # round-trip identity: every input row present exactly once
    assert set(by_tie) == set(range(len(rows)))


def test_time_range_window_vs_bruteforce():
    import numpy as np

    from record_matching_ray.stages.temporal import time_range_window

    rng = np.random.default_rng(7)
    n = 400
    keys = rng.integers(0, 12, n)
    ts_us = rng.integers(0, 3_600_000_000 * 6, n)  # 6h span
    vals = np.round(rng.uniform(0, 100, n), 2)
    base = dt.datetime(2024, 1, 1)
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "user_id": pa.array(keys, pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(microseconds=int(t)) for t in ts_us],
                    pa.timestamp("us"),
                ),
                "value": pa.array(vals, pa.float64()),
            }
        )
    ).repartition(5)
    w = 3_600_000_000
    out = (
        time_range_window(ds, window_us=w)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    cents = np.round(vals * 1e6).astype(np.int64)
    for r in out.itertuples(index=False):
        i = r.event_id
        # SQL RANGE frame: same key, ts in [ts_i - w, ts_i] inclusive —
        # peers with the exact same ts are in the frame
        mask = (keys == keys[i]) & (ts_us >= ts_us[i] - w) & (ts_us <= ts_us[i])
        assert r.win_n == mask.sum(), i
        assert r.win_sum_c == cents[mask].sum(), i


def test_latest_snapshot_vs_bruteforce_and_partition_invariant():
    import numpy as np

    from record_matching_ray.stages.temporal import latest_snapshot

    rng = np.random.default_rng(11)
    n = 300
    keys = rng.integers(0, 20, n)
    ts_us = rng.integers(0, 1000, n)  # force ts ties so the id tiebreak runs
    base = dt.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(keys, pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(microseconds=int(t)) for t in ts_us],
                pa.timestamp("us"),
            ),
            "event_type": pa.array([f"t{k % 3}" for k in keys], pa.string()),
            "value": pa.array(rng.uniform(0, 10, n), pa.float64()),
        }
    )
    expect = {}
    for i in range(n):
        k = int(keys[i])
        if k not in expect or (ts_us[i], i) > expect[k]:
            expect[k] = (ts_us[i], i)
    for parts in (1, 7):
        out = (
            latest_snapshot(rd.from_arrow(tbl).repartition(parts))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert len(out) == len(expect)
        for r in out.itertuples(index=False):
            assert expect[r.user_id][1] == r.event_id, r.user_id


def test_dist_rank_per_group_sql_semantics():
    """PERCENT_RANK/CUME_DIST tie semantics vs a brute-force window:
    peers share values; single-row partitions get percent_rank 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.stages.temporal import dist_rank_per_group

    rows = [
        ("a", 10, 1), ("a", 10, 2), ("a", 5, 3), ("a", 7, 4),
        ("b", 1, 5),
        ("c", 4, 6), ("c", 4, 7), ("c", 4, 8),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.string()),
                "v": pa.array([r[1] for r in rows], pa.int64()),
                "id": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(3)
    got = {
        r["id"]: (r["percent_rank"], r["cume_dist"])
        for r in dist_rank_per_group(ds, "k", "v", "id", descending=True).take_all()
    }
    # brute force per partition, ORDER BY v DESC
    groups = {}
    for k, v, i in rows:
        groups.setdefault(k, []).append((v, i))
    for k, members in groups.items():
        vals = sorted({v for v, _ in members}, reverse=True)
        n = len(members)
        for v, i in members:
            rank = 1 + sum(1 for w, _ in members if w > v)
            peers_through = sum(1 for w, _ in members if w >= v)
            pr = 0.0 if n == 1 else (rank - 1) / (n - 1)
            assert got[i] == (pr, peers_through / n), (k, i)


def test_scd2_intervals_runs_and_validity():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.stages.temporal import scd2_intervals

    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3_600_000_000, "us")
    rows = [
        # user 1: A A B A  -> 3 runs
        (1, 1, base + 0 * h, "A"),
        (2, 1, base + 1 * h, "A"),
        (3, 1, base + 2 * h, "B"),
        (4, 1, base + 3 * h, "A"),
        # user 2: single state, current forever
        (5, 2, base + 0 * h, "C"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    ).repartition(3)
    out = sorted(
        scd2_intervals(ds).take_all(),
        key=lambda r: (r["user_id"], r["valid_from"]),
    )
    assert len(out) == 4
    r1, r2, r3, r4 = out
    assert (r1["event_type"], r1["n_events"]) == ("A", 2)
    assert np.datetime64(r1["valid_to"], "us") == base + 2 * h
    assert (r2["event_type"], r2["n_events"]) == ("B", 1)
    assert np.datetime64(r2["valid_to"], "us") == base + 3 * h
    assert (r3["event_type"], r3["valid_to"]) == ("A", None)  # current
    assert (r4["user_id"], r4["valid_to"]) == (2, None)
