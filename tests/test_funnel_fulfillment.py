"""funnel_steps (stages/temporal.py) and order_fulfillment left-outer
tagged union (pipelines/analytics.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.temporal import funnel_steps


def _events(rows):
    """rows: (user_id, ts_us, event_type)"""
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    np.array([r[1] for r in rows], dtype="datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    ).repartition(3)


def test_funnel_order_matters():
    rows = [
        # u1: full funnel in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2: purchase BEFORE click -> stops at 2 (view, click)
        (2, 10, "view"), (2, 15, "purchase"), (2, 20, "click"),
        # u3: click only, never viewed -> 0
        (3, 10, "click"), (3, 20, "click"),
        # u4: view then purchase, no click -> 1
        (4, 10, "view"), (4, 30, "purchase"),
        # u5: no funnel event types at all -> absent
        (5, 10, "error"),
    ]
    res = {
        r["user_id"]: r["steps_completed"]
        for r in funnel_steps(_events(rows)).take_all()
    }
    assert res == {1: 3, 2: 2, 3: 0, 4: 1}


def test_funnel_strictly_after():
    # click at the SAME timestamp as the first view does not count;
    # a later click does
    rows = [
        (1, 10, "view"), (1, 10, "click"),
        (2, 10, "view"), (2, 10, "click"), (2, 11, "click"),
    ]
    res = {
        r["user_id"]: r["steps_completed"]
        for r in funnel_steps(_events(rows)).take_all()
    }
    assert res == {1: 1, 2: 2}


def test_funnel_earliest_step1_is_used():
    # u1 views at t=10 and t=100; click at t=50 counts (after EARLIEST view)
    rows = [(1, 100, "view"), (1, 10, "view"), (1, 50, "click")]
    res = funnel_steps(_events(rows)).take_all()
    assert res[0]["steps_completed"] == 2


def test_order_fulfillment_keeps_lineless_orders():
    from record_matching_ray.pipelines.analytics import (
        ORDER_FULFILLMENT_SQL,
        order_fulfillment,
    )

    sf = "/root/testdata/sf0.001"
    df = (
        order_fulfillment(sf)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    odf = (
        con.execute(ORDER_FULFILLMENT_SQL)
        .fetchdf()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(df, odf, check_dtype=False)
    # the left-outer shape is actually exercised: some orders have no
    # shipped lines at this cutoff but are still present
    assert (df["n_shipped_lines"] == 0).any()
