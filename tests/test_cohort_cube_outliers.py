"""cohort_retention (stages/temporal.py), orders_cube and
event_value_outliers (pipelines/analytics.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.temporal import cohort_retention

SF = "/root/testdata/sf0.001"


def _events(rows):
    """rows: (user_id, iso_ts)"""
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    np.array([r[1] for r in rows], dtype="datetime64[us]"),
                    pa.timestamp("us"),
                ),
            }
        )
    ).repartition(3)


def test_cohort_retention_known_values():
    rows = [
        # u1 first active Jan, also Feb and Mar
        (1, "2024-01-05"), (1, "2024-02-20"), (1, "2024-03-01"),
        # u2 first active Jan, twice in Jan only (distinct months counted once)
        (2, "2024-01-10"), (2, "2024-01-25"),
        # u3 first active Feb, active Mar
        (3, "2024-02-02"), (3, "2024-03-30"),
    ]
    res = {
        (str(r["cohort_period"])[:7], r["offset_periods"]): r["n_users"]
        for r in cohort_retention(_events(rows), granularity="month").take_all()
    }
    assert res == {
        ("2024-01", 0): 2,
        ("2024-01", 1): 1,
        ("2024-01", 2): 1,
        ("2024-02", 0): 1,
        ("2024-02", 1): 1,
    }


def test_cohort_retention_day_granularity():
    rows = [(1, "2024-01-01T05:00"), (1, "2024-01-03T09:00"), (1, "2024-01-01T23:59")]
    res = {
        r["offset_periods"]: r["n_users"]
        for r in cohort_retention(_events(rows), granularity="day").take_all()
    }
    assert res == {0: 1, 2: 1}


def _con():
    con = duckdb.connect()
    for t in ("orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_orders_cube_matches_oracle():
    from record_matching_ray.pipelines.analytics import ORDERS_CUBE_SQL, orders_cube

    df = orders_cube(SF).to_pandas()
    odf = _con().execute(ORDERS_CUBE_SQL).fetchdf()
    pd.testing.assert_frame_equal(_canon(df), _canon(odf), check_dtype=False)
    # all four grouping sets present
    top = df[(df.o_orderpriority == "ALL") & (df.o_orderstatus == "ALL")]
    assert len(top) == 1 and top.n_orders.iloc[0] == df[
        (df.o_orderpriority != "ALL") & (df.o_orderstatus != "ALL")
    ].n_orders.sum()


def test_event_outliers_match_oracle():
    from record_matching_ray.pipelines.analytics import (
        EVENT_OUTLIERS_SQL,
        event_value_outliers,
    )

    df = event_value_outliers(SF).to_pandas()
    odf = _con().execute(EVENT_OUTLIERS_SQL).fetchdf()
    assert len(df) == len(odf)
    pd.testing.assert_frame_equal(
        _canon(df), _canon(odf), check_dtype=False, atol=1e-9
    )
