"""VERDICT r3 items 1-2: the two inventory queries that loaded a whole
dimension table to driver pandas are now count-gated with a distributed
hash-join fallback. Both plans must agree with each other and with the
DuckDB oracle (the test_q5.py pattern: broadcast_max_rows=0 forces the
fallback on the same input)."""

import duckdb
import pandas as pd
import pytest

from record_matching_ray.pipelines.analytics import (
    NATION_PRIORITY_MODE_SQL,
    SUPPLIER_FULL_COVERAGE_SQL,
    nation_priority_mode,
    supplier_full_coverage,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem".split():
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("gate", [2_000_000, 0])
def test_supplier_full_coverage_both_plans_match_oracle(con, gate, ray_session):
    want = con.execute(SUPPLIER_FULL_COVERAGE_SQL).fetchdf()
    got = supplier_full_coverage(SF, broadcast_max_rows=gate).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


@pytest.mark.parametrize("gate", [2_000_000, 0])
def test_nation_priority_mode_both_plans_match_oracle(con, gate, ray_session):
    want = con.execute(NATION_PRIORITY_MODE_SQL).fetchdf()
    got = nation_priority_mode(SF, broadcast_max_rows=gate).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


@pytest.mark.parametrize("gate", [2_000_000, 0])
def test_q7_both_plans_match_oracle(con, gate, ray_session):
    from record_matching_ray.pipelines.analytics import Q7_SQL, q7_nation_volume

    want = con.execute(Q7_SQL).fetchdf()
    got = q7_nation_volume(SF, broadcast_max_rows=gate).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


@pytest.mark.parametrize("gate", [2_000_000, 0])
def test_nation_price_slope_both_plans_match_oracle(con, gate, ray_session):
    from record_matching_ray.pipelines.analytics import (
        NATION_PRICE_SLOPE_SQL,
        nation_price_slope,
    )

    want = con.execute(NATION_PRICE_SLOPE_SQL).fetchdf()
    got = nation_price_slope(SF, broadcast_max_rows=gate).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_q7_drops_rows_missing_dimension_key(tmp_path, ray_session):
    """ADVICE r4: a fact row referencing a missing dimension key must DROP
    (inner-join semantics, matching the SQL oracle) — not raise."""
    import shutil

    import duckdb as ddb
    import pyarrow.parquet as pq

    from record_matching_ray.pipelines.analytics import Q7_SQL, q7_nation_volume

    d = tmp_path / "sf"
    d.mkdir()
    for t in "region nation customer supplier part orders lineitem".split():
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    # drop half the suppliers: lineitem now references missing s_suppkey
    supp = pq.read_table(d / "supplier.parquet")
    pq.write_table(supp.slice(0, max(1, supp.num_rows // 2)),
                   d / "supplier.parquet")
    c = ddb.connect()
    for t in "nation customer supplier orders lineitem".split():
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    want = c.execute(Q7_SQL).fetchdf()
    got = q7_nation_volume(str(d)).to_pandas()
    assert len(got) > 0
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)
