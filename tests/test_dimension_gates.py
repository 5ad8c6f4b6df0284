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
