"""TPC-H Q5-style local_supplier_volume: broadcast and join plans agree
with each other and with a DuckDB oracle on generated tables."""

import duckdb
import pandas as pd
import pytest

from record_matching_ray.pipelines.analytics import (
    LOCAL_SUPPLIER_VOLUME_SQL,
    local_supplier_volume,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in "region nation customer supplier orders lineitem".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(LOCAL_SUPPLIER_VOLUME_SQL).fetchdf()


def test_q5_broadcast_plan_matches_oracle(oracle):
    df = local_supplier_volume(SF).to_pandas()
    pd.testing.assert_frame_equal(
        df.reset_index(drop=True), oracle.reset_index(drop=True), check_dtype=False
    )


def test_q5_join_plan_matches_broadcast(oracle):
    df = local_supplier_volume(SF, force_join=True).to_pandas()
    pd.testing.assert_frame_equal(
        df.reset_index(drop=True), oracle.reset_index(drop=True), check_dtype=False
    )
