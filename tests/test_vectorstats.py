"""embedding_dim_stats (stages/vectorstats.py) vs numpy on known data."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.vectorstats import embedding_dim_stats


def test_dim_stats_match_numpy():
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(50, 6)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(50), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(4)
    rows = sorted(embedding_dim_stats(ds).take_all(), key=lambda r: r["dim"])
    m = mat.astype(np.float64)
    assert [r["dim"] for r in rows] == list(range(1, 7))
    for d, r in enumerate(rows):
        assert r["n"] == 50
        # engine rounds mean/std to 6 decimals (oracle-parity convention)
        assert abs(r["mean"] - m[:, d].mean()) < 1e-6
        assert abs(r["std"] - m[:, d].std()) < 1e-6
        assert r["vmin"] == m[:, d].min() and r["vmax"] == m[:, d].max()


def test_dim_stats_partitioning_independent():
    mat = np.arange(12, dtype=np.float32).reshape(4, 3)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in mat], pa.list_(pa.float32())
            ),
        }
    )
    a = sorted(
        embedding_dim_stats(rd.from_arrow(tbl)).take_all(), key=lambda r: r["dim"]
    )
    b = sorted(
        embedding_dim_stats(rd.from_arrow(tbl).repartition(4)).take_all(),
        key=lambda r: r["dim"],
    )
    assert a == b


def test_embedding_covariance_matches_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.stages.vectorstats import embedding_covariance

    rng = np.random.default_rng(3)
    n, d = 120, 6
    mat = rng.normal(size=(n, d)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), pa.float32()), d
                )
            }
        )
    ).repartition(4)
    out = embedding_covariance(ds).to_pandas().sort_values(["i", "j"])
    ref = np.cov(mat.astype(np.float64).T, ddof=1)
    assert len(out) == d * (d + 1) // 2
    for r in out.itertuples(index=False):
        assert r.n == n
        assert abs(r.cov - ref[r.i - 1, r.j - 1]) < 2e-6, (r.i, r.j)


def test_bounded_take_all_over_bound_fails_loudly(ray_session):
    """VERDICT r4 task 8: driver collects declare their bound and fail
    loudly when a widened input exceeds it."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from record_matching_ray.stages.util import bounded_take_all

    ds = rd.from_arrow(pa.table({"x": list(range(100))}))
    assert len(bounded_take_all(ds, 100, "test")) == 100
    with _pytest.raises(RuntimeError, match="declared driver bound"):
        bounded_take_all(ds, 99, "test")
