"""Distributed Lloyd k-means + SemDeDup vs in-process numpy references:
the distributed partial-sum path must be EXACTLY the single-machine
algorithm (integer-scaled sums make the reduction order-independent),
and results must be partition-count invariant."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.kmeans import (
    SCALE,
    kmeans_fit,
    kmeans_fit_predict,
    semdedup,
)

K, ITERS, DIM, N = 4, 3, 8, 120


def _mk(seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((K, DIM)) * 2
    x = (
        centers[rng.randint(0, K, N)] + rng.standard_normal((N, DIM)) * 0.3
    ).astype(np.float32)
    # a few exact near-dups for semdedup
    x[10] = x[11] = x[12]
    x[50] = x[51]
    return x


def _ref_kmeans(x64: np.ndarray):
    cents = x64[:K].copy()
    for _ in range(ITERS):
        acc = np.zeros((N, K))
        for d in range(DIM):
            diff = x64[:, d, None] - cents[None, :, d]
            acc += diff * diff
        assign = np.argmin(acc, axis=1)
        xi = np.floor(x64 * SCALE).astype(np.int64)
        new = cents.copy()
        for c in range(K):
            m = assign == c
            if m.any():
                new[c] = (xi[m].sum(axis=0).astype(np.float64) / SCALE) / m.sum()
        cents = new
    return cents


def _ds(x, nparts):
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(N), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(x.ravel(), pa.float32()), DIM
            ),
        }
    )
    return rd.from_arrow(t).repartition(nparts)


def test_kmeans_matches_reference_and_partition_invariant():
    x = _mk()
    want = _ref_kmeans(x.astype(np.float64))
    for nparts in (1, 5):
        got = kmeans_fit(_ds(x, nparts), K, ITERS, DIM)
        assert np.array_equal(got, want), nparts  # bit-exact, not allclose


def test_kmeans_predict_assigns_nearest():
    x = _mk()
    out, cents = kmeans_fit_predict(_ds(x, 3), K, ITERS, DIM)
    df = out.to_pandas().sort_values("vec_id")
    x64 = x.astype(np.float64)
    d = ((x64[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assert (df["cluster"].values == np.argmin(d, axis=1)).all()
    assert np.allclose(df["dist"].values, np.round(d.min(axis=1), 6))


def test_semdedup_finds_planted_duplicates():
    x = _mk()
    res = semdedup(_ds(x, 3), K, ITERS, DIM, threshold=0.999).to_pandas()
    keep = dict(zip(res["vec_id"], res["keep_id"]))
    assert keep[11] == 10 and keep[12] == 10 and keep[51] == 50
    # non-dups keep themselves
    assert keep[0] == 0
    # dup components never span k-means clusters
    cl = dict(zip(res["vec_id"], res["cluster"]))
    for v, kk in keep.items():
        assert cl[v] == cl[kk]


def test_kmeans_silhouette_vs_numpy(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    rng = np.random.default_rng(6)
    # three well-separated blobs -> high silhouette
    centers = np.array([[5.0, 0, 0, 0], [0, 5.0, 0, 0], [0, 0, 5.0, 0]])
    X = np.vstack([c + rng.normal(0, 0.3, (40, 4)) for c in centers])
    ids = np.arange(len(X))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(X.astype(np.float32).ravel(), pa.float32()), 4
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    from record_matching_ray.stages.kmeans import (
        kmeans_fit,
        kmeans_silhouette,
        _seq_dists,
    )

    embs = rd.read_parquet(str(tmp_path / "embeddings.parquet"))
    got = kmeans_silhouette(embs, k=3, iters=6, dim=4).to_pandas()
    # numpy reference with the same centroids
    cents = kmeans_fit(embs, 3, 6, 4)
    d = _seq_dists(X.astype(np.float32).astype(np.float64), cents)
    own = np.argmin(d, axis=1)
    a = np.sqrt(d[np.arange(len(X)), own])
    d2 = d.copy()
    d2[np.arange(len(X)), own] = np.inf
    b = np.sqrt(d2.min(axis=1))
    s = (b - a) / np.maximum(a, b)
    for _, row in got.iterrows():
        mask = own == row["cluster"]
        assert row["n"] == mask.sum()
        assert abs(row["mean_silhouette"] - round(float(s[mask].mean()), 6)) <= 2e-6
    # separated blobs should score high
    assert (got["mean_silhouette"] > 0.7).all()
