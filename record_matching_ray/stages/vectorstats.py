"""Per-dimension profiling of an embedding column.

The vector-QA primitive for embedding pipelines (dead dimensions,
scale drift, outlier coordinates): for every dimension d of a
``list<float>`` column, its count / mean / population std / min / max.

Ray shape (100 TB-safe): one stateless ``map_batches`` turns each batch
into DIMENSION-bounded moment rows (dim, n, s, s2, mn, mx) — a 64-dim
batch of any row count contributes exactly 64 rows — and one tiny
groupby(dim) merges them. Nothing but O(dims x batches) rows shuffle.
Moments merge associatively, so the result is partitioning-independent;
std uses the explicit-moment formula sqrt(max(s2/n - (s/n)^2, 0)),
mirrored verbatim by the DuckDB oracle so both sides share one
expression tree (summation order is the only difference, ~1e-15).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.stages.knn import _emb_matrix
from record_matching_ray.stages.util import conformed

_MOM_SCHEMA = pa.schema(
    [
        ("dim", pa.int64()),
        ("n", pa.int64()),
        ("s", pa.float64()),
        ("s2", pa.float64()),
        ("mn", pa.float64()),
        ("mx", pa.float64()),
    ]
)
OUT_SCHEMA = pa.schema(
    [
        ("dim", pa.int64()),
        ("n", pa.int64()),
        ("mean", pa.float64()),
        ("std", pa.float64()),
        ("vmin", pa.float64()),
        ("vmax", pa.float64()),
    ]
)


def embedding_dim_stats(
    embs: ray.data.Dataset, emb_col: str = "embedding"
) -> ray.data.Dataset:
    """(dim, n, mean, std, vmin, vmax) per embedding dimension; ``dim``
    is 1-based (matching SQL's generate_subscripts)."""

    def partial(t: pa.Table) -> pa.Table:
        mat = _emb_matrix(t.column(emb_col))
        if mat.size == 0:
            return _MOM_SCHEMA.empty_table()
        d = mat.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64), pa.int64()),
                "n": pa.array(np.full(d, mat.shape[0], dtype=np.int64), pa.int64()),
                "s": pa.array(mat.sum(axis=0), pa.float64()),
                "s2": pa.array((mat * mat).sum(axis=0), pa.float64()),
                "mn": pa.array(mat.min(axis=0), pa.float64()),
                "mx": pa.array(mat.max(axis=0), pa.float64()),
            }
        )

    mom = (
        conformed(embs.map_batches(partial, batch_format="pyarrow"), _MOM_SCHEMA)
        .groupby("dim")
        .aggregate(
            ray.data.aggregate.Sum("n"),
            ray.data.aggregate.Sum("s"),
            ray.data.aggregate.Sum("s2"),
            ray.data.aggregate.Min("mn"),
            ray.data.aggregate.Max("mx"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(n)" not in t.column_names:
            return OUT_SCHEMA.empty_table()
        n = t.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("sum(s)").to_numpy(zero_copy_only=False)
        s2 = t.column("sum(s2)").to_numpy(zero_copy_only=False)
        mean = np.round(s / n, 6)  # round-6 output convention: the
        # sum-of-squares reduction order drifts vs SQL in the last ulp
        std = np.round(np.sqrt(np.maximum(s2 / n - (s / n) * (s / n), 0.0)), 6)
        return pa.table(
            {
                "dim": t.column("dim"),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "mean": pa.array(mean, pa.float64()),
                "std": pa.array(std, pa.float64()),
                "vmin": t.column("min(mn)"),
                "vmax": t.column("max(mx)"),
            }
        )

    return conformed(mom.map_batches(finish, batch_format="pyarrow"), OUT_SCHEMA)


__all__ = ["embedding_dim_stats", "embedding_covariance"]


_COV_PART = pa.schema(
    [
        ("pk", pa.int64()),
        ("i", pa.int64()),
        ("j", pa.int64()),
        ("n", pa.int64()),
        ("si", pa.float64()),
        ("sj", pa.float64()),
        ("sij", pa.float64()),
    ]
)
COV_SCHEMA = pa.schema(
    [
        ("i", pa.int64()),
        ("j", pa.int64()),
        ("n", pa.int64()),
        ("cov", pa.float64()),
    ]
)


def embedding_covariance(
    embs: ray.data.Dataset, emb_col: str = "embedding"
) -> ray.data.Dataset:
    """Upper-triangle sample covariance matrix of an embedding column —
    the one-pass sufficient-statistics primitive behind PCA/whitening/
    drift detection at corpus scale.

    Ray shape (100 TB-safe): each batch contributes exactly
    d*(d+1)/2 moment rows (i, j, n, sum_i, sum_j, sum_ij) computed by ONE
    ``X.T @ X`` matmul — the shuffle is bounded by the dimension, never
    the row count — then a single int-key groupby merges partials and the
    finish pass applies the explicit sample-covariance formula
    (sij - si*sj/n) / (n-1), rounded to 6 decimals; the DuckDB oracle
    evaluates the same expression tree. ``i``/``j`` are 1-based (SQL's
    generate_subscripts convention), i <= j."""

    def partial(t: pa.Table) -> pa.Table:
        mat = _emb_matrix(t.column(emb_col))
        if mat.size == 0:
            return _COV_PART.empty_table()
        n, d = mat.shape
        iu, ju = np.triu_indices(d)
        xtx = mat.T @ mat
        s = mat.sum(axis=0)
        return pa.table(
            {
                "pk": pa.array(iu * np.int64(d) + ju, pa.int64()),
                "i": pa.array(iu + 1, pa.int64()),
                "j": pa.array(ju + 1, pa.int64()),
                "n": pa.array(np.full(len(iu), n, dtype=np.int64), pa.int64()),
                "si": pa.array(s[iu], pa.float64()),
                "sj": pa.array(s[ju], pa.float64()),
                "sij": pa.array(xtx[iu, ju], pa.float64()),
            }
        )

    acc = (
        conformed(embs.map_batches(partial, batch_format="pyarrow"), _COV_PART)
        .groupby("pk")
        .aggregate(
            ray.data.aggregate.Min("i"),
            ray.data.aggregate.Min("j"),
            ray.data.aggregate.Sum("n"),
            ray.data.aggregate.Sum("si"),
            ray.data.aggregate.Sum("sj"),
            ray.data.aggregate.Sum("sij"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(n)" not in t.column_names:
            return COV_SCHEMA.empty_table()
        n = t.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.float64)
        si = t.column("sum(si)").to_numpy(zero_copy_only=False)
        sj = t.column("sum(sj)").to_numpy(zero_copy_only=False)
        sij = t.column("sum(sij)").to_numpy(zero_copy_only=False)
        cov = np.round((sij - si * sj / n) / (n - 1.0), 6)
        return pa.table(
            {
                "i": t.column("min(i)"),
                "j": t.column("min(j)"),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "cov": pa.array(cov, pa.float64()),
            }
        )

    return conformed(acc.map_batches(finish, batch_format="pyarrow"), COV_SCHEMA)


# ---------------------------------------------------------------------------
# PCA over the covariance sufficient statistics: the projection /
# whitening step behind embedding compression and drift monitoring.


def pca_fit(
    embs: ray.data.Dataset, k: int, emb_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k principal components from ONE streaming covariance pass
    (embedding_covariance — shuffle bounded by d(d+1)/2 moment rows,
    never row count); the d x d eigendecomposition runs on the driver
    (d is an embedding dimension, trivially driver-sized). Deterministic
    sign convention: each component's largest-|entry| coordinate is
    positive. Returns (components [k, d] row-major, eigvals [k] desc)."""
    from record_matching_ray.stages.util import bounded_take_all

    rows = bounded_take_all(
        embedding_covariance(embs, emb_col=emb_col),
        9_000_000,  # d(d+1)/2 moment rows; d <= 4096 stays under this
        "pca_fit covariance moments",
    )
    d = max(int(r["j"]) for r in rows)
    C = np.zeros((d, d), dtype=np.float64)
    for r in rows:
        i, j = int(r["i"]) - 1, int(r["j"]) - 1
        C[i, j] = C[j, i] = float(r["cov"])
    w, v = np.linalg.eigh(C)  # ascending
    idx = np.argsort(-w, kind="stable")[:k]
    comps = v[:, idx].T.copy()
    vals = w[idx].copy()
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    return comps, vals


def pca_project(
    embs: ray.data.Dataset,
    components: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "proj",
) -> ray.data.Dataset:
    """Distributed projection onto fitted components: components
    broadcast once via ray.put, one stateless matmul per batch."""
    import ray as _ray

    ref = _ray.put(np.ascontiguousarray(components))

    def proj(t: pa.Table) -> pa.Table:
        comps = _ray.get(ref)
        mat = _emb_matrix(t.column(emb_col))
        p = mat @ comps.T
        return pa.table(
            {
                id_col: t.column(id_col),
                out_col: pa.array(p.tolist(), pa.list_(pa.float64())),
            }
        )

    return embs.select_columns([id_col, emb_col]).map_batches(
        proj, batch_format="pyarrow"
    )


def pca_check(
    embs: ray.data.Dataset, k: int, emb_col: str = "embedding", id_col: str = "vec_id"
) -> ray.data.Dataset:
    """Invariant wrapper (the lang_distinct_estimate pattern): fit top-k
    PCA, project the corpus DISTRIBUTED, and verify per component that
    (1) eigenvalues are non-increasing, (2) components are orthonormal,
    (3) the projected dimension's sample variance (computed by a second
    streaming moments pass over the projection — this is what actually
    tests pca_project) equals its eigenvalue, (4) top-k eigenvalue mass
    does not exceed total variance. Emits (rank, total_var, ok) where
    total_var is the SQL-recomputable trace (sum of rounded per-dim
    variances); any violation flips ok and fails the value hash."""
    comps, vals = pca_fit(embs, k, emb_col=emb_col)
    from record_matching_ray.stages.util import bounded_take_all

    diag = bounded_take_all(
        embedding_covariance(embs, emb_col=emb_col),
        9_000_000,  # d(d+1)/2 moment rows
        "pca_check covariance moments",
    )
    total_var = round(
        float(sum(r["cov"] for r in diag if r["i"] == r["j"])), 6
    )

    proj = pca_project(embs, comps, emb_col=emb_col, id_col=id_col)

    def moments(t: pa.Table) -> pa.Table:
        mat = _emb_matrix(t.column("proj"))
        if mat.size == 0:
            return pa.table(
                {
                    "r": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "s2": pa.array([], pa.float64()),
                }
            )
        n, kk = mat.shape
        return pa.table(
            {
                "r": pa.array(np.arange(1, kk + 1), pa.int64()),
                "n": pa.array(np.full(kk, n, np.int64), pa.int64()),
                "s": pa.array(mat.sum(axis=0), pa.float64()),
                "s2": pa.array((mat * mat).sum(axis=0), pa.float64()),
            }
        )

    parts = (
        proj.map_batches(moments, batch_format="pyarrow")
        .groupby("r")
        .aggregate(
            ray.data.aggregate.Sum("n"),
            ray.data.aggregate.Sum("s"),
            ray.data.aggregate.Sum("s2"),
        )
        .take_all()  # bounded: one row per projected rank (k rows)
    )
    var_by_rank = {}
    for r in parts:
        n, s, s2 = int(r["sum(n)"]), float(r["sum(s)"]), float(r["sum(s2)"])
        var_by_rank[int(r["r"])] = (s2 - s * s / n) / (n - 1)

    tol = max(1e-3 * max(total_var, 1e-9), 1e-6)
    gram = comps @ comps.T
    orthonormal = bool(np.max(np.abs(gram - np.eye(len(vals)))) < 1e-8)
    desc = bool(np.all(np.diff(vals) <= 1e-9))
    mass_ok = bool(np.sum(vals) <= total_var + tol)
    oks = []
    for r in range(1, k + 1):
        var_ok = abs(var_by_rank.get(r, np.nan) - vals[r - 1]) <= tol
        oks.append(bool(orthonormal and desc and mass_ok and var_ok))
    out = pa.table(
        {
            "rank": pa.array(np.arange(1, k + 1), pa.int64()),
            "total_var": pa.array([total_var] * k, pa.float64()),
            "ok": pa.array(oks, pa.bool_()),
        }
    )
    return ray.data.from_arrow(out)
