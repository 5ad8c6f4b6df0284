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
