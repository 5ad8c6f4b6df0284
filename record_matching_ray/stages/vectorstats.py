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
        mean = s / n
        std = np.sqrt(np.maximum(s2 / n - mean * mean, 0.0))
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


__all__ = ["embedding_dim_stats"]
