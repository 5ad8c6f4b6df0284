"""Distributed k-means (Lloyd's algorithm) over an embedding column, plus
SemDeDup-style semantic deduplication built on it.

The reference clusters records only via pairwise ER (record_matching/
main.py build_clusters); a training-data pipeline also needs CENTROID
clustering of embeddings — the primitive behind IVF index training,
SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") and data-mixture curation.
`stages/knn.train_ivf_centroids` fits centroids on a driver-side sample;
this module is the exact, whole-dataset, oracle-checkable variant.

Distributed layout (the scale story):
- Each Lloyd iteration is ONE streaming pass: centroids broadcast as a
  plain (k, d) array in fn_kwargs; every batch assigns points
  (vectorized over points x clusters, looping only over the d
  dimensions) and emits ONE partial row — k counts + k*d integer
  component sums packed as bytes. The driver reduces batch partials
  (k*d int64s each) and updates centroids; nothing per-point ever
  reaches the driver.
- Determinism for the SQL oracle: component sums use EXACT integer
  arithmetic — float32 inputs scale by 2^40 (a power of two, so the
  float64 multiply is exact) and floor to int64. Integer addition is
  associative, so Ray's partial-sum order and the oracle's SUM() give
  bit-identical centroid numerators; the centroid double division
  (S / SCALE) / cnt is then correctly rounded identically on both
  sides. Distances accumulate sequentially over dimensions, matching
  the oracle's left-associative unrolled `(x[1]-c1)^2 + ...`
  expression term for term, and argmin ties break to the smallest
  cluster index (np.argmin first-occurrence == ORDER BY dist, cluster).
- Init: the embeddings of the k smallest ids (batch-local top-k prune,
  driver merges k rows per batch) — deterministic and one SQL LIMIT.

Partitioning assumptions: k*d driver state per iteration (a few MB for
k=65k, d=768 — fine); the assignment pass is stateless and embarrassingly
parallel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

# 2^40: float32 * SCALE is exact in float64; |v| < ~1e3 keeps the scaled
# magnitude < 2^53 (double-exact) and corpus sums < 2^63 (int64-exact).
SCALE = float(1 << 40)


def _emb_f64(col, dim: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.FixedSizeListArray) or pa.types.is_fixed_size_list(
        col.type
    ):
        return (
            col.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim).astype(
                np.float64
            )
        )
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _seq_dists(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances accumulated SEQUENTIALLY over
    dimensions — term-for-term identical to the oracle's unrolled
    left-associative sum (np.sum/matmul reassociate and would drift)."""
    n, k = len(x), len(cents)
    acc = np.zeros((n, k), dtype=np.float64)
    for d in range(x.shape[1]):
        diff = x[:, d, None] - cents[None, :, d]
        acc += diff * diff
    return acc


def _init_centroids(
    embs: ray.data.Dataset, k: int, dim: int, id_col: str, emb_col: str
) -> np.ndarray:
    """Embeddings of the k smallest ids: batch-local top-k prune, driver
    merges k rows per batch partial."""

    def prune(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.argsort(ids, kind="stable")[:k]
        return t.select([id_col, emb_col]).take(pa.array(keep, pa.int64()))

    rows = embs.map_batches(prune, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    return np.asarray([r[emb_col] for r in rows[:k]], dtype=np.float64)


def kmeans_fit(
    embs: ray.data.Dataset,
    k: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Lloyd's k-means: `iters` centroid updates from deterministic
    min-id init; returns the final (k, dim) centroids. Empty clusters
    keep their previous centroid."""
    cents = _init_centroids(embs, k, dim, id_col, emb_col)

    def partial(t: pa.Table, centroids: np.ndarray) -> pa.Table:
        x = _emb_f64(t.column(emb_col), dim)
        if len(x) == 0:
            return pa.table(
                {
                    "cnts": pa.array(
                        [np.zeros(k, dtype=np.int64).tobytes()], pa.binary()
                    ),
                    "sums": pa.array(
                        [np.zeros((k, dim), dtype=np.int64).tobytes()], pa.binary()
                    ),
                }
            )
        assign = np.argmin(_seq_dists(x, centroids), axis=1)
        xi = np.floor(x * SCALE).astype(np.int64)
        order = np.argsort(assign, kind="stable")
        a_s, xi_s = assign[order], xi[order]
        bounds = np.flatnonzero(np.diff(a_s)) + 1
        starts = np.concatenate([[0], bounds])
        sums = np.zeros((k, dim), dtype=np.int64)
        sums[a_s[starts]] = np.add.reduceat(xi_s, starts, axis=0)
        cnts = np.bincount(assign, minlength=k).astype(np.int64)
        return pa.table(
            {
                "cnts": pa.array([cnts.tobytes()], pa.binary()),
                "sums": pa.array([sums.tobytes()], pa.binary()),
            }
        )

    for _ in range(iters):
        rows = embs.map_batches(
            partial, fn_kwargs={"centroids": cents}, batch_format="pyarrow"
        ).take_all()  # one tiny row per batch
        cnts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        for r in rows:
            cnts += np.frombuffer(r["cnts"], dtype=np.int64)
            sums += np.frombuffer(r["sums"], dtype=np.int64).reshape(k, dim)
        nz = cnts > 0
        new = cents.copy()
        # (S / SCALE) / cnt — the oracle divides in this exact order
        new[nz] = (sums[nz].astype(np.float64) / SCALE) / cnts[nz, None]
        cents = new
    return cents


def kmeans_fit_predict(
    embs: ray.data.Dataset,
    k: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple[ray.data.Dataset, np.ndarray]:
    """kmeans_fit + one stateless assignment pass. Returns
    (Dataset[id, cluster, dist], centroids); dist is the squared L2
    distance rounded to 6 decimals."""
    cents = kmeans_fit(embs, k, iters, dim, id_col, emb_col)

    def final_assign(t: pa.Table, centroids: np.ndarray) -> pa.Table:
        x = _emb_f64(t.column(emb_col), dim)
        dists = _seq_dists(x, centroids)
        assign = np.argmin(dists, axis=1)
        best = dists[np.arange(len(x)), assign]
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(assign.astype(np.int64), pa.int64()),
                "dist": pa.array(np.round(best, 6), pa.float64()),
            }
        )

    out = embs.map_batches(
        final_assign, fn_kwargs={"centroids": cents}, batch_format="pyarrow"
    )
    return out, cents


def kmeans_silhouette(
    embs: ray.data.Dataset,
    k: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Simplified silhouette per cluster (centroid-based: a = euclidean
    distance to own centroid, b = to the nearest OTHER centroid,
    s = (b - a) / max(a, b)) — the O(n*k) clustering-quality score that
    replaces exact silhouette's O(n^2) all-pairs at scale. One stateless
    pass after kmeans_fit; per-cluster (sum, n) partials shuffle |k| rows.
    Distances share `_seq_dists`' sequential accumulation with the SQL
    oracle, so mean silhouette matches DuckDB to round-6.

    Output: (cluster, n, mean_silhouette)."""
    cents = kmeans_fit(embs, k, iters, dim, id_col, emb_col)

    def partial(t: pa.Table) -> pa.Table:
        x = _emb_f64(t.column(emb_col), dim)
        if len(x) == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "s_sum": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        d = _seq_dists(x, cents)
        own = np.argmin(d, axis=1)  # ties -> lowest cluster, == oracle rk=1
        rows = np.arange(len(x))
        a = d[rows, own]
        d2 = d.copy()
        d2[rows, own] = np.inf
        second = np.argmin(d2, axis=1)  # oracle rk=2 (same tie order)
        b = d[rows, second]
        sa, sb = np.sqrt(a), np.sqrt(b)
        mx = np.maximum(sa, sb)
        s = np.where(mx > 0, (sb - sa) / np.where(mx > 0, mx, 1.0), 0.0)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "cluster": pa.array(own.astype(np.int64), pa.int64()),
                    "s": pa.array(s, pa.float64()),
                    "one": pa.array(np.ones(len(s), np.int64), pa.int64()),
                }
            ),
            "cluster",
        ).aggregate([("s", "sum"), ("one", "sum")])
        return g.rename_columns(["cluster", "s_sum", "n"])

    from ray.data.aggregate import Sum

    agg = (
        embs.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum(on="s_sum", alias_name="s_sum"), Sum(on="n", alias_name="n"))
    )

    OUT = pa.schema(
        [
            ("cluster", pa.int64()),
            ("n", pa.int64()),
            ("mean_silhouette", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "s_sum" not in t.column_names:
            return OUT.empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False)
        ss = t.column("s_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cluster": pa.compute.cast(t.column("cluster"), pa.int64()),
                "n": pa.compute.cast(t.column("n"), pa.int64()),
                "mean_silhouette": pa.array(np.round(ss / n, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023): k-means partition, then exact cosine
# near-dup components WITHIN each cluster; keep the min-id member.


def _union_find_pairs(n: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in zip(a, b):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    return np.array([find(i) for i in range(n)])


def semdedup(
    embs: ray.data.Dataset,
    k: int,
    iters: int,
    dim: int,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_bucket: int = 8192,
) -> ray.data.Dataset:
    """(id, cluster, keep_id): keep_id is the smallest id in the row's
    cosine >= threshold component within its k-means cluster (== its own
    id when the row has no semantic duplicate). Filtering keep_id == id
    yields the deduplicated corpus; the rest are the semantic dups
    SemDeDup removes.

    Cosine parity with the oracle: float64 upcast, round(cos, 6) —
    same recipe as dedup.embedding_neardup_pairs. Partitioning
    assumption: one k-means cluster's rows fit one map_groups group
    (pick k so n/k is bucket-sized; `max_bucket` hard-caps the
    in-group pair matrix like the dedup family's sketch buckets)."""
    cents = kmeans_fit(embs, k, iters, dim, id_col, emb_col)

    def assign_rows(t: pa.Table, centroids: np.ndarray) -> pa.Table:
        x = _emb_f64(t.column(emb_col), dim)
        assign = (
            np.argmin(_seq_dists(x, centroids), axis=1)
            if len(x)
            else np.empty(0, dtype=np.int64)
        )
        return pa.table(
            {
                "cluster": pa.array(assign.astype(np.int64), pa.int64()),
                "vid": t.column(id_col),
                "emb": t.column(emb_col),
            }
        )

    def group_components(g: pa.Table) -> pa.Table:
        ids = g.column("vid").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")[:max_bucket]
        ids = ids[order]
        x = _emb_f64(g.column("emb"), dim)[order]
        norms = np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        unit = x / norms
        cs = np.round(unit @ unit.T, 6)
        a, b = np.triu_indices(len(ids), k=1)
        hit = cs[a, b] >= threshold
        root = _union_find_pairs(len(ids), a[hit], b[hit])
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(
                    np.full(len(ids), g.column("cluster")[0].as_py()), pa.int64()
                ),
                "keep_id": pa.array(ids[root], pa.int64()),
            }
        )

    return (
        embs.map_batches(
            assign_rows, fn_kwargs={"centroids": cents}, batch_format="pyarrow"
        )
        .groupby("cluster")
        .map_groups(group_components, batch_format="pyarrow")
    )
