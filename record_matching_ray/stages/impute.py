"""Per-group mean embeddings + null imputation.

Reference semantics replaced here:
- ``average_fields`` — per-template-key mean embedding over all vectors,
  computed as one GPU ``torch.mean`` (record_matching/main.py:127-144),
  written to the tiny ``vector_averages`` table (context.py:102-107).
- ``coalesce(embedding, average)`` null imputation during the
  field-distance join projection (main.py:393-408) and the PoC's global /
  neighborhood average imputation (claude_poc/entity-resolution_v4.py:
  412-431, 1472-1625).

Ray-Data-native layout: the mean is a partial aggregate — each batch
reduces its rows to one (group, sum, count) row per group (float64 sums),
then a single tiny ``groupby(group)`` combines partials. The input is
never concentrated; only ``n_groups`` rows shuffle. The resulting
averages table is small by construction and is BROADCAST (``ray.put``
once, read per task) for imputation — never a shuffle join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from record_matching_ray.stages.knn import _emb_matrix


def _group_sums(t: pa.Table, group_col: str, emb_col: str, dim: int) -> pa.Table:
    """Per-batch partial: one (group, sum fixed_size_list, cnt) row per
    distinct group value in the batch. Null embeddings are skipped (they
    are what imputation later fills)."""
    col = t.column(emb_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = np.asarray(
        pa.compute.is_valid(col).to_numpy(zero_copy_only=False), dtype=bool
    )
    groups = np.asarray(t.column(group_col).to_pylist(), dtype=object)
    out_g: list[object] = []
    sums: list[np.ndarray] = []
    cnts: list[int] = []
    if valid.any():
        mat = np.zeros((t.num_rows, dim), dtype=np.float64)
        mat[valid] = _emb_matrix(col.filter(pa.array(valid)))
        order = np.argsort(groups[valid].astype(str), kind="stable")
        gv = groups[valid][order]
        mv = mat[valid][order]
        bounds = np.nonzero(
            np.concatenate(([True], gv[1:] != gv[:-1], [True]))
        )[0]
        for s, e in zip(bounds[:-1], bounds[1:]):
            out_g.append(gv[s])
            sums.append(mv[s:e].sum(axis=0))
            cnts.append(e - s)
    sum_arr = (
        np.concatenate(sums) if sums else np.empty(0, dtype=np.float64)
    )
    return pa.table(
        {
            "group": pa.array(out_g, _group_type(t.schema.field(group_col).type)),
            "vsum": pa.FixedSizeListArray.from_arrays(
                pa.array(sum_arr, pa.float64()), dim
            ),
            "cnt": pa.array(cnts, pa.int64()),
        }
    )


def _group_type(t: pa.DataType) -> pa.DataType:
    # group keys are strings or integers in this engine
    return t if (pa.types.is_integer(t) or pa.types.is_string(t)) else pa.string()


def mean_embeddings(
    ds: ray.data.Dataset,
    group_col: str,
    emb_col: str = "embedding",
    dim: int = 64,
) -> pa.Table:
    """Distributed per-group mean embedding -> small driver-side table
    (group, mean: fixed_size_list<float64, dim>, cnt).

    Two-level reduce: batch partials (n_groups rows per batch) -> one
    groupby over partials -> driver. The full embedding column never
    leaves its blocks."""
    partials = ds.map_batches(
        _group_sums,
        fn_kwargs={"group_col": group_col, "emb_col": emb_col, "dim": dim},
        batch_format="pyarrow",
    )

    def combine(g: pa.Table) -> pa.Table:
        mat = _emb_matrix(g.column("vsum"))
        cnt = int(g.column("cnt").to_numpy(zero_copy_only=False).sum())
        mean = mat.sum(axis=0) / max(cnt, 1)
        return pa.table(
            {
                "group": g.column("group").slice(0, 1),
                "mean": pa.FixedSizeListArray.from_arrays(
                    pa.array(mean, pa.float64()), dim
                ),
                "cnt": pa.array([cnt], pa.int64()),
            }
        )

    rows = partials.groupby("group").map_groups(combine, batch_format="pyarrow")
    group_type = partials.schema().base_schema.field("group").type
    return pa.Table.from_pylist(
        rows.take_all(),
        schema=pa.schema(
            [
                ("group", group_type),
                ("mean", pa.list_(pa.float64())),
                ("cnt", pa.int64()),
            ]
        ),
    )


def mean_embeddings_long(
    ds: ray.data.Dataset,
    group_col: str,
    emb_col: str = "embedding",
    dim: int = 64,
) -> pa.Table:
    """(group, pos, mean_v) long form, mean_v rounded to 6 decimals —
    the SQL-oracle-comparable shape (DuckDB: avg(embedding[pos+1])
    grouped by (group, pos))."""
    wide = mean_embeddings(ds, group_col, emb_col, dim)
    n = wide.num_rows
    mat = np.asarray(wide.column("mean").to_pylist(), dtype=np.float64).reshape(n, dim)
    return pa.table(
        {
            "group": pa.array(
                [wide.column("group")[i].as_py() for i in range(n) for _ in range(dim)],
                wide.schema.field("group").type,
            ),
            "pos": pa.array(np.tile(np.arange(dim, dtype=np.int64), n), pa.int64()),
            "mean_v": pa.array(np.round(mat.ravel(), 6), pa.float64()),
        }
    )


def neighborhood_embedding_averages(
    features: ray.data.Dataset,
    cfg,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-record mean of its BLOCK NEIGHBORS' embeddings — the PoC's
    neighborhood-average imputation source (claude_poc/entity-resolution_
    v4.py:1493-1625: ANN neighbors' field vectors averaged per record),
    with blocking standing in for ANN neighborhoods exactly as elsewhere
    in this engine.

    Layout: block rows are (block_key, uid) ONLY (16B); the embedding
    matrix is broadcast once (bounded feature side). Per coarse partition,
    each block segment contributes (block_sum - self)/(m-1) per member;
    per-uid partials are then folded by one small groupby. Output:
    (uid, neighbor_mean list<float64>, n_neighbors)."""
    import ray as _ray

    from record_matching_ray.functions.hashing import _U64
    from record_matching_ray.stages import blocking as _b
    from record_matching_ray.stages.util import coarse_groupby_partitions

    dim = cfg.embed_dim
    # broadcast uid -> embedding row (reuses the fused-scorer payload build)
    from record_matching_ray.stages.scoring import build_payload_arrays

    uids_sorted, perm, _urls, _names, _years, _mh, emb = build_payload_arrays(
        features
    )
    ref = _ray.put((uids_sorted, perm, emb.astype(np.float64)))
    n_parts = num_partitions or coarse_groupby_partitions()

    blocks = features.map_batches(
        _b.emit_block_keys,
        fn_kwargs={"cfg": cfg, "hot_hosts": set()},
        batch_format="pyarrow",
    )

    def add_pk(t: pa.Table) -> pa.Table:
        bk = t.column("block_key").to_numpy(zero_copy_only=False)
        return t.append_column(
            "pk", pa.array((bk % _U64(n_parts)).astype(np.int64), pa.int64())
        )

    def partial_sums(g: pa.Table) -> pa.Table:
        us, pm, E = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        keys = g.column("block_key").to_numpy(zero_copy_only=False)
        uids = g.column("uid").to_numpy(zero_copy_only=False)
        order = np.lexsort((uids, keys))
        keys, uids = keys[order], uids[order]
        rows = pm[np.searchsorted(us, uids)]
        bounds = np.nonzero(
            np.concatenate(([True], keys[1:] != keys[:-1], [True]))
        )[0]
        out_uid: list[np.ndarray] = []
        out_sum: list[np.ndarray] = []
        out_cnt: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg_uids, seg_idx = np.unique(uids[s:e], return_index=True)
            m = len(seg_uids)
            if m < 2:
                continue
            seg_rows = rows[s:e][seg_idx]
            block_sum = E[seg_rows].sum(axis=0)
            out_uid.append(seg_uids)
            out_sum.append(block_sum[None, :] - E[seg_rows])
            out_cnt.append(np.full(m, m - 1, dtype=np.int64))
        if not out_uid:
            return pa.table(
                {
                    "uid": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64(), dim)),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        sums = np.concatenate(out_sum, axis=0)
        return pa.table(
            {
                "uid": pa.array(np.concatenate(out_uid), pa.int64()),
                "vsum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel(), pa.float64()), dim
                ),
                "cnt": pa.array(np.concatenate(out_cnt), pa.int64()),
            }
        )

    partials = (
        blocks.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(partial_sums, batch_format="pyarrow")
    )

    def fold(g: pa.Table) -> pa.Table:
        from record_matching_ray.stages.knn import _emb_matrix

        mat = _emb_matrix(g.column("vsum"))
        cnt = int(g.column("cnt").to_numpy(zero_copy_only=False).sum())
        mean = mat.sum(axis=0) / max(cnt, 1)
        return pa.table(
            {
                "uid": g.column("uid").slice(0, 1),
                "neighbor_mean": pa.array([mean.tolist()], pa.list_(pa.float64())),
                "n_neighbors": pa.array([cnt], pa.int64()),
            }
        )

    return partials.groupby("uid").map_groups(fold, batch_format="pyarrow")


def impute_embeddings(
    ds: ray.data.Dataset,
    averages: pa.Table,
    group_col: str,
    emb_col: str = "embedding",
    dim: int = 64,
) -> ray.data.Dataset:
    """Fill null embeddings with the group's mean vector (float32), the
    ``coalesce(embedding, average)`` of main.py:393-408. The averages
    table is broadcast once via ``ray.put``; each task does a vectorized
    in-batch fill — no join, no shuffle."""
    mapping = {
        averages.column("group")[i].as_py(): np.asarray(
            averages.column("mean")[i].as_py(), dtype=np.float32
        )
        for i in range(averages.num_rows)
    }
    ref = ray.put(mapping)

    def fill(t: pa.Table) -> pa.Table:
        m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        col = t.column(emb_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = np.asarray(
            pa.compute.is_valid(col).to_numpy(zero_copy_only=False), dtype=bool
        )
        if valid.all():
            return t
        mat = np.zeros((t.num_rows, dim), dtype=np.float32)
        if valid.any():
            mat[valid] = _emb_matrix(col.filter(pa.array(valid)), cast=np.float32)
        groups = t.column(group_col).to_pylist()
        zero = np.zeros(dim, dtype=np.float32)
        for i in np.nonzero(~valid)[0]:
            mat[i] = m.get(groups[i], zero)
        filled = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float32()), dim
        )
        idx = t.schema.get_field_index(emb_col)
        return t.set_column(idx, emb_col, filled)

    return ds.map_batches(fill, batch_format="pyarrow")


def label_centroid_spread(
    ds: ray.data.Dataset,
    group_col: str = "label",
    emb_col: str = "embedding",
    dim: int = 64,
) -> ray.data.Dataset:
    """Embedding cluster-quality metric: per group, the mean cosine of
    members to their group centroid — high spread (low mean cosine)
    flags labels whose embeddings don't cohere. Output:
    (label, n, avg_cos).

    Two passes, both bounded: the centroid table is mean_embeddings'
    driver-side result (one row per group), broadcast once via ray.put;
    the cosine pass is stateless map_batches emitting per-group partial
    (cos_sum, cnt) rows, reduced by one small groupby."""
    from ray.data.aggregate import Sum

    cent = mean_embeddings(ds, group_col, emb_col=emb_col, dim=dim)
    labels = cent.column("group").to_pylist()
    M = np.array(cent.column("mean").to_pylist(), dtype=np.float64)
    lab2row = {l: i for i, l in enumerate(labels)}
    ref = ray.put((lab2row, M))

    def partial(t: pa.Table) -> pa.Table:
        l2r, cm = ray.get(ref)
        labs = t.column(group_col).to_pylist()
        E = _emb_matrix(t.column(emb_col)).astype(np.float64)
        rows = np.fromiter((l2r[l] for l in labs), dtype=np.int64, count=len(labs))
        C = cm[rows]
        num = (E * C).sum(axis=1)
        den = np.linalg.norm(E, axis=1) * np.linalg.norm(C, axis=1)
        cos = np.divide(num, den, out=np.zeros_like(num), where=den > 0)
        prep = pa.table(
            {
                "label": t.column(group_col),
                "cos_sum": pa.array(cos, pa.float64()),
            }
        )
        g = pa.TableGroupBy(prep, "label").aggregate(
            [("cos_sum", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["label", "cos_sum", "n"])

    def finalize(t: pa.Table) -> pa.Table:
        cs = t.column("cos_sum").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "label": t.column("label"),
                "n": t.column("n"),
                "avg_cos": pa.array(
                    np.round(np.divide(cs, np.maximum(n, 1)), 6), pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(
            Sum(on="cos_sum", alias_name="cos_sum"),
            Sum(on="n", alias_name="n"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )
