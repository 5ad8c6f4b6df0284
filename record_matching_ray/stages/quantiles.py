"""Distributed quantiles: exact per-group quantiles over integer domains,
plus a mergeable sampling sketch for unbounded domains.

``group_quantiles`` is the scale-correct exact path for money/count-like
columns: per-batch (group, value) partial counts collapse the data to its
VALUE HISTOGRAM (distinct values per group, not rows) before the single
shuffle — at 100 TB a price column has millions of rows but only ~1e5
distinct cents values per group, so the per-group finalize sweeps a tiny
sorted histogram. The quantile rule is the deterministic "lower" method:
value at index floor((n-1) * q) of the sorted multiset — chosen because a
SQL oracle can replicate it exactly with row_number() (no interpolation
float drift).

``approx_quantiles`` is the unbounded-domain fallback: a fixed-size
uniform coreset per batch (deterministic hash-based thinning), merged on
the driver — rank error is bounded by the coreset size; checked as an
invariant (estimate within tolerance of exact) rather than value-for-value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.stages.util import conformed


def group_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> ray.data.Dataset:
    """Exact (group, q, value) for an INTEGER value column.

    value = sorted(values)[floor((n-1)*q)] per group ("lower" method).
    Layout: map_batches partial count per (group, value) -> groupby sum
    (rows = distinct values, not events) -> per-group cumulative sweep.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select([group_col, value_col]), [group_col, value_col]
        ).aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "cnt"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, value_col])
        .aggregate(Sum(on="cnt", alias_name="cnt"))
    )

    qs_arr = np.asarray(qs, dtype=np.float64)

    def finalize(g: pa.Table) -> pa.Table:
        keys = np.asarray(g.column(group_col).to_pylist(), dtype=object)
        vals = g.column(value_col).to_numpy(zero_copy_only=False)
        cnts = g.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, keys))
        keys, vals, cnts = keys[order], vals[order], cnts[order]
        out_g, out_q, out_v = [], [], []
        start = 0
        n = len(keys)
        for i in range(1, n + 1):
            if i == n or keys[i] != keys[start]:
                seg_v = vals[start:i]
                seg_c = cnts[start:i]
                cum = np.cumsum(seg_c)
                total = cum[-1]
                idx = np.floor((total - 1) * qs_arr).astype(np.int64)
                pos = np.searchsorted(cum, idx + 1)
                out_g.extend([keys[start]] * len(qs_arr))
                out_q.extend(qs_arr)
                out_v.extend(seg_v[pos])
                start = i
        return pa.table(
            {
                group_col: pa.array(out_g, pa.string()),
                "q": pa.array(out_q, pa.float64()),
                "value": pa.array(np.asarray(out_v, dtype=np.int64), pa.int64()),
            }
        )

    out = hist.groupby(group_col).map_groups(finalize, batch_format="pyarrow")
    return conformed(
        out,
        pa.schema(
            [(group_col, pa.string()), ("q", pa.float64()), ("value", pa.int64())]
        ),
    )


def approx_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    coreset_size: int = 4096,
) -> dict[float, float]:
    """Driver-side approximate quantiles from per-batch coresets.

    Each batch contributes an evenly-strided sample of its SORTED values
    (deterministic — no RNG), weighted by batch size; the driver merges
    the weighted coresets and reads quantiles off the weighted CDF. Rank
    error ~ 1/coreset_size per batch. Only ``batches * coreset_size``
    float64s reach the driver."""

    def coreset(t: pa.Table) -> pa.Table:
        v = np.sort(t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64))
        n = len(v)
        if n == 0:
            return pa.table(
                {"v": pa.array([], pa.float64()), "w": pa.array([], pa.float64())}
            )
        m = min(coreset_size, n)
        idx = np.floor(np.linspace(0, n - 1, m)).astype(np.int64)
        return pa.table(
            {
                "v": pa.array(v[idx], pa.float64()),
                "w": pa.array(np.full(m, n / m, dtype=np.float64), pa.float64()),
            }
        )

    parts = ds.select_columns([value_col]).map_batches(
        coreset, batch_format="pyarrow"
    ).take_all()
    if not parts:
        return {q: float("nan") for q in qs}
    v = np.asarray([r["v"] for r in parts], dtype=np.float64)
    w = np.asarray([r["w"] for r in parts], dtype=np.float64)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cdf = np.cumsum(w)
    total = cdf[-1]
    out = {}
    for q in qs:
        pos = np.searchsorted(cdf, q * total)
        out[q] = float(v[min(pos, len(v) - 1)])
    return out
