"""Small Dataset utilities shared by stages."""

from __future__ import annotations

import pyarrow as pa

import ray.data


def conform_schema(schema: pa.Schema):
    """map_batches fn factory: coerce every block to `schema`.

    Ray's hash-shuffle groupby emits ZERO-COLUMN empty blocks for empty
    partitions; Acero (the per-partition join kernel) then fails with
    'No match for key field ... on right side'. Conforming empty blocks to
    the stage schema makes groupby outputs safe to join."""

    def fix(t: pa.Table) -> pa.Table:
        if t.schema.equals(schema):
            return t
        if t.num_rows == 0:
            return schema.empty_table()
        return t.select(schema.names).cast(schema)

    return fix


def conformed(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    return ds.map_batches(conform_schema(schema), batch_format="pyarrow")


def compact_nonempty(
    ds: ray.data.Dataset, max_blocks: int
) -> tuple[ray.data.Dataset, int]:
    """Materialize a BOUNDED relation and repartition so every block is
    non-empty. Returns (dataset, row_count).

    Belt-and-braces companion to rayfix.install(): groupby outputs at high
    parallelism are mostly-empty blocks, and Ray 2.49's hash-shuffle join
    loses its schema broadcast when the first-shuffled block is empty (see
    rayfix.py). Only for relations known to be small relative to the
    corpus (candidate pair sets, cluster maps) — never mid-pipeline on the
    full input. The count also lets callers scale join ``num_partitions``
    to the actual data instead of fanning a 25-row input over 16
    aggregators."""
    m = ds.materialize()
    n = m.count()
    if n == 0:
        return m, 0
    return m.repartition(max(1, min(max_blocks, n))), n


def shuffle_partitions() -> int:
    """Partition count for coarse-key hash shuffles (pair dedup,
    canonicalize, label propagation). Ray's hash-shuffle spins up one
    aggregator actor per partition; past ~CPU count they fight the map
    tasks for slots (measured: 4x CPUs partitions made a 32-CPU run
    SLOWER than 8-CPU). Override with RMRAY_SHUFFLE_PARTS."""
    import os

    env = os.environ.get("RMRAY_SHUFFLE_PARTS")
    if env:
        return max(1, int(env))
    return max(4, cluster_parallelism() // 2)


def cluster_parallelism(default: int = 8) -> int:
    """Upper bound for autoscaling actor pools: the cluster's CPU count.
    Resolved at pipeline-build time so the same code saturates a 4-CPU
    test session and a 32-CPU bench session (and, unchanged, a multi-node
    cluster where cluster_resources() spans all nodes)."""
    import ray

    try:
        return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:
        return default


def coarse_groupby_partitions() -> int:
    """Partition count for SORT-shuffled coarse-key groupbys (pair
    emission/dedup, canonicalize/refine sweeps, contraction co-location).

    Distinct from shuffle_partitions(): a sort-based groupby's reduce
    parallelism equals the number of distinct coarse keys, so CPU/2 keys
    capped a 32-CPU dedup of 50M pair rows at 16-way parallelism
    (measured 6.3s -> 3.9s at 4x CPUs). Joins stay on
    shuffle_partitions() — their hash-shuffle aggregator actors DO
    contend with map tasks past ~CPU count. Override with
    RMRAY_COARSE_PARTS."""
    import os

    env = os.environ.get("RMRAY_COARSE_PARTS")
    if env:
        return max(1, int(env))
    return max(8, 4 * cluster_parallelism())


def round6_sql(x):
    """Round half AWAY FROM ZERO at 6 decimals — DuckDB round() semantics.

    np.round / Python round are half-even (banker's): on an
    exactly-representable .xxxxxx5 value (e.g. lift = 2·589/512 =
    2.3015625) the two conventions disagree and the driver's value-hash
    compare goes red. Any new derived-float column should round through
    this helper; the long-standing np.round call sites only survive
    because their divisions never landed on an exact half."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5) / 1e6, x)


def bounded_take_all(
    ds: ray.data.Dataset, bound: int, what: str
) -> list[dict]:
    """take_all with a COUNTED driver gate (VERDICT r4 task 8): callers
    that collect a "small" relation (per-group partials, top-k, moment
    rows) state their bound, and a widened input fails loudly instead of
    silently materializing on the driver. The dataset is materialized
    once — count() then take_all() reuse the same blocks."""
    ds = ds.materialize()
    n = ds.count()
    if n > bound:
        raise RuntimeError(
            f"{what}: {n} rows exceed the declared driver bound {bound}; "
            "this collect is only safe for bounded relations — widen the "
            "bound only with a matching memory argument"
        )
    return ds.take_all()


def streamed_rows(ds: ray.data.Dataset):
    """Driver-side STREAMING row iterator for fold-at-driver sketches
    (Misra-Gries, count-min, HLL register maxima): constant driver
    memory — one batch in flight — where take_all() would materialize
    one partial-sketch row per input block (10^6 blocks at web scale)."""
    for t in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        yield from t.to_pylist()
