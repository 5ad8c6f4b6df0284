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
