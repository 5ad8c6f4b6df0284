"""Consistent shard assignment via rendezvous (highest-random-weight)
hashing — the placement primitive for resumable partitioned output.

A 100 TB pipeline writes output in shards; when the shard count changes
(cluster resize, re-partitioning), naive ``hash(id) % S`` relocates
almost every row, invalidating resume state. Rendezvous hashing
(Thaler & Ravishankar 1998) assigns each key to
``argmax_s h(key, s)`` — adding a shard relocates only ~1/(S+1) of keys
(exactly those whose new-shard hash wins), and removing one relocates
only that shard's keys. Stateless, coordination-free, and deterministic,
so every worker computes identical placement with no directory service.

The hash here is md5-lower64 over ``"{key}:{shard}"`` — bit-identical to
DuckDB's ``md5_number_lower``, so the assignment is SQL-checkable. A
production deployment at 10^12 rows would swap in ``mix64(uid ^ s)``
(no string building); the argmax structure is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.functions.hashing import hash_strings, md5_lower64


def rendezvous_shard(keys: list, n_shards: int) -> np.ndarray:
    """(n,) int64 shard per key: argmax over shards of
    md5_lower64(f"{key}:{shard}"). Ties (2^-64) break to the lower
    shard id via argmax's first-wins."""
    n = len(keys)
    weights = np.empty((n, n_shards), dtype=np.uint64)
    for s in range(n_shards):
        weights[:, s] = hash_strings(
            [f"{k}:{s}" for k in keys], hash_fn=md5_lower64
        )
    return np.argmax(weights, axis=1).astype(np.int64)


def shard_assign(
    ds: ray.data.Dataset, key_col: str, n_shards: int
) -> ray.data.Dataset:
    """Adds a ``shard`` column (stateless map_batches — embarrassingly
    parallel, no shuffle; the assignment is the same on every worker)."""

    def per_batch(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        return t.append_column(
            "shard", pa.array(rendezvous_shard(keys, n_shards), pa.int64())
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")
