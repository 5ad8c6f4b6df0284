"""Bloom-join: broadcast Bloom-filter semi-join pruning of a big fact
table against a filtered dimension (functions/bloom.py has the filter).

Replaces the shuffle both sides of ``WHERE key IN (SELECT ...)`` would
cost: the dimension's keys become a Bloom filter broadcast once via
ray.put; the fact side prunes inside stateless map_batches, so only the
~matching fraction ever reaches a downstream shuffle/aggregate.

Two modes:
- exact=True (default): an exact sorted key array rides along with the
  filter; Bloom false positives are removed by a vectorized searchsorted
  verify, so the output IS the exact semi-join. Right-sizes when the
  dimension fits driver memory (count-gated by callers the same way the
  repo's other broadcasts are).
- exact=False: Bloom-only pruning (documented FP rate) for the true
  100 TB shape — follow with the exact distributed join; the filter only
  ever ADMITS extra rows, never drops a match, so exactness is preserved
  by the join that follows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from record_matching_ray.functions.bloom import bloom_contains, build_bloom


def bloom_semi_join(
    big: ray.data.Dataset,
    key_col: str,
    small: ray.data.Dataset,
    small_key_col: str,
    n_bits_log2: int | None = None,
    k: int = 4,
    exact: bool = True,
    anti: bool = False,
) -> ray.data.Dataset:
    """Rows of ``big`` whose ``key_col`` appears in ``small``'s
    ``small_key_col`` (exact mode) or possibly appears (bloom-only).
    ``anti=True`` inverts to NOT-IN semantics — exact mode only: a Bloom
    false positive would silently DROP a legitimate row from an anti
    join, so the bloom-only fast path cannot be made exact downstream
    the way the semi direction can."""
    if anti and not exact:
        raise ValueError("anti join requires exact=True (FPs would drop rows)")
    parts = [
        t
        for t in (
            ray.get(r) for r in small.select_columns([small_key_col]).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    keys = (
        np.unique(
            np.concatenate(
                [
                    p.column(small_key_col).to_numpy(zero_copy_only=False)
                    for p in parts
                ]
            ).astype(np.int64)
        )
        if parts
        else np.empty(0, dtype=np.int64)
    )
    if n_bits_log2 is None:
        # m/n >= 16 -> ~0.24% FP at k=4
        n_bits_log2 = max(10, int(np.ceil(np.log2(16 * max(len(keys), 1)))))
    nb, kk = n_bits_log2, k
    words_ref = ray.put(build_bloom(keys, nb, kk))
    exact_ref = ray.put(keys) if exact else None

    def prune(t: pa.Table) -> pa.Table:
        kv = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = bloom_contains(ray.get(words_ref), kv, nb, kk)
        if exact_ref is not None and m.any():
            ex = ray.get(exact_ref)
            if len(ex) == 0:
                m = np.zeros_like(m)
            else:
                sub = kv[m]
                pos = np.clip(np.searchsorted(ex, sub), 0, len(ex) - 1)
                mm = m.copy()
                mm[np.nonzero(m)[0]] = ex[pos] == sub
                m = mm
        return t.filter(pa.array(~m if anti else m))

    return big.map_batches(prune, batch_format="pyarrow")
