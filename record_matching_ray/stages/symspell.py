"""Deletion-neighborhood (FastSS / SymSpell) edit-distance self-join.

Finds every pair of records whose string field is within Levenshtein
distance <= 1 WITHOUT an all-pairs comparison: two strings are within
distance 1 iff they share a member of {s} ∪ {s with one char deleted}
(Bocek et al. 2007, "Fast Similarity Search in Large Dictionaries").
Each record therefore emits len(s)+1 deletion-variant hash keys, one
``groupby(key)`` shuffle co-locates all candidates, and an exact
vectorized Levenshtein verify inside each bucket keeps only true pairs.

Reference analog: the reference's candidate generation is ANN blocking
(record_matching/main.py:552-577) and its PoCs use plain Levenshtein
name similarity (claude_poc/entity-resolution_v4.py:588-603); this
stage contributes the classical *exact* small-edit-distance blocking
technique the reference lacks — the right tool for typo-level name
dedup where LSH recall is probabilistic.

Scale: emission blow-up is O(L) keys per row (L = string length), keys
are 64-bit hashes shuffled once; bucket sizes are bounded by the
deletion-variant fan-in (alphabet-sized, not corpus-sized). A bucket
over max_bucket RAISES by default (capping would break the exact-join
contract); opt-in on_overflow="count" caps with a sentinel accounting
row that survives the pair fold (blocking.py principle: caps must
never be silent). Pair dedup (the same pair found
via several shared variants) goes through the int-keyed packed
pair-hash fold (stages/dedup.py:fold_candidate_pairs), never a
composite-key groupby. Verification is the Myers bit-parallel
Levenshtein (functions/strsim.py), vectorized over the bucket's pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.functions.hashing import hash_strings
from record_matching_ray.functions.strsim import _codepoint_matrix, levenshtein_vec
from record_matching_ray.stages.dedup import (
    _append_sentinel,
    _bucket_overflow,
    _check_overflow,
    fold_candidate_pairs,
)
from record_matching_ray.stages.util import conformed


def _deletion_variants(names: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """All 1-deletion variants of each name, vectorized.

    Returns (row_idx, variant_strings): one entry per (name, deleted
    position) with position < len(name). The full (undeleted) string is
    NOT included — callers emit it separately."""
    mat, lengths = _codepoint_matrix(names)
    n, L = mat.shape
    if n == 0 or L == 0:
        return np.zeros(0, np.int64), np.zeros(0, dtype="<U1")
    rows_out: list[np.ndarray] = []
    vars_out: list[np.ndarray] = []
    width = max(L - 1, 1)
    for i in range(L):
        mask = lengths > i
        if not mask.any():
            break
        sub = np.concatenate(
            [mat[mask][:, :i], mat[mask][:, i + 1 :]], axis=1
        )
        if sub.shape[1] < width:
            pad = np.zeros((sub.shape[0], width - sub.shape[1]), np.uint32)
            sub = np.concatenate([sub, pad], axis=1)
        # contiguous (n, width) uint32 -> '<Uwidth' strings; numpy strips
        # the 0-codepoint padding on conversion, so equal variant strings
        # hash equal regardless of each batch's padded width
        strs = np.ascontiguousarray(sub).view(f"<U{width}").ravel()
        rows_out.append(np.nonzero(mask)[0].astype(np.int64))
        vars_out.append(strs)
    return np.concatenate(rows_out), np.concatenate(vars_out)


def deletion_join(
    ds: ray.data.Dataset,
    id_col: str,
    name_col: str,
    max_bucket: int = 512,
    on_overflow: str = "raise",
) -> ray.data.Dataset:
    """Self-join: all (left, right, dist) id pairs with
    ``levenshtein(name_left, name_right) <= 1``, left < right, deduped.

    ``ds`` must carry one row per id (distinct ids); duplicate names on
    distinct ids match at distance 0.

    Bucket-cap policy (ADVICE r3 item 1 — the cap must never silently
    drop true edit-distance pairs): on_overflow="raise" (default) fails
    loudly in the worker the moment any deletion-variant bucket exceeds
    max_bucket, because a capped bucket breaks this operator's EXACT-join
    contract. on_overflow="count" caps observably instead: the output
    gains an `overflow` int64 column (0 on real pairs) plus at most one
    left=-1 accounting row totalling every dropped candidate pair —
    summed forward through fold_candidate_pairs, so the count survives
    even when a capped bucket's surviving candidates all fail the
    Levenshtein verify."""

    def emit_keys(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        names = t.column(name_col).to_pylist()
        full_keys = hash_strings(names)
        rows, variants = _deletion_variants(names)
        var_keys = hash_strings(variants) if len(variants) else np.zeros(0, np.uint64)
        all_keys = np.concatenate([full_keys, var_keys]).view(np.int64)
        all_rows = np.concatenate([np.arange(len(ids), dtype=np.int64), rows])
        name_arr = pa.array(names, pa.string())
        take = pa.array(all_rows, pa.int64())
        return pa.table(
            {
                "bk": pa.array(all_keys, pa.int64()),
                "id": pa.array(ids[all_rows], pa.int64()),
                "nm": name_arr.take(take),
            }
        )

    EMPTY = pa.table(
        {
            "left": pa.array([], pa.int64()),
            "right": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
            "overflow": pa.array([], pa.int64()),
        }
    )

    def verify_partition(g: pa.Table) -> pa.Table:
        """All buckets of one coarse partition in ONE dispatch: lexsort
        by bucket key, sweep segments (most are singletons — skipped in
        bulk), emit candidate index pairs, then ONE vectorized
        Levenshtein call over every candidate in the partition.
        blocking.py:570-575 measured this coarse-key layout against
        per-group map_groups dispatch (~1ms/group kills 10^5 tiny
        buckets)."""
        bk = g.column("bk").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bk))
        bk, ids = bk[order], ids[order]
        names = np.asarray(g.column("nm").to_pylist(), dtype=object)[order]
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], len(bk)]
        multi = np.flatnonzero(ends - starts >= 2)
        if len(multi) == 0:
            return EMPTY
        ia_all, ib_all = [], []
        total_over = 0
        for si in multi:
            s, e = starts[si], ends[si]
            # same id can hit one bucket via two deletions of its own
            # name (ids sorted within the segment -> unique keeps order)
            seg_ids = ids[s:e]
            keep_first = np.r_[True, seg_ids[1:] != seg_ids[:-1]]
            idx = s + np.flatnonzero(keep_first)
            m = len(idx)
            if m < 2:
                continue
            over = _bucket_overflow(m, max_bucket)
            # loud by default: a capped bucket breaks the exact-join
            # contract (ADVICE r3 item 1); "count" totals drops into the
            # partition sentinel below
            _check_overflow(over, m, max_bucket, on_overflow)
            if m > max_bucket:
                total_over += over
                idx = idx[:max_bucket]
                m = max_bucket
            a, b = np.triu_indices(m, k=1)
            ia_all.append(idx[a])
            ib_all.append(idx[b])
        if not ia_all and not total_over:
            return EMPTY
        if ia_all:
            ia = np.concatenate(ia_all)
            ib = np.concatenate(ib_all)
            d = levenshtein_vec(names[ia], names[ib])
            keep = d <= 1
            left = ids[ia[keep]]
            right = ids[ib[keep]]
            lo = np.minimum(left, right)
            hi = np.maximum(left, right)
            dk = d[keep]
        else:
            lo = hi = np.zeros(0, np.int64)
            dk = np.zeros(0, np.int64)
        # one sentinel accounting row per partition totals the dropped
        # pairs — survives the fold and empty-verify buckets alike
        lo, hi, dk, ovs = _append_sentinel(lo, hi, dk, total_over)
        if len(lo) == 0:
            return EMPTY
        return pa.table(
            {
                "left": pa.array(lo, pa.int64()),
                "right": pa.array(hi, pa.int64()),
                "dist": pa.array(dk, pa.int64()),
                "overflow": pa.array(ovs, pa.int64()),
            }
        )

    from record_matching_ray.stages.util import coarse_groupby_partitions

    n_parts = coarse_groupby_partitions()

    def add_pk(t: pa.Table) -> pa.Table:
        bk = t.column("bk").to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "pk", pa.array((bk % np.uint64(n_parts)).astype(np.int64), pa.int64())
        )

    cand = (
        ds.map_batches(emit_keys, batch_format="pyarrow")
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(verify_partition, batch_format="pyarrow")
    )
    # raise mode never emits sentinels -> keep the pinned 3-column schema;
    # count mode carries the overflow column through the fold
    ov_col = "overflow" if on_overflow == "count" else None
    out = fold_candidate_pairs(
        cand, "dist", pa.int64(), take_max=False, overflow_col=ov_col
    )
    fields = [("left", pa.int64()), ("right", pa.int64()), ("dist", pa.int64())]
    if ov_col:
        fields.append(("overflow", pa.int64()))
    return conformed(out, pa.schema(fields))
