"""Deterministic corpus sampling operators.

Web-scale training-data pipelines need samples that are (a) reproducible
across runs and engines (no RNG state, no partition-order dependence) and
(b) computable streaming with no global pass. Both operators key off the
md5 of row content, so the SAME rows are selected no matter how the data
is partitioned, resumed, or re-run — and a DuckDB oracle can replicate
the selection exactly (md5 is md5 everywhere).

- ``sample_by_hash``: Bernoulli(rate) via "first 8 md5 hex chars below a
  threshold" — the standard hash-mod sampling used for held-out splits.
  Pure map_batches filter, zero shuffle.
- ``stratified_sample``: exactly n rows per stratum, the n with the
  smallest content hashes — one tiny shuffle of per-batch local winners
  (each batch forwards at most n rows per stratum it saw, so the final
  per-stratum sort touches O(n_batches * n) rows, never the corpus).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.stages.util import conformed


def _md5_prefixes(texts: list[str], k: int = 8) -> list[str]:
    return [
        hashlib.md5(t.encode("utf-8", "surrogatepass")).hexdigest()[:k]
        for t in texts
    ]


def rate_to_hex_threshold(rate: float) -> str:
    """Largest 8-hex-digit string h such that P(md5[:8] < h) ~= rate.
    Shared with the SQL oracle (substr(md5(col),1,8) < '<h>')."""
    t = int(rate * (1 << 32))
    return format(min(t, (1 << 32) - 1), "08x")


def sample_by_hash(
    ds: ray.data.Dataset,
    col: str = "text",
    rate: float = 0.1,
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> ray.data.Dataset:
    """Deterministic Bernoulli sample: keep rows whose md5(col) prefix is
    below the rate threshold. Selection depends only on row content."""
    thr = rate_to_hex_threshold(rate)

    def keep(t: pa.Table) -> pa.Table:
        h = _md5_prefixes(t.column(col).to_pylist())
        mask = pa.array([x < thr for x in h], pa.bool_())
        return t.select(list(keep_cols)).filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds: ray.data.Dataset,
    strata_col: str,
    n_per_stratum: int,
    hash_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> ray.data.Dataset:
    """Exactly min(n, |stratum|) rows per stratum: the n rows with the
    smallest md5(hash_col) (ties broken by the hash's own uniqueness).

    Two-phase top-n: each batch keeps its local n smallest per stratum
    (so the shuffle moves O(batches * strata * n) rows), then one
    groupby(strata) picks the global n smallest. Output columns:
    keep_cols + strata_col + sample_rank (1-based by hash order)."""

    def local_topn(t: pa.Table) -> pa.Table:
        h = np.asarray(_md5_prefixes(t.column(hash_col).to_pylist(), 32), dtype=object)
        strata = np.asarray(
            [x if x is not None else "" for x in t.column(strata_col).to_pylist()],
            dtype=object,
        )
        order = np.lexsort((h, strata))
        keep_idx = []
        start = 0
        for i in range(1, len(order) + 1):
            if i == len(order) or strata[order[i]] != strata[order[start]]:
                keep_idx.extend(order[start : min(start + n_per_stratum, i)])
                start = i
        idx = pa.array(np.asarray(keep_idx, dtype=np.int64))
        out = t.select(list(keep_cols) + [strata_col]).take(idx)
        return out.append_column("h", pa.array([h[k] for k in keep_idx], pa.string()))

    def final_topn(g: pa.Table) -> pa.Table:
        h = np.asarray(g.column("h").to_pylist(), dtype=object)
        strata = np.asarray(
            [x if x is not None else "" for x in g.column(strata_col).to_pylist()],
            dtype=object,
        )
        order = np.lexsort((h, strata))
        keep_idx, ranks = [], []
        start = 0
        for i in range(1, len(order) + 1):
            if i == len(order) or strata[order[i]] != strata[order[start]]:
                chosen = order[start : min(start + n_per_stratum, i)]
                keep_idx.extend(chosen)
                ranks.extend(range(1, len(chosen) + 1))
                start = i
        out = g.select(list(keep_cols) + [strata_col]).take(
            pa.array(np.asarray(keep_idx, dtype=np.int64))
        )
        return out.append_column(
            "sample_rank", pa.array(np.asarray(ranks, dtype=np.int64), pa.int64())
        )

    local = ds.map_batches(local_topn, batch_format="pyarrow")
    out = local.groupby(strata_col).map_groups(final_topn, batch_format="pyarrow")
    fields = [(c, pa.int64() if c == "doc_id" else pa.string()) for c in keep_cols]
    schema = pa.schema(
        fields + [(strata_col, pa.string()), ("sample_rank", pa.int64())]
    )
    return conformed(out, schema)


def weighted_sample_topk(
    ds: ray.data.Dataset,
    weight_col: str,
    k: int,
    hash_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic weighted sampling without replacement — the k rows
    with the largest u^(1/w), u = md5_number_lower(hash_col) / 2^64
    (Efraimidis & Spirakis 2006 A-ES keys). Content-hash randomness keeps
    the selection reproducible across runs/partitionings, and a SQL
    oracle recomputes the identical keys (DuckDB md5_number_lower + pow;
    glibc pow is correctly rounded, and keys round to 9 decimals with
    id tie-break so last-ulp library drift cannot flip the selection).

    Distributed top-k: each batch forwards only its local k largest keys,
    the final exact cut sorts O(n_batches * k) rows — the corpus itself
    never shuffles. Output: (id, weight, wkey), the sampled rows."""
    from record_matching_ray.functions.hashing import hash_strings, md5_lower64

    def keyed_topk(t: pa.Table) -> pa.Table:
        h = hash_strings(t.column(hash_col).to_pylist(), hash_fn=md5_lower64)
        u = h.astype(np.float64) / 18446744073709551616.0
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        wkey = np.round(u ** (1.0 / w), 9)
        order = np.lexsort((ids, -wkey))[: min(k, len(ids))]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                weight_col: t.column(weight_col).take(
                    pa.array(order, pa.int64())
                ),
                "wkey": pa.array(wkey[order], pa.float64()),
            }
        )

    local = ds.select_columns([id_col, weight_col, hash_col]).map_batches(
        keyed_topk, batch_format="pyarrow"
    )
    return local.sort(["wkey", id_col], descending=[True, False]).limit(k)
