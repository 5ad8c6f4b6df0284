"""Intra-corpus duplicated-span rate: per document, the fraction of its
token n-grams that also occur in at least one OTHER document.

The corpus-level diagnostic behind exact-substring training-data dedup
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better"): before deleting duplicated spans you measure them. Extends the
reference's whole-content dedup table (record_matching/context.py:15-20)
from document identity to span overlap.

Ray shape (100 TB-safe): NO join on the big side. The gram stream
(gram_hash, doc_id, multiplicity) takes exactly ONE hash shuffle — a
groupby(gram) whose aggregate (count, sum, max) tells us, for
document-frequency-1 grams, which single doc owns them and with what
multiplicity. Per-doc totals come straight off the tokenizer batch (a doc
is never split across batches), so

    dup_grams(doc) = total_grams(doc) - sum of m over its df==1 grams

needs only a second, tiny shuffle keyed by doc_id over ~1 row/doc. The
docs relation is consumed twice (gram emission + total counting); both
passes read only (id, text) columns.

Tokenization parity with the DuckDB oracle: lowercase, whitespace split
of trimmed text, STRICT n-grams (docs shorter than n tokens emit nothing
and are absent from the output — same as the SQL side). N-gram identity
is the 64-bit polynomial combine over token hashes
(functions/hashing.py:93), so equality is token-sequence equality modulo
64-bit collisions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.functions.hashing import combine_rows, hash_strings
from record_matching_ray.stages.util import conformed, shuffle_partitions

_GRAM_SCHEMA = pa.schema(
    [("gram", pa.int64()), ("doc_id", pa.int64()), ("m", pa.int64())]
)
_ACC_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("total", pa.int64()), ("uniq", pa.int64())]
)
_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_grams", pa.int64()),
        ("dup_grams", pa.int64()),
        ("dup_frac", pa.float64()),
    ]
)


def _tokenize(texts: list[str]) -> tuple[list[str], np.ndarray]:
    """Flat lowercase token stream + per-doc offsets (strict split)."""
    toks: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        tt = (t or "").strip().lower().split()
        toks.extend(tt)
        offsets[i + 1] = len(toks)
    return toks, offsets


def dup_ngram_rate(
    docs: ray.data.Dataset,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, n_grams, dup_grams, dup_frac) for every doc with >= n
    tokens; dup_grams counts n-gram occurrences (with multiplicity) whose
    gram appears in >= 2 distinct documents."""

    def gram_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        toks, off = _tokenize(t.column(text_col).to_pylist())
        th = hash_strings(toks) if toks else np.empty(0, dtype=np.uint64)
        grams: list[np.ndarray] = []
        doc_ids: list[np.ndarray] = []
        ms: list[np.ndarray] = []
        for i in range(len(ids)):
            seg = th[off[i] : off[i + 1]]
            if len(seg) < n:
                continue
            win = np.lib.stride_tricks.sliding_window_view(seg, n)
            g, m = np.unique(combine_rows(np.ascontiguousarray(win)),
                             return_counts=True)
            grams.append(g.view(np.int64))
            doc_ids.append(np.full(len(g), ids[i], dtype=np.int64))
            ms.append(m.astype(np.int64))
        if not grams:
            return _GRAM_SCHEMA.empty_table()
        return pa.table(
            {
                "gram": pa.array(np.concatenate(grams), pa.int64()),
                "doc_id": pa.array(np.concatenate(doc_ids), pa.int64()),
                "m": pa.array(np.concatenate(ms), pa.int64()),
            }
        )

    def total_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        _, off = _tokenize(t.column(text_col).to_pylist())
        lens = np.diff(off)
        total = np.maximum(lens - n + 1, 0)
        keep = total > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep].astype(np.int64), pa.int64()),
                "total": pa.array(total[keep], pa.int64()),
                "uniq": pa.array(np.zeros(int(keep.sum()), np.int64), pa.int64()),
            }
        )

    gm = conformed(
        docs.map_batches(gram_rows, batch_format="pyarrow"), _GRAM_SCHEMA
    )
    per_gram = gm.groupby("gram").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("m"),
        ray.data.aggregate.Max("doc_id"),
    )

    def uniq_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "count()" not in t.column_names:
            return _ACC_SCHEMA.empty_table()
        df = t.column("count()").to_numpy(zero_copy_only=False)
        keep = df == 1
        owner = t.column("max(doc_id)").to_numpy(zero_copy_only=False)[keep]
        msum = t.column("sum(m)").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "doc_id": pa.array(owner.astype(np.int64), pa.int64()),
                "total": pa.array(np.zeros(len(owner), np.int64), pa.int64()),
                "uniq": pa.array(msum.astype(np.int64), pa.int64()),
            }
        )

    uniq = per_gram.map_batches(uniq_rows, batch_format="pyarrow")
    totals = conformed(
        docs.map_batches(total_rows, batch_format="pyarrow"), _ACC_SCHEMA
    )
    acc = (
        totals.union(uniq)
        .groupby("doc_id")
        .aggregate(ray.data.aggregate.Sum("total"), ray.data.aggregate.Sum("uniq"))
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(total)" not in t.column_names:
            return _OUT_SCHEMA.empty_table()
        total = t.column("sum(total)").to_numpy(zero_copy_only=False)
        uniq_m = t.column("sum(uniq)").to_numpy(zero_copy_only=False)
        keep = total > 0
        total = total[keep].astype(np.int64)
        dup = total - uniq_m[keep].astype(np.int64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "n_grams": pa.array(total, pa.int64()),
                "dup_grams": pa.array(dup, pa.int64()),
                "dup_frac": pa.array(dup / total, pa.float64()),
            }
        )

    return conformed(
        acc.map_batches(finish, batch_format="pyarrow"), _OUT_SCHEMA
    )


__all__ = ["dup_ngram_rate"]
