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


_OCC_SCHEMA = pa.schema(
    [("pk", pa.int64()), ("gram", pa.int64()), ("doc_id", pa.int64()),
     ("pos", pa.int64())]
)
_POS_SCHEMA = pa.schema(
    [("pk2", pa.int64()), ("doc_id", pa.int64()), ("pos", pa.int64()),
     ("text", pa.string())]
)
_CLEAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("clean_text", pa.string()),
        ("n_tokens", pa.int64()),
        ("n_removed", pa.int64()),
    ]
)


def dedup_spans(
    docs: ray.data.Dataset,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact duplicated-span REMOVAL — the transform dup_ngram_rate only
    measures (Lee et al. 2022 exact-substring dedup): every token covered
    by an n-gram that occurs in >= 2 distinct documents is dropped;
    output is (doc_id, clean_text, n_tokens, n_removed) for EVERY doc
    (short docs pass through normalized). Text normalization is the
    measurement op's: trim, lowercase, whitespace tokens, single-space
    rejoin — clean_text is a token stream, not byte-preserving.

    Ray shape: two coarse-pk shuffles, both vectorized sweeps (never a
    group per gram/doc):
    1. gram-occurrence rows (gram, doc, pos) co-locate by gram % P; one
       lexsorted sweep finds grams with >= 2 distinct docs and emits
       their (doc, pos) occurrences. Shuffle volume is one row per gram
       OCCURRENCE — the honest O(corpus tokens) cost of exact span
       removal (Lee et al. pay the same bound via suffix arrays).
    2. duplicated positions + the doc text co-locate by doc % P (tagged
       union, no join); a diff-array coverage mask rebuilds each doc.
    """
    from record_matching_ray.functions.hashing import _U64, mix64

    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions

    def occ_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        toks, off = _tokenize(t.column(text_col).to_pylist())
        th = hash_strings(toks) if toks else np.empty(0, dtype=np.uint64)
        grams, doc_ids, poss = [], [], []
        for i in range(len(ids)):
            seg = th[off[i] : off[i + 1]]
            if len(seg) < n:
                continue
            win = np.lib.stride_tricks.sliding_window_view(seg, n)
            g = combine_rows(np.ascontiguousarray(win)).view(np.int64)
            grams.append(g)
            doc_ids.append(np.full(len(g), ids[i], dtype=np.int64))
            poss.append(np.arange(len(g), dtype=np.int64))
        if not grams:
            return _OCC_SCHEMA.empty_table()
        gg = np.concatenate(grams)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(gg.astype(_U64)) % _U64(P)).astype(np.int64),
                    pa.int64(),
                ),
                "gram": pa.array(gg, pa.int64()),
                "doc_id": pa.array(np.concatenate(doc_ids), pa.int64()),
                "pos": pa.array(np.concatenate(poss), pa.int64()),
            }
        )

    def dup_sweep(g: pa.Table) -> pa.Table:
        gr = g.column("gram").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, gr))
        gr_s, id_s, pos_s = gr[order], ids[order], pos[order]
        new_seg = np.concatenate(([True], gr_s[1:] != gr_s[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        # distinct docs per gram segment: count doc-change points + 1
        doc_change = np.concatenate(
            ([False], (id_s[1:] != id_s[:-1]) & ~new_seg[1:])
        )
        n_seg = seg_id[-1] + 1 if len(seg_id) else 0
        distinct = np.ones(n_seg, dtype=np.int64)
        np.add.at(distinct, seg_id[doc_change], 1)
        keep = distinct[seg_id] >= 2
        return pa.table(
            {
                "pk2": pa.array(
                    (mix64(id_s[keep].astype(_U64)) % _U64(P)).astype(np.int64),
                    pa.int64(),
                ),
                "doc_id": pa.array(id_s[keep], pa.int64()),
                "pos": pa.array(pos_s[keep], pa.int64()),
                "text": pa.array([None] * int(keep.sum()), pa.string()),
            }
        )

    occ = conformed(
        docs.map_batches(occ_rows, batch_format="pyarrow"), _OCC_SCHEMA
    )
    dup_pos = occ.groupby("pk").map_groups(
        lambda g: dup_sweep(g.drop_columns(["pk"])), batch_format="pyarrow"
    )

    def text_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pk2": pa.array(
                    (mix64(ids.astype(_U64)) % _U64(P)).astype(np.int64),
                    pa.int64(),
                ),
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(np.full(len(ids), -1), pa.int64()),
                "text": t.column(text_col),
            }
        )

    tagged = conformed(dup_pos, _POS_SCHEMA).union(
        conformed(
            docs.map_batches(text_rows, batch_format="pyarrow"), _POS_SCHEMA
        )
    )

    def rebuild(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        texts = g.column("text").to_pylist()
        order = np.lexsort((pos, ids))
        out_id, out_text, out_nt, out_rm = [], [], [], []
        start = 0
        m = len(order)
        for i in range(1, m + 1):
            if i == m or ids[order[i]] != ids[order[start]]:
                seg = order[start:i]
                start = i
                # text row sorts first (pos=-1)
                if pos[seg[0]] != -1:
                    continue  # positions without a text row (can't happen)
                text = texts[seg[0]]
                toks = (text or "").strip().lower().split()
                L = len(toks)
                diff = np.zeros(L + n + 1, dtype=np.int64)
                for j in seg[1:]:
                    p = pos[j]
                    diff[p] += 1
                    diff[min(p + n, L)] -= 1
                covered = np.cumsum(diff[:L]) > 0 if L else np.zeros(0, bool)
                kept = [t_ for t_, c in zip(toks, covered) if not c]
                out_id.append(int(ids[seg[0]]))
                out_text.append(" ".join(kept))
                out_nt.append(L)
                out_rm.append(int(covered.sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "clean_text": pa.array(out_text, pa.string()),
                "n_tokens": pa.array(out_nt, pa.int64()),
                "n_removed": pa.array(out_rm, pa.int64()),
            }
        )

    out = tagged.groupby("pk2").map_groups(
        lambda g: rebuild(g.drop_columns(["pk2"])), batch_format="pyarrow"
    )
    return conformed(out, _CLEAN_SCHEMA)


__all__ = ["dup_ngram_rate", "dedup_spans"]
