"""Skip-gram token co-occurrence with PMI scoring.

The collocation/embedding-prep primitive (word2vec's skip-gram counting,
Church & Hanks 1990 pointwise mutual information): unordered token pairs
co-occurring within a ±``window`` position offset, scored

    pmi(x, y) = ln( (c_xy / N_pair) / ((c_x / N_tok) * (c_y / N_tok)) )

Ray shape (100 TB-safe): pair emission is a stateless ``map_batches``
that pre-combines counts inside the batch (pa.TableGroupBy) before the
ONE vocabulary²-bounded shuffle — the stream's size never reaches the
reducer, only (pair, partial-count) rows do. Unigram counts take the
same partial-combine path (vocabulary-bounded). The normalizers N_pair /
N_tok are sums OVER the two count relations, so no extra pass over the
corpus. The final PMI map broadcasts the unigram table via ``ray.put``
(vocabulary-bounded by definition of a token vocabulary; for web-scale
vocabularies raise ``max_broadcast_vocab`` thresholds or pre-prune with
``min_count`` pushed into the partial combine).

Tokenization parity with the DuckDB oracle: lowercase, whitespace split
of trimmed text; pairs are positions (i, j), i < j <= i + window, within
one document; unordered identity is lexicographic (least, greatest) —
INCLUDING x == y pairs (a token near itself), which the oracle counts
identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

PAIR_SCHEMA = pa.schema(
    [("tok_x", pa.string()), ("tok_y", pa.string()), ("c", pa.int64())]
)
UNI_SCHEMA = pa.schema([("tok", pa.string()), ("c", pa.int64())])
OUT_SCHEMA = pa.schema(
    [
        ("tok_x", pa.string()),
        ("tok_y", pa.string()),
        ("pair_count", pa.int64()),
        ("pmi", pa.float64()),
    ]
)


def _token_arrays(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Flat lowercase token array + per-doc offsets."""
    toks: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        tt = (t or "").strip().lower().split()
        toks.extend(tt)
        offsets[i + 1] = len(toks)
    return np.array(toks, dtype=object), offsets


def cooccurrence_pmi(
    docs: ray.data.Dataset,
    window: int = 3,
    min_count: int = 5,
    text_col: str = "text",
    max_broadcast_vocab: int = 10_000_000,
) -> ray.data.Dataset:
    """(tok_x, tok_y, pair_count, pmi) for unordered within-window token
    pairs seen >= min_count times across the corpus."""

    def pair_partial(t: pa.Table) -> pa.Table:
        toks, off = _token_arrays(t.column(text_col).to_pylist())
        xs, ys = [], []
        for s, e in zip(off[:-1], off[1:]):
            seg = toks[s:e]
            for d in range(1, window + 1):
                if len(seg) <= d:
                    break
                xs.append(seg[:-d])
                ys.append(seg[d:])
        if not xs:
            return PAIR_SCHEMA.empty_table()
        a = np.concatenate(xs)
        b = np.concatenate(ys)
        swap = a.astype(str) > b.astype(str)
        x = np.where(swap, b, a)
        y = np.where(swap, a, b)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "tok_x": pa.array(x.tolist(), pa.string()),
                    "tok_y": pa.array(y.tolist(), pa.string()),
                }
            ),
            ["tok_x", "tok_y"],
        ).aggregate([([], "count_all")])
        return g.rename_columns(["tok_x", "tok_y", "c"]).cast(PAIR_SCHEMA)

    def uni_partial(t: pa.Table) -> pa.Table:
        toks, _ = _token_arrays(t.column(text_col).to_pylist())
        if len(toks) == 0:
            return UNI_SCHEMA.empty_table()
        g = pa.TableGroupBy(
            pa.table({"tok": pa.array(toks.tolist(), pa.string())}), "tok"
        ).aggregate([([], "count_all")])
        return g.rename_columns(["tok", "c"]).cast(UNI_SCHEMA)

    from record_matching_ray.stages.util import conformed

    # materialized: consumed twice (N_pair normalizer + final PMI map) and
    # vocabulary²-bounded, so caching beats re-running the corpus shuffle
    pair_counts = conformed(
        conformed(docs.map_batches(pair_partial, batch_format="pyarrow"), PAIR_SCHEMA)
        .groupby(["tok_x", "tok_y"])
        .sum("c")
        .rename_columns({"sum(c)": "c"}),
        PAIR_SCHEMA,
    ).materialize()
    uni_counts = conformed(
        conformed(docs.map_batches(uni_partial, batch_format="pyarrow"), UNI_SCHEMA)
        .groupby("tok")
        .sum("c")
        .rename_columns({"sum(c)": "c"}),
        UNI_SCHEMA,
    )

    # vocabulary-bounded collections (gated)
    uni_tbl = pa.concat_tables(
        [
            t
            for t in uni_counts.iter_batches(batch_format="pyarrow", batch_size=65536)
            if t.num_rows
        ]
        or [UNI_SCHEMA.empty_table()]
    )
    if uni_tbl.num_rows > max_broadcast_vocab:
        raise ValueError(
            f"cooccurrence_pmi vocab gate: {uni_tbl.num_rows} unigrams > "
            f"{max_broadcast_vocab}"
        )
    toks = np.array(uni_tbl.column("tok").to_pylist(), dtype=object).astype(str)
    cs = uni_tbl.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(toks)
    toks, cs = toks[order], cs[order]
    n_tok = float(cs.sum())
    n_pair = float(
        pair_counts.aggregate(ray.data.aggregate.Sum("c"))["sum(c)"] or 0
    )
    uni_ref = ray.put((toks, cs))

    def pmi_map(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        keep = c >= min_count
        t = t.filter(pa.array(keep))
        c = c[keep]
        if len(c) == 0:
            return OUT_SCHEMA.empty_table()
        ks, vs = ray.get(uni_ref) if isinstance(uni_ref, ray.ObjectRef) else uni_ref
        x = np.array(t.column("tok_x").to_pylist(), dtype=object).astype(str)
        y = np.array(t.column("tok_y").to_pylist(), dtype=object).astype(str)
        cx = vs[np.searchsorted(ks, x)]
        cy = vs[np.searchsorted(ks, y)]
        # round-6 output convention (reduction-order parity with SQL)
        pmi = np.round(np.log((c / n_pair) / ((cx / n_tok) * (cy / n_tok))), 6)
        return pa.table(
            {
                "tok_x": t.column("tok_x"),
                "tok_y": t.column("tok_y"),
                "pair_count": pa.array(c.astype(np.int64), pa.int64()),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return conformed(
        pair_counts.map_batches(pmi_map, batch_format="pyarrow"), OUT_SCHEMA
    )


__all__ = ["cooccurrence_pmi"]
