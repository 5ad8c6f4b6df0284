"""Sequence packing for LLM training: map every document to its range of
fixed-length training sequences under the "concatenate then chunk" rule.

Documents are concatenated in doc_id order into one virtual token stream,
which is cut into sequences of ``cap`` tokens; each doc spans sequences
[first_seq, last_seq]. This is the standard packing layout (GPT-style
pretraining): no padding waste, deterministic, and — unlike greedy
bin-packing — expressible as a PREFIX SUM, which distributes.

Distributed prefix-sum layout (the scale story):
1. shard = doc_id // shard_size — a priori partitioning key, no shuffle
   needed to discover it;
2. per-shard token totals via the partial-aggregate pattern (one row per
   shard leaves each batch);
3. the driver computes the exclusive prefix over the ~n/shard_size shard
   totals (tiny) and broadcasts the offsets via ray.put;
4. one groupby(shard) pass computes in-shard cumulative sums locally and
   adds the shard offset: global positions without any global sort.

Oracle: a SQL window ``SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED
PRECEDING ... 1 PRECEDING)`` reproduces the global prefix exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from record_matching_ray.stages.textstats import _WS_SPLIT
from record_matching_ray.stages.util import conformed


def pack_sequences(
    docs: ray.data.Dataset,
    cap: int = 512,
    shard_size: int = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, n_tokens, first_seq, last_seq) per document.

    n_tokens is the \\s+ token count of trimmed text (same rule as
    token_stats); first/last_seq = floor(cum_before / cap),
    floor((cum_before + n_tokens - 1) / cap) over the doc_id-ordered
    concatenation."""

    def counts(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        n = np.fromiter(
            (len(_WS_SPLIT.split(s.strip())) for s in texts),
            dtype=np.int64,
            count=len(texts),
        )
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "shard": pa.array(ids // shard_size, pa.int64()),
            }
        )

    counted = docs.map_batches(counts, batch_format="pyarrow")

    # per-shard totals: batch partials -> one tiny groupby
    def shard_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["shard", "n_tokens"]), "shard").aggregate(
            [("n_tokens", "sum")]
        )
        return g.rename_columns(["shard", "total"])

    totals = (
        counted.map_batches(shard_partial, batch_format="pyarrow")
        .groupby("shard")
        .sum("total")
        .rename_columns({"sum(total)": "total"})
        .take_all()
    )  # ~n_docs/shard_size rows — driver-safe by construction
    totals.sort(key=lambda r: r["shard"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in totals:
        offsets[int(r["shard"])] = acc
        acc += int(r["total"])
    offsets_ref = ray.put(offsets)

    def pack_shard(g: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref) if isinstance(offsets_ref, ray.ObjectRef) else offsets_ref
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids_s, n_s = ids[order], n[order]
        base = offs[int(ids_s[0] // shard_size)]
        cum_before = base + np.concatenate(([0], np.cumsum(n_s)[:-1]))
        first = cum_before // cap
        last = (cum_before + np.maximum(n_s, 1) - 1) // cap
        return pa.table(
            {
                id_col: pa.array(ids_s, pa.int64()),
                "n_tokens": pa.array(n_s, pa.int64()),
                "first_seq": pa.array(first, pa.int64()),
                "last_seq": pa.array(last, pa.int64()),
            }
        )

    out = counted.groupby("shard").map_groups(pack_shard, batch_format="pyarrow")
    return conformed(
        out,
        pa.schema(
            [
                (id_col, pa.int64()),
                ("n_tokens", pa.int64()),
                ("first_seq", pa.int64()),
                ("last_seq", pa.int64()),
            ]
        ),
    )


def chunk_documents(
    docs: ray.data.Dataset,
    chunk_size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Fixed-size token chunks with overlap — the RAG / context-window
    preparation transform. Chunk c of a doc covers tokens
    [c*step, c*step + chunk_size) with step = chunk_size - overlap; the
    final chunk may be shorter; empty docs emit nothing.

    Output: (doc_id, chunk_id, n_tokens, chunk_text). Stateless
    flat-emission map_batches — embarrassingly parallel, output rows ~
    (1 + overlap/chunk_size) x input tokens, no shuffle. Tokenization is
    the \\s+ rule shared with token_stats and its SQL oracle."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap

    def emit(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        out_id, out_chunk, out_n, out_text = [], [], [], []
        for i, s in enumerate(t.column(text_col).to_pylist()):
            toks = _WS_SPLIT.split(s.strip()) if s and s.strip() else []
            n = len(toks)
            for c, start in enumerate(range(0, n, step)):
                seg = toks[start : start + chunk_size]
                out_id.append(ids[i])
                out_chunk.append(c)
                out_n.append(len(seg))
                out_text.append(" ".join(seg))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "chunk_id": pa.array(out_chunk, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "chunk_text": pa.array(out_text, pa.string()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pyarrow"
    )
