"""Benchmark decontamination: flag corpus documents that share any token
n-gram with a benchmark/eval set.

The standard "remove eval contamination" pass for training corpora
(GPT-3 appendix-C / PaLM-style n-gram filtering) — the corpus-curation
sibling of the reference's dedup table (record_matching/context.py:15-20),
generalized from whole-content equality to n-gram containment against a
designated contamination source.

Ray shape (100 TB-safe): the benchmark side is SMALL by definition (eval
sets are 10^3..10^6 rows), so its distinct n-gram hashes are reduced once
— per-batch unique, driver-side merge bounded by the benchmark vocabulary
— and broadcast via ``ray.put``. The corpus side is ONE stateless
``map_batches`` doing a vectorized ``np.isin``-style membership test
against the sorted hash array: no shuffle, no join, nothing scales with
corpus size but the stream itself.

Tokenization parity (for the DuckDB oracle): lowercase, ``\\s+`` split of
trimmed text, STRICT n-grams (a doc with fewer than n tokens has none) —
matching ``string_split_regex(trim(lower(text)), '\\s+')`` slices. N-gram
identity is by 64-bit polynomial hash of the token-hash window
(functions/hashing.py), so Ray-side equality is token-sequence equality
modulo 64-bit collisions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from record_matching_ray.functions.hashing import _U64, hash_strings


def _strict_ngram_hashes(texts: list[str], n: int) -> tuple[np.ndarray, np.ndarray]:
    """All strict token-n-gram hashes of a text batch.

    Returns (flat_hashes, offsets) where doc i owns
    ``flat[offsets[i]:offsets[i+1]]``. One vectorized hash over the
    batch's token stream; the n-gram combine is a sliding-window
    polynomial over token hashes (no n-gram strings are materialized).
    """
    from record_matching_ray.functions.hashing import combine_rows
    from record_matching_ray.stages.textstats import _WS_SPLIT

    toks: list[str] = []
    tok_offsets = [0]
    for t in texts:
        tt = _WS_SPLIT.split((t or "").strip().lower())
        toks.extend(tt)
        tok_offsets.append(len(toks))
    th = hash_strings(toks)
    out = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i in range(len(texts)):
        seg = th[tok_offsets[i] : tok_offsets[i + 1]]
        if len(seg) >= n:
            win = np.lib.stride_tricks.sliding_window_view(seg, n)
            out.append(combine_rows(np.ascontiguousarray(win)))
        offsets[i + 1] = offsets[i] + max(len(seg) - n + 1, 0)
    flat = np.concatenate(out) if out else np.empty(0, dtype=_U64)
    return flat, offsets


def benchmark_ngram_hashes(
    bench: ray.data.Dataset, n: int = 8, text_col: str = "text"
) -> np.ndarray:
    """Sorted distinct n-gram hashes of the benchmark set.

    Per-batch unique first, so the driver merge is bounded by the
    benchmark's n-gram vocabulary (not its token count) — the benchmark
    is the small side by construction; a 100k-doc eval suite is tens of
    millions of u64s, well inside driver memory.
    """
    parts = []
    for t in bench.select_columns([text_col]).iter_batches(
        batch_format="pyarrow", batch_size=4096
    ):
        flat, _ = _strict_ngram_hashes(t.column(text_col).to_pylist(), n)
        parts.append(np.unique(flat))
    if not parts:
        return np.empty(0, dtype=_U64)
    return np.unique(np.concatenate(parts))


class Decontaminator:
    """Actor-pool membership test: broadcast sorted benchmark hashes read
    once per actor in ``__init__`` (ray.put'd by the caller), vectorized
    searchsorted per batch."""

    def __init__(self, bench_ref, n: int, id_col: str, text_col: str):
        self.bench = (
            ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        )
        self.n = n
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        flat, offsets = _strict_ngram_hashes(texts, self.n)
        if len(self.bench) and len(flat):
            pos = np.searchsorted(self.bench, flat)
            pos = np.clip(pos, 0, len(self.bench) - 1)
            hit = self.bench[pos] == flat
        else:
            hit = np.zeros(len(flat), dtype=bool)
        csum = np.concatenate(([0], np.cumsum(hit.astype(np.int64))))
        n_hits = csum[offsets[1:]] - csum[offsets[:-1]]
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0),
            }
        )


def decontaminate(
    docs: ray.data.Dataset,
    bench: ray.data.Dataset,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, n_hits, contaminated) per corpus document.

    ``n_hits`` counts n-gram POSITIONS in the doc whose n-gram occurs
    anywhere in the benchmark (repeats count per position). Filter
    ``contaminated == False`` downstream to drop leaked documents.
    """
    from record_matching_ray.stages.util import cluster_parallelism

    bench_ref = ray.put(benchmark_ngram_hashes(bench, n, text_col))
    return docs.map_batches(
        Decontaminator,
        fn_constructor_args=(bench_ref, n, id_col, text_col),
        batch_format="pyarrow",
        concurrency=(1, concurrency or cluster_parallelism()),
    )
