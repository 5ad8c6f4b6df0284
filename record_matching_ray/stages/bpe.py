"""BPE tokenizer training + encoding (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units").

A training-data engine must be able to TRAIN the tokenizer, not just
count tokens (textstats.bpe_token_stats counts under a fixed GPT-2-style
pretokenizer). Industry BPE trainers (sentencepiece, HF tokenizers) all
use the same two-phase layout this module distributes:

1. corpus -> (word, count) table. This is the only data-scale pass:
   per-batch partial counts, ONE groupby shuffle bounded by the WORD
   VOCABULARY, never the token stream. ``min_count`` prunes the long
   tail so the driver-side table stays bounded on a web corpus (the
   standard trainer knob; exact at small scale with min_count=1).
2. merges computed on the word-frequency table (driver-side — the table
   is vocabulary-sized, and each merge is a global argmax, inherently
   sequential). Pair counts are weighted by word frequency; ties break
   to the lexicographically smallest (left, right) pair so training is
   fully deterministic.

Encoding distributes trivially: the learned merge ranks broadcast once
(ray.put), each batch applies them per unique word (memoized — web text
repeats words heavily) in rank order, exactly like GPT-2's encoder.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def word_counts(
    docs: ray.data.Dataset, text_col: str = "text", min_count: int = 1
) -> list[tuple[str, int]]:
    """(word, count) for the whole corpus, descending count then
    ascending word; shuffle rows bounded by per-batch vocabulary."""

    def partial(t: pa.Table) -> pa.Table:
        words: list[str] = []
        for s in t.column(text_col).to_pylist():
            words.extend(("" if s is None else s).lower().split())
        u, c = np.unique(np.asarray(words, dtype=object), return_counts=True)
        return pa.table(
            {
                "word": pa.array(u, pa.string()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .sum("cnt")
        .take_all()
    )  # vocabulary-bounded by construction
    out = [
        (r["word"], int(r["sum(cnt)"]))
        for r in rows
        if int(r["sum(cnt)"]) >= min_count
    ]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def bpe_merges(
    vocab: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Learn up to n_merges BPE merges from a (word, count) table.
    Returns [(left, right, pair_count)] in merge order. Deterministic:
    best pair = (max weighted count, then lexicographically smallest
    (left, right)). Stops early when no pair occurs twice."""
    words = [(tuple(w), c) for w, c in vocab if w]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        ab = a + b
        new_words = []
        for syms, c in words:
            out = []
            i = 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((tuple(out), c))
        words = new_words
    return merges


def bpe_train(
    docs: ray.data.Dataset,
    n_merges: int = 64,
    text_col: str = "text",
    min_count: int = 1,
) -> ray.data.Dataset:
    """Train BPE on the corpus; returns the merge table as a Dataset
    (rank, left, right, pair_count) — the tokenizer artifact."""
    merges = bpe_merges(word_counts(docs, text_col, min_count), n_merges)
    return ray.data.from_arrow(
        pa.table(
            {
                "rank": pa.array(range(len(merges)), pa.int64()),
                "left": pa.array([m[0] for m in merges], pa.string()),
                "right": pa.array([m[1] for m in merges], pa.string()),
                "pair_count": pa.array([m[2] for m in merges], pa.int64()),
            }
        )
    )


def _apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style encoder: repeatedly merge the lowest-rank adjacent
    pair present in the word."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """Actor-pool encoder: merge ranks read once per actor, per-unique-word
    memoization (web text repeats words heavily)."""

    def __init__(self, ranks_ref, id_col: str = "doc_id", text_col: str = "text"):
        ranks = (
            ray.get(ranks_ref) if isinstance(ranks_ref, ray.ObjectRef) else ranks_ref
        )
        self.ranks: dict[tuple[str, str], int] = ranks
        self.id_col, self.text_col = id_col, text_col
        self.cache: dict[str, int] = {}

    def _n_subwords(self, w: str) -> int:
        got = self.cache.get(w)
        if got is None:
            got = self.cache[w] = len(_apply_merges(w, self.ranks))
        return got

    def __call__(self, t: pa.Table) -> pa.Table:
        n_words, n_sub = [], []
        for s in t.column(self.text_col).to_pylist():
            ws = ("" if s is None else s).lower().split()
            n_words.append(len(ws))
            n_sub.append(sum(self._n_subwords(w) for w in ws))
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "n_words": pa.array(n_words, pa.int64()),
                "n_subwords": pa.array(n_sub, pa.int64()),
            }
        )


def bpe_encode_counts(
    docs: ray.data.Dataset,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, n_words, n_subwords) under the learned merges — the
    tokenizer-fertility measurement (subwords per word) used to compare
    tokenizers on a corpus."""
    from record_matching_ray.stages.util import cluster_parallelism

    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    ranks_ref = ray.put(ranks)
    return docs.select_columns([id_col, text_col]).map_batches(
        BpeEncoder,
        fn_constructor_args=(ranks_ref, id_col, text_col),
        batch_format="pyarrow",
        concurrency=(1, cluster_parallelism()),
    )
