"""Deterministic local text embedder (hashing trick).

Replaces the reference's remote OpenAI text-embedding-3-large calls
(record_matching/main.py:96-102, context.py:4-5 — 3072-d, one call per
distinct string) with a local, deterministic, vectorized encoder: each token
hash selects a bucket (h % dim) and a sign bit; counts are accumulated and
L2-normalized. Cosine over these vectors behaves like token-frequency
cosine — adequate for the blocking/scoring role and fully reproducible.

Batch-vectorized: one np.add.at over (doc_index, bucket) for the whole
batch; no per-doc loop.
"""

from __future__ import annotations

import numpy as np

from record_matching_ray.functions.hashing import _U64


def hashing_embed(
    flat_token_hashes: np.ndarray,
    offsets: np.ndarray,
    dim: int = 64,
    dtype=np.float32,
) -> np.ndarray:
    """(n, dim) L2-normalized embeddings from concatenated token hashes.
    dtype=float64 keeps the normalization exact enough for round-6 SQL
    parity (the bucket sums themselves are exact small integers either
    way); float32 stays the storage default."""
    n = len(offsets) - 1
    out = np.zeros((n, dim), dtype=dtype)
    T = len(flat_token_hashes)
    if T:
        doc_idx = np.repeat(
            np.arange(n, dtype=np.int64), np.diff(offsets).astype(np.int64)
        )
        buckets = (flat_token_hashes % _U64(dim)).astype(np.int64)
        signs = np.where((flat_token_hashes >> _U64(32)) & _U64(1), 1.0, -1.0).astype(
            dtype
        )
        np.add.at(out, (doc_idx, buckets), signs)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def cosine_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine similarity of two (n, d) float arrays (not assumed
    normalized). Reference: cosine distance (1 - a.b)/2 clamped [0,1] at
    record_matching/main.py:424-426; we keep plain cosine similarity and let
    the scorer weight it."""
    num = np.einsum("ij,ij->i", a, b)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    den[den == 0] = 1.0
    return num / den
