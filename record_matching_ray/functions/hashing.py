"""Stable, vectorized hashing primitives.

Everything downstream (MinHash, SimHash, hashing embeddings, block salting)
keys off these. All hashes are deterministic across processes and runs
(no PYTHONHASHSEED dependence) — the reference relies on content hashes the
same way for its dedup table (record_matching/context.py:15-20) and stable
crc32 ids (claude_poc/entity-resolution_v4.py:39-41).

Hot-path design: token/shingle hashing is done on the *unique* strings of a
batch (np.unique), then broadcast back via the inverse index; shingle hashes
are a vectorized polynomial combine of consecutive token hashes, so the
per-string Python loop only runs over a batch's vocabulary, not its tokens.
"""

from __future__ import annotations

import hashlib
import numpy as np

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)

# splitmix64 constants for mixing; odd multipliers for universal hashing.
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)


def blake8(s: str | bytes) -> int:
    """64-bit stable hash of one string (blake2b, digest_size=8)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little")


def md5_lower64(s: str | bytes) -> int:
    """Lower 64 bits of md5, little-endian — bit-identical to DuckDB's
    ``md5_number_lower(text)``, which makes any hash built from it
    independently recomputable by a SQL oracle (simhash / winnowing
    parity checks). blake8 stays the default for hot paths."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.md5(s).digest()[8:], "little")


def hash_strings(arr: np.ndarray | list[str], hash_fn=None) -> np.ndarray:
    """Vectorized-ish 64-bit hash of a string array.

    Hashes only the unique values (batch vocabulary) in Python, then maps
    back. Returns uint64 array of the same length.
    """
    a = np.asarray(arr, dtype=object)
    if a.size == 0:
        return np.empty(0, dtype=_U64)
    # hash-based factorize beats np.unique's object sort ~10x on token
    # streams (measured 252ms -> ~25ms per 263k-token batch); per-string
    # hash values are unchanged, so stored signatures stay compatible
    import pandas as pd

    fn = hash_fn or blake8
    codes, uniq = pd.factorize(a, sort=False)
    uh = np.fromiter((fn(u) for u in uniq), dtype=_U64, count=len(uniq))
    if codes.min(initial=0) < 0:
        # factorize assigns code -1 to None/NaN, which would alias uh[-1]
        # (the last unique's hash) and IndexError on an all-null batch;
        # give nulls their own deterministic hash instead (ADVICE r1)
        uh = np.append(uh, _U64(fn(b"\x00__rmray_null__")))
        codes = np.where(codes < 0, len(uh) - 1, codes)
    return uh[codes]


def mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates low/high bits, vectorized."""
    h = h.astype(_U64, copy=True)
    h ^= h >> _U64(30)
    h *= _MIX1
    h ^= h >> _U64(27)
    h *= _MIX2
    h ^= h >> _U64(31)
    return h


def combine_rows(mat: np.ndarray) -> np.ndarray:
    """Combine each row of a (n, k) uint64 matrix into one uint64 per row
    (order-sensitive polynomial combine + final mix)."""
    n, k = mat.shape
    out = np.zeros(n, dtype=_U64)
    P = _U64(0x9E3779B97F4A7C15)
    for j in range(k):
        out = (out * P + mat[:, j].astype(_U64)) & _MASK64
    return mix64(out)


def shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """Hashes of all k-grams of consecutive tokens (one doc).

    token_hashes: (t,) uint64. Returns (max(t-k+1, 0 or 1),) uint64.
    A doc with fewer than k tokens yields a single shingle over all tokens.
    """
    t = len(token_hashes)
    if t == 0:
        return np.empty(0, dtype=_U64)
    if t < k:
        return combine_rows(token_hashes.reshape(1, -1))
    windows = np.lib.stride_tricks.sliding_window_view(token_hashes, k)
    return combine_rows(np.ascontiguousarray(windows))
