"""64-bit SimHash fingerprints, vectorized across a batch.

Near-dup detector complementary to MinHash-LSH (SURVEY.md §2.7: the
reference's entire pipeline is near-dedup via embeddings; SimHash is the
classic Charikar alternative for web text). Two docs are near-dups when the
Hamming distance of their simhashes is small; blocking = group by rotated
16-bit chunks so any pair within distance<=3 shares at least one chunk.
"""

from __future__ import annotations

import numpy as np

from record_matching_ray.functions.hashing import _U64


def simhash(flat_token_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash per doc from concatenated token hashes.

    flat_token_hashes: (T,) uint64; offsets: (n+1,) int64.
    Returns (n,) uint64. Empty docs hash to 0.
    """
    n = len(offsets) - 1
    out = np.zeros(n, dtype=_U64)
    T = len(flat_token_hashes)
    if T == 0:
        return out
    # per-doc count of 1s at each bit position: 64 one-dimensional
    # add.reduceat passes (1-D reduceat has a fast path; the 2-D axis-0
    # variant and a full cumsum are both ~50x slower)
    h = np.ascontiguousarray(flat_token_hashes)
    starts = np.asarray(offsets[:-1], dtype=np.int64)
    ends = np.asarray(offsets[1:], dtype=np.int64)
    nonempty = ends > starts
    ne_starts = starts[nonempty]
    lens = (ends - starts)[nonempty]
    outbits = np.empty((len(ne_starts), 64), dtype=np.uint8)
    for j in range(64):
        bit = ((h >> _U64(j)) & _U64(1)).astype(np.int64)
        ones = np.add.reduceat(bit, ne_starts)
        outbits[:, j] = 2 * ones > lens  # majority of signed ±1 votes > 0
    packed = np.packbits(outbits, axis=1, bitorder="little")
    out[nonempty] = packed.copy().view(_U64).ravel()
    return out


_POPCOUNT_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR for uint64 arrays (byte lookup table)."""
    x = np.asarray(a, dtype=_U64) ^ np.asarray(b, dtype=_U64)
    bytes_view = np.ascontiguousarray(x)[..., None].view(np.uint8)
    return _POPCOUNT_LUT[bytes_view].sum(axis=-1).reshape(x.shape)


def simhash_chunks(h: np.ndarray, n_chunks: int = 4) -> np.ndarray:
    """(n, n_chunks) uint64 block keys: the i-th 16-bit chunk tagged with its
    position. Pigeonhole: Hamming distance < n_chunks => >=1 shared chunk."""
    h = np.asarray(h, dtype=_U64)
    width = 64 // n_chunks
    mask = _U64((1 << width) - 1)
    out = np.empty((len(h), n_chunks), dtype=_U64)
    for i in range(n_chunks):
        chunk = (h >> _U64(i * width)) & mask
        out[:, i] = chunk | (_U64(i + 1) << _U64(56))
    return out
