"""MinHash signatures + LSH band keys, vectorized across a whole batch.

Plays the candidate-generation role the reference fills with a CUDA ANN
beam graph (record_matching/main.py:175-191, 552-577) and Qdrant HNSW
(claude_poc/entity-resolution_v4.py:278-356): pages that share an LSH band
key land in the same block and become candidate pairs.

Implementation: universal hashing h_i(x) = mix64(a_i * x + b_i) over the
doc's shingle hashes, minimized per doc with np.minimum.reduceat over the
flat concatenation of all docs' shingles — one numpy pass per permutation
bank for the entire batch, no per-doc Python loop.
"""

from __future__ import annotations

import numpy as np

from record_matching_ray.functions.hashing import _MASK64, _U64, combine_rows, mix64

_EMPTY_SENTINEL = _U64(0xFFFFFFFFFFFFFFFF)


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**63 - 1, size=num_perm, dtype=np.int64).astype(_U64)
    a |= _U64(1)  # odd multipliers
    b = rng.randint(0, 2**63 - 1, size=num_perm, dtype=np.int64).astype(_U64)
    return a, b


class MinHasher:
    """Stateful (seeded permutation bank) — held once per actor/closure."""

    def __init__(self, num_perm: int = 64, seed: int = 7):
        self.num_perm = num_perm
        self.a, self.b = _perm_params(num_perm, seed)

    def signatures(self, flat_shingles: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """MinHash signatures for a batch of docs.

        flat_shingles: (S,) uint64 — all docs' shingle hashes concatenated.
        offsets: (n+1,) int64 — doc i owns flat_shingles[offsets[i]:offsets[i+1]].
        Returns (n, num_perm) uint64; empty docs get all-0xFF sentinels.
        """
        n = len(offsets) - 1
        out = np.full((n, self.num_perm), _EMPTY_SENTINEL, dtype=_U64)
        if len(flat_shingles) == 0:
            return out
        starts = offsets[:-1]
        lens = np.diff(offsets)
        nonempty = lens > 0
        ne_starts = starts[nonempty]
        for i in range(self.num_perm):
            hv = mix64((flat_shingles * self.a[i] + self.b[i]) & _MASK64)
            mins = np.minimum.reduceat(hv, ne_starts)
            out[nonempty, i] = mins
        return out

    def band_keys(self, sigs: np.ndarray, bands: int) -> np.ndarray:
        """(n, bands) uint64 band keys: hash of each band's rows + band index.

        Docs with identical values in any band share that band key — the
        LSH collision that puts them in one block.
        """
        n, num_perm = sigs.shape
        rows = num_perm // bands
        out = np.empty((n, bands), dtype=_U64)
        for b in range(bands):
            band = sigs[:, b * rows : (b + 1) * rows]
            # fold the band index in so band b of doc X never collides with
            # band c!=b of doc Y
            mat = np.concatenate(
                [np.full((n, 1), _U64(b + 1), dtype=_U64), band], axis=1
            )
            out[:, b] = combine_rows(mat)
        return out


def jaccard_from_signatures(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard from row-aligned signature matrices (n, num_perm)."""
    return (sig_a == sig_b).mean(axis=1)
