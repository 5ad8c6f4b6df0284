"""Broadcast Bloom-filter semi-join pruning.

The 100 TB join pattern the repo's count-gated broadcasts stop short of:
when the "small" side is too big to broadcast as an exact key set
(say 10^9 keys = 8 GB) but the big side is orders of magnitude larger, a
Bloom filter at ~2 bytes/key (m/n = 16, k = 4 → ~0.24% false positives)
broadcasts once via ray.put and prunes the big side inside map_batches
BEFORE the expensive exact join — the classic Bloom-join of distributed
databases. False positives only ever admit extra rows; the downstream
exact join (or the exact verify mode here) removes them, so results stay
exact while the shuffle moves ~the matching fraction of the big side.

All operations are vectorized: k double-hashed probes per key
(Kirsch-Mitzenmacher h1 + i*h2), bit scatter via np.bitwise_or.at on a
uint64 word array, membership as ANDed gathers.
"""

from __future__ import annotations

import numpy as np

from record_matching_ray.functions.hashing import _U64, mix64

_SALT = _U64(0x9E3779B97F4A7C15)


def _probes(keys: np.ndarray, n_bits_log2: int, k: int):
    """Yield k vectorized probe positions per key (double hashing)."""
    mask = _U64((1 << n_bits_log2) - 1)
    h1 = mix64(keys.astype(_U64))
    h2 = mix64(h1 ^ _SALT) | _U64(1)
    for i in range(k):
        yield (h1 + _U64(i) * h2) & mask


def build_bloom(keys: np.ndarray, n_bits_log2: int = 22, k: int = 4) -> np.ndarray:
    """Bloom filter over int-like keys: (2^n_bits_log2)/64 uint64 words.

    Size for m/n >= 16 (n_bits_log2 >= log2(16 * len(keys))) to keep the
    false-positive rate ~(1 - e^{-k n/m})^k under 0.3% at k=4. Filters
    built over shards of a key set can be OR-merged."""
    words = np.zeros(1 << max(n_bits_log2 - 6, 0), dtype=_U64)
    if len(keys) == 0:
        return words
    for pos in _probes(np.asarray(keys), n_bits_log2, k):
        np.bitwise_or.at(words, pos >> _U64(6), _U64(1) << (pos & _U64(63)))
    return words


def bloom_contains(
    words: np.ndarray, keys: np.ndarray, n_bits_log2: int = 22, k: int = 4
) -> np.ndarray:
    """Vectorized membership test: True = possibly present (FP rate per
    build_bloom sizing), False = definitely absent."""
    keys = np.asarray(keys)
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    out = np.ones(len(keys), dtype=bool)
    for pos in _probes(keys, n_bits_log2, k):
        bit = (words[pos >> _U64(6)] >> (pos & _U64(63))) & _U64(1)
        out &= bit.astype(bool)
    return out
