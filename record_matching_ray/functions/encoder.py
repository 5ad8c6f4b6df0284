"""Pluggable text-embedding encoders for the feature-extraction stage.

The reference holds a remote embedding-API client per pipeline stage with
the model pinned in config (record_matching/main.py:96-102,
context.py:4-5). Here the encoder is an injectable protocol so a real
model (local torch, remote API) drops into ExtractFeatures or the
standalone embed_texts actor-pool stage without touching the pipeline:

- ``HashingEncoder`` — the deterministic local default (identical to
  functions.embed.hashing_embed, so every existing query/oracle stays
  bit-identical);
- ``RetryingRemoteEncoder`` — wraps a remote client callable with
  exponential-backoff retries, the shape a rate-limited embedding API
  needs (one client per ACTOR, never per batch);
- ``embed_texts`` (stages side) — an actor-pool map_batches stage that
  builds the encoder once per actor via a factory.

Encoder protocol: ``encode(texts, flat_hashes=None, offsets=None) ->
(n, dim) float32``. The optional (flat_hashes, offsets) pair lets
ExtractFeatures share its already-computed token hashes with the default
encoder instead of re-tokenizing; remote encoders ignore them.
"""

from __future__ import annotations

import time

import numpy as np

from record_matching_ray.functions.embed import hashing_embed
from record_matching_ray.functions.hashing import hash_strings


class HashingEncoder:
    """Deterministic hashing-trick encoder — the engine's default and the
    reference-free test rig. Given precomputed token hashes it is exactly
    functions.embed.hashing_embed; given raw texts it tokenizes the same
    way ExtractFeatures does (lowercase word regex, max_tokens cap)."""

    def __init__(self, dim: int, max_tokens: int = 512):
        self.dim = dim
        self.max_tokens = max_tokens

    def encode(
        self,
        texts: list[str],
        flat_hashes: np.ndarray | None = None,
        offsets: np.ndarray | None = None,
    ) -> np.ndarray:
        if flat_hashes is None or offsets is None:
            from record_matching_ray.stages.extract import _TOKEN_RE

            token_lists = [
                _TOKEN_RE.findall(("" if t is None else t).lower())[
                    : self.max_tokens
                ]
                for t in texts
            ]
            lens = np.array([len(t) for t in token_lists], dtype=np.int64)
            offsets = np.concatenate([[0], np.cumsum(lens)])
            flat_hashes = hash_strings(
                [tok for toks in token_lists for tok in toks]
            )
        return hashing_embed(flat_hashes, offsets, self.dim)


class RetryingRemoteEncoder:
    """Remote-client wrapper with exponential backoff.

    ``client``: callable(list[str]) -> array-like (n, dim) — e.g. a
    rate-limited HTTP embedding API. Transient exceptions retry up to
    ``max_retries`` times with delays base_delay * 2^attempt (``sleep``
    injectable for tests); the final failure re-raises. Hold ONE instance
    per actor (pass an encoder_factory to embed_texts / construct inside
    ExtractFeatures' __init__) so connections and auth are per-actor
    state, never per batch."""

    def __init__(
        self,
        client,
        dim: int,
        max_retries: int = 5,
        base_delay: float = 0.1,
        max_delay: float = 30.0,
        sleep=time.sleep,
    ):
        self.client = client
        self.dim = dim
        self.max_retries = max_retries
        self.base_delay = base_delay
        self.max_delay = max_delay
        self._sleep = sleep
        self.n_retries = 0  # observable counter

    def encode(
        self,
        texts: list[str],
        flat_hashes: np.ndarray | None = None,
        offsets: np.ndarray | None = None,
    ) -> np.ndarray:
        delay = self.base_delay
        last: Exception | None = None
        for _attempt in range(self.max_retries + 1):
            try:
                out = np.asarray(self.client(list(texts)), dtype=np.float32)
                return out.reshape(len(texts), self.dim)
            except Exception as e:  # noqa: BLE001 — client errors are opaque
                last = e
                self.n_retries += 1
                self._sleep(delay)
                delay = min(delay * 2.0, self.max_delay)
        raise RuntimeError(
            f"remote encoder failed after {self.max_retries + 1} attempts"
        ) from last
