"""Declarative field/feature registry — SURVEY §2.14 full parity.

The reference's extension surface is a 9-key Handlebars template dict
(record_matching/main.py:40-53) plus a weights schema that tracks the
keys (context.py:62-78): adding a field means adding one dict entry.
Here the same contract is a registry of FieldSpec rows; registering one
makes the field flow through the WHOLE chain with no other edits:

    extract   — FieldSpec.extract(features_batch) adds the payload column
    payload   — the column rides the pair-payload attach (both sides)
    score     — FieldSpec.compare(left, right) appends f_<name> to the
                feature vector after the six built-ins
    train     — train_weights_from_labeled fits a weight for it
    resume    — FeatureRegistry.fingerprint() folds into stage manifests

Built-in features stay pinned in config.FEATURE_NAMES and keep the fused
broadcast scorer; a run with registered custom fields uses the generic
payload-attach + PairScorer plan (run_er switches automatically) — the
documented trade for arbitrary user payload columns.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Callable

import numpy as np
import pyarrow as pa

from record_matching_ray.config import FEATURE_NAMES


@dataclass(frozen=True)
class FieldSpec:
    """One registered field.

    name: payload column added to the features table (and, suffixed
      _l/_r, to each pair).
    extract: features-batch -> pa.Array of `dtype` — input is the WIDE
      extracted batch (url, host, text, name, year, lang, ... already
      present), so a field can derive from any of them.
    compare: (left_values, right_values) -> (n,) float64 similarity —
      object numpy arrays for string dtypes, native arrays otherwise.
      Scalar Python comparators can memoize via
      scoring._memoized_pairwise inside this callable if wanted.
    dtype: arrow type of the payload column (string/float64/int64 —
      payload columns must survive the Acero join, so no nested types;
      pack to binary yourself if needed).
    version: bump to invalidate checkpoints when semantics change
      (callables can't be fingerprinted — the (name, version) pair is
      the contract, mirroring how the reference keys weights by field
      name, context.py:62-78).
    """

    name: str
    extract: Callable[[pa.Table], pa.Array]
    compare: Callable[[np.ndarray, np.ndarray], np.ndarray]
    dtype: pa.DataType = None  # type: ignore[assignment]
    version: str = "1"

    def __post_init__(self):
        if self.dtype is None:
            object.__setattr__(self, "dtype", pa.string())

    @property
    def feature(self) -> str:
        return f"f_{self.name}"


class FeatureRegistry:
    """Ordered collection of FieldSpecs; empty registry == today's
    pinned-feature engine, bit for bit."""

    def __init__(self, fields: tuple[FieldSpec, ...] | list[FieldSpec] = ()):
        names = [f.name for f in fields]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate field names: {names}")
        clash = set(names) & {"url", "name", "minhash", "year", "embedding"}
        if clash:
            raise ValueError(f"field names collide with built-ins: {clash}")
        self.fields: tuple[FieldSpec, ...] = tuple(fields)

    def __bool__(self) -> bool:
        return bool(self.fields)

    def __iter__(self):
        return iter(self.fields)

    def feature_names(self) -> tuple[str, ...]:
        """Built-ins first (config.FEATURE_NAMES order is part of the
        contract), then registered fields in registration order."""
        return FEATURE_NAMES + tuple(f.feature for f in self.fields)

    def payload_columns(self) -> list[str]:
        return [f.name for f in self.fields]

    def fingerprint(self) -> str:
        if not self.fields:
            return ""
        payload = ",".join(f"{f.name}@{f.version}" for f in self.fields)
        return ":r" + hashlib.sha256(payload.encode()).hexdigest()[:12]


EMPTY_REGISTRY = FeatureRegistry()
