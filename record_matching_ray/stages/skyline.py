"""Distributed 2-D skyline (Pareto frontier) query.

A row is in the skyline iff no other row dominates it (<= in both
dimensions, < in at least one). The distributed plan exploits the
closure property ``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))``:
each batch computes its local frontier vectorized (sort + per-x group
minima + exclusive prefix-min), the driver merges the bounded union of
local frontiers with one final local pass. For randomly-ordered data a
block's frontier is ~O(log B) rows, so the merge input is tiny; a fully
anti-correlated worst case makes the *answer itself* large, which no
algorithm avoids — the driver merge is then bounded by the output, and
the caller should treat a huge skyline as a modeling smell.

Duplicate handling matches SQL dominance exactly: duplicates of a
frontier point are all kept (neither strictly dominates the other).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask for the minimize-(x, y) skyline. A point stays
    iff y equals the min-y of its x group AND y is strictly below every
    smaller-x group's min-y (exclusive prefix minimum)."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    ux, inv = np.unique(x, return_inverse=True)
    gmin = np.full(len(ux), np.inf)
    np.minimum.at(gmin, inv, y)
    pmin = np.concatenate(([np.inf], np.minimum.accumulate(gmin)[:-1]))
    return (y == gmin[inv]) & (y < pmin[inv])


def skyline_2d(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    maximize_y: bool = False,
) -> pa.Table:
    """Skyline minimizing ``x_col`` and minimizing (or, with
    ``maximize_y``, maximizing) ``y_col``. Returns the frontier rows as
    an Arrow table (x_col, y_col) — batch-local frontiers, then one
    driver merge over their bounded union."""

    def local(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        keep = _skyline_mask(x, -y if maximize_y else y)
        return pa.table(
            {
                x_col: pa.array(x[keep], pa.float64()),
                y_col: pa.array(y[keep], pa.float64()),
            }
        )

    parts = ds.map_batches(local, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table(
            {x_col: pa.array([], pa.float64()), y_col: pa.array([], pa.float64())}
        )
    x = np.array([r[x_col] for r in parts], dtype=np.float64)
    y = np.array([r[y_col] for r in parts], dtype=np.float64)
    keep = _skyline_mask(x, -y if maximize_y else y)
    return pa.table(
        {
            x_col: pa.array(x[keep], pa.float64()),
            y_col: pa.array(y[keep], pa.float64()),
        }
    )
