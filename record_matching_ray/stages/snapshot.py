"""Corpus snapshot diff: classify every record id across two dataset
versions as added / removed / changed / unchanged — the CDC-style
maintenance pass a recurring training-data build runs between crawls
(which shards to re-embed, re-dedup, re-score).

Ray shape (100 TB-safe): NO join. Each side emits (id, content_hash,
side-tag) rows; ONE groupby(id) sees a record's 1-2 rows together and
classifies it with vectorized segment compares. Content identity is the
64-bit string hash of the concatenated content columns (equality modulo
hash collisions — same contract as exact_dedup). The per-status rollup
is a 4-row aggregate off batch partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.functions.hashing import hash_strings
from record_matching_ray.stages.util import conformed

_ACC = pa.schema(
    [("id", pa.int64()), ("h", pa.int64()), ("in_old", pa.int64()), ("in_new", pa.int64())]
)
_OUT = pa.schema([("id", pa.int64()), ("status", pa.string())])


def _tagged(
    ds: ray.data.Dataset, id_col: str, content_cols: list[str], old: bool
) -> ray.data.Dataset:
    def rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = [
            ["" if v is None else str(v) for v in t.column(c).to_pylist()]
            for c in content_cols
        ]
        joined = ["\x1f".join(vals) for vals in zip(*parts)] if parts else [""] * n
        h = hash_strings(joined).view(np.int64) if n else np.empty(0, np.int64)
        ones = np.ones(n, np.int64)
        zeros = np.zeros(n, np.int64)
        return pa.table(
            {
                "id": t.column(id_col).cast(pa.int64()),
                "h": pa.array(h, pa.int64()),
                "in_old": pa.array(ones if old else zeros, pa.int64()),
                "in_new": pa.array(zeros if old else ones, pa.int64()),
            }
        )

    return conformed(
        ds.select_columns([id_col] + content_cols).map_batches(
            rows, batch_format="pyarrow"
        ),
        _ACC,
    )


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    id_col: str,
    content_cols: list[str],
) -> ray.data.Dataset:
    """(id, status) for every id in either snapshot, status in
    {added, removed, changed, unchanged}. Assumes ids unique per side
    (a snapshot's contract)."""

    both = _tagged(old, id_col, content_cols, True).union(
        _tagged(new, id_col, content_cols, False)
    )

    def classify(g: pa.Table) -> pa.Table:
        ids = g.column("id").to_numpy(zero_copy_only=False)
        h = g.column("h").to_numpy(zero_copy_only=False)
        io = g.column("in_old").to_numpy(zero_copy_only=False)
        inw = g.column("in_new").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, h, io, inw = ids[order], h[order], io[order], inw[order]
        new_seg = np.concatenate(([True], ids[1:] != ids[:-1]))
        starts = np.nonzero(new_seg)[0]
        ends = np.append(starts[1:], len(ids))
        uid = ids[starts]
        n_rows = ends - starts
        has_old = np.add.reduceat(io, starts) > 0
        has_new = np.add.reduceat(inw, starts) > 0
        # for 2-row segments, hashes differ iff first != last
        same_h = h[starts] == h[ends - 1]
        status = np.where(
            has_old & has_new,
            np.where(same_h, "unchanged", "changed"),
            np.where(has_old, "removed", "added"),
        )
        del n_rows
        return pa.table(
            {
                "id": pa.array(uid, pa.int64()),
                "status": pa.array(status.tolist(), pa.string()),
            }
        )

    return conformed(
        both.groupby("id").map_groups(classify, batch_format="pyarrow"), _OUT
    )


def snapshot_diff_counts(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    id_col: str,
    content_cols: list[str],
) -> ray.data.Dataset:
    """Per-status rollup (status, n) of snapshot_diff — batch partials,
    one 4-row shuffle."""
    diff = snapshot_diff(old, new, id_col, content_cols)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        codes, uniq = pd.factorize(
            np.asarray(t.column("status").to_pylist(), object), sort=False
        )
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "status": pa.array(list(uniq), pa.string()),
                "n": pa.array(n, pa.int64()),
            }
        )

    out = diff.map_batches(partial, batch_format="pyarrow").groupby("status").sum("n")
    return conformed(
        out.rename_columns({"sum(n)": "n"}),
        pa.schema([("status", pa.string()), ("n", pa.int64())]),
    )
