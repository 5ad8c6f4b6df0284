"""S5b — cluster refinement: split incoherent clusters.

Reference semantics (claude_poc_v2/...v2.py:1640-1853): per cluster,
detect birth/death-year conflicts and name incoherence, rebuild the
cluster without the conflicting members, fall back to split-by-name.
Web analog implemented here: within each cluster, members whose extracted
year conflicts (differs by > year_tolerance from the cluster's dominant
year) are split off into sub-clusters keyed by (cluster, year-bucket);
members sharing the dominant year (or with no year) stay.

Shuffle layout: ONE pass — clusters ⋈ features on url, then the same
coarse-partition sweep as canonicalize (hash(cluster_id) mod P), so Ray
dispatches Python per partition, not per cluster. Clusters are small
after transitive closure (giant ones were bounded upstream by block
caps + salting), so the per-segment work is trivial.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.functions.hashing import _U64, hash_strings, mix64
from record_matching_ray.stages.util import shuffle_partitions


def _refine_segments(g: pa.Table, year_tolerance: float) -> pa.Table:
    cids = np.asarray(g.column("cluster_id").to_pylist(), dtype=object)
    urls = np.asarray(g.column("url").to_pylist(), dtype=object)
    years = g.column("year").to_pylist()
    order = np.argsort(cids, kind="stable")
    out_url: list[str] = []
    out_cid: list[str] = []
    n = len(order)
    i = 0
    while i < n:
        j = i
        while j < n and cids[order[j]] == cids[order[i]]:
            j += 1
        seg = order[i:j]
        seg_years = [years[k] for k in seg]
        known = [y for y in seg_years if y is not None and y == y]
        if not known:
            for k in seg:
                out_url.append(urls[k])
                out_cid.append(cids[k])
            i = j
            continue
        dominant = Counter(known).most_common(1)[0][0]
        # conflicting members split into per-year-bucket sub-clusters with
        # ids derived from (base, year) — NEVER from member urls: when the
        # cluster id equals the min url and that url lands in a conflict
        # bucket, min(bucket) == base and the "split" silently no-ops
        # (round-1 ADVICE: u0@1950 stayed clustered with u1-u3@1900)
        buckets: dict[object, list[str]] = {}
        keep: list[str] = []
        for k in seg:
            y = years[k]
            if y is None or y != y or abs(y - dominant) <= year_tolerance:
                keep.append(urls[k])
            else:
                buckets.setdefault(y, []).append(urls[k])
        base = cids[seg[0]]
        for u in keep:
            out_url.append(u)
            out_cid.append(base)
        for y, members in buckets.items():
            sub = f"{base}#y{int(y)}"
            for u in members:
                out_url.append(u)
                out_cid.append(sub)
        i = j
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "cluster_id": pa.array(out_cid, pa.string()),
        }
    )


def refine_clusters(
    clusters: ray.data.Dataset,
    features: ray.data.Dataset,
    year_tolerance: float = 2.0,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(url, cluster_id) + features.year -> refined (url, cluster_id).

    Splitting only ever increases precision; recall-affecting merges are
    never performed here (reference keeps refinement one-directional
    too, poc2:1640-1853)."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    joined = clusters.join(
        features.select_columns(["url", "year"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("url",),
        right_on=("url",),
    )
    from record_matching_ray.stages.util import coarse_groupby_partitions

    n_parts = coarse_groupby_partitions()

    def add_pk(t: pa.Table) -> pa.Table:
        h = mix64(hash_strings(t.column("cluster_id").to_pylist()))
        return t.append_column(
            "pk", pa.array((h % _U64(n_parts)).astype(np.int64), pa.int64())
        )

    return (
        joined.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda g: _refine_segments(g, year_tolerance), batch_format="pyarrow"
        )
    )
