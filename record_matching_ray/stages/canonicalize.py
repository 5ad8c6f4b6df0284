"""S5 — canonical entity forms per cluster.

Reference: per-cluster canonical name by completeness priority + frequency
aggregation of roles/subjects (claude_poc_v2/...v2.py:2038-2206). Web
analog: per cluster pick the canonical url (min), most frequent name,
year span, member count, language histogram top-1.

Shuffle layout: ONE hash shuffle on a coarse partition key
(hash(cluster_id) mod 4·CPUs) instead of groupby(cluster_id) — Ray's
map_groups dispatches Python per group, which at many small clusters
costs more than the aggregation itself; here each partition call sweeps
all its clusters in one pass.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.functions.hashing import _U64, hash_strings, mix64
from record_matching_ray.stages.util import shuffle_partitions


def _canonical_segments(g: pa.Table) -> pa.Table:
    """All clusters of one hash partition, one Python sweep."""
    cids = np.asarray(g.column("cluster_id").to_pylist(), dtype=object)
    urls = np.asarray(g.column("url").to_pylist(), dtype=object)
    names = g.column("name").to_pylist()
    years = g.column("year").to_pylist()
    langs = g.column("lang").to_pylist()
    order = np.argsort(cids, kind="stable")
    out = {
        "cluster_id": [], "canonical_url": [], "canonical_name": [],
        "size": [], "year_min": [], "year_max": [], "lang": [],
    }
    i, n = 0, len(order)
    while i < n:
        j = i
        while j < n and cids[order[j]] == cids[order[i]]:
            j += 1
        seg = order[i:j]
        seg_urls = urls[seg]
        seg_names = [names[k] for k in seg if names[k]]
        seg_years = [years[k] for k in seg if years[k] is not None and years[k] == years[k]]
        seg_langs = [langs[k] for k in seg if langs[k]]
        out["cluster_id"].append(cids[order[i]])
        out["canonical_url"].append(min(seg_urls))
        out["canonical_name"].append(
            Counter(seg_names).most_common(1)[0][0] if seg_names else ""
        )
        out["size"].append(len(seg))
        out["year_min"].append(min(seg_years) if seg_years else None)
        out["year_max"].append(max(seg_years) if seg_years else None)
        out["lang"].append(Counter(seg_langs).most_common(1)[0][0] if seg_langs else "")
        i = j
    return pa.table(
        {
            "cluster_id": pa.array(out["cluster_id"], pa.string()),
            "canonical_url": pa.array(out["canonical_url"], pa.string()),
            "canonical_name": pa.array(out["canonical_name"], pa.string()),
            "size": pa.array(out["size"], pa.int64()),
            "year_min": pa.array(out["year_min"], pa.float64()),
            "year_max": pa.array(out["year_max"], pa.float64()),
            "lang": pa.array(out["lang"], pa.string()),
        }
    )


def canonicalize(
    clusters: ray.data.Dataset,
    features: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """clusters(url, cluster_id) ⋈ features -> one canonical row per cluster."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    joined = clusters.join(
        features.select_columns(["url", "name", "year", "lang"]),
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
        .map_groups(_canonical_segments, batch_format="pyarrow")
    )
