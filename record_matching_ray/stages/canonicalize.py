"""S5 — canonical entity forms per cluster.

Reference: per-cluster canonical name by completeness priority + frequency
aggregation of roles/subjects (claude_poc_v2/...v2.py:2038-2206). Web
analog: per cluster pick the canonical url (min), most frequent name,
year span, member count, language histogram top-1. Clusters are small
after transitive closure, so groupby(cluster_id).map_groups is cheap;
giant clusters were already bounded upstream by block caps + salting.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

import ray.data


def _canonical_one(group: pa.Table) -> pa.Table:
    urls = group.column("url").to_pylist()
    names = [n for n in group.column("name").to_pylist() if n]
    years = [y for y in group.column("year").to_pylist() if y == y]  # drop NaN
    langs = [l for l in group.column("lang").to_pylist() if l]
    name = Counter(names).most_common(1)[0][0] if names else ""
    lang = Counter(langs).most_common(1)[0][0] if langs else ""
    return pa.table(
        {
            "cluster_id": [group.column("cluster_id")[0].as_py()],
            "canonical_url": [min(urls)],
            "canonical_name": [name],
            "size": pa.array([len(urls)], pa.int64()),
            "year_min": pa.array(
                [min(years) if years else None], pa.float64()
            ),
            "year_max": pa.array(
                [max(years) if years else None], pa.float64()
            ),
            "lang": [lang],
        }
    )


def canonicalize(
    clusters: ray.data.Dataset,
    features: ray.data.Dataset,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """clusters(url, cluster_id) ⋈ features -> one canonical row per cluster."""
    joined = clusters.join(
        features.select_columns(["url", "name", "year", "lang"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("url",),
        right_on=("url",),
    )
    return joined.groupby("cluster_id").map_groups(
        _canonical_one, batch_format="pyarrow"
    )
