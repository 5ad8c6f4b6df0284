"""S5 — canonical entity forms per cluster.

Reference: per-cluster canonical name by completeness priority + frequency
aggregation of roles/subjects (claude_poc_v2/...v2.py:2038-2206), ported
field-for-field to the web corpus:

- canonical name priority (poc2:2106-2135): records WITH a year (the web
  analog of complete birth/death dates) beat records without one; within
  a tier the most metadata-complete record wins (ties -> min url). The
  chosen record also donates the canonical ``year``.
- frequency aggregation with the small-cluster rule (poc2:2163-2171):
  values kept only when seen >= 2 times IF the cluster has > 5 records
  (min_count 1 otherwise), top 5 by frequency, '; '-joined — applied to
  names and langs (the corpus' multi-value field analogs).
- sampled exemplars (poc2:2180-2186): first 3 member urls in url order
  (the reference samples titles in row order; url order keeps it
  deterministic under any partitioning).
- mean completeness rounded to 2 decimals (poc2:2203) over the per-member
  (name, year, lang) non-null count.

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


def _freq_join(values: list[str], size: int, top: int = 5) -> str:
    """poc2's frequency aggregation: min_count 2 for clusters > 5 records,
    1 otherwise; most-frequent-first (stable on first-seen order, which is
    deterministic because members are swept in url order); top 5 joined."""
    min_count = 2 if size > 5 else 1
    kept = [v for v, c in Counter(values).most_common() if c >= min_count]
    return "; ".join(kept[:top])


def _canonical_segments(g: pa.Table, completeness_mode: str = "round2") -> pa.Table:
    """All clusters of one hash partition, one Python sweep.

    completeness_mode: "round2" keeps poc2:2203's round(mean, 2); "exact"
    emits the raw IEEE mean (sum/size) so a SQL oracle reproduces the value
    bit-identically (Python round's ties-to-even on binary doubles differs
    from DuckDB's round/round_even on ~0.04% of small-integer ratios)."""
    cids = np.asarray(g.column("cluster_id").to_pylist(), dtype=object)
    urls = np.asarray(g.column("url").to_pylist(), dtype=object)
    names = g.column("name").to_pylist()
    years = g.column("year").to_pylist()
    langs = g.column("lang").to_pylist()
    # sort by (cluster, url): url order inside a segment makes every
    # first-seen / sampled output deterministic under any partitioning
    order = np.lexsort((urls, cids))
    out = {
        "cluster_id": [], "canonical_url": [], "canonical_name": [],
        "year": [], "size": [], "year_min": [], "year_max": [],
        "lang": [], "names": [], "langs": [], "sample_urls": [],
        "completeness": [],
    }
    i, n = 0, len(order)
    while i < n:
        j = i
        while j < n and cids[order[j]] == cids[order[i]]:
            j += 1
        seg = order[i:j]
        seg_urls = [urls[k] for k in seg]
        seg_names = [names[k] for k in seg if names[k]]
        seg_years = [
            years[k] for k in seg if years[k] is not None and years[k] == years[k]
        ]
        seg_langs = [langs[k] for k in seg if langs[k]]
        size = len(seg)

        # completeness per member: non-null count over (name, year, lang)
        def compl(k: int) -> int:
            return (
                (1 if names[k] else 0)
                + (1 if years[k] is not None and years[k] == years[k] else 0)
                + (1 if langs[k] else 0)
            )

        # canonical-name priority (poc2:2106-2135): year-bearing records
        # first, then completeness desc; seg is url-sorted so ties are
        # deterministic (min url wins)
        with_year = [k for k in seg if years[k] is not None and years[k] == years[k]]
        pool = with_year if with_year else list(seg)
        best = max(pool, key=compl)  # python max keeps FIRST of equals
        out["cluster_id"].append(cids[seg[0]])
        out["canonical_url"].append(seg_urls[0])
        out["canonical_name"].append(names[best] or "")
        out["year"].append(years[best] if with_year else None)
        out["size"].append(size)
        out["year_min"].append(min(seg_years) if seg_years else None)
        out["year_max"].append(max(seg_years) if seg_years else None)
        out["lang"].append(
            Counter(seg_langs).most_common(1)[0][0] if seg_langs else ""
        )
        out["names"].append(_freq_join(seg_names, size))
        out["langs"].append(_freq_join(seg_langs, size))
        out["sample_urls"].append("; ".join(seg_urls[:3]))
        mean_compl = sum(compl(k) for k in seg) / size
        out["completeness"].append(
            round(mean_compl, 2) if completeness_mode == "round2" else mean_compl
        )
        i = j
    return pa.table(
        {
            "cluster_id": pa.array(out["cluster_id"], pa.string()),
            "canonical_url": pa.array(out["canonical_url"], pa.string()),
            "canonical_name": pa.array(out["canonical_name"], pa.string()),
            "year": pa.array(out["year"], pa.float64()),
            "size": pa.array(out["size"], pa.int64()),
            "year_min": pa.array(out["year_min"], pa.float64()),
            "year_max": pa.array(out["year_max"], pa.float64()),
            "lang": pa.array(out["lang"], pa.string()),
            "names": pa.array(out["names"], pa.string()),
            "langs": pa.array(out["langs"], pa.string()),
            "sample_urls": pa.array(out["sample_urls"], pa.string()),
            "completeness": pa.array(out["completeness"], pa.float64()),
        }
    )


def cluster_profiles(
    assign: ray.data.Dataset,
    docs: ray.data.Dataset,
    cat_col: str = "lang",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-cluster categorical profile: (cluster_id, size, top_cat,
    n_cats) where top_cat is the modal ``cat_col`` value with LEXICOGRAPHIC
    tie-break (unlike canonicalize's first-seen rule, this tie-break is
    order-free, so a SQL ``row_number() OVER (ORDER BY c DESC, cat)``
    oracle reproduces it exactly — the checked face of the canonical-forms
    family).

    Shuffle shape: one hash join (assign x docs on id), then per-batch
    (cluster, cat) partial counts -> groupby sum (rows = distinct
    (cluster, cat), not members) -> per-cluster sweep."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    joined = assign.join(
        docs.select_columns([id_col, cat_col]),
        join_type="inner",
        num_partitions=num_partitions,
        on=(id_col,),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["cluster_id", cat_col]), ["cluster_id", cat_col]
        ).aggregate([([], "count_all")])
        return g.rename_columns(["cluster_id", cat_col, "c"])

    counts = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["cluster_id", cat_col])
        .sum("c")
        .rename_columns({"sum(c)": "c"})
    )

    def sweep(g: pa.Table) -> pa.Table:
        cids = g.column("cluster_id").to_numpy(zero_copy_only=False)
        cats = np.asarray(g.column(cat_col).to_pylist(), dtype=object)
        cs = g.column("c").to_numpy(zero_copy_only=False)
        # sort by (cluster, -count, cat): first row of each cluster IS the
        # mode with lexicographic tie-break
        order = np.lexsort((cats, -cs, cids))
        cid_s, cat_s, c_s = cids[order], cats[order], cs[order]
        starts = np.nonzero(
            np.concatenate(([True], cid_s[1:] != cid_s[:-1]))
        )[0]
        ends = np.append(starts[1:], len(order))
        cum = np.concatenate(([0], np.cumsum(c_s)))
        return pa.table(
            {
                "cluster_id": pa.array(cid_s[starts], pa.int64()),
                "size": pa.array(cum[ends] - cum[starts], pa.int64()),
                "top_cat": pa.array(list(cat_s[starts]), pa.string()),
                "n_cats": pa.array(ends - starts, pa.int64()),
            }
        )

    from record_matching_ray.stages.util import coarse_groupby_partitions

    n_parts = coarse_groupby_partitions()

    def add_pk(t: pa.Table) -> pa.Table:
        cid = t.column("cluster_id").to_numpy(zero_copy_only=False).astype(_U64)
        return t.append_column(
            "pk", pa.array((mix64(cid) % _U64(n_parts)).astype(np.int64), pa.int64())
        )

    out = (
        counts.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
    )
    from record_matching_ray.stages.util import conformed

    return conformed(
        out,
        pa.schema(
            [
                ("cluster_id", pa.int64()),
                ("size", pa.int64()),
                ("top_cat", pa.string()),
                ("n_cats", pa.int64()),
            ]
        ),
    )


def canonicalize(
    clusters: ray.data.Dataset,
    features: ray.data.Dataset,
    num_partitions: int | None = None,
    completeness_mode: str = "round2",
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
        .map_groups(
            lambda g: _canonical_segments(g, completeness_mode),
            batch_format="pyarrow",
        )
    )
