"""Human-readable ER run report — the engine-side replacement for the
reference PoC's post-run diagnostics (cluster-size distribution plot,
top-domain chart, and the disambiguation-details text file,
claude_poc_v2/run-vector-enhanced-resolution.py:305-395; closes VERDICT
r3 "What's missing" item 3).

Everything the report contains is computed DISTRIBUTED and the driver
only ever sees bounded aggregates: per-stage manifest counters (tiny
JSON), the (size -> n_clusters) histogram (distinct sizes), the top-k
largest clusters (sort + limit), the disambiguation cases (names split
across >1 cluster — vocabulary-bounded name fold, top-k detail rows),
and the optional labeled-pair quality metrics (the existing evaluate
machinery). No matplotlib in this environment — the "plots" are the
underlying tables plus a markdown rendering.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.stages.util import conformed, shuffle_partitions

STAGES = ("features", "pairs", "edges", "clusters", "canonical")


def cluster_size_histogram_ds(clusters: ray.data.Dataset) -> ray.data.Dataset:
    """(size, n_clusters) from a (url, cluster_id) table — two partial
    folds, driver sees one row per DISTINCT size."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["cluster_id"]), "cluster_id").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["cluster_id", "c"])

    sizes = (
        clusters.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Sum(on="c", alias_name="size"))
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        s, n = np.unique(
            t.column("size").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "size": pa.array(s.astype(np.int64), pa.int64()),
                "n_clusters": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    out = (
        sizes.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("size")
        .aggregate(Sum(on="n_clusters", alias_name="n_clusters"))
    )
    return conformed(
        out, pa.schema([("size", pa.int64()), ("n_clusters", pa.int64())])
    )


def disambiguation_cases(
    clusters: ray.data.Dataset,
    features: ray.data.Dataset,
    top_k: int = 20,
    num_partitions: int | None = None,
) -> pa.Table:
    """Names the pipeline SPLIT into multiple entities — the PoC's
    "successfully disambiguated" report. One join attaches the
    normalized name per url, a name-keyed fold counts distinct clusters
    per name, and only names with >= 2 clusters survive to the driver
    (bounded by the ambiguous-name vocabulary, sorted, top-k)."""
    P = num_partitions or shuffle_partitions()
    named = clusters.join(
        features.select_columns(["url", "name"]),
        join_type="inner",
        num_partitions=P,
        on=("url",),
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["name", "cluster_id"]), ["name", "cluster_id"]
        ).aggregate([([], "count_all")])
        return g.rename_columns(["name", "cluster_id", "n_pages"])

    # name-keyed sweep: every (name, cluster) row of a name co-locates
    from record_matching_ray.functions.hashing import _U64, hash_strings, mix64

    def add_pk(t: pa.Table) -> pa.Table:
        pk = (
            mix64(hash_strings(t.column("name").to_pylist())) % _U64(P)
        ).astype(np.int64)
        return t.append_column("pk", pa.array(pk, pa.int64()))

    def name_fold(g: pa.Table) -> pa.Table:
        names = np.asarray(g.column("name").to_pylist(), dtype=object)
        cids = np.asarray(g.column("cluster_id").to_pylist(), dtype=object)
        np_pages = g.column("n_pages").to_numpy(zero_copy_only=False)
        order = np.lexsort((cids, names))
        names, cids, np_pages = names[order], cids[order], np_pages[order]
        new_pair = np.r_[True, (names[1:] != names[:-1]) | (cids[1:] != cids[:-1])]
        seg = np.cumsum(new_pair) - 1
        pair_names = names[new_pair]
        pair_pages = np.bincount(seg, weights=np_pages.astype(np.float64))
        new_name = np.r_[True, pair_names[1:] != pair_names[:-1]]
        nseg = np.cumsum(new_name) - 1
        n_clusters = np.bincount(nseg)
        n_pages = np.bincount(nseg, weights=pair_pages)
        out_names = pair_names[new_name]
        keep = n_clusters >= 2
        return pa.table(
            {
                "name": pa.array(out_names[keep], pa.string()),
                "n_clusters": pa.array(
                    n_clusters[keep].astype(np.int64), pa.int64()
                ),
                "n_pages": pa.array(n_pages[keep].astype(np.int64), pa.int64()),
            }
        )

    folded = (
        named.map_batches(pair_partial, batch_format="pyarrow")
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda g: name_fold(g.drop_columns(["pk"])), batch_format="pyarrow"
        )
    )
    folded = conformed(
        folded,
        pa.schema(
            [
                ("name", pa.string()),
                ("n_clusters", pa.int64()),
                ("n_pages", pa.int64()),
            ]
        ),
    )
    top = folded.sort(
        ["n_clusters", "n_pages", "name"], descending=[True, True, False]
    ).limit(top_k)
    parts = [
        t
        for t in top.iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    if not parts:
        return pa.schema(
            [
                ("name", pa.string()),
                ("n_clusters", pa.int64()),
                ("n_pages", pa.int64()),
            ]
        ).empty_table()
    return pa.concat_tables(parts)


def er_run_report(
    out_dir: str,
    labeled: ray.data.Dataset | None = None,
    top_k: int = 10,
) -> dict:
    """Assemble the run report from a completed run_er checkpoint
    directory: per-stage rows + wall counters, cluster-size histogram,
    top-k largest canonical entities, disambiguation cases, and (with a
    labeled pair set) pairwise precision/recall/F1."""
    from record_matching_ray.state import manifest as mf

    report: dict = {"out_dir": out_dir, "stages": {}}
    for st in STAGES:
        sdir = os.path.join(out_dir, st)
        if os.path.exists(os.path.join(sdir, "_MANIFEST.json")):
            m = mf.read_manifest(sdir)
            report["stages"][st] = {
                "rows": m.get("rows"),
                "wall_s": (m.get("counters") or {}).get("wall_s"),
            }

    clusters = mf.read_stage(os.path.join(out_dir, "clusters"))
    features = mf.read_stage(
        os.path.join(out_dir, "features"), columns=["url", "name"]
    )
    hist = (
        cluster_size_histogram_ds(clusters)
        .sort("size")
        .to_pandas()
    )
    report["cluster_size_histogram"] = [
        {"size": int(r.size), "n_clusters": int(r.n_clusters)}
        for r in hist.itertuples()
    ]
    report["n_clusters"] = int(hist["n_clusters"].sum())
    report["n_records"] = int((hist["size"] * hist["n_clusters"]).sum())

    canonical = mf.read_stage(
        os.path.join(out_dir, "canonical"),
        columns=["cluster_id", "canonical_name", "size", "year"],
    )
    top = (
        canonical.sort(["size", "cluster_id"], descending=[True, False])
        .limit(top_k)
        .to_pandas()
    )
    report["largest_clusters"] = [
        {
            "canonical_name": r.canonical_name,
            "size": int(r.size),
            "year": None if r.year is None or (isinstance(r.year, float) and np.isnan(r.year)) else float(r.year),
        }
        for r in top.itertuples()
    ]

    dis = disambiguation_cases(clusters, features, top_k=top_k)
    report["disambiguated_names"] = dis.to_pylist()

    if labeled is not None:
        from record_matching_ray.stages.evaluate import pairwise_metrics_on_labeled

        m = pairwise_metrics_on_labeled(labeled, clusters)
        report["pair_metrics"] = {
            "precision": m.precision,
            "recall": m.recall,
            "f1": m.f1,
            "tp": m.tp,
            "fp": m.fp,
            "fn": m.fn,
        }
    return report


def report_markdown(report: dict) -> str:
    """Render the report dict as markdown (the PoC's human-readable
    artifact; plots become their underlying tables)."""
    lines = [f"# ER run report — `{report['out_dir']}`", ""]
    lines.append("## Stages")
    lines.append("| stage | rows | wall (s) |")
    lines.append("|---|---|---|")
    for st, info in report["stages"].items():
        lines.append(f"| {st} | {info['rows']} | {info['wall_s']} |")
    lines.append("")
    lines.append(
        f"## Clusters: {report['n_clusters']} over {report['n_records']} records"
    )
    lines.append("| cluster size | count |")
    lines.append("|---|---|")
    for row in report["cluster_size_histogram"]:
        lines.append(f"| {row['size']} | {row['n_clusters']} |")
    lines.append("")
    lines.append("## Largest entities")
    lines.append("| canonical name | pages | year |")
    lines.append("|---|---|---|")
    for row in report["largest_clusters"]:
        lines.append(
            f"| {row['canonical_name']} | {row['size']} | {row['year']} |"
        )
    lines.append("")
    lines.append("## Disambiguated names (same name, distinct entities)")
    if report["disambiguated_names"]:
        lines.append("| name | entities | pages |")
        lines.append("|---|---|---|")
        for row in report["disambiguated_names"]:
            lines.append(
                f"| {row['name']} | {row['n_clusters']} | {row['n_pages']} |"
            )
    else:
        lines.append("(none)")
    if "pair_metrics" in report:
        pm = report["pair_metrics"]
        lines.append("")
        lines.append(
            f"## Labeled-pair quality: P={pm['precision']:.6f} "
            f"R={pm['recall']:.6f} F1={pm['f1']:.6f} "
            f"(tp={pm['tp']} fp={pm['fp']} fn={pm['fn']})"
        )
    return "\n".join(lines) + "\n"


def write_report(
    out_dir: str,
    labeled: ray.data.Dataset | None = None,
    top_k: int = 10,
) -> tuple[str, str]:
    """er_run_report -> report.json + report.md inside out_dir; returns
    both paths."""
    rep = er_run_report(out_dir, labeled=labeled, top_k=top_k)
    jpath = os.path.join(out_dir, "report.json")
    mpath = os.path.join(out_dir, "report.md")
    with open(jpath, "w") as f:
        json.dump(rep, f, indent=1, default=str)
    with open(mpath, "w") as f:
        f.write(report_markdown(rep))
    return jpath, mpath
