"""CLI stage registry — one subcommand per pipeline stage.

Mirrors the reference's 18 console scripts (pyproject.toml:22-41), where
each stage is an idempotent read-Parquet -> write-Parquet step and
``run-all`` chains them (record_matching/main.py:858-871). Here every
stage writes through the manifest layer (state/manifest.py), so rerunning
any command with the same inputs/config is a no-op skip and ``run-all``
resumes from the last complete stage.

    python -m record_matching_ray gen-corpus --out /tmp/corpus --pages 5000 --entities 800
    python -m record_matching_ray run-all   --pages /tmp/corpus/pages --out /tmp/run
    python -m record_matching_ray extract   --pages /tmp/corpus/pages --out /tmp/run
    python -m record_matching_ray block     --out /tmp/run
    python -m record_matching_ray score     --out /tmp/run [--weights w.parquet]
    python -m record_matching_ray cluster   --out /tmp/run
    python -m record_matching_ray canonicalize --out /tmp/run
    python -m record_matching_ray refine    --out /tmp/run
    python -m record_matching_ray fold      --out /tmp/run --pages /tmp/new_batch/pages
    python -m record_matching_ray evaluate  --out /tmp/run --labeled .../labeled_pairs.parquet
    python -m record_matching_ray search    --docs .../documents.parquet --query "..." -k 10
    python -m record_matching_ray export-graphml --out /tmp/run --path graph.graphml

Ray session: owned HERE (scripts own sessions; library code never calls
ray.init — driver contract in __ray_entry__.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_up() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)


def _cfg(args) -> "object":
    from record_matching_ray.config import PipelineConfig

    if getattr(args, "config", None):
        with open(args.config) as f:
            return PipelineConfig(**json.load(f))
    return PipelineConfig()


def _fp(args) -> str:
    return _cfg(args).fingerprint() + ":" + (getattr(args, "input_key", "") or "")


def _stage_dir(args, stage: str) -> str:
    return os.path.join(args.out, stage)


def cmd_gen_corpus(args) -> None:
    from record_matching_ray.testgen import write_pages_dir

    paths = write_pages_dir(args.out, args.pages, args.entities, args.seed)
    print(json.dumps(paths))


def cmd_extract(args) -> None:
    _ray_up()
    from record_matching_ray.pipelines.er import build_features
    from record_matching_ray.sources import read_pages
    from record_matching_ray.state import manifest as mf

    sdir = _stage_dir(args, "features")
    if mf.is_complete(sdir, _fp(args)):
        print(f"features complete: {sdir}")
        return
    ds = build_features(read_pages(args.pages), _cfg(args))
    mf.write_stage(ds, sdir, _fp(args))
    print(f"features -> {sdir}")


def cmd_block(args) -> None:
    _ray_up()
    from record_matching_ray.stages import blocking
    from record_matching_ray.state import manifest as mf

    cfg = _cfg(args)
    sdir = _stage_dir(args, "pairs")
    if mf.is_complete(sdir, _fp(args)):
        print(f"pairs complete: {sdir}")
        return
    features = mf.read_stage(_stage_dir(args, "features"))
    hot = blocking.compute_hot_hosts(features, cfg)
    pairs = blocking.generate_candidate_pairs(features, cfg, hot)
    mf.write_stage(pairs, sdir, _fp(args))
    print(f"pairs -> {sdir}")


def cmd_score(args) -> None:
    _ray_up()
    from record_matching_ray.stages import blocking, scoring
    from record_matching_ray.state import manifest as mf

    cfg = _cfg(args)
    sdir = _stage_dir(args, "edges")
    if mf.is_complete(sdir, _fp(args)):
        print(f"edges complete: {sdir}")
        return
    features = mf.read_stage(_stage_dir(args, "features"))
    pairs = mf.read_stage(_stage_dir(args, "pairs"))
    weights = None
    if args.weights:
        from record_matching_ray.stages.sinks import read_weights

        weights = read_weights(args.weights, cfg)
    wide = blocking.attach_pair_payload(pairs, features, cfg, restore_urls=False)
    scored = scoring.score_pairs(wide, cfg, weights)
    mf.write_stage(scoring.edges_from_scores(scored, cfg), sdir, _fp(args))
    print(f"edges -> {sdir}")


def cmd_cluster(args) -> None:
    _ray_up()
    import pyarrow as pa

    from record_matching_ray.pipelines.er import _restore_cluster_urls
    from record_matching_ray.stages import blocking
    from record_matching_ray.stages.clustering import connected_components
    from record_matching_ray.state import manifest as mf

    sdir = _stage_dir(args, "clusters")
    if mf.is_complete(sdir, _fp(args)):
        print(f"clusters complete: {sdir}")
        return
    features = mf.read_stage(_stage_dir(args, "features"))
    edges = mf.read_stage(_stage_dir(args, "edges"))

    def uid_nodes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pa.array(
                    blocking.page_uids(t.column("url").to_pylist()), pa.int64()
                )
            }
        )

    ucl = connected_components(
        edges,
        nodes=features.select_columns(["url"]).map_batches(
            uid_nodes, batch_format="pyarrow"
        ),
        max_iters=_cfg(args).max_cc_iters,
    )
    mf.write_stage(_restore_cluster_urls(ucl, features, 16), sdir, _fp(args))
    print(f"clusters -> {sdir}")


def cmd_canonicalize(args) -> None:
    _ray_up()
    from record_matching_ray.stages.canonicalize import canonicalize
    from record_matching_ray.state import manifest as mf

    sdir = _stage_dir(args, "canonical")
    if mf.is_complete(sdir, _fp(args)):
        print(f"canonical complete: {sdir}")
        return
    # prefer the refined checkpoint (same fingerprint) when the refine
    # command ran — matches run_er, which canonicalizes refined clusters
    cluster_stage = (
        "refined"
        if mf.is_complete(_stage_dir(args, "refined"), _fp(args))
        else "clusters"
    )
    clusters = mf.read_stage(_stage_dir(args, cluster_stage))
    features = mf.read_stage(_stage_dir(args, "features"))
    mf.write_stage(canonicalize(clusters, features), sdir, _fp(args))
    print(f"canonical -> {sdir}")


def cmd_refine(args) -> None:
    _ray_up()
    from record_matching_ray.stages.refine import refine_clusters
    from record_matching_ray.state import manifest as mf

    sdir = _stage_dir(args, "refined")
    if mf.is_complete(sdir, _fp(args)):
        print(f"refined complete: {sdir}")
        return
    clusters = mf.read_stage(_stage_dir(args, "clusters"))
    features = mf.read_stage(_stage_dir(args, "features"))
    mf.write_stage(refine_clusters(clusters, features), sdir, _fp(args))
    print(f"refined -> {sdir}")


def cmd_assign(args) -> None:
    """Incremental ER: assign a NEW page batch to the clusters of a
    completed run (pipelines/incremental.py) — base clusters stay
    immutable; output is one (url, cluster_id, from_base) row per new
    page, written as a manifested stage keyed by --input-key."""
    _ray_up()
    from record_matching_ray.pipelines.incremental import incremental_assign
    from record_matching_ray.sources import read_pages
    from record_matching_ray.state import manifest as mf

    sdir = _stage_dir(args, f"assign_{args.input_key or 'new'}")
    if mf.is_complete(sdir, _fp(args)):
        print(f"assignments complete: {sdir}")
        return
    cluster_stage = (
        "refined"
        if mf.is_complete(_stage_dir(args, "refined"), _fp(args))
        else "clusters"
    )
    res = incremental_assign(
        read_pages(args.new_pages),
        mf.read_stage(_stage_dir(args, "features")),
        mf.read_stage(_stage_dir(args, cluster_stage)),
        _cfg(args),
    )
    mf.write_stage(res["assignments"], sdir, _fp(args))
    print(f"assignments -> {sdir}")


def cmd_block_stats(args) -> None:
    """Observable skew diagnostics: block-size histogram, hot blocks,
    pair-cap overflow bound (stages/blocking.py:block_size_stats)."""
    _ray_up()
    from record_matching_ray.stages import blocking
    from record_matching_ray.state import manifest as mf

    features = mf.read_stage(_stage_dir(args, "features"))
    print(json.dumps(blocking.block_size_stats(features, _cfg(args))))


def cmd_train(args) -> None:
    """Fit logistic weights from labeled pairs (reference train-weights
    console script, record_matching/main.py:444-486) -> weights parquet
    + metrics JSON."""
    _ray_up()
    import numpy as np

    from record_matching_ray.pipelines.er import train_weights_from_labeled
    from record_matching_ray.pipelines.training import (
        cross_validated_f1, feature_importance,
    )
    from record_matching_ray.sources import read_labeled_pairs
    from record_matching_ray.stages.sinks import write_metrics_json, write_weights
    from record_matching_ray.state import manifest as mf

    cfg = _cfg(args)
    features = mf.read_stage(_stage_dir(args, "features"))
    labeled = read_labeled_pairs(args.labeled)
    intercept, w, auc = train_weights_from_labeled(features, labeled, cfg)
    write_weights(args.weights_out, intercept, w, cfg)
    metrics = {
        "auc": auc,
        "intercept": intercept,
        "weights": {n: float(v) for n, v in zip(cfg.feature_names(), w)},
        "importance": feature_importance(np.asarray(w), cfg.feature_names()),
    }
    if args.metrics_json:
        write_metrics_json(args.metrics_json, metrics)
    print(json.dumps(metrics))


def cmd_discover(args) -> None:
    """Oracle-labeled balanced training set (reference
    discover-training-set console script, main.py:194-260) -> labeled
    pairs parquet."""
    _ray_up()
    import pyarrow.parquet as pq

    from record_matching_ray.pipelines.training import discover_training_set
    from record_matching_ray.state import manifest as mf

    cfg = _cfg(args)
    features = mf.read_stage(_stage_dir(args, "features"))
    truth_t = pq.read_table(args.truth)
    truth = dict(
        zip(
            truth_t.column("url").to_pylist(),
            truth_t.column("entity_id").to_pylist(),
        )
    )
    out = discover_training_set(features, truth, cfg, n_target=args.n_target)
    mf.write_stage(out, _stage_dir(args, "training_set"), _fp(args))
    print(f"training_set -> {_stage_dir(args, 'training_set')}")


def cmd_run_all(args) -> None:
    _ray_up()
    from record_matching_ray.pipelines.er import run_er
    from record_matching_ray.sources import read_pages

    res = run_er(
        read_pages(args.pages),
        _cfg(args),
        out_dir=args.out,
        input_key=args.input_key or "",
    )
    n = res["clusters"].count()
    print(json.dumps({"clusters_rows": n, "out": args.out}))


def cmd_fold(args) -> None:
    """Incremental fold: cluster NEW pages into an existing run-all
    checkpoint (pipelines/incremental.py) — only new-touching pairs are
    scored, old edges come from the checkpoint. Writes the merged
    (url, cluster_id) table to --fold-out as partitioned parquet."""
    _ray_up()
    from record_matching_ray.pipelines.incremental import run_er_incremental
    from record_matching_ray.sources import read_pages
    from record_matching_ray.state import manifest as mf

    res = run_er_incremental(
        read_pages(args.pages),
        _cfg(args),
        args.out,
        args.input_key or "",
        append_checkpoint=bool(args.append),
        fold_key=args.fold_key or "",
    )
    fold_out = args.fold_out or os.path.join(args.out, "fold_clusters")
    mf.write_stage(res["clusters"], fold_out, _fp(args) + ":fold")
    n = mf.read_manifest(fold_out)["rows"]
    print(json.dumps({"clusters_rows": n, "out": fold_out}))


def cmd_evaluate(args) -> None:
    _ray_up()
    from record_matching_ray.sources import read_labeled_pairs
    from record_matching_ray.stages.evaluate import pairwise_metrics_on_labeled
    from record_matching_ray.state import manifest as mf

    clusters = mf.read_stage(_stage_dir(args, "clusters"))
    labeled = read_labeled_pairs(args.labeled)
    m = pairwise_metrics_on_labeled(labeled, clusters)
    out = {
        "tp": m.tp, "fp": m.fp, "fn": m.fn, "tn": m.tn,
        "precision": m.precision, "recall": m.recall, "f1": m.f1,
    }
    if args.metrics_json:
        from record_matching_ray.stages.sinks import write_metrics_json

        write_metrics_json(args.metrics_json, out)
    if args.errors_out:
        # FP/FN pair export for error review (reference recall()'s
        # anti-join pair tables, main.py:771-782)
        from record_matching_ray.stages.evaluate import error_pairs_on_labeled

        errs = error_pairs_on_labeled(labeled, clusters)
        mf.write_stage(errs, args.errors_out, _fp(args) + ":errors")
        out["errors_out"] = args.errors_out
        out["error_rows"] = mf.read_manifest(args.errors_out)["rows"]
    print(json.dumps(out))


def cmd_search(args) -> None:
    _ray_up()
    import ray.data

    from record_matching_ray.stages.search import semantic_search

    docs = ray.data.read_parquet(args.docs)
    out = semantic_search(docs, args.query, k=args.k, where_lang=args.lang)
    print(out.to_pandas().to_json(orient="records"))


def cmd_export_csv(args) -> None:
    """Small-result CSV export of any checkpointed stage (reference:
    resolved/canonical entities CSVs, poc1:1281-1366, poc2:2574-2595).
    Size-gated: CSV is a driver-side convenience sink, not a data path."""
    _ray_up()
    from record_matching_ray.state import manifest as mf

    ds = mf.read_stage(_stage_dir(args, args.stage))
    n = ds.count()
    if n > args.max_rows:
        raise SystemExit(
            f"stage has {n} rows > --max-rows {args.max_rows}; "
            "use the parquet output for large results"
        )
    ds.to_pandas().to_csv(args.path, index=False)
    print(json.dumps({"rows": n, "path": args.path}))


def cmd_export_shards(args) -> None:
    """Sharded training-data export of a checkpointed stage: fixed-size
    parquet shards + shards.json index for data-loader assignment."""
    _ray_up()
    from record_matching_ray.sources.tables import export_training_shards
    from record_matching_ray.state import manifest as mf

    ds = mf.read_stage(_stage_dir(args, args.stage))
    idx = export_training_shards(ds, args.path, rows_per_shard=args.rows_per_shard)
    print(json.dumps({"shards": len(idx["shards"]), "rows": idx["total_rows"]}))


def cmd_export_graphml(args) -> None:
    _ray_up()
    from record_matching_ray.stages.sinks import write_graphml
    from record_matching_ray.state import manifest as mf

    edges = mf.read_stage(_stage_dir(args, "edges"))
    stats = write_graphml(edges, args.path, max_edges=args.max_edges)
    print(json.dumps(stats))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="record_matching_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, out=True):
        if out:
            sp.add_argument("--out", required=True)
        sp.add_argument("--config", help="JSON file of PipelineConfig overrides")
        sp.add_argument("--input-key", dest="input_key", default="")

    sp = sub.add_parser("gen-corpus")
    sp.add_argument("--out", required=True)
    sp.add_argument("--pages", type=int, default=5000)
    sp.add_argument("--entities", type=int, default=800)
    sp.add_argument("--seed", type=int, default=42)
    sp.set_defaults(fn=cmd_gen_corpus)

    sp = sub.add_parser("extract")
    sp.add_argument("--pages", required=True)
    common(sp)
    sp.set_defaults(fn=cmd_extract)

    for name, fn in [
        ("block", cmd_block),
        ("cluster", cmd_cluster),
        ("canonicalize", cmd_canonicalize),
        ("refine", cmd_refine),
    ]:
        sp = sub.add_parser(name)
        common(sp)
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("score")
    common(sp)
    sp.add_argument("--weights", help="weights parquet (stages/sinks.py)")
    sp.set_defaults(fn=cmd_score)

    sp = sub.add_parser("block-stats")
    common(sp)
    sp.set_defaults(fn=cmd_block_stats)

    sp = sub.add_parser("assign")
    common(sp)
    sp.add_argument("--new-pages", dest="new_pages", required=True)
    sp.set_defaults(fn=cmd_assign)

    sp = sub.add_parser("train")
    common(sp)
    sp.add_argument("--labeled", required=True)
    sp.add_argument("--weights-out", dest="weights_out", required=True)
    sp.add_argument("--metrics-json", dest="metrics_json")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("discover")
    common(sp)
    sp.add_argument("--truth", required=True, help="truth parquet (url, entity_id)")
    sp.add_argument("--n-target", dest="n_target", type=int, default=200)
    sp.set_defaults(fn=cmd_discover)

    sp = sub.add_parser("run-all")
    sp.add_argument("--pages", required=True)
    common(sp)
    sp.set_defaults(fn=cmd_run_all)

    sp = sub.add_parser("fold")
    sp.add_argument("--pages", required=True, help="NEW pages to fold in")
    sp.add_argument("--fold-out", dest="fold_out")
    sp.add_argument("--append", action="store_true",
                    help="persist this fold (features_fN/edges_fN + "
                         "folds.json) so the next fold chains on it")
    sp.add_argument("--fold-key", dest="fold_key", default="")
    common(sp)
    sp.set_defaults(fn=cmd_fold)

    sp = sub.add_parser("evaluate")
    common(sp)
    sp.add_argument("--labeled", required=True)
    sp.add_argument("--metrics-json", dest="metrics_json")
    sp.add_argument(
        "--errors-out",
        dest="errors_out",
        help="write the FP/FN pair table (parquet stage) here for review",
    )
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("search")
    sp.add_argument("--docs", required=True)
    sp.add_argument("--query", required=True)
    sp.add_argument("-k", type=int, default=10)
    sp.add_argument("--lang")
    sp.set_defaults(fn=cmd_search)

    sp = sub.add_parser("export-csv")
    common(sp)
    sp.add_argument("--stage", required=True)
    sp.add_argument("--path", required=True)
    sp.add_argument("--max-rows", dest="max_rows", type=int, default=1_000_000)
    sp.set_defaults(fn=cmd_export_csv)

    sp = sub.add_parser("export-graphml")
    common(sp)
    sp.add_argument("--path", required=True)
    sp.add_argument("--max-edges", dest="max_edges", type=int, default=1_000_000)
    sp.set_defaults(fn=cmd_export_graphml)

    sp = sub.add_parser("export-shards")
    common(sp)
    sp.add_argument("--stage", required=True)
    sp.add_argument("--path", required=True)
    sp.add_argument(
        "--rows-per-shard", dest="rows_per_shard", type=int, default=1 << 16
    )
    sp.set_defaults(fn=cmd_export_shards)
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv if argv is not None else sys.argv[1:])
    args.fn(args)


if __name__ == "__main__":
    main()
