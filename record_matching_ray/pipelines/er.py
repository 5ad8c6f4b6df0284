"""The flagship entity-resolution pipeline (north rule, SURVEY.md §7.1).

    read_parquet(pages url,warc_ts,html,text,lang)
      S1 extract+features   map_batches (actor pool, zero-copy Arrow)
      S2 blocking           emit block keys (host|LSH band|name, salted)
                            -> coarse groupby -> pairs -> int-keyed dedup
      S3 scoring            fused broadcast scorer (uid pairs in, edges
                            out) or payload-join + actor pool at scale
      S4 clustering         vectorized contraction + hybrid components
                            -> (url, cluster_id)
      S5 canonicalize       groupby(cluster_id) -> canonical entities
      S5b refine (optional) year-conflict cluster splitting

Reference chain replaced: record_matching/main.py:858-871 (template ->
dedup -> vectorize -> index -> ANN -> filter -> distances -> classify ->
cluster). Each stage optionally checkpoints as partitioned Parquet +
manifest and a rerun resumes from the last complete stage.
"""

from __future__ import annotations

import numpy as np

import ray
import ray.data

from record_matching_ray.config import PipelineConfig
from record_matching_ray.functions.logistic import fit_logistic, roc_auc
from record_matching_ray.stages import blocking, scoring
from record_matching_ray.stages.canonicalize import canonicalize
from record_matching_ray.stages.clustering import connected_components
from record_matching_ray.stages.extract import ExtractFeatures
from record_matching_ray.state import manifest as mf
from record_matching_ray.stages.util import cluster_parallelism


def weights_digest(weights: tuple[float, np.ndarray] | None) -> str:
    """Stable digest of an explicit (intercept, weights) override, folded
    into stage fingerprints so a checkpoint scored under one model is
    never silently reused (or folded onto, pipelines/incremental.py) under
    another. None -> '' (the cfg-default weights are already part of
    cfg.fingerprint()), which keeps fingerprints for weight-less runs
    byte-identical to prior releases."""
    if weights is None:
        return ""
    import hashlib

    intercept, w = weights
    payload = np.concatenate(
        [[np.float64(intercept)], np.asarray(w, dtype=np.float64)]
    ).tobytes()
    return ":w" + hashlib.sha256(payload).hexdigest()[:12]


def _pool_max(cfg: PipelineConfig) -> int:
    """Actor-pool ceiling: at least the configured concurrency, scaled up
    to the session's CPU count so 32-CPU runs don't idle behind a
    4-actor pool sized for the test session."""
    return max(cfg.scorer_concurrency, cluster_parallelism())


def build_features(
    pages: ray.data.Dataset,
    cfg: PipelineConfig,
    concurrency: int | None = None,
    encoder=None,
    registry=None,
) -> ray.data.Dataset:
    """S1. Actor pool so the per-worker state (permutation bank, compiled
    regexes, embedding model) is built once per actor, not per batch.

    ``encoder``: functions/encoder.py protocol instance or zero-arg
    factory — swaps the deterministic hashing embedder for a real model
    (local or RetryingRemoteEncoder-wrapped API client) without touching
    the pipeline. Custom encoders change feature semantics: fold an
    encoder tag into run_er's input_key so checkpoints fingerprint it."""
    return pages.map_batches(
        ExtractFeatures,
        fn_constructor_args=(cfg, True, encoder, registry),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        # autoscaling pool (min 1): a fixed-size pool would reserve CPUs
        # that the hash-shuffle aggregators downstream need to start
        concurrency=(1, concurrency or _pool_max(cfg)),
    )


def train_weights_from_labeled(
    features: ray.data.Dataset,
    labeled_pairs: ray.data.Dataset,
    cfg: PipelineConfig,
    num_partitions: int | None = None,
    registry=None,
) -> tuple[float, np.ndarray, float]:
    """Logistic-regression weights from the labeled pair sample.

    Distributed part: join labeled pairs to both sides' payloads and
    compute per-pair feature vectors with the same scorer kernels used at
    inference (so train/serve features can't drift). Driver part: the
    small (pairs × features) matrix -> numpy gradient descent (reference:
    sklearn liblinear at main.py:444-486). Returns (intercept, weights,
    train AUC)."""
    pairs = labeled_pairs.select_columns(["left", "right", "match"])
    fnames = registry.feature_names() if registry else cfg.feature_names()
    wide = blocking.attach_pair_payload(
        pairs, features, cfg, num_partitions,
        extra_payload=registry.payload_columns() if registry else None,
    )

    import pyarrow as pa

    def featurize(t: pa.Table) -> pa.Table:
        X = scoring.compute_pair_features(t, cfg.embed_dim, registry=registry)
        cols = {"match": t.column("match")}
        for i, name in enumerate(fnames):
            cols[name] = pa.array(X[:, i], pa.float64())
        return pa.table(cols)

    mat = wide.map_batches(featurize, batch_format="pyarrow").to_pandas()
    X = mat[list(fnames)].to_numpy()
    y = mat["match"].to_numpy().astype(np.float64)
    intercept, weights = fit_logistic(X, y)
    from record_matching_ray.functions.logistic import predict_proba

    auc = roc_auc(y, predict_proba(X, intercept, weights))
    return intercept, weights, auc


def _restore_cluster_urls(
    uclusters: ray.data.Dataset,
    features: ray.data.Dataset,
    num_partitions: int,
    broadcast_max_rows: int = 2_000_000,
    uid_remap: dict | None = None,
) -> ray.data.Dataset:
    """(uid, cluster_uid) -> (url, cluster_id) where cluster_id is the url
    of the component's min-uid member (deterministic). Broadcast map for
    counted-small page sets; double hash join beyond."""
    import pyarrow as pa

    from record_matching_ray.stages import blocking as _b

    n = features.count()
    if n <= broadcast_max_rows:
        import ray as _ray

        # sorted-array broadcast (searchsorted + Arrow take) — no per-row
        # Python dict build or lookup (VERDICT r2 cosmetic finding)
        uid_parts: list[np.ndarray] = []
        url_parts: list[pa.Array] = []
        for t in features.select_columns(["url"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            urls_col = t.column("url")
            uid_parts.append(
                np.asarray(_b.page_uids(urls_col.to_pylist(), uid_remap), np.int64)
            )
            url_parts.append(
                urls_col.combine_chunks()
                if isinstance(urls_col, pa.ChunkedArray)
                else urls_col
            )
        all_uids = np.concatenate(uid_parts) if uid_parts else np.empty(0, np.int64)
        all_urls = (
            pa.concat_arrays([pa.array(a) if not isinstance(a, pa.Array) else a for a in url_parts])
            if url_parts
            else pa.array([], pa.string())
        )
        order = np.argsort(all_uids)
        ref = _ray.put((all_uids[order], all_urls.take(pa.array(order, pa.int64()))))

        def restore(t: pa.Table) -> pa.Table:
            uids_sorted, urls_sorted = (
                _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
            )
            uids = t.column("url").to_numpy(zero_copy_only=False)
            cids = t.column("cluster_id").to_numpy(zero_copy_only=False)
            pu = np.searchsorted(uids_sorted, uids)
            pc_ = np.searchsorted(uids_sorted, cids)
            # vectorized presence check (ADVICE r3 item 2): a uid absent
            # from the features map must fail loudly, not resolve to a
            # neighboring entry's url / IndexError past the end
            nmap = len(uids_sorted)
            if nmap == 0 and (len(uids) or len(cids)):
                raise KeyError("cluster uid restore: empty features map")
            pu_c = np.clip(pu, 0, max(nmap - 1, 0))
            pc_c = np.clip(pc_, 0, max(nmap - 1, 0))
            if not (
                np.array_equal(uids_sorted[pu_c], uids)
                and np.array_equal(uids_sorted[pc_c], cids)
            ):
                missing = np.unique(
                    np.concatenate(
                        [uids[uids_sorted[pu_c] != uids], cids[uids_sorted[pc_c] != cids]]
                    )
                )[:5]
                raise KeyError(
                    f"cluster uid restore: {missing.tolist()} not in features map"
                )
            pu, pc_ = pu_c, pc_c
            return pa.table(
                {
                    "url": urls_sorted.take(pa.array(pu, pa.int64())),
                    "cluster_id": urls_sorted.take(pa.array(pc_, pa.int64())),
                }
            )

        return uclusters.map_batches(restore, batch_format="pyarrow")

    def uid_url(t: pa.Table) -> pa.Table:
        urls = t.column("url")
        return pa.table(
            {
                "muid": pa.array(
                    _b.page_uids(urls.to_pylist(), uid_remap), pa.int64()
                ),
                "murl": urls,
            }
        )

    side = features.select_columns(["url"]).map_batches(uid_url, batch_format="pyarrow")
    out = uclusters.join(
        side, join_type="inner", num_partitions=num_partitions,
        on=("url",), right_on=("muid",),
    ).rename_columns({"murl": "url_str"})
    out = out.join(
        side, join_type="inner", num_partitions=num_partitions,
        on=("cluster_id",), right_on=("muid",),
    ).rename_columns({"murl": "cid_str"})
    return out.map_batches(
        lambda t: pa.table(
            {"url": t.column("url_str"), "cluster_id": t.column("cid_str")}
        ),
        batch_format="pyarrow",
    )


def run_er(
    pages: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    out_dir: str | None = None,
    input_key: str = "",
    weights: tuple[float, np.ndarray] | None = None,
    num_partitions: int | None = None,
    feature_concurrency: int | None = None,
    encoder=None,
    registry=None,
) -> dict:
    """Run S1..S5. If out_dir is set, every stage checkpoints to
    out_dir/<stage>/ with a manifest and a rerun skips complete stages
    (same config fingerprint + input_key). Returns dict of Datasets:
    features, pairs, scored, edges, clusters, canonical ("scored" is None
    on the fused-scorer path, where per-pair scores below tau are never
    materialized — set cfg.keep_scored/emit_features to force the
    two-stage join plan)."""
    cfg = cfg or PipelineConfig()
    if num_partitions is None:
        from record_matching_ray.stages.util import shuffle_partitions

        # num_partitions feeds ONLY hash-shuffle joins (payload attach,
        # url restore, canonicalize, refine) — one aggregator ACTOR per
        # partition, so past ~CPUs/2 they fight map tasks for slots:
        # measured 4.7M-pair payload attach on 32 CPUs: 16 partitions
        # 11.5s, 32 partitions 52.6s, 64 partitions >390s. Keep exactly
        # shuffle_partitions() (CPUs/2), never a multiple of it.
        num_partitions = max(8, shuffle_partitions())
    fp = (
        cfg.fingerprint()
        + weights_digest(weights)
        + (registry.fingerprint() if registry else "")
        + ":"
        + input_key
    )

    def checkpoint(ds: ray.data.Dataset, stage: str) -> ray.data.Dataset:
        if out_dir is None:
            return ds
        import os
        import time

        sdir = os.path.join(out_dir, stage)
        if mf.is_complete(sdir, fp):
            return mf.read_stage(sdir)
        t0 = time.time()
        mf.write_stage(ds, sdir, fp, counters={"wall_s": None})
        # stage wall time (includes executing the lazy pipeline since the
        # previous checkpoint) — recorded in the manifest counters
        mf.update_counters(sdir, {"wall_s": round(time.time() - t0, 3)})
        return mf.read_stage(sdir)

    features = checkpoint(
        build_features(pages, cfg, feature_concurrency, encoder, registry),
        "features",
    )
    if out_dir is None:
        # features feed 4+ consumers (hot hosts, block keys, both payload
        # joins, cluster nodes, canonicalize); without a parquet checkpoint,
        # pin them once in the object store instead of re-running S1 per
        # consumer. (With out_dir set, the checkpoint read serves this.)
        features = features.materialize()

    def pruned(cols: list[str]) -> ray.data.Dataset:
        """Feature reader pruned to `cols` AT THE PARQUET READER when
        checkpointed — select_columns after a read is a post-read Project
        in this Ray version, so every downstream consumer was re-reading
        the full ~N-GB feature table (text included) to use 3 columns."""
        if out_dir is not None:
            import os as _os

            return mf.read_stage(_os.path.join(out_dir, "features"), columns=cols)
        return features

    uid_remap: dict | None = None
    if cfg.uid_mode == "checked64":
        # 10^12-page path: audit 63-bit uid collisions across the corpus
        # and broadcast the tiny deterministic remap (blocking.page_uids
        # docstring); persisted next to the checkpoints so incremental
        # folds reuse the exact id assignment.
        import pyarrow as _pa

        def _flag(t):
            return t.append_column(
                "frozen",
                _pa.array(np.zeros(t.num_rows, dtype=bool), _pa.bool_()),
            )

        uid_remap = blocking.build_uid_remap(
            pruned(["url"]).map_batches(_flag, batch_format="pyarrow")
        )
        if out_dir is not None:
            import json as _json
            import os as _os

            with open(_os.path.join(out_dir, "uid_remap.json"), "w") as f:
                _json.dump(uid_remap, f)

    hot = blocking.compute_hot_hosts(pruned(["host"]), cfg)
    pairs = checkpoint(
        blocking.generate_candidate_pairs(
            pruned(["url", "host", "name", "minhash"]), cfg, hot,
            uid_remap=uid_remap,
        ),
        "pairs",
    )
    extra_cols = registry.payload_columns() if registry else []
    payload_feats = pruned(["url"] + blocking.PAIR_PAYLOAD + extra_cols)
    url_feats = pruned(["url"])
    # Scoring, edges and clustering all run in uid space (8B keys);
    # urls are restored once on the final cluster table. Two scoring
    # plans, picked by the counted feature size (same bound as
    # attach_pair_payload's broadcast gate):
    # - fused broadcast scorer: bare uid pairs stream into an actor pool
    #   holding the whole payload; attach + features + edge filter happen
    #   in one pass and the wide pair table never exists.
    # - join plan (payload too big to broadcast — the 100TB path): hash-
    #   join payloads onto pairs, then the scorer actor pool.
    # Pairs spread over >= 2 blocks per scorer actor — the pair-dedup
    # stage emits shuffle_partitions() blocks, which under-subscribes a
    # 32-actor scorer pool (narrow repartition: left/right only).
    scored = None
    # Fused-plan gate: the broadcast scorer state is ~230MB of numpy
    # (SQ8 embedding + packed minhash + uids/years) shared zero-copy via
    # plasma per node, plus ~160B/feature of PRIVATE per-actor heap for
    # the url/name object arrays (~240MB/actor at 1.5M; ~20GB across a
    # 32-actor pool at the 4M gate on a 128GB node). The r3 gate
    # of 1M pushed a 1.45M-page corpus onto the join plan, whose 16
    # CPU-scaled partitions each held ~7GB of wide pairs and OOM'd the
    # hash-join aggregators (round-4 1.5M-page leg); the join plan is
    # the right plan only at true 100TB counts, and now scales its
    # partition count with the pair volume (attach_pair_payload).
    if (
        url_feats.count() <= 4_000_000
        and not cfg.keep_scored
        and not cfg.emit_features
        and not registry
        # registered custom fields use the generic payload-attach +
        # PairScorer plan (the fused scorer's packed actor state is
        # built-in-only — documented trade in registry.py)
    ):
        # no repartition: the dedup stage already emits
        # coarse_groupby_partitions() (= 4x CPUs) blocks, so the scorer
        # pool is fully subscribed without an extra 16B/pair all-to-all
        edges_ds = scoring.score_pairs_fused(
            pairs, payload_feats, cfg, weights, uid_remap=uid_remap
        )
    else:
        wide = blocking.attach_pair_payload(
            pairs, payload_feats, cfg, num_partitions, restore_urls=False,
            uid_remap=uid_remap, extra_payload=extra_cols or None,
        )
        # persisting the full scored table would write+read ~150B x
        # |pairs| for a stage whose only consumer keeps score >= tau
        # rows; set keep_scored=True (cfg) to checkpoint it for
        # re-thresholding experiments.
        scored = scoring.score_pairs(wide, cfg, weights, registry)
        if out_dir is not None and cfg.keep_scored:
            scored = checkpoint(scored, "scored")
        edges_ds = scoring.edges_from_scores(scored, cfg)
    edges = checkpoint(edges_ds, "edges")

    def uid_nodes(t):
        import pyarrow as pa

        return pa.table(
            {
                "url": pa.array(
                    blocking.page_uids(t.column("url").to_pylist(), uid_remap),
                    pa.int64(),
                )
            }
        )

    uclusters = connected_components(
        edges,
        nodes=url_feats.select_columns(["url"]).map_batches(
            uid_nodes, batch_format="pyarrow"
        ),
        max_iters=cfg.max_cc_iters,
    )
    clusters = checkpoint(
        _restore_cluster_urls(
            uclusters, url_feats, num_partitions, uid_remap=uid_remap
        ),
        "clusters",
    )
    refined = None
    if cfg.refine_year_tolerance is not None or cfg.refine_domain_threshold is not None:
        from record_matching_ray.stages.refine import (
            refine_clusters,
            refine_clusters_domain,
        )

        ref_ds = clusters
        if cfg.refine_year_tolerance is not None:
            ref_ds = refine_clusters(
                ref_ds, pruned(["url", "name", "year", "lang"]),
                cfg.refine_year_tolerance, num_partitions,
            )
        if cfg.refine_domain_threshold is not None:
            ref_ds = refine_clusters_domain(
                ref_ds, pruned(["url", "name", "embedding"]),
                cfg.refine_domain_threshold, num_partitions, dim=cfg.embed_dim,
            )
        refined = checkpoint(ref_ds, "refined")
        clusters = refined
    canonical = checkpoint(
        canonicalize(clusters, pruned(["url", "name", "year", "lang"]),
                     num_partitions),
        "canonical",
    )
    return {
        "features": features,
        "pairs": pairs,
        "scored": scored,
        "edges": edges,
        "clusters": clusters,
        "refined": refined,
        "canonical": canonical,
        "hot_hosts": hot,
    }
