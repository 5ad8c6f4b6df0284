"""Incremental entity resolution: fold a batch of NEW pages into an
existing `run_er` checkpoint without rescoring the old corpus.

The reference pipeline (record_matching/main.py:858-871) is batch-only —
every nightly crawl increment reruns template -> vectorize -> ANN ->
classify over the whole corpus. Here the expensive work is proportional
to the increment:

  S1'  features(new)                    actor-pool map over NEW pages only
  S2'  block keys over old∪new          stateless map; pair emission
       restricted to pairs TOUCHING a new page (old-only blocks emit
       nothing — their pairs were scored by the batch run)
  S3'  score only new-touching pairs    same fused/join scorer plans
  S4'  components over old-edges ∪ new-edges (edge lists, not pair
       tables — |edges| << |pairs|), then url restore

Exactness: min-label connected components is order-independent, so
clusters(old ∪ new) computed incrementally equal the full-batch result
whenever the incremental edge set ∪ old edges covers the same component
structure — which it does by construction: within-old edges come from
the batch checkpoint verbatim, and every block of the union key table
containing a new member emits all its new-touching pairs (tested:
incremental == batch, tests/test_incremental.py). Incremental runs can
therefore MERGE previously separate clusters when a new page bridges
them, which naive assign-to-nearest-cluster schemes cannot.

Scale: the one O(corpus) term is the stateless block-key map over the
old features checkpoint (a pruned 3-column parquet read). At 100 TB,
persist the key table once (it is `pairs`' first map) and this too
becomes O(new + touched blocks); the code reads the feature checkpoint
because the key table is cheap to rebuild at bench scale.
"""

from __future__ import annotations

import numpy as np

import ray.data

from record_matching_ray.config import PipelineConfig
from record_matching_ray.pipelines.er import (
    _restore_cluster_urls,
    build_features,
)
from record_matching_ray.stages import blocking, scoring
from record_matching_ray.stages.clustering import connected_components
from record_matching_ray.state import manifest as mf


def run_er_incremental(
    new_pages: ray.data.Dataset,
    cfg: PipelineConfig,
    old_out_dir: str,
    old_input_key: str,
    weights: tuple[float, np.ndarray] | None = None,
    num_partitions: int | None = None,
) -> dict:
    """Fold `new_pages` into the completed `run_er(out_dir=old_out_dir,
    input_key=old_input_key)` checkpoint. Requires the batch run's
    `features` and `edges` stages to be complete for the same cfg
    fingerprint (raises otherwise — an incremental fold over a stale or
    differently-configured checkpoint would silently mix semantics).

    Returns {"features_new", "pairs", "edges_new", "clusters"} where
    clusters covers the FULL old ∪ new corpus."""
    import os

    fp = cfg.fingerprint() + ":" + old_input_key
    fdir = os.path.join(old_out_dir, "features")
    edir = os.path.join(old_out_dir, "edges")
    for sdir, name in ((fdir, "features"), (edir, "edges")):
        if not mf.is_complete(sdir, fp):
            raise ValueError(
                f"incremental fold needs a complete '{name}' checkpoint in "
                f"{old_out_dir} for fingerprint {fp!r} — run run_er first"
            )
    if num_partitions is None:
        from record_matching_ray.stages.util import shuffle_partitions

        num_partitions = max(8, shuffle_partitions())

    old_block_cols = mf.read_stage(
        fdir, columns=["url", "host", "name", "minhash"]
    )
    old_edges = mf.read_stage(edir)

    # S1' — features for the increment only
    new_features = build_features(new_pages, cfg).materialize()

    # hot hosts over the union (head domains shift as the crawl grows)
    hot = blocking.compute_hot_hosts(
        mf.read_stage(fdir, columns=["host"]).union(
            new_features.select_columns(["host"])
        ),
        cfg,
    )

    # S2' — new-touching candidate pairs
    pairs = blocking.generate_incremental_pairs(
        old_block_cols, new_features, cfg, hot
    )

    # S3' — score them. Payload side must cover old AND new pages (a
    # cross pair needs both sides); same counted broadcast gate as run_er.
    payload_union = mf.read_stage(
        fdir, columns=["url"] + blocking.PAIR_PAYLOAD
    ).union(new_features.select_columns(["url"] + blocking.PAIR_PAYLOAD))
    n_union = payload_union.count()
    if n_union <= 1_000_000 and not cfg.keep_scored and not cfg.emit_features:
        edges_new = scoring.score_pairs_fused(pairs, payload_union, cfg, weights)
    else:
        wide = blocking.attach_pair_payload(
            pairs, payload_union, cfg, num_partitions, restore_urls=False
        )
        edges_new = scoring.edges_from_scores(
            scoring.score_pairs(wide, cfg, weights), cfg
        )

    # S4' — components over the union edge list; nodes = every page uid
    # so singleton pages keep their own cluster
    import pyarrow as pa

    def uid_nodes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pa.array(
                    blocking.page_uids(t.column("url").to_pylist()), pa.int64()
                )
            }
        )

    url_union = mf.read_stage(fdir, columns=["url"]).union(
        new_features.select_columns(["url"])
    )
    uclusters = connected_components(
        old_edges.select_columns(["left", "right"]).union(
            edges_new.select_columns(["left", "right"])
        ),
        nodes=url_union.map_batches(uid_nodes, batch_format="pyarrow"),
        max_iters=cfg.max_cc_iters,
    )
    clusters = _restore_cluster_urls(uclusters, url_union, num_partitions)
    return {
        "features_new": new_features,
        "pairs": pairs,
        "edges_new": edges_new,
        "clusters": clusters,
    }
