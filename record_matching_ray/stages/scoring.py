"""S3 — pairwise scoring with a warm actor pool.

Replaces the reference's GPU classify loop — weights tensor + sigmoid over
all candidate pairs on CUDA (record_matching/main.py:494-501, 606-626) and
the per-field distance joins (main.py:353-441) — with a callable-class
map_batches stage: each actor holds the broadcast weights (ray.put once on
the driver, ray.get once per actor in __init__ — never re-shipped per
batch) plus compiled similarity kernels, and scores a whole Arrow batch of
pairs vectorized.

Feature vector order is pinned to config.FEATURE_NAMES (the reference pins
sorted(keys), main.py:452, 684 — ordering is part of the contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from record_matching_ray.config import FEATURE_NAMES, PipelineConfig
from record_matching_ray.functions.embed import cosine_rows
from record_matching_ray.functions.logistic import expit
from record_matching_ray.functions import strsim
from record_matching_ray.stages.util import cluster_parallelism


def _unpack_embeddings(col, dim: int) -> np.ndarray:
    """binary blobs (packed float32) -> (n, dim) float32."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    buf = b"".join(col.to_pylist())
    return np.frombuffer(buf, dtype=np.float32).reshape(-1, dim)


def compute_pair_features(batch: pa.Table, dim: int) -> np.ndarray:
    """(n, len(FEATURE_NAMES)) float64 feature matrix, FEATURE_NAMES order."""
    n = batch.num_rows
    emb_l = _unpack_embeddings(batch.column("embedding_l"), dim)
    emb_r = _unpack_embeddings(batch.column("embedding_r"), dim)
    name_l = batch.column("name_l").to_pylist()
    name_r = batch.column("name_r").to_pylist()
    sig_l = batch.column("token_sig_l").to_pylist()
    sig_r = batch.column("token_sig_r").to_pylist()
    year_l = batch.column("year_l").to_numpy(zero_copy_only=False)
    year_r = batch.column("year_r").to_numpy(zero_copy_only=False)

    feats = np.empty((n, len(FEATURE_NAMES)), dtype=np.float64)
    feats[:, FEATURE_NAMES.index("f_cosine")] = cosine_rows(emb_l, emb_r)
    feats[:, FEATURE_NAMES.index("f_jaccard")] = strsim.jaccard_tokens_batch(sig_l, sig_r)
    feats[:, FEATURE_NAMES.index("f_jaro_winkler")] = strsim.jaro_winkler_batch(
        name_l, name_r
    )
    feats[:, FEATURE_NAMES.index("f_token_levenshtein")] = (
        strsim.token_set_levenshtein_batch(name_l, name_r)
    )
    feats[:, FEATURE_NAMES.index("f_temporal")] = strsim.year_compat_batch(
        year_l, year_r
    )
    return feats


class PairScorer:
    """Actor-pool callable: pairs-with-payload -> (left, right, f_*, score).

    weights_ref: ray.ObjectRef of (intercept, np.ndarray) — or the tuple
    itself (tests). Resolved ONCE in __init__ (warm per actor).
    """

    def __init__(self, cfg: PipelineConfig, weights_ref=None):
        self.cfg = cfg
        if weights_ref is None:
            self.intercept = cfg.intercept
            self.weights = np.asarray(cfg.weights, dtype=np.float64)
        else:
            obj = (
                ray.get(weights_ref)
                if isinstance(weights_ref, ray.ObjectRef)
                else weights_ref
            )
            self.intercept, self.weights = float(obj[0]), np.asarray(
                obj[1], dtype=np.float64
            )
        assert len(self.weights) == len(FEATURE_NAMES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = compute_pair_features(batch, self.cfg.embed_dim)
        score = expit(feats @ self.weights + self.intercept)
        cols = {
            "left": batch.column("left"),
            "right": batch.column("right"),
        }
        for i, fname in enumerate(FEATURE_NAMES):
            cols[fname] = pa.array(feats[:, i].astype(np.float32), pa.float32())
        cols["score"] = pa.array(score.astype(np.float32), pa.float32())
        return pa.table(cols)


def score_pairs(
    pairs_with_payload: ray.data.Dataset,
    cfg: PipelineConfig,
    weights: tuple[float, np.ndarray] | None = None,
) -> ray.data.Dataset:
    """The pairs-scored/sec hot loop (BASELINE.md headline metric)."""
    weights_ref = ray.put(weights) if weights is not None else None
    return pairs_with_payload.map_batches(
        PairScorer,
        fn_constructor_args=(cfg, weights_ref),
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
        # autoscaling (min 1) so the pool never starves co-scheduled
        # shuffle aggregators of CPU slots; ceiling tracks cluster CPUs
        concurrency=(1, max(cfg.scorer_concurrency, cluster_parallelism())),
    )


def edges_from_scores(scored: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """score >= tau -> edges (left, right, score). Vectorized Arrow filter
    (reference: prediction > 0.97 filter, main.py:630/634)."""
    import pyarrow.compute as pc

    tau = cfg.edge_threshold

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["score"], tau)).select(
            ["left", "right", "score"]
        )

    return scored.map_batches(keep, batch_format="pyarrow")
