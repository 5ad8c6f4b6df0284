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


def _unpack_blobs(col, dtype) -> np.ndarray:
    """binary blobs (fixed-width packed arrays) -> (n, dim) matrix.

    Fast path: when the binary values are contiguous in the Arrow data
    buffer (the normal case for a freshly-built column), the matrix is a
    zero-copy ``np.frombuffer`` view — no per-row Python bytes objects.
    The ``b"".join(to_pylist())`` it replaces was ~40% of scorer batch
    time."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count == 0 and pa.types.is_binary(col.type):
        arr_offset = col.offset
        offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            arr_offset : arr_offset + n + 1
        ]
        widths = np.diff(offsets)
        if len(widths) and (widths == widths[0]).all():
            data = np.frombuffer(col.buffers()[2], dtype=dtype)
            itemsize = np.dtype(dtype).itemsize
            start = offsets[0] // itemsize
            per = widths[0] // itemsize
            return data[start : start + n * per].reshape(n, per)
    buf = b"".join(col.to_pylist())
    mat = np.frombuffer(buf, dtype=dtype)
    return mat.reshape(n, -1)


def _memoized_pairwise(
    fn, left: list, right: list, cache: dict
) -> np.ndarray:
    """LEGACY per-pair scalar fn with a persistent cache. The hot loop
    now uses strsim.cached_pairwise_vec (same cache semantics, vectorized
    misses); kept for custom scalar feature fns in the registry."""
    n = len(left)
    out = np.empty(n, dtype=np.float64)
    for i in range(n):
        key = (left[i], right[i])
        v = cache.get(key)
        if v is None:
            v = fn(left[i], right[i])
            cache[key] = v
        out[i] = v
    return out


def compute_pair_features(
    batch: pa.Table,
    dim: int,
    caches: dict[str, dict] | None = None,
    registry=None,
) -> np.ndarray:
    """(n, n_features) float64 feature matrix — FEATURE_NAMES order, then
    any registered custom fields (registry.py) in registration order.

    f_cosine and f_jaccard are fully vectorized (embedding dot products /
    minhash signature agreement); the name kernels memoize through
    `caches` (persistent across batches when called from the PairScorer
    actor). Custom fields compute FieldSpec.compare over the attached
    <name>_l/<name>_r payload columns."""
    n = batch.num_rows
    caches = caches if caches is not None else {"jw": {}, "lev": {}, "tok": {}}
    caches.setdefault("tok", {})
    names = registry.feature_names() if registry else FEATURE_NAMES
    # embeddings travel SQ8-quantized (int8 unit-scaled, blocking.py pack);
    # cosine_rows re-normalizes, so the scale cancels
    emb_l = _unpack_blobs(batch.column("embedding_l"), np.int8).astype(np.float32)
    emb_r = _unpack_blobs(batch.column("embedding_r"), np.int8).astype(np.float32)
    mh_l = _unpack_blobs(batch.column("minhash_l"), np.uint8)
    mh_r = _unpack_blobs(batch.column("minhash_r"), np.uint8)
    name_l = batch.column("name_l").to_pylist()
    name_r = batch.column("name_r").to_pylist()
    year_l = batch.column("year_l").to_numpy(zero_copy_only=False)
    year_r = batch.column("year_r").to_numpy(zero_copy_only=False)

    feats = np.empty((n, len(names)), dtype=np.float64)
    feats[:, FEATURE_NAMES.index("f_cosine")] = cosine_rows(emb_l, emb_r)
    feats[:, FEATURE_NAMES.index("f_jaccard")] = (mh_l == mh_r).mean(axis=1)
    feats[:, FEATURE_NAMES.index("f_jaro_winkler")] = strsim.cached_pairwise_vec(
        strsim.jaro_winkler_vec, name_l, name_r, caches["jw"]
    )
    tok = caches["tok"]
    feats[:, FEATURE_NAMES.index("f_token_levenshtein")] = strsim.cached_pairwise_vec(
        lambda l, r: strsim.token_set_levenshtein_vec(l, r, token_memo=tok),
        name_l, name_r, caches["lev"],
    )
    feats[:, FEATURE_NAMES.index("f_temporal")] = strsim.year_compat_batch(
        year_l, year_r
    )
    feats[:, FEATURE_NAMES.index("f_name_content")] = (
        feats[:, FEATURE_NAMES.index("f_jaro_winkler")]
        * feats[:, FEATURE_NAMES.index("f_jaccard")]
    )
    if registry:
        for j, f in enumerate(registry.fields):
            cl = batch.column(f"{f.name}_l")
            cr = batch.column(f"{f.name}_r")
            if pa.types.is_string(cl.type) or pa.types.is_binary(cl.type):
                l_vals = np.asarray(cl.to_pylist(), dtype=object)
                r_vals = np.asarray(cr.to_pylist(), dtype=object)
            else:
                l_vals = cl.to_numpy(zero_copy_only=False)
                r_vals = cr.to_numpy(zero_copy_only=False)
            feats[:, len(FEATURE_NAMES) + j] = np.asarray(
                f.compare(l_vals, r_vals), dtype=np.float64
            )
    return feats


class PairScorer:
    """Actor-pool callable: pairs-with-payload -> (left, right, f_*, score).

    weights_ref: ray.ObjectRef of (intercept, np.ndarray) — or the tuple
    itself (tests). Resolved ONCE in __init__ (warm per actor).
    """

    def __init__(self, cfg: PipelineConfig, weights_ref=None, registry=None):
        self.cfg = cfg
        self.registry = registry
        self.feature_names = (
            registry.feature_names() if registry else FEATURE_NAMES
        )
        if weights_ref is None:
            self.intercept = cfg.intercept
            w = np.asarray(cfg.weights, dtype=np.float64)
            if registry and len(w) == len(FEATURE_NAMES):
                # cfg defaults cover the built-ins; registered fields
                # start at 0 until trained
                w = np.concatenate([w, np.zeros(len(registry.fields))])
            self.weights = w
        else:
            obj = (
                ray.get(weights_ref)
                if isinstance(weights_ref, ray.ObjectRef)
                else weights_ref
            )
            self.intercept, self.weights = float(obj[0]), np.asarray(
                obj[1], dtype=np.float64
            )
        assert len(self.weights) == len(self.feature_names)
        # persistent name-kernel memoization (bounded: cleared past 1M
        # keys); misses are computed by the VECTORIZED codepoint-matrix
        # kernels (functions/strsim.py), so an all-unique-names corpus
        # (hit-rate -> 0) stays numpy-bound, never per-pair Python
        self._caches: dict[str, dict] = {"jw": {}, "lev": {}, "tok": {}}

    def __call__(self, batch: pa.Table) -> pa.Table:
        for c in self._caches.values():
            if len(c) > 1_000_000:
                c.clear()
        feats = compute_pair_features(
            batch, self.cfg.embed_dim, self._caches, self.registry
        )
        score = expit(feats @ self.weights + self.intercept)
        cols = {
            "left": batch.column("left"),
            "right": batch.column("right"),
        }
        if self.cfg.emit_features:
            for i, fname in enumerate(self.feature_names):
                cols[fname] = pa.array(feats[:, i].astype(np.float32), pa.float32())
        cols["score"] = pa.array(score.astype(np.float32), pa.float32())
        return pa.table(cols)


def score_pairs(
    pairs_with_payload: ray.data.Dataset,
    cfg: PipelineConfig,
    weights: tuple[float, np.ndarray] | None = None,
    registry=None,
) -> ray.data.Dataset:
    """The pairs-scored/sec hot loop (BASELINE.md headline metric)."""
    weights_ref = ray.put(weights) if weights is not None else None
    return pairs_with_payload.map_batches(
        PairScorer,
        fn_constructor_args=(cfg, weights_ref, registry),
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
        # autoscaling (min 1) so the pool never starves co-scheduled
        # shuffle aggregators of CPU slots; ceiling tracks cluster CPUs
        concurrency=(1, max(cfg.scorer_concurrency, cluster_parallelism())),
    )


def build_payload_arrays(
    features: ray.data.Dataset, uid_remap: dict | None = None
) -> tuple:
    """Collect the (bounded, counted-small) feature payload into numpy
    arrays for the fused broadcast scorer: (uids_sorted, perm, urls,
    names, years, minhash (n,p) uint8, embedding (n,d) float32).

    Packing runs distributed (map_batches); the driver only concatenates
    Arrow tables and wraps buffers — no per-row Python work here."""
    from record_matching_ray.stages import blocking as _b

    packed = features.select_columns(["url"] + _b.PAIR_PAYLOAD).map_batches(
        _b._pack_payload_batch,
        fn_kwargs={"uid_remap": uid_remap},
        batch_format="pyarrow",
    )
    tables = [
        t
        for t in packed.iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    if not tables:
        z = np.empty(0, dtype=np.int64)
        return (z, z, np.empty(0, object), np.empty(0, object),
                np.empty(0, np.float64), np.empty((0, 0), np.uint8),
                np.empty((0, 0), np.float32))
    side = pa.concat_tables(tables).combine_chunks()
    uids = side.column("uid").to_numpy(zero_copy_only=False)
    perm = np.argsort(uids, kind="stable")
    uids_sorted = uids[perm]
    urls = np.asarray(side.column("url").to_pylist(), dtype=object)
    names = np.asarray(side.column("name").to_pylist(), dtype=object)
    years = side.column("year").to_numpy(zero_copy_only=False)
    mh = _unpack_blobs(side.column("minhash"), np.uint8)
    emb = _unpack_blobs(side.column("embedding"), np.int8)  # SQ8 (blocking pack)
    return uids_sorted, perm, urls, names, years, mh, emb


class FusedPairScorer:
    """Actor-pool callable fusing payload-attach + feature computation +
    edge thresholding: input batches are BARE uid pairs (16B/row); the
    payload lives in actor state (broadcast ray.get once per actor), so
    the wide intermediate pair table — 2x(name+minhash+embedding+year)
    per pair — never exists in the object store at all. Output: edges
    (left, right, score) in uid space, score >= tau only."""

    def __init__(
        self, cfg: PipelineConfig, payload_ref, weights_ref=None,
        backend: str = "numpy",
    ):
        self.cfg = cfg
        (self.uids_sorted, self.perm, self.urls, self.names, self.years,
         self.mh, self.emb) = (
            ray.get(payload_ref)
            if isinstance(payload_ref, ray.ObjectRef)
            else payload_ref
        )
        # embeddings stay int8 (SQ8) in actor state so the per-pair DRAM
        # gather is 64B/row, not 256B — the 32-CPU run is bandwidth-bound
        # on exactly this access. Cosine = float32 dot of the gathered
        # (cache-resident) batch / precomputed norms.
        self.emb_q = np.ascontiguousarray(self.emb, dtype=np.int8)
        norms = np.sqrt(
            np.einsum("ij,ij->i", self.emb_q.astype(np.int32),
                      self.emb_q.astype(np.int32)).astype(np.float64)
        )
        norms[norms == 0] = 1.0
        self.emb_norm = norms
        # cosine kernel backend (functions/accel.py): "numpy" default is
        # bit-reproducible; "torch"/"auto" offload the gather+dot to a
        # device when torch is present (the reference's CUDA loop,
        # main.py:494-501)
        from record_matching_ray.functions.accel import cosine_backend

        self._cosine = cosine_backend(self.emb_q, norms, backend)
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
        self._caches: dict[str, dict] = {"jw": {}, "lev": {}, "tok": {}}

    def _gather(self, uid_col) -> np.ndarray:
        u = uid_col.to_numpy(zero_copy_only=False)
        return self.perm[np.searchsorted(self.uids_sorted, u)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        for c in self._caches.values():
            if len(c) > 1_000_000:
                c.clear()
        li = self._gather(batch.column("left"))
        ri = self._gather(batch.column("right"))
        n = len(li)
        w = self.weights
        feats = np.empty((n, len(FEATURE_NAMES)), dtype=np.float64)
        feats[:, FEATURE_NAMES.index("f_cosine")] = self._cosine(li, ri)
        feats[:, FEATURE_NAMES.index("f_jaccard")] = (
            self.mh[li] == self.mh[ri]
        ).mean(axis=1)
        name_l = self.names[li]
        name_r = self.names[ri]
        feats[:, FEATURE_NAMES.index("f_jaro_winkler")] = strsim.cached_pairwise_vec(
            strsim.jaro_winkler_vec, name_l, name_r, self._caches["jw"]
        )
        tok = self._caches["tok"]
        feats[:, FEATURE_NAMES.index("f_token_levenshtein")] = strsim.cached_pairwise_vec(
            lambda l, r: strsim.token_set_levenshtein_vec(l, r, token_memo=tok),
            name_l, name_r, self._caches["lev"],
        )
        feats[:, FEATURE_NAMES.index("f_temporal")] = strsim.year_compat_batch(
            self.years[li], self.years[ri]
        )
        feats[:, FEATURE_NAMES.index("f_name_content")] = (
            feats[:, FEATURE_NAMES.index("f_jaro_winkler")]
            * feats[:, FEATURE_NAMES.index("f_jaccard")]
        )
        score = expit(feats @ w + self.intercept)
        keep = score >= self.cfg.edge_threshold
        return pa.table(
            {
                "left": batch.column("left").filter(pa.array(keep)),
                "right": batch.column("right").filter(pa.array(keep)),
                "score": pa.array(score[keep].astype(np.float32), pa.float32()),
            }
        )


def score_pairs_fused(
    pairs: ray.data.Dataset,
    features: ray.data.Dataset,
    cfg: PipelineConfig,
    weights: tuple[float, np.ndarray] | None = None,
    uid_remap: dict | None = None,
    backend: str = "numpy",
) -> ray.data.Dataset:
    """uid pairs + broadcast feature payload -> edges (left, right,
    score >= tau), one map_batches. Only valid when the feature payload
    fits a broadcast (caller gates on count — run_er checks the same
    bound attach_pair_payload uses)."""
    payload_ref = ray.put(build_payload_arrays(features, uid_remap))
    weights_ref = ray.put(weights) if weights is not None else None
    return pairs.select_columns(["left", "right"]).map_batches(
        FusedPairScorer,
        fn_constructor_args=(cfg, payload_ref, weights_ref, backend),
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
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


class ExplainScorer(PairScorer):
    """PairScorer variant that emits the match-weight decomposition per
    pair — splink-style "waterfall" explainability: for each feature,
    its value x_f AND its logit contribution w_f * x_f, plus the
    intercept, total logit and sigmoid score. Same actor-pool contract
    (weights resolved once per actor, memoized name kernels)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        for c in self._caches.values():
            if len(c) > 1_000_000:
                c.clear()
        feats = compute_pair_features(
            batch, self.cfg.embed_dim, self._caches, self.registry
        )
        contrib = feats * self.weights[None, :]
        logit = contrib.sum(axis=1) + self.intercept
        cols = {
            "left": batch.column("left"),
            "right": batch.column("right"),
        }
        for i, fname in enumerate(self.feature_names):
            cols[fname] = pa.array(feats[:, i], pa.float64())
            cols[f"w_{fname}"] = pa.array(contrib[:, i], pa.float64())
        cols["intercept"] = pa.array(
            np.full(len(logit), self.intercept), pa.float64()
        )
        cols["logit"] = pa.array(logit, pa.float64())
        cols["score"] = pa.array(expit(logit), pa.float64())
        return pa.table(cols)


def explain_pairs(
    pairs_with_payload: ray.data.Dataset,
    cfg: PipelineConfig,
    weights: tuple[float, np.ndarray] | None = None,
) -> ray.data.Dataset:
    """Match-weight waterfall for candidate pairs (see ExplainScorer).
    Input is attach_pair_payload's output; run on a SELECTED pair set
    (disputed matches, a cluster under review), not the full candidate
    stream — the output is ~4x wider than the score table."""
    weights_ref = ray.put(weights) if weights is not None else None
    return pairs_with_payload.map_batches(
        ExplainScorer,
        fn_constructor_args=(cfg, weights_ref),
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
        concurrency=(1, max(cfg.scorer_concurrency, cluster_parallelism())),
    )
