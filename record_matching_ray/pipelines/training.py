"""Training-set discovery, oracle labeling, threshold selection.

Reference chain re-expressed Ray-Data-first:
- ``discover_training_set`` (record_matching/main.py:194-260): sample
  pair distances -> derivative-peak threshold -> balanced near/far
  sampling -> LLM oracle labels each pair yes/no, verdict parsed by regex
  (main.py:279-340). Here the oracle is a deterministic actor-pool stage
  (``map_batches(OracleCls)``) answering from a broadcast truth map in the
  same yes/no-string protocol — swap in a real model client per actor for
  production.
- hard-negative sampling: random pairs kept when max feature > 0.3
  (claude_poc/entity-resolution_v4.py:684-710).
- best-F1 threshold sweep in [0.1, 1.0) step 0.05
  (claude_poc_v2/...v2.py:2557-2572).
- shuffled train/test split, seeded (main.py:466-473).

Driver-side work stays small by design: thresholds and splits operate on
bounded samples; everything per-pair runs distributed.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray
import ray.data

from record_matching_ray.config import PipelineConfig
from record_matching_ray.stages import blocking, scoring


def find_distance_threshold(distances: np.ndarray, smooth: int = 25) -> float:
    """Candidate-distance threshold from the sorted distance curve's
    steepest rise (the reference runs scipy ``find_peaks`` on the first
    derivative of the first 1000 sorted ANN distances, main.py:210-224;
    same idea with a moving-average derivative, no scipy dependency)."""
    d = np.sort(np.asarray(distances, dtype=np.float64))
    if len(d) < 3:
        return float(d[-1]) if len(d) else 0.5
    deriv = np.diff(d)
    if smooth > 1 and len(deriv) > smooth:
        kernel = np.ones(smooth) / smooth
        deriv = np.convolve(deriv, kernel, mode="same")
    # ignore the extreme tails where the derivative is noisy
    lo, hi = len(deriv) // 20, max(len(deriv) - len(deriv) // 20, 1)
    peak = lo + int(np.argmax(deriv[lo:hi]))
    return float((d[peak] + d[peak + 1]) / 2.0)


def sample_pair_distances(
    features: ray.data.Dataset,
    cfg: PipelineConfig,
    n_sample: int = 1000,
    num_partitions: int | None = None,
) -> pa.Table:
    """(left, right, distance) for a bounded sample of blocking candidate
    pairs; distance = (1 - cosine)/2 clamped [0,1] (main.py:424-426).
    The sample bound applies BEFORE payload attach, so driver and network
    cost stay O(n_sample)."""
    pairs = blocking.generate_candidate_pairs(features, cfg).limit(n_sample)
    wide = blocking.attach_pair_payload(pairs, features, cfg, num_partitions)

    def dist(t: pa.Table) -> pa.Table:
        X = scoring.compute_pair_features(t, cfg.embed_dim)
        cos = X[:, list(cfg.feature_names()).index("f_cosine")]
        d = np.clip((1.0 - cos) / 2.0, 0.0, 1.0)
        return pa.table(
            {
                "left": t.column("left"),
                "right": t.column("right"),
                "distance": pa.array(d, pa.float64()),
            }
        )

    rows = wide.map_batches(dist, batch_format="pyarrow").take_all()
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("left", pa.string()), ("right", pa.string()), ("distance", pa.float64())]
        ),
    )


_VERDICT_RE = re.compile(r"\b(yes|no)\b", re.IGNORECASE)  # main.py:279-283


class TruthOracle:
    """Actor-pool oracle: answers 'yes'/'no' per pair from a broadcast
    truth map (url -> entity label), then the verdict string is regex-
    parsed back to a bool — deliberately keeping the reference's
    LLM-protocol shape (main.py:279-340) so a model-backed oracle is a
    drop-in replacement for ``_answer``."""

    def __init__(self, truth_ref):
        self.truth = (
            ray.get(truth_ref) if isinstance(truth_ref, ray.ObjectRef) else truth_ref
        )

    def _answer(self, left: str, right: str) -> str:
        same = self.truth.get(left) is not None and self.truth.get(
            left
        ) == self.truth.get(right)
        return "Yes, these records match." if same else "No, they differ."

    def __call__(self, batch: pa.Table) -> pa.Table:
        lefts = batch.column("left").to_pylist()
        rights = batch.column("right").to_pylist()
        verdicts = []
        for l, r in zip(lefts, rights):
            m = _VERDICT_RE.search(self._answer(l, r))
            verdicts.append(bool(m) and m.group(1).lower() == "yes")
        return pa.table(
            {
                "left": batch.column("left"),
                "right": batch.column("right"),
                "match": pa.array(verdicts, pa.bool_()),
            }
        )


def discover_training_set(
    features: ray.data.Dataset,
    truth: dict[str, object],
    cfg: PipelineConfig,
    n_target: int = 200,
    n_sample: int = 2000,
    oracle_concurrency: int = 2,
) -> ray.data.Dataset:
    """Balanced labeled pairs: distance-threshold split + running
    same/different tally picks near/far candidates alternately
    (main.py:229-256), then the oracle actor pool labels them.
    Returns a Dataset (left, right, match)."""
    sample = sample_pair_distances(features, cfg, n_sample)
    dists = sample.column("distance").to_numpy(zero_copy_only=False)
    tau = find_distance_threshold(dists)
    order = np.argsort(dists, kind="stable")
    near = [i for i in order if dists[i] <= tau]
    far = [i for i in order[::-1] if dists[i] > tau]
    picked: list[int] = []
    same = diff = 0
    ni = fi = 0
    while len(picked) < min(n_target, len(near) + len(far)):
        take_near = (same <= diff and ni < len(near)) or fi >= len(far)
        if take_near:
            picked.append(near[ni])
            ni += 1
            same += 1
        else:
            picked.append(far[fi])
            fi += 1
            diff += 1
    chosen = sample.take(pa.array(picked, pa.int64()))
    truth_ref = ray.put(dict(truth))
    return ray.data.from_arrow(chosen.select(["left", "right"])).map_batches(
        TruthOracle,
        fn_constructor_args=(truth_ref,),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, oracle_concurrency),
    )


def hard_negative_pairs(
    features: ray.data.Dataset,
    cfg: PipelineConfig,
    n_pairs: int = 500,
    min_max_feature: float = 0.3,
    seed: int = 23,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Random cross-page pairs kept only when their strongest feature
    exceeds ``min_max_feature`` — 'hard' negatives that teach the
    classifier boundaries (poc1:684-710). Pair sampling is driver-cheap
    (a BOUNDED random url sample, never the full url column — at 100x the
    old take_all() shipped every url to the driver); feature computation
    runs distributed."""
    target = max(8 * n_pairs, 64)
    n_feat = features.count()
    url_ds = features.select_columns(["url"])
    if n_feat > target:
        url_ds = url_ds.random_sample(target / n_feat, seed=seed).limit(target)
    urls = [r["url"] for r in url_ds.take_all()]
    rng = np.random.RandomState(seed)
    n = len(urls)
    li = rng.randint(0, n, size=n_pairs * 2)
    ri = rng.randint(0, n, size=n_pairs * 2)
    keep = li != ri
    li, ri = li[keep][:n_pairs], ri[keep][:n_pairs]
    pairs_t = pa.table(
        {
            "left": pa.array([min(urls[a], urls[b]) for a, b in zip(li, ri)]),
            "right": pa.array([max(urls[a], urls[b]) for a, b in zip(li, ri)]),
        }
    )
    wide = blocking.attach_pair_payload(
        ray.data.from_arrow(pairs_t), features, cfg, num_partitions
    )

    def hard(t: pa.Table) -> pa.Table:
        X = scoring.compute_pair_features(t, cfg.embed_dim)
        mask = X.max(axis=1) > min_max_feature
        return pa.table(
            {
                "left": t.column("left").filter(pa.array(mask)),
                "right": t.column("right").filter(pa.array(mask)),
            }
        )

    return wide.map_batches(hard, batch_format="pyarrow")


def best_f1_threshold(
    scores: np.ndarray, labels: np.ndarray, lo: float = 0.1, hi: float = 1.0,
    step: float = 0.05,
) -> tuple[float, float]:
    """(threshold, f1) maximizing F1 over the sweep grid
    (poc2:2557-2572). Ties go to the lowest threshold."""
    s = np.asarray(scores, dtype=np.float64)
    y = np.asarray(labels, dtype=bool)
    best_t, best_f1 = lo, -1.0
    for t in np.arange(lo, hi, step):
        pred = s >= t
        tp = int((pred & y).sum())
        fp = int((pred & ~y).sum())
        fn = int((~pred & y).sum())
        f1 = 2 * tp / max(2 * tp + fp + fn, 1)
        if f1 > best_f1 + 1e-12:
            best_t, best_f1 = float(t), f1
    return best_t, best_f1


def train_test_split(
    ds: ray.data.Dataset, test_frac: float = 1 / 3, seed: int = 23
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Seeded shuffle + proportional split (main.py:466-473's
    shuffle(random_state=23) 2/3 split)."""
    shuffled = ds.random_shuffle(seed=seed)
    train, test = shuffled.split_proportionately([1.0 - test_frac])
    return train, test


def stratified_kfold_indices(
    labels: np.ndarray, n_splits: int = 5, seed: int = 42
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Deterministic stratified k-fold (train_idx, test_idx) pairs —
    driver-side CV over the (small) labeled matrix, the poc2:2479-2496
    StratifiedKFold role without sklearn. Each class's indices are
    shuffled with the seed and dealt round-robin to folds, so fold class
    ratios track the global ratio."""
    y = np.asarray(labels).astype(bool)
    rng = np.random.RandomState(seed)
    folds: list[list[int]] = [[] for _ in range(n_splits)]
    for cls in (False, True):
        idx = np.nonzero(y == cls)[0]
        rng.shuffle(idx)
        for i, j in enumerate(idx):
            folds[i % n_splits].append(int(j))
    out = []
    all_idx = np.arange(len(y))
    for k in range(n_splits):
        test = np.array(sorted(folds[k]), dtype=np.int64)
        mask = np.ones(len(y), dtype=bool)
        mask[test] = False
        out.append((all_idx[mask], test))
    return out


def cross_validated_f1(
    X: np.ndarray, y: np.ndarray, n_splits: int = 5, seed: int = 42,
    threshold: float = 0.5,
) -> float:
    """Mean F1 over stratified folds with a fresh logistic fit per fold
    (poc2:2479-2496's CV estimate, logistic instead of RandomForest)."""
    from record_matching_ray.functions.logistic import fit_logistic, predict_proba

    scores = []
    for train_idx, test_idx in stratified_kfold_indices(y, n_splits, seed):
        b, w = fit_logistic(X[train_idx], y[train_idx].astype(np.float64))
        pred = predict_proba(X[test_idx], b, w) >= threshold
        yy = y[test_idx].astype(bool)
        tp = int((pred & yy).sum()); fp = int((pred & ~yy).sum())
        fn = int((~pred & yy).sum())
        scores.append(2 * tp / max(2 * tp + fp + fn, 1))
    return float(np.mean(scores))


def feature_importance(
    weights: np.ndarray, feature_names: tuple[str, ...]
) -> dict[str, float]:
    """Normalized |weight| shares — the role of poc1's printed feature
    importances (poc1:955-984) and poc2's RF feature_importances ->
    metric weights (poc2:2511-2532)."""
    w = np.abs(np.asarray(weights, dtype=np.float64))
    total = w.sum() or 1.0
    return {n: float(v / total) for n, v in zip(feature_names, w)}
