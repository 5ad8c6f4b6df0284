"""Training-set discovery, oracle protocol, threshold sweep, splits."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from record_matching_ray.config import PipelineConfig
from record_matching_ray.pipelines.er import build_features
from record_matching_ray.pipelines.training import (
    TruthOracle,
    best_f1_threshold,
    discover_training_set,
    find_distance_threshold,
    hard_negative_pairs,
    train_test_split,
)
from record_matching_ray.testgen import make_pages


def test_find_distance_threshold_bimodal():
    near = np.random.RandomState(0).uniform(0.0, 0.1, 300)
    far = np.random.RandomState(1).uniform(0.6, 1.0, 300)
    tau = find_distance_threshold(np.concatenate([near, far]))
    assert 0.1 <= tau <= 0.62


def test_truth_oracle_protocol():
    truth = {"u1": "e1", "u2": "e1", "u3": "e2"}
    oracle = TruthOracle(truth)
    batch = pa.table({"left": ["u1", "u1", "u9"], "right": ["u2", "u3", "u1"]})
    out = oracle(batch)
    assert out.column("match").to_pylist() == [True, False, False]


def test_discover_training_set_balanced_and_correct():
    pages, labeled, truth = make_pages(300, 60, 7)
    truth_map = dict(
        zip(truth.column("url").to_pylist(), truth.column("entity_id").to_pylist())
    )
    cfg = PipelineConfig()
    feats = build_features(rd.from_arrow(pages), cfg, concurrency=2).materialize()
    out = discover_training_set(feats, truth_map, cfg, n_target=60).take_all()
    assert len(out) == 60
    n_pos = sum(r["match"] for r in out)
    # balanced-ish: oracle labels near picks mostly positive, far negative
    assert 10 <= n_pos <= 50
    # labels agree with ground truth
    for r in out:
        assert r["match"] == (truth_map[r["left"]] == truth_map[r["right"]])


def test_hard_negative_pairs_filter():
    pages, _, _ = make_pages(200, 40, 3)
    cfg = PipelineConfig()
    feats = build_features(rd.from_arrow(pages), cfg, concurrency=2).materialize()
    hard = hard_negative_pairs(feats, cfg, n_pairs=100, min_max_feature=0.3)
    rows = hard.take_all()
    assert 0 < len(rows) <= 100


def test_best_f1_threshold():
    scores = np.array([0.1, 0.2, 0.6, 0.7, 0.9])
    labels = np.array([False, False, True, True, True])
    t, f1 = best_f1_threshold(scores, labels)
    assert f1 == 1.0
    assert 0.2 < t <= 0.6


def test_train_test_split_proportions():
    ds = rd.range(300)
    tr, te = train_test_split(ds, test_frac=1 / 3, seed=23)
    assert tr.count() == 200 and te.count() == 100
    # seeded: same split both times
    tr2, te2 = train_test_split(rd.range(300), test_frac=1 / 3, seed=23)
    assert sorted(r["id"] for r in te.take_all()) == sorted(
        r["id"] for r in te2.take_all()
    )


def test_stratified_kfold_and_cv():
    from record_matching_ray.pipelines.training import (
        cross_validated_f1,
        stratified_kfold_indices,
    )

    rng = np.random.RandomState(0)
    y = np.concatenate([np.ones(40, bool), np.zeros(160, bool)])
    folds = stratified_kfold_indices(y, n_splits=5, seed=1)
    assert len(folds) == 5
    seen = np.concatenate([t for _, t in folds])
    assert sorted(seen) == list(range(200))  # exact partition
    for train, test in folds:
        assert 6 <= y[test].sum() <= 10  # stratified: ~8 positives per fold
        assert set(train) & set(test) == set()
    # separable data -> CV F1 ~ 1.0
    X = np.where(y[:, None], 1.0, 0.0) + rng.normal(0, 0.05, (200, 3))
    assert cross_validated_f1(X, y) > 0.95


def test_feature_importance_normalized():
    from record_matching_ray.config import PipelineConfig
    from record_matching_ray.pipelines.training import feature_importance

    cfg = PipelineConfig()
    imp = feature_importance(np.array(cfg.weights), cfg.feature_names())
    assert abs(sum(imp.values()) - 1.0) < 1e-12
    assert imp["f_cosine"] == imp["f_name_content"]  # both weight 4.0
