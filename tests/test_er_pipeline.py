"""End-to-end gates (SURVEY.md §7.2 step 5 + north rule):
pairwise F1 >= 0.99 on the labeled corpus at the reference blocking key,
ARI vs truth clusters, resume-identity from checkpoints."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from record_matching_ray.config import PipelineConfig
from record_matching_ray.pipelines.er import (
    build_features,
    run_er,
    train_weights_from_labeled,
)
from record_matching_ray.stages.evaluate import (
    adjusted_rand_vs_truth,
    pairwise_metrics_on_labeled,
)
from record_matching_ray.testgen import make_pages


@pytest.fixture(scope="module")
def corpus():
    pages, labeled, truth = make_pages(800, 160, 42)
    return (
        rd.from_arrow(pages).materialize(),
        rd.from_arrow(labeled).materialize(),
        rd.from_arrow(truth).materialize(),
    )


def test_f1_gate(corpus):
    pages_ds, lab_ds, truth_ds = corpus
    cfg = PipelineConfig()
    res = run_er(pages_ds, cfg, num_partitions=4, feature_concurrency=2)
    clusters = res["clusters"].materialize()
    m = pairwise_metrics_on_labeled(lab_ds, clusters, num_partitions=4)
    assert m.f1 >= 0.99, f"F1={m.f1} (tp={m.tp} fp={m.fp} fn={m.fn})"
    ari = adjusted_rand_vs_truth(clusters, truth_ds, num_partitions=4)
    assert ari >= 0.95, f"ARI={ari}"


def test_trained_weights_f1(corpus):
    pages_ds, lab_ds, truth_ds = corpus
    cfg = PipelineConfig()
    feats = build_features(pages_ds, cfg, concurrency=2).materialize()
    intercept, w, auc = train_weights_from_labeled(feats, lab_ds, cfg, num_partitions=4)
    assert auc > 0.99
    res = run_er(
        pages_ds, cfg, weights=(intercept, w), num_partitions=4, feature_concurrency=2
    )
    m = pairwise_metrics_on_labeled(lab_ds, res["clusters"].materialize(), num_partitions=4)
    assert m.f1 >= 0.99, f"trained F1={m.f1}"


def test_resume_identity(tmp_path, corpus):
    """A resumed run must produce identical clusters (SURVEY.md §7.5)."""
    pages_ds, _, _ = corpus
    cfg = PipelineConfig()
    out = str(tmp_path / "ckpt")
    r1 = run_er(pages_ds, cfg, out_dir=out, input_key="corpus1",
                num_partitions=4, feature_concurrency=2)
    c1 = sorted(
        (r["url"], r["cluster_id"]) for r in r1["clusters"].take_all()
    )
    # second run: all stages must be skipped (manifests present) and the
    # result identical
    r2 = run_er(pages_ds, cfg, out_dir=out, input_key="corpus1",
                num_partitions=4, feature_concurrency=2)
    c2 = sorted(
        (r["url"], r["cluster_id"]) for r in r2["clusters"].take_all()
    )
    assert c1 == c2
    # changed config fingerprint -> checkpoint not reused
    from record_matching_ray.state import manifest as mf

    assert mf.is_complete(out + "/clusters", cfg.fingerprint() + ":corpus1")
    assert not mf.is_complete(
        out + "/clusters", PipelineConfig(edge_threshold=0.9).fingerprint() + ":corpus1"
    )


def test_cluster_error_taxonomy(corpus):
    import ray.data as rd
    import pyarrow as pa

    from record_matching_ray.stages.evaluate import cluster_error_taxonomy

    # hand-built: entity 1 split into two clusters; cluster c3 merges 2+3
    clusters = rd.from_arrow(pa.table({
        "url": ["a", "b", "c", "d", "e"],
        "cluster_id": ["c1", "c1x", "c3", "c3", "c4"],
    }))
    truth = rd.from_arrow(pa.table({
        "url": ["a", "b", "c", "d", "e"],
        "entity_id": [1, 1, 2, 3, 4],
    }))
    tx = cluster_error_taxonomy(clusters, truth, num_partitions=2)
    assert tx == {
        "entities": 4, "clusters": 4, "split_entities": 1,
        "merged_clusters": 1, "entities_merged_away": 1, "pure_clusters": 3,
    }


def test_fused_and_join_scorers_agree(corpus):
    """The fused broadcast scorer and the payload-join + PairScorer path
    must produce the same edge set (same features, same math) — guards
    train/serve and small/large-scale drift."""
    import pyarrow as pa

    from record_matching_ray.stages import blocking, scoring

    pages_ds, _, _ = corpus
    cfg = PipelineConfig()
    feats = build_features(pages_ds, cfg, concurrency=2).materialize()
    hot = blocking.compute_hot_hosts(feats, cfg)
    pairs = blocking.generate_candidate_pairs(feats, cfg, hot).materialize()
    fused = {
        (r["left"], r["right"])
        for r in scoring.score_pairs_fused(pairs, feats, cfg).take_all()
    }
    wide = blocking.attach_pair_payload(pairs, feats, cfg, num_partitions=4,
                                        restore_urls=False)
    scored = scoring.score_pairs(wide, cfg)
    joined = {
        (r["left"], r["right"])
        for r in scoring.edges_from_scores(scored, cfg).take_all()
    }
    assert fused == joined


def test_error_pairs_on_labeled_exports_fp_and_fn():
    """FP/FN pair export (evaluate.error_pairs_on_labeled): both error
    directions materialize with the right tags; agreeing pairs don't."""
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.stages.evaluate import error_pairs_on_labeled

    clusters = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(["a", "b", "c", "d"], pa.string()),
                "cluster_id": pa.array(["k1", "k1", "k2", "k3"], pa.string()),
            }
        )
    )
    labeled = rd.from_arrow(
        pa.table(
            {
                "left": pa.array(["a", "a", "c"], pa.string()),
                "right": pa.array(["b", "c", "d"], pa.string()),
                # (a,b): match & same cluster -> TP (no row)
                # (a,c): match but different clusters -> FN
                # (c,d): non-match, different clusters -> TN (no row)
                "match": pa.array([True, True, False], pa.bool_()),
            }
        )
    )
    out = error_pairs_on_labeled(labeled, clusters).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["left"], r["right"], r["error"]) == ("a", "c", "fn")
    assert bool(r["match"]) is True and bool(r["predicted"]) is False

    # flip: a false positive
    labeled_fp = rd.from_arrow(
        pa.table(
            {
                "left": pa.array(["a"], pa.string()),
                "right": pa.array(["b"], pa.string()),
                "match": pa.array([False], pa.bool_()),
            }
        )
    )
    out2 = error_pairs_on_labeled(labeled_fp, clusters).to_pandas()
    assert len(out2) == 1 and out2.iloc[0]["error"] == "fp"


def test_restore_cluster_urls_missing_uid_fails_loudly(ray_session):
    """ADVICE r3 item 2: a uid absent from the features map must raise
    (KeyError), not resolve silently to a neighboring entry's url via
    the unclamped searchsorted position."""
    from record_matching_ray.pipelines.er import _restore_cluster_urls
    from record_matching_ray.stages import blocking as _b

    urls = [f"https://ex.com/p{i}" for i in range(4)]
    feats = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    uids = _b.page_uids(urls)
    good = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(uids, pa.int64()),
                "cluster_id": pa.array([uids[0]] * 4, pa.int64()),
            }
        )
    )
    out = _restore_cluster_urls(good, feats, num_partitions=2).to_pandas()
    assert sorted(out["url"]) == sorted(urls)
    assert (out["cluster_id"] == urls[0]).all() or set(out["cluster_id"]) == {
        urls[int(np.argmin(uids))]
    }

    bogus = rd.from_arrow(
        pa.table(
            {
                "url": pa.array([int(uids[0]), 12345], pa.int64()),
                "cluster_id": pa.array([int(uids[0])] * 2, pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="features map"):
        _restore_cluster_urls(bogus, feats, num_partitions=2).materialize()


def _ari_fixture():
    import pyarrow as pa

    import ray.data as rd

    n = 600
    urls = [f"https://e{i//3}.com/p{i}" for i in range(n)]
    pred = [f"c{i // 3}" for i in range(n)]
    # truth disagrees on a tenth of the urls
    true = [f"e{i // 3 if i % 10 else i // 7}" for i in range(n)]
    clusters = rd.from_arrow(pa.table({"url": urls, "cluster_id": pred}))
    truth = rd.from_arrow(pa.table({"url": urls, "entity_id": true}))
    return clusters, truth


def test_sampled_ari_with_full_sample_equals_exact(ray_session):
    """VERDICT r4 wrong#2: sample_n >= corpus must degenerate to the
    exact ARI (the old limit() path silently truncated)."""
    from record_matching_ray.stages.evaluate import adjusted_rand_vs_truth

    clusters, truth = _ari_fixture()
    exact = adjusted_rand_vs_truth(clusters, truth, num_partitions=4)
    sampled = adjusted_rand_vs_truth(
        clusters, truth, num_partitions=4, sample_n=10_000
    )
    assert sampled == exact


def test_sampled_ari_is_block_order_invariant(ray_session):
    """The hash-threshold sample keeps the SAME rows whatever the block
    arrangement (the old first-blocks limit() was arrival-order-biased)."""
    from record_matching_ray.stages.evaluate import adjusted_rand_vs_truth

    clusters, truth = _ari_fixture()
    a = adjusted_rand_vs_truth(clusters, truth, num_partitions=4, sample_n=300)
    b = adjusted_rand_vs_truth(
        clusters.random_shuffle(seed=3).repartition(7),
        truth.random_shuffle(seed=9).repartition(2),
        num_partitions=4,
        sample_n=300,
    )
    assert a == b
    # and it is a real subset: a plausible ARI, not degenerate
    assert -1.0 <= a <= 1.0


def test_exact_ari_gate_fails_loudly(ray_session):
    """Default path must refuse to collect past max_exact_rows."""
    import pytest as _pytest

    from record_matching_ray.stages.evaluate import adjusted_rand_vs_truth

    clusters, truth = _ari_fixture()
    with _pytest.raises(RuntimeError, match="driver gate"):
        adjusted_rand_vs_truth(
            clusters, truth, num_partitions=4, max_exact_rows=100
        )
