"""Sorted-neighborhood blocking + Fellegi-Sunter EM."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.fellegi import (
    fellegi_sunter_em,
    sorted_neighborhood_pairs,
)


def test_sorted_neighborhood_vs_bruteforce():
    """Pairs = exactly the rank-window pairs, across bucket and rank-group
    boundaries; payload rides correctly on both sides."""
    rng = np.random.default_rng(3)
    keys = ["".join(rng.choice(list("abcd"), size=3)) for _ in range(120)]
    rows = [{"id": i, "key": k, "val": i * 10} for i, k in enumerate(keys)]
    ds = rd.from_items(rows).repartition(5)
    window = 4
    got = sorted_neighborhood_pairs(
        ds, "key", "id", ["id", "val"], window=window, bucket_prefix_len=1
    ).take_all()
    order = sorted(range(len(rows)), key=lambda i: (keys[i], i))
    want = set()
    for r in range(len(order)):
        for d in range(1, window):
            if r + d < len(order):
                want.add((order[r], order[r + d]))
    assert {(r["l_id"], r["r_id"]) for r in got} == want
    for r in got:
        assert r["l_val"] == r["l_id"] * 10 and r["r_val"] == r["r_id"] * 10
        assert 1 <= r["r_rank"] - r["l_rank"] <= window - 1


def test_fellegi_em_matches_numpy_reference_and_separates():
    """EM over planted two-class gammas: distributed result equals a
    local numpy EM bit-for-bit-ish (<=1e-9), and m/u separate the planted
    match/non-match agreement rates."""
    rng = np.random.default_rng(11)
    n, frac = 6000, 0.2
    F = 3  # >=3 binary fields: 2^3 cells > 2F+1 params -> identifiable
    is_match = rng.random(n) < frac
    m_true, u_true = [0.95, 0.85, 0.9], [0.05, 0.3, 0.15]
    g = np.stack(
        [
            np.where(is_match, rng.random(n) < m_true[f], rng.random(n) < u_true[f])
            for f in range(F)
        ],
        axis=1,
    ).astype(np.int8)

    ds = rd.from_arrow(
        pa.table({f"g{f}": g[:, f] for f in range(F)})
    ).repartition(6)
    # both plans: counted-small driver fixed-point AND the streaming
    # per-iteration partial path (driver_max_rows=0 forces it)
    outs = [
        {
            r["field"]: (r["m"], r["u"])
            for r in fellegi_sunter_em(
                ds, [f"g{f}" for f in range(F)], iters=20,
                driver_max_rows=bound,
            ).to_pylist()
        }
        for bound in (2_000_000, 0)
    ]
    out = outs[0]
    for f in range(F):
        for o in outs[1:]:
            assert abs(o[f"g{f}"][0] - out[f"g{f}"][0]) < 1e-9
            assert abs(o[f"g{f}"][1] - out[f"g{f}"][1]) < 1e-9

    # local reference EM (identical update equations)
    m = np.full(F, 0.9)
    u = np.full(F, 0.1)
    p = 0.1
    gf = g.astype(np.float64)
    for _ in range(20):
        a = np.full(n, p)
        b = np.full(n, 1 - p)
        for f in range(F):
            a = a * np.where(gf[:, f] == 1.0, m[f], 1 - m[f])
            b = b * np.where(gf[:, f] == 1.0, u[f], 1 - u[f])
        w = a / (a + b)
        m = (w[:, None] * gf).sum(0) / w.sum()
        u = ((1 - w)[:, None] * gf).sum(0) / (1 - w).sum()
        p = w.sum() / n

    for f in range(F):
        got_m, got_u = out[f"g{f}"]
        # engine rounds m/u to 6 decimals (oracle-parity convention)
        assert abs(got_m - m[f]) < 1e-6 and abs(got_u - u[f]) < 1e-6
        # recovered parameters separate the planted classes
        assert got_m > got_u
        assert abs(got_m - m_true[f]) < 0.1 and abs(got_u - u_true[f]) < 0.1
    lam = out["__lambda__"]
    assert abs(lam[0] - p) < 1e-6 and abs(lam[0] - frac) < 0.1


def test_blocking_metrics_vs_bruteforce():
    """Reduction ratio / pairs completeness / pairs quality against a
    brute-force count on the synthetic labeled corpus."""
    from record_matching_ray.config import PipelineConfig
    from record_matching_ray.pipelines.er import build_features
    from record_matching_ray.stages import blocking
    from record_matching_ray.stages.evaluate import blocking_metrics
    from record_matching_ray.testgen import make_pages

    pages, labeled, truth = make_pages(400, 80, 5)
    pages_ds = rd.from_arrow(pages).materialize()
    cfg = PipelineConfig()
    feats = build_features(pages_ds, cfg, concurrency=2).materialize()
    pairs = blocking.generate_candidate_pairs(
        feats, cfg, blocking.compute_hot_hosts(feats, cfg)
    ).materialize()
    m = blocking_metrics(pairs, rd.from_arrow(truth), n_records=400)

    # brute-force reference
    ent = {r["url"]: r["entity_id"] for r in truth.to_pylist()}
    uid_of = dict(
        zip(
            blocking.page_uids(list(ent)),
            (ent[u] for u in ent),
        )
    )
    cand = [(r["left"], r["right"]) for r in pairs.take_all()]
    cov = sum(1 for a, b in cand if uid_of.get(a) == uid_of.get(b))
    from collections import Counter

    sizes = Counter(ent.values())
    n_true = sum(s * (s - 1) // 2 for s in sizes.values())
    assert m.n_candidates == len(cand)
    assert m.n_covered == cov
    assert m.n_true_pairs == n_true
    # the flagship blocking covers essentially every true pair directly
    # (clusters only need CONNECTIVITY, so closure recovers the tail) and
    # prunes the quadratic space hard
    assert m.pairs_completeness > 0.999
    assert m.reduction_ratio > 0.85  # 400 rows, ~7.5% of pairs are true
    assert 0 < m.pairs_quality <= 1.0


def test_explain_pairs_waterfall_consistent():
    """Contributions sum to the logit; sigmoid(logit) equals the scorer's
    score; features match the plain scorer's feature emission."""
    from record_matching_ray.config import PipelineConfig
    from record_matching_ray.pipelines.er import build_features
    from record_matching_ray.stages import blocking
    from record_matching_ray.stages.scoring import explain_pairs
    from record_matching_ray.testgen import make_pages

    pages, _, _ = make_pages(200, 40, 3)
    pages_ds = rd.from_arrow(pages).materialize()
    cfg = PipelineConfig()
    feats = build_features(pages_ds, cfg, concurrency=2).materialize()
    pairs = blocking.generate_candidate_pairs(
        feats, cfg, blocking.compute_hot_hosts(feats, cfg)
    )
    wide = blocking.attach_pair_payload(pairs, feats, cfg, num_partitions=4,
                                        restore_urls=False)
    rows = explain_pairs(wide, cfg).take_all()
    assert rows
    from record_matching_ray.config import FEATURE_NAMES

    w = np.asarray(cfg.weights, dtype=np.float64)
    for r in rows[:200]:
        contribs = [r[f"w_{f}"] for f in FEATURE_NAMES]
        assert abs(sum(contribs) + r["intercept"] - r["logit"]) < 1e-9
        for i, f in enumerate(FEATURE_NAMES):
            assert abs(r[f] * w[i] - r[f"w_{f}"]) < 1e-12
        assert abs(1.0 / (1.0 + np.exp(-r["logit"])) - r["score"]) < 1e-9
        assert 0.0 <= r["score"] <= 1.0
