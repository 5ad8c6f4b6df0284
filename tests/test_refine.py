"""Cluster refinement: year-conflict splitting (poc2:1640-1853 analog)."""

import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.refine import refine_clusters


def _ds(table):
    return rd.from_arrow(table)


def test_refine_splits_year_conflicts():
    clusters = _ds(
        pa.table(
            {
                "url": [f"u{i}" for i in range(6)],
                "cluster_id": ["u0"] * 5 + ["u5"],
            }
        )
    )
    feats = _ds(
        pa.table(
            {
                "url": [f"u{i}" for i in range(6)],
                "year": [1900.0, 1901.0, 1900.0, 1950.0, None, 1960.0],
            }
        )
    )
    out = {r["url"]: r["cluster_id"] for r in refine_clusters(clusters, feats).take_all()}
    # dominant year 1900: u0,u1,u2 stay; unknown year u4 stays; u3 splits
    assert out["u0"] == out["u1"] == out["u2"] == out["u4"] == "u0"
    assert out["u3"] == "u0#y1950"  # its own sub-cluster, id from (base, year)
    assert out["u5"] == "u5"  # singleton untouched


def test_refine_splits_when_base_url_is_in_conflict_bucket():
    # Round-1 ADVICE regression: the cluster id equals the min url (u0) and
    # u0 itself carries the conflicting year. With member-url-derived sub
    # ids, min(bucket) == "u0" == base and the split silently no-oped.
    clusters = _ds(
        pa.table({"url": ["u0", "u1", "u2", "u3"], "cluster_id": ["u0"] * 4})
    )
    feats = _ds(
        pa.table(
            {
                "url": ["u0", "u1", "u2", "u3"],
                "year": [1950.0, 1900.0, 1900.0, 1900.0],
            }
        )
    )
    out = {r["url"]: r["cluster_id"] for r in refine_clusters(clusters, feats).take_all()}
    assert out["u1"] == out["u2"] == out["u3"] == "u0"
    assert out["u0"] == "u0#y1950"
    assert out["u0"] != out["u1"]


def test_refine_preserves_coherent_clusters():
    clusters = _ds(
        pa.table({"url": ["a", "b", "c"], "cluster_id": ["a", "a", "a"]})
    )
    feats = _ds(
        pa.table({"url": ["a", "b", "c"], "year": [1900.0, 1900.0, 1902.0]})
    )
    out = {r["url"]: r["cluster_id"] for r in refine_clusters(clusters, feats).take_all()}
    assert set(out.values()) == {"a"}


def _emb_table(urls, cids, names, vecs):
    import numpy as np

    blobs = None  # embeddings enter via the features side below
    clusters = _ds(pa.table({"url": urls, "cluster_id": cids}))
    feats = _ds(
        pa.table(
            {
                "url": urls,
                "name": names,
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(
                        np.asarray(vecs, dtype=np.float32).ravel(), pa.float32()
                    ),
                    len(vecs[0]),
                ),
            }
        )
    )
    return clusters, feats


def test_domain_refine_splits_incoherent_cluster():
    import numpy as np

    from record_matching_ray.stages.refine import refine_clusters_domain

    dim = 8
    a = np.zeros(dim); a[0] = 1.0
    b = np.zeros(dim); b[1] = 1.0  # orthogonal to a
    # one cluster, two incoherent halves (mean pairwise cos ~0.33 < 0.5
    # within-half cos = 1.0, cross-half = 0.0)
    urls = ["u0", "u1", "u2", "u3"]
    vecs = [a, a, b, b]
    clusters, feats = _emb_table(urls, ["u0"] * 4, ["n"] * 4, vecs)
    out = {
        r["url"]: r["cluster_id"]
        for r in refine_clusters_domain(
            clusters, feats, threshold=0.5, dim=dim
        ).take_all()
    }
    assert out["u0"] == out["u1"] == "u0"
    assert out["u2"] == out["u3"] == "u0#d1"
    assert out["u0"] != out["u2"]


def test_domain_refine_preserves_coherent_cluster():
    import numpy as np

    from record_matching_ray.stages.refine import refine_clusters_domain

    dim = 8
    rng = np.random.RandomState(7)
    base = rng.standard_normal(dim)
    vecs = [base + 0.01 * rng.standard_normal(dim) for _ in range(4)]
    clusters, feats = _emb_table(
        ["u0", "u1", "u2", "u3"], ["u0"] * 4, ["n"] * 4, vecs
    )
    out = {
        r["url"]: r["cluster_id"]
        for r in refine_clusters_domain(
            clusters, feats, threshold=0.25, dim=dim
        ).take_all()
    }
    assert set(out.values()) == {"u0"}


def test_domain_refine_name_fallback_on_full_fragmentation():
    import numpy as np

    from record_matching_ray.stages.refine import refine_clusters_domain

    # 3 mutually-orthogonal vectors -> every rebuild component is a
    # singleton -> poc2 fallback groups by normalized name instead
    dim = 4
    vecs = [np.eye(dim)[i] for i in range(3)]
    clusters, feats = _emb_table(
        ["u0", "u1", "u2"], ["u0"] * 3, ["alice", "alice", "bob"], vecs
    )
    out = {
        r["url"]: r["cluster_id"]
        for r in refine_clusters_domain(
            clusters, feats, threshold=0.5, dim=dim
        ).take_all()
    }
    assert out["u0"] == out["u1"]  # same name regrouped
    assert out["u2"] != out["u0"]


def test_run_er_with_domain_refine_keeps_quality(tmp_path):
    import ray.data as rd

    from record_matching_ray.config import PipelineConfig
    from record_matching_ray.pipelines.er import run_er
    from record_matching_ray.stages.evaluate import pairwise_metrics_on_labeled
    from record_matching_ray.testgen import make_pages

    pages, labeled, truth = make_pages(200, 40, 21)
    cfg = PipelineConfig(refine_domain_threshold=0.25)
    res = run_er(rd.from_arrow(pages), cfg, out_dir=str(tmp_path / "ck"),
                 input_key="r", num_partitions=4, feature_concurrency=2)
    assert res["refined"] is not None
    m = pairwise_metrics_on_labeled(rd.from_arrow(labeled), res["clusters"])
    assert m.f1 >= 0.99  # splitting a coherent corpus must not hurt


def test_run_er_with_refine_stage(tmp_path):
    from record_matching_ray.config import PipelineConfig
    from record_matching_ray.pipelines.er import run_er
    from record_matching_ray.testgen import make_pages

    pages, labeled, truth = make_pages(200, 40, 21)
    cfg = PipelineConfig(refine_year_tolerance=2.0)
    res = run_er(rd.from_arrow(pages), cfg, out_dir=str(tmp_path / "ck"),
                 input_key="r", num_partitions=4, feature_concurrency=2)
    assert res["refined"] is not None
    assert (tmp_path / "ck" / "refined" / "_MANIFEST.json").exists()
    # refinement never decreases precision: clusters remain valid urls
    rows = res["clusters"].take_all()
    assert len(rows) == 200
