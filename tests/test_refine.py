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
