"""Checkpoint manifests: atomic write, reuse, fingerprint invalidation."""

import os

import pyarrow as pa
import ray.data as rd

from record_matching_ray.state import manifest as mf


def test_write_read_roundtrip(tmp_path):
    ds = rd.from_arrow(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}))
    sdir = str(tmp_path / "stage1")
    m = mf.write_stage(ds, sdir, "fp1", counters={"rows_in": 3})
    assert m["rows"] == 3
    assert m["counters"]["rows_in"] == 3
    assert mf.is_complete(sdir, "fp1")
    assert not mf.is_complete(sdir, "fp2")
    back = mf.read_stage(sdir)
    assert sorted(r["a"] for r in back.take_all()) == [1, 2, 3]
    assert mf.read_manifest(sdir)["fingerprint"] == "fp1"


def test_overwrite_replaces_atomically(tmp_path):
    sdir = str(tmp_path / "stage2")
    mf.write_stage(rd.from_arrow(pa.table({"a": [1]})), sdir, "fp1")
    mf.write_stage(rd.from_arrow(pa.table({"a": [7, 8]})), sdir, "fp2")
    assert mf.is_complete(sdir, "fp2")
    assert mf.read_manifest(sdir)["rows"] == 2
    # no stray temp dirs
    assert not [d for d in os.listdir(tmp_path) if ".tmp-" in d]


def test_incomplete_dir_not_reused(tmp_path):
    sdir = tmp_path / "stage3"
    sdir.mkdir()
    assert not mf.is_complete(str(sdir), "fp")


def test_mid_chain_crash_resume(tmp_path):
    """Simulated crash after the pairs stage: later stage dirs removed,
    rerun completes from the surviving checkpoints and reproduces the
    identical clustering (SURVEY.md §7.5 resume correctness)."""
    import shutil

    import ray.data as rd

    from record_matching_ray.config import PipelineConfig
    from record_matching_ray.pipelines.er import run_er
    from record_matching_ray.testgen import make_pages

    pages, _, _ = make_pages(200, 40, 17)
    cfg = PipelineConfig()
    out = str(tmp_path / "ck")
    r1 = run_er(rd.from_arrow(pages), cfg, out_dir=out, input_key="crash",
                num_partitions=4, feature_concurrency=2)
    want = sorted((r["url"], r["cluster_id"]) for r in r1["clusters"].take_all())
    # crash simulation: everything after pairs is lost (partial tmp dirs
    # from write_stage never survive — it writes tmp + atomic rename)
    for stage in ("edges", "clusters", "canonical"):
        shutil.rmtree(f"{out}/{stage}")
    r2 = run_er(rd.from_arrow(pages), cfg, out_dir=out, input_key="crash",
                num_partitions=4, feature_concurrency=2)
    got = sorted((r["url"], r["cluster_id"]) for r in r2["clusters"].take_all())
    assert got == want


def test_partitioned_write_and_pruned_read(tmp_path):
    t = pa.table(
        {
            "uid": pa.array(list(range(12)), pa.int64()),
            "pk": pa.array([i % 3 for i in range(12)], pa.int64()),
            "val": pa.array([f"v{i}" for i in range(12)], pa.string()),
        }
    )
    sdir = str(tmp_path / "stage")
    m = mf.write_stage(rd.from_arrow(t).repartition(4), sdir, "fp1", partition_cols=["pk"])
    assert m["rows"] == 12 and m["partition_cols"] == ["pk"]
    assert all("pk=" in f for f in m["files"])
    assert mf.is_complete(sdir, "fp1")
    # full read keeps all rows and restores the partition column
    full = mf.read_stage(sdir).to_pandas()
    assert len(full) == 12
    assert "pk" in full.columns and sorted(full["pk"].astype(int).unique()) == [0, 1, 2]
    # pruned read lists only the matching partition's files
    pruned = mf.read_stage(sdir, partition_filter=lambda p: p["pk"] == "1")
    pdf = pruned.to_pandas()
    assert len(pdf) == 4 and set(pdf["uid"]) == {1, 4, 7, 10}


def test_manifest_per_file_lineage(tmp_path):
    """file_rows records one row count per written parquet file and sums
    to the stage total — the per-partition lineage a resume/audit reads
    without scanning data."""
    import ray.data as rd

    from record_matching_ray.state import manifest as mf

    ds = rd.range(1000).repartition(4)
    d = str(tmp_path / "stage")
    m = mf.write_stage(ds, d, "fp:lineage")
    assert m["rows"] == 1000
    assert set(m["file_rows"]) == set(m["files"])
    assert sum(m["file_rows"].values()) == 1000
    # survives the round-trip
    m2 = mf.read_manifest(d)
    assert m2["file_rows"] == m["file_rows"]
