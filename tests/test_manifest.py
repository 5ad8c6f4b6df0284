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
