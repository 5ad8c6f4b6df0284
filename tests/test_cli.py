"""CLI stage registry: stage-by-stage run == run-all, idempotent skips."""

import json
import os

from record_matching_ray.cli import main


def test_cli_stagewise_pipeline(tmp_path, capsys):
    corpus = str(tmp_path / "corpus")
    run = str(tmp_path / "run")
    main(["gen-corpus", "--out", corpus, "--pages", "300", "--entities", "60",
          "--seed", "5"])
    main(["extract", "--pages", f"{corpus}/pages", "--out", run])
    main(["block", "--out", run])
    main(["score", "--out", run])
    main(["cluster", "--out", run])
    main(["canonicalize", "--out", run])
    main(["evaluate", "--out", run, "--labeled", f"{corpus}/labeled_pairs.parquet",
          "--metrics-json", str(tmp_path / "m.json")])
    out = capsys.readouterr().out.strip().splitlines()
    metrics = json.loads(out[-1])
    assert metrics["f1"] >= 0.99
    assert json.load(open(tmp_path / "m.json"))["f1"] == metrics["f1"]
    # idempotent: rerunning a complete stage is a skip, not a rebuild
    mtime = os.path.getmtime(f"{run}/pairs/_MANIFEST.json")
    main(["block", "--out", run])
    assert "complete" in capsys.readouterr().out
    assert os.path.getmtime(f"{run}/pairs/_MANIFEST.json") == mtime


def test_cli_graphml_and_refine(tmp_path, capsys):
    corpus = str(tmp_path / "corpus")
    run = str(tmp_path / "run")
    main(["gen-corpus", "--out", corpus, "--pages", "200", "--entities", "40",
          "--seed", "6"])
    main(["run-all", "--pages", f"{corpus}/pages", "--out", run])
    main(["refine", "--out", run])
    main(["export-graphml", "--out", run, "--path", str(tmp_path / "g.graphml")])
    out = capsys.readouterr().out.strip().splitlines()
    stats = json.loads(out[-1])
    assert stats["edges"] > 0 and stats["components"] > 0
    assert os.path.exists(tmp_path / "g.graphml")
    assert os.path.isdir(f"{run}/refined")


def test_cli_train_and_discover(tmp_path, capsys):
    corpus = str(tmp_path / "corpus")
    run = str(tmp_path / "run")
    main(["gen-corpus", "--out", corpus, "--pages", "250", "--entities", "50",
          "--seed", "8"])
    main(["extract", "--pages", f"{corpus}/pages", "--out", run])
    wpath = str(tmp_path / "w.parquet")
    main(["train", "--out", run, "--labeled", f"{corpus}/labeled_pairs.parquet",
          "--weights-out", wpath, "--metrics-json", str(tmp_path / "tm.json")])
    out = capsys.readouterr().out.strip().splitlines()
    metrics = json.loads(out[-1])
    assert metrics["auc"] > 0.99
    assert abs(sum(metrics["importance"].values()) - 1.0) < 1e-9
    # weights parquet round-trips and can drive scoring
    from record_matching_ray.config import PipelineConfig
    from record_matching_ray.stages.sinks import read_weights

    intercept, w = read_weights(wpath, PipelineConfig())
    assert len(w) == len(PipelineConfig().feature_names())
    main(["block", "--out", run])
    main(["score", "--out", run, "--weights", wpath])
    import os
    assert os.path.isdir(f"{run}/edges")
    # discover: oracle-labeled training set from truth
    main(["discover", "--out", run, "--truth", f"{corpus}/truth_clusters.parquet",
          "--n-target", "40"])
    import pyarrow.parquet as pq, glob
    rows = sum(pq.read_metadata(p).num_rows
               for p in glob.glob(f"{run}/training_set/*.parquet"))
    assert rows == 40


def test_cli_export_csv(tmp_path, capsys):
    corpus = str(tmp_path / "corpus")
    run = str(tmp_path / "run")
    main(["gen-corpus", "--out", corpus, "--pages", "120", "--entities", "25",
          "--seed", "4"])
    main(["run-all", "--pages", f"{corpus}/pages", "--out", run])
    path = str(tmp_path / "canonical.csv")
    main(["export-csv", "--out", run, "--stage", "canonical", "--path", path])
    out = capsys.readouterr().out.strip().splitlines()
    meta = json.loads(out[-1])
    import csv
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == meta["rows"] > 0
    assert "canonical_name" in rows[0]


def test_cli_export_shards(tmp_path, capsys):
    corpus = str(tmp_path / "corpus")
    run = str(tmp_path / "run")
    main(["gen-corpus", "--out", corpus, "--pages", "120", "--entities", "25",
          "--seed", "4"])
    main(["run-all", "--pages", f"{corpus}/pages", "--out", run])
    path = str(tmp_path / "shards")
    main(["export-shards", "--out", run, "--stage", "clusters", "--path", path,
          "--rows-per-shard", "50"])
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["rows"] == 120 and meta["shards"] >= 3
    with open(f"{path}/shards.json") as f:
        idx = json.load(f)
    assert idx["total_rows"] == 120
    assert all(s["rows"] <= 50 for s in idx["shards"])


def test_cli_assign_incremental(tmp_path, capsys):
    """assign: run-all on a base corpus, then attach a second corpus
    batch; manifested + idempotent like every other stage."""
    import pyarrow.parquet as pq

    corpus = str(tmp_path / "corpus")
    run = str(tmp_path / "run")
    main(["gen-corpus", "--out", corpus, "--pages", "240", "--entities", "48",
          "--seed", "9"])
    # split the pages dir: first shards as base, last as the new batch
    import glob
    import shutil

    shards = sorted(glob.glob(f"{corpus}/pages/*.parquet"))
    base_dir, new_dir = str(tmp_path / "base"), str(tmp_path / "new")
    os.makedirs(base_dir), os.makedirs(new_dir)
    for s in shards[:-1]:
        shutil.copy(s, base_dir)
    shutil.copy(shards[-1], new_dir)

    main(["run-all", "--pages", base_dir, "--out", run])
    main(["assign", "--out", run, "--new-pages", new_dir,
          "--input-key", "batch2"])
    out_dir = f"{run}/assign_batch2"
    assert os.path.isdir(out_dir)
    t = pq.read_table(out_dir)
    n_new = pq.read_table(new_dir).num_rows
    assert t.num_rows == n_new
    assert set(t.column_names) >= {"url", "cluster_id", "from_base"}
    # idempotent skip
    mtime = os.path.getmtime(f"{out_dir}/_MANIFEST.json")
    main(["assign", "--out", run, "--new-pages", new_dir,
          "--input-key", "batch2"])
    assert "complete" in capsys.readouterr().out
    assert os.path.getmtime(f"{out_dir}/_MANIFEST.json") == mtime


def test_cli_fold_exact(tmp_path, capsys):
    """fold: run-all on a base corpus, then exact-fold a new batch —
    output covers the FULL corpus (old + new) as one cluster table."""
    import glob
    import shutil

    import pyarrow.parquet as pq

    corpus = str(tmp_path / "corpus")
    run = str(tmp_path / "run")
    main(["gen-corpus", "--out", corpus, "--pages", "240", "--entities", "48",
          "--seed", "9"])
    shards = sorted(glob.glob(f"{corpus}/pages/*.parquet"))
    base_dir, new_dir = str(tmp_path / "base"), str(tmp_path / "new")
    os.makedirs(base_dir), os.makedirs(new_dir)
    for s in shards[:-1]:
        shutil.copy(s, base_dir)
    shutil.copy(shards[-1], new_dir)

    main(["run-all", "--pages", base_dir, "--out", run])
    main(["fold", "--out", run, "--pages", new_dir])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    t = pq.read_table(out["out"])
    n_total = sum(pq.read_table(s).num_rows for s in shards)
    assert t.num_rows == n_total
    assert set(t.column_names) == {"url", "cluster_id"}
