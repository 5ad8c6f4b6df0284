"""Incremental ER fold (pipelines/incremental.py): folding a batch of
new pages into a run_er checkpoint must reproduce the full-batch result
exactly — min-label components are order-independent, so incremental
vs batch is a strict equality check, not a similarity score."""

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.config import PipelineConfig
from record_matching_ray.pipelines.er import (
    build_features,
    run_er,
    train_weights_from_labeled,
)
from record_matching_ray.pipelines.incremental import run_er_incremental
from record_matching_ray.stages.blocking import _emit_new_touching_segments
from record_matching_ray.testgen import write_pages_dir


def test_emit_new_touching_segments_pairs():
    # one block: olds {1,2}, news {3,4}; old-only block {10,11}
    ids = np.array([1, 2, 3, 4, 10, 11], dtype=np.int64)
    keys = np.array([5, 5, 5, 5, 9, 9], dtype=np.uint64)
    is_new = np.array([False, False, True, True, False, False])
    t = _emit_new_touching_segments(ids, keys, is_new, max_pairs=1000)
    got = set(zip(t.column("left").to_pylist(), t.column("right").to_pylist()))
    # new-new (3,4) + cross (1,3),(2,3),(1,4),(2,4); nothing from block 9
    assert got == {(3, 4), (1, 3), (2, 3), (1, 4), (2, 4)}
    assert t.column("overflow").to_pylist() == [0] * 5


def test_emit_new_touching_segments_old_only_block_silent():
    ids = np.arange(50, dtype=np.int64)
    keys = np.zeros(50, dtype=np.uint64)
    is_new = np.zeros(50, dtype=bool)
    t = _emit_new_touching_segments(ids, keys, is_new, max_pairs=1000)
    assert t.num_rows == 0


def _partition(clusters_ds) -> set[frozenset]:
    df = clusters_ds.to_pandas()
    return set(frozenset(g) for _, g in df.groupby("cluster_id")["url"])


def _split_is_new(urls: list[str]) -> np.ndarray:
    # deterministic ~1/3 split independent of row order
    from record_matching_ray.functions.hashing import hash_strings

    return hash_strings(urls) % np.uint64(3) == 0


def test_incremental_fold_equals_batch(tmp_path):
    d = str(tmp_path / "corpus")
    write_pages_dir(d, n_pages=900, n_entities=140, seed=11)
    pages = ray.data.read_parquet(f"{d}/pages")
    labeled = ray.data.read_parquet(f"{d}/labeled_pairs.parquet")
    cfg = PipelineConfig()
    b0, w, _ = train_weights_from_labeled(build_features(pages, cfg), labeled, cfg)
    weights = (b0, w)

    full = run_er(pages, cfg, weights=weights)["clusters"]

    def keep(flag: bool):
        def fn(t: pa.Table) -> pa.Table:
            # self-contained: workers cannot import the test module
            import numpy as _np

            from record_matching_ray.functions.hashing import hash_strings

            m = hash_strings(t.column("url").to_pylist()) % _np.uint64(3) == 0
            return t.filter(pa.array(m if flag else ~m))

        return fn

    old_pages = pages.map_batches(keep(False), batch_format="pyarrow")
    new_pages = pages.map_batches(keep(True), batch_format="pyarrow")
    n_old, n_new = old_pages.count(), new_pages.count()
    assert n_new > 100 and n_old + n_new == 900

    ck = str(tmp_path / "ck")
    run_er(old_pages, cfg, out_dir=ck, input_key="old", weights=weights)
    inc = run_er_incremental(new_pages, cfg, ck, "old", weights=weights)

    part_full = _partition(full)
    part_inc = _partition(inc["clusters"])
    assert part_inc == part_full

    # the fold genuinely crossed the split: at least one multi-member
    # cluster mixes old and new urls (so cross-pair scoring really ran)
    mixed = 0
    for cl in part_inc:
        if len(cl) < 2:
            continue
        flags = _split_is_new(sorted(cl))
        if flags.any() and not flags.all():
            mixed += 1
    assert mixed > 0


def test_incremental_requires_complete_checkpoint(tmp_path):
    d = str(tmp_path / "corpus")
    write_pages_dir(d, n_pages=120, n_entities=30, seed=5)
    pages = ray.data.read_parquet(f"{d}/pages")
    cfg = PipelineConfig()
    try:
        run_er_incremental(pages, cfg, str(tmp_path / "nope"), "old")
        raised = False
    except ValueError as e:
        raised = True
        assert "checkpoint" in str(e)
    assert raised
