"""Incremental ER: assigning a held-out page batch to base clusters must
reproduce the full-run partition (ARI 1.0 on the synthetic corpus), on
both the broadcast and the tagged-union (100TB) contract plans."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from record_matching_ray.config import PipelineConfig
from record_matching_ray.pipelines.er import run_er
from record_matching_ray.pipelines.incremental import incremental_assign
from record_matching_ray.stages.evaluate import adjusted_rand_vs_truth
from record_matching_ray.testgen import make_pages


def _partition(rows):
    """Canonical partition: set of frozensets of urls per cluster."""
    by = {}
    for r in rows:
        by.setdefault(r["cluster_id"], set()).add(r["url"])
    return {frozenset(v) for v in by.values()}


@pytest.fixture(scope="module")
def split_corpus():
    pages, labeled, truth = make_pages(700, 120, 11)
    # stable 80/20 split by row position (deterministic, entity-agnostic:
    # most entities end up with pages on both sides)
    n = pages.num_rows
    new_mask = np.arange(n) % 5 == 0
    base = pages.filter(pa.array(~new_mask))
    new = pages.filter(pa.array(new_mask))
    cfg = PipelineConfig()
    full = run_er(
        rd.from_arrow(pages).materialize(), cfg,
        num_partitions=4, feature_concurrency=2,
    )
    full_partition = _partition(full["clusters"].take_all())
    return (
        rd.from_arrow(base).materialize(),
        rd.from_arrow(new).materialize(),
        rd.from_arrow(truth).materialize(),
        full_partition,
    )


@pytest.mark.parametrize("plan", ["broadcast", "shuffle"])
def test_incremental_matches_full_run(split_corpus, plan):
    base_pages, new_pages, truth_ds, full_partition = split_corpus
    cfg = PipelineConfig()
    res = run_er(base_pages, cfg, num_partitions=4, feature_concurrency=2)
    base_clusters = res["clusters"].materialize()
    base_feats = res["features"].materialize()

    kw = {} if plan == "broadcast" else {"broadcast_max_rows": 0}
    inc = incremental_assign(
        new_pages, base_feats, base_clusters, cfg, **kw
    )
    assign = inc["assignments"].materialize()

    # every new page assigned exactly once
    new_urls = [r["url"] for r in new_pages.select_columns(["url"]).take_all()]
    got_urls = [r["url"] for r in assign.select_columns(["url"]).take_all()]
    assert sorted(got_urls) == sorted(new_urls)

    # merged clustering reproduces the FULL batch run's partition exactly
    # (cluster ids may differ — min-url over different member sets — so
    # compare partitions, not labels), and scores >= 0.999 ARI vs truth
    # (the full run itself splits one 2-page entity on this corpus).
    merged = base_clusters.union(
        assign.select_columns(["url", "cluster_id"])
    ).materialize()
    assert _partition(merged.take_all()) == full_partition, plan
    ari = adjusted_rand_vs_truth(merged, truth_ds, num_partitions=4)
    assert ari > 0.999, f"ARI={ari} ({plan})"

    # pages of entities that have base-side members join base clusters
    rows = assign.take_all()
    n_base = sum(1 for r in rows if r["from_base"])
    assert n_base > 0.5 * len(rows), (n_base, len(rows))

# ---------------------------------------------------------------------------
# EXACT fold mode (run_er_incremental): incremental == batch strict equality


from record_matching_ray.pipelines.er import (
    build_features,
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


def _partition_ds(clusters_ds) -> set[frozenset]:
    df = clusters_ds.to_pandas()
    return set(frozenset(g) for _, g in df.groupby("cluster_id")["url"])


def _split_is_new(urls: list[str]) -> np.ndarray:
    # deterministic ~1/3 split independent of row order
    from record_matching_ray.functions.hashing import hash_strings

    return hash_strings(urls) % np.uint64(3) == 0


def test_incremental_fold_equals_batch(tmp_path):
    d = str(tmp_path / "corpus")
    write_pages_dir(d, n_pages=900, n_entities=140, seed=11)
    pages = rd.read_parquet(f"{d}/pages")
    labeled = rd.read_parquet(f"{d}/labeled_pairs.parquet")
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

    part_full = _partition_ds(full)
    part_inc = _partition_ds(inc["clusters"])
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
    pages = rd.read_parquet(f"{d}/pages")
    cfg = PipelineConfig()
    try:
        run_er_incremental(pages, cfg, str(tmp_path / "nope"), "old")
        raised = False
    except ValueError as e:
        raised = True
        assert "checkpoint" in str(e)
    assert raised


def test_chained_folds_equal_batch(tmp_path):
    """Three successive appended folds (the nightly-crawl chain) must
    reproduce the full-batch clustering exactly. Each fold writes only
    its own features/edges partition (folds.json registry)."""
    d = str(tmp_path / "corpus")
    write_pages_dir(d, n_pages=600, n_entities=90, seed=13)
    pages = rd.read_parquet(f"{d}/pages")
    labeled = rd.read_parquet(f"{d}/labeled_pairs.parquet")
    cfg = PipelineConfig()
    b0, w, _ = train_weights_from_labeled(build_features(pages, cfg), labeled, cfg)
    weights = (b0, w)

    full = run_er(pages, cfg, weights=weights)["clusters"]

    def part_of(mod: int):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as _np

            from record_matching_ray.functions.hashing import hash_strings

            m = hash_strings(t.column("url").to_pylist()) % _np.uint64(4) == mod
            return t.filter(pa.array(m))

        return fn

    batches = [
        pages.map_batches(part_of(m), batch_format="pyarrow") for m in range(4)
    ]
    base = batches[0].union(batches[1])  # ~half the corpus as the base run
    ck = str(tmp_path / "ck")
    run_er(base, cfg, out_dir=ck, input_key="base", weights=weights)

    # fold batch 2, appending; then fold batch 3 on top of base+fold1
    run_er_incremental(
        batches[2], cfg, ck, "base", weights=weights,
        append_checkpoint=True, fold_key="b2",
    )
    from record_matching_ray.pipelines.incremental import _fold_registry

    assert len(_fold_registry(ck)) == 1
    final = run_er_incremental(
        batches[3], cfg, ck, "base", weights=weights,
        append_checkpoint=True, fold_key="b3",
    )
    assert len(_fold_registry(ck)) == 2
    assert _partition_ds(final["clusters"]) == _partition_ds(full)


def test_fold_fast_path_writes_delta_and_fallback_equal(tmp_path):
    """Round-4 touched-component fold: (a) an appended fold records the
    O(increment) cluster delta (assign stage + relabel map) and the fast
    path is actually taken; (b) forcing the legacy union-edge-list
    fallback (pre-delta checkpoint shape) yields the IDENTICAL partition —
    the two clustering plans are exact equivalents."""
    import json
    import os
    import shutil

    d = str(tmp_path / "corpus")
    write_pages_dir(d, n_pages=400, n_entities=60, seed=7)
    pages = rd.read_parquet(f"{d}/pages")
    cfg = PipelineConfig()

    def part_of(mod: int):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as _np

            from record_matching_ray.functions.hashing import hash_strings

            m = hash_strings(t.column("url").to_pylist()) % _np.uint64(3) == mod
            return t.filter(pa.array(m))

        return fn

    base = pages.map_batches(part_of(0), batch_format="pyarrow")
    b1 = pages.map_batches(part_of(1), batch_format="pyarrow")
    b2 = pages.map_batches(part_of(2), batch_format="pyarrow")

    ck = str(tmp_path / "ck")
    run_er(base, cfg, out_dir=ck, input_key="base")
    run_er_incremental(b1, cfg, ck, "base", append_checkpoint=True, fold_key="f1")
    from record_matching_ray.pipelines.incremental import _fold_registry

    folds = _fold_registry(ck)
    assert len(folds) == 1
    assert folds[0]["assign"] == "assign_f1" and "relabel" in folds[0]
    assert os.path.isdir(os.path.join(ck, "assign_f1"))

    fast = run_er_incremental(b2, cfg, ck, "base")
    part_fast = _partition_ds(fast["clusters"])

    # strip the delta from the registry -> forces the legacy fallback
    ck2 = str(tmp_path / "ck2")
    shutil.copytree(ck, ck2)
    with open(os.path.join(ck2, "folds.json")) as f:
        legacy = json.load(f)
    for fe in legacy:
        fe.pop("assign", None)
        fe.pop("relabel", None)
    with open(os.path.join(ck2, "folds.json"), "w") as f:
        json.dump(legacy, f)
    slow = run_er_incremental(b2, cfg, ck2, "base")
    assert _partition_ds(slow["clusters"]) == part_fast

    # and both equal the from-scratch batch run over the full corpus
    full = run_er(pages, cfg)["clusters"]
    assert part_fast == _partition_ds(full)
