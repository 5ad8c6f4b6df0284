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
