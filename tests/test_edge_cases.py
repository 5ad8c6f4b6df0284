"""Edge-case hardening: empty/singleton/degenerate inputs through the
flagship pipeline and key operators."""

import pyarrow as pa
import ray.data as rd

from record_matching_ray.config import PipelineConfig
from record_matching_ray.pipelines.er import build_features, run_er
from record_matching_ray.stages import blocking
from record_matching_ray.stages.clustering import connected_components
from record_matching_ray.testgen import make_pages


def _pages_table(rows):
    import datetime as dt

    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [dt.datetime(2024, 1, 1)] * len(rows), pa.timestamp("us")
            ),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )


def test_single_page_corpus():
    t = _pages_table(
        [("https://a.com/1", b"<html><title>X</title><p>hello</p></html>", "X hello")]
    )
    res = run_er(rd.from_arrow(t), PipelineConfig(), num_partitions=2,
                 feature_concurrency=1)
    rows = res["clusters"].take_all()
    assert len(rows) == 1
    assert rows[0]["cluster_id"] == rows[0]["url"]  # singleton cluster


def test_identical_pages_all_merge():
    html = b"<html><title>Anna Wang</title><p>Anna Wang b. 1900 same text</p></html>"
    rows = [(f"https://h{i}.com/p", html, "Anna Wang Anna Wang b. 1900 same text")
            for i in range(6)]
    t = _pages_table(rows)
    res = run_er(rd.from_arrow(t), PipelineConfig(), num_partitions=2,
                 feature_concurrency=1)
    out = res["clusters"].take_all()
    assert len({r["cluster_id"] for r in out}) == 1  # one cluster


def test_empty_edges_all_singletons():
    pages, _, _ = make_pages(20, 20, 3)  # 20 singleton entities
    cfg = PipelineConfig()
    feats = build_features(rd.from_arrow(pages), cfg, concurrency=1).materialize()

    def uid_nodes(t):
        return pa.table(
            {"url": pa.array(blocking.page_uids(t.column("url").to_pylist()),
                             pa.int64())}
        )

    empty_edges = rd.from_arrow(
        pa.table({"left": pa.array([], pa.int64()),
                  "right": pa.array([], pa.int64())})
    )
    ucl = connected_components(
        empty_edges,
        nodes=feats.select_columns(["url"]).map_batches(
            uid_nodes, batch_format="pyarrow"),
    )
    rows = ucl.take_all()
    assert len(rows) == 20
    assert all(r["url"] == r["cluster_id"] for r in rows)


def test_block_size_stats():
    pages, _, _ = make_pages(300, 60, 11)
    cfg = PipelineConfig()
    feats = build_features(rd.from_arrow(pages), cfg, concurrency=2).materialize()
    stats = blocking.block_size_stats(feats, cfg)
    assert stats["blocks"] > 0
    assert stats["members_max"] >= stats["members_p99"] >= stats["members_p50"]
    assert stats["blocks_over_pair_cap"] == 0  # small corpus, no overflow
