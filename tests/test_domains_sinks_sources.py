"""Domain classification, mentions, completeness; sinks; sources."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from record_matching_ray.config import PipelineConfig
from record_matching_ray.stages.domains import (
    classify_domains,
    completeness_flags,
    extract_mentions,
)
from record_matching_ray.stages.sinks import (
    read_weights,
    write_graphml,
    write_weights,
)
from record_matching_ray.sources import read_pages, read_table


def _docs():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "join scan filter join",      # query x4
                "stream window stream data",  # streaming x3 beats ml x1
                "zzz qqq",                    # nothing
            ],
            "lang": ["en", "en", ""],
            "source": ["s1", None, "s3"],
        }
    )


def test_classify_domains_argmax_and_unknown():
    out = classify_domains(_docs())
    assert out.column("primary_domain").to_pylist() == [
        "query", "streaming", "unknown",
    ]
    assert out.column("s_query").to_pylist() == [4, 0, 0]


def test_extract_mentions_caps():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["met Alan Turing and Grace Hopper today", "no caps here"],
        }
    )
    out = extract_mentions(t)
    assert out.column("mentions")[0].as_py() == ["Alan Turing", "Grace Hopper"]
    assert out.column("n_mentions").to_pylist() == [2, 0]


def test_completeness_flags():
    out = completeness_flags(_docs())
    assert out.column("null_field_count").to_pylist() == [0, 1, 1]
    assert out.column("completeness").to_pylist() == [1.0, 0.666667, 0.666667]


def test_weights_roundtrip(tmp_path):
    cfg = PipelineConfig()
    w = np.array([1.5, -2.0, 0.5, 3.0, 0.25, 4.0])
    p = str(tmp_path / "weights.parquet")
    write_weights(p, -4.5, w, cfg)
    intercept, got = read_weights(p, cfg)
    assert intercept == pytest.approx(-4.5)
    assert np.allclose(got, w)


def test_graphml_export(tmp_path):
    edges = rd.from_items(
        [
            {"left": "a", "right": "b", "score": 0.9},
            {"left": "b", "right": "c", "score": 0.8},
            {"left": "x", "right": "y", "score": 0.7},
        ]
    )
    p = str(tmp_path / "g.graphml")
    stats = write_graphml(edges, p)
    assert stats == {"nodes": 5, "edges": 3, "components": 2, "max_component": 3}
    content = open(p).read()
    assert content.count("<node") == 5 and content.count("<edge") == 3
    with pytest.raises(ValueError):
        write_graphml(edges, p, max_edges=2)


def test_graphml_escapes_quotes(tmp_path):
    # ADVICE r1: saxutils.escape leaves double quotes alone — a node id
    # containing '"' must not break the double-quoted XML attribute
    edges = rd.from_items([{"left": 'a"b', "right": "c&d", "score": 0.5}])
    p = str(tmp_path / "q.graphml")
    write_graphml(edges, p)
    content = open(p).read()
    assert 'a"b' not in content
    assert "a&quot;b" in content and "c&amp;d" in content
    import xml.dom.minidom

    xml.dom.minidom.parse(p)  # well-formed


def test_sources_schema_assertion(tmp_path):
    import pyarrow.parquet as pq

    from record_matching_ray.testgen import make_pages

    pages, _, _ = make_pages(50, 10, 5)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    ds = read_pages(p, columns=["url", "text"])
    assert ds.schema().names == ["url", "text"]
    bad = pa.table({"url": pa.array([1, 2], pa.int64())})
    pb = str(tmp_path / "bad.parquet")
    pq.write_table(bad, pb)
    with pytest.raises((TypeError, ValueError)):
        read_table(pb, schema=pa.schema([("url", pa.string())]))


def test_jsonl_roundtrip(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.sources.tables import read_jsonl, write_jsonl

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b", "c", 'quote " and \\ slash'], pa.string()),
        }
    )
    out = str(tmp_path / "jl")
    write_jsonl(rd.from_arrow(t).repartition(2), out)
    back = read_jsonl(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(back["doc_id"]) == [1, 2, 3]
    assert list(back["text"]) == list(t.column("text").to_pylist())
    # column projection + schema assertion
    only = read_jsonl(out, schema=t.schema, columns=["doc_id"]).to_pandas()
    assert list(only.columns) == ["doc_id"]


def test_export_training_shards(tmp_path):
    import json
    import os

    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.sources.tables import export_training_shards

    t = pa.table({"x": pa.array(list(range(1000)), pa.int64())})
    out = str(tmp_path / "shards")
    idx = export_training_shards(rd.from_arrow(t).repartition(4), out, rows_per_shard=300)
    assert idx["total_rows"] == 1000
    assert all(s["rows"] <= 300 for s in idx["shards"])
    with open(os.path.join(out, "shards.json")) as f:
        assert json.load(f)["total_rows"] == 1000
    back = rd.read_parquet([os.path.join(out, s["file"]) for s in idx["shards"]])
    assert back.count() == 1000


def test_arrow_ipc_roundtrip(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.sources.tables import read_arrow_ipc, write_arrow_ipc

    t = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(100)], pa.string()),
            "score": pa.array([i / 7 for i in range(100)], pa.float64()),
        }
    )
    out = str(tmp_path / "ipc")
    paths = write_arrow_ipc(rd.from_arrow(t).repartition(4), out)
    assert len(paths) >= 2  # one file per block, never one giant file

    back = read_arrow_ipc(out)
    rows = sorted(back.take_all(), key=lambda r: r["doc_id"])
    assert len(rows) == 100
    assert rows[5]["text"] == "doc 5" and abs(rows[5]["score"] - 5 / 7) < 1e-12

    # reader-level column projection
    pruned = read_arrow_ipc(out, columns=["doc_id"]).take_all()
    assert set(pruned[0].keys()) == {"doc_id"}
