"""S2 blocking: band-key collisions, pair canonicalization/dedup, hot-host
salting bounds, per-block pair caps (SURVEY.md §7.2 step 2)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from record_matching_ray.config import PipelineConfig
from record_matching_ray.pipelines.er import build_features
from record_matching_ray.stages import blocking
from record_matching_ray.stages.blocking import _emit_pairs_in_block, emit_block_keys
from record_matching_ray.testgen import make_pages


def _features(n_pages=300, n_entities=60, seed=11):
    pages, labeled, truth = make_pages(n_pages, n_entities, seed)
    cfg = PipelineConfig()
    feats = build_features(rd.from_arrow(pages), cfg, concurrency=2).materialize()
    return cfg, feats, labeled


def test_emit_block_keys_shape():
    cfg, feats, _ = _features()
    batch = feats.take_batch(50, batch_format="pyarrow")
    out = emit_block_keys(batch, cfg)
    # each page emits 1 host key + lsh_bands band keys + 1 name key when
    # the normalized name is non-empty
    n_named = sum(1 for nm in batch.column("name").to_pylist() if nm)
    assert out.num_rows == 50 * (1 + cfg.lsh_bands) + n_named
    assert out.schema.names == ["block_key", "uid"]


def test_pairs_canonical_and_deduped():
    cfg, feats, _ = _features()
    pairs = blocking.generate_candidate_pairs(feats, cfg).materialize()
    rows = pairs.take_all()
    seen = set()
    for r in rows:
        assert r["left"] < r["right"]
        assert (r["left"], r["right"]) not in seen
        seen.add((r["left"], r["right"]))


def test_blocking_covers_true_pairs():
    cfg, feats, labeled = _features()
    pairs = blocking.generate_candidate_pairs(feats, cfg).materialize()
    got = {(r["left"], r["right"]) for r in pairs.take_all()}
    lu = blocking.page_uids(labeled.column("left").to_pylist())
    ru = blocking.page_uids(labeled.column("right").to_pylist())
    pos = {
        (min(int(l), int(r)), max(int(l), int(r)))
        for l, r, m in zip(lu, ru, labeled.column("match").to_pylist())
        if m
    }
    recall = len(pos & got) / len(pos)
    assert recall >= 0.99, f"blocking recall {recall}"


def test_pair_cap_and_overflow_counter():
    block = pa.table({"block_key": [1] * 10, "url": [f"u{i:02d}" for i in range(10)]})
    out = _emit_pairs_in_block(block, max_pairs=5)
    # oversized block -> dense core over m_cap smallest ids + hub spokes
    # from the first 2 ids to every remaining member; every member appears
    m_cap = int((2 * 5) ** 0.5) + 1  # 4
    expected = m_cap * (m_cap - 1) // 2 + 2 * (10 - m_cap)
    assert out.num_rows == expected
    assert out.column("overflow")[0].as_py() == 45 - expected
    members = set(out.column("left").to_pylist()) | set(
        out.column("right").to_pylist()
    )
    assert members == {f"u{i:02d}" for i in range(10)}  # nobody stranded
    full = _emit_pairs_in_block(block, max_pairs=1000)
    assert full.num_rows == 45
    assert full.column("overflow")[0].as_py() == 0


def test_hot_host_salting_splits_blocks():
    cfg = PipelineConfig(n_salts=4)
    urls = [f"https://hot.com/{i}" for i in range(40)]
    t = pa.table(
        {
            "url": urls,
            "host": ["hot.com"] * 40,
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(
                    np.arange(40 * cfg.num_perm, dtype=np.uint64), pa.uint64()
                ),
                cfg.num_perm,
            ),
        }
    )
    unsalted = emit_block_keys(t, PipelineConfig(use_lsh_blocks=False))
    salted = emit_block_keys(
        t,
        PipelineConfig(use_lsh_blocks=False, n_salts=4),
        hot_hosts={"hot.com"},
    )
    assert len(set(unsalted.column("block_key").to_pylist())) == 1
    n_blocks = len(set(salted.column("block_key").to_pylist()))
    assert 2 <= n_blocks <= 4  # split into at most n_salts sub-blocks


def test_compute_hot_hosts():
    cfg = PipelineConfig(hot_block_limit=30)
    pages, _, _ = make_pages(400, 30, 5)
    feats = build_features(rd.from_arrow(pages), cfg, concurrency=2).materialize()
    hot = blocking.compute_hot_hosts(feats, cfg)
    # the generator's head domains concentrate ~25% of pages
    assert any("portal" in h for h in hot)


def test_attach_pair_payload_roundtrip():
    cfg, feats, _ = _features(100, 20, 9)
    pairs = blocking.generate_candidate_pairs(feats, cfg).materialize()
    for wide in (
        blocking.attach_pair_payload(pairs, feats, cfg),  # broadcast plan
        blocking._attach_payload_join(pairs, feats, cfg, num_partitions=2),
    ):
        row = wide.take(1)[0]
        for col in ("name_l", "name_r", "minhash_l", "minhash_r"):
            assert col in row
        # embeddings travel SQ8-quantized: int8 unit-scaled by 127
        emb = np.frombuffer(row["embedding_l"], dtype=np.int8)
        assert emb.shape == (cfg.embed_dim,)
        assert abs(np.linalg.norm(emb.astype(np.float32)) - 127.0) < 2.0
        mh = np.frombuffer(row["minhash_l"], dtype=np.uint8)  # byte-packed
        assert mh.shape == (cfg.num_perm,)
