"""Imputation (vector averages + coalesce), semantic search, sinks."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.impute import (
    impute_embeddings,
    mean_embeddings,
    mean_embeddings_long,
)
from record_matching_ray.stages.search import embed_texts, semantic_search


def _emb_table(with_nulls=False):
    dim = 4
    vals = [
        ("a", [1.0, 0.0, 0.0, 0.0]),
        ("a", [3.0, 2.0, 0.0, 0.0]),
        ("b", [0.0, 0.0, 2.0, 2.0]),
        ("b", None if with_nulls else [0.0, 0.0, 4.0, 0.0]),
    ]
    embs = [v for _, v in vals]
    arr = pa.array(embs, pa.list_(pa.float32(), 4))
    return pa.table(
        {
            "grp": pa.array([g for g, _ in vals]),
            "embedding": arr,
        }
    )


def test_mean_embeddings():
    ds = rd.from_arrow(_emb_table()).repartition(2)
    out = mean_embeddings(ds, "grp", dim=4)
    m = {out.column("group")[i].as_py(): out.column("mean")[i].as_py()
         for i in range(out.num_rows)}
    assert np.allclose(m["a"], [2.0, 1.0, 0.0, 0.0])
    assert np.allclose(m["b"], [0.0, 0.0, 3.0, 1.0])
    cnts = {out.column("group")[i].as_py(): out.column("cnt")[i].as_py()
            for i in range(out.num_rows)}
    assert cnts == {"a": 2, "b": 2}


def test_mean_embeddings_skips_nulls_and_long_form():
    ds = rd.from_arrow(_emb_table(with_nulls=True))
    out = mean_embeddings(ds, "grp", dim=4)
    m = {out.column("group")[i].as_py(): out.column("mean")[i].as_py()
         for i in range(out.num_rows)}
    assert np.allclose(m["b"], [0.0, 0.0, 2.0, 2.0])  # null row skipped
    long = mean_embeddings_long(ds, "grp", dim=4)
    assert long.num_rows == 2 * 4
    assert set(long.column("pos").to_pylist()) == {0, 1, 2, 3}


def test_impute_fills_nulls_with_group_mean():
    ds = rd.from_arrow(_emb_table(with_nulls=True))
    avg = mean_embeddings(ds, "grp", dim=4)
    filled = impute_embeddings(ds, avg, "grp", dim=4).take_all()
    null_row = [r for r in filled if r["embedding"] is not None][-1]
    vals = {tuple(np.round(r["embedding"], 3)) for r in filled}
    assert (0.0, 0.0, 2.0, 2.0) in vals  # the imputed row == group b mean
    assert all(r["embedding"] is not None for r in filled)


def test_embed_texts_deterministic():
    a = embed_texts(["spark table join", "window stream"], dim=16)
    b = embed_texts(["spark table join", "window stream"], dim=16)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_semantic_search_ranks_exact_match_first():
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "spark table join agg",
                "window stream batch",
                "spark table join agg scan",
                "completely unrelated words here",
            ],
            "lang": ["en", "en", "de", "en"],
        }
    )
    out = semantic_search(rd.from_arrow(docs).repartition(2),
                          "spark table join agg", k=2)
    assert out.column("doc_id")[0].as_py() == 1  # exact text = cos 1.0
    assert out.column("cos_sim")[0].as_py() == 1.0
    assert out.num_rows == 2
    # payload filter: lang=de restricts candidates
    de = semantic_search(rd.from_arrow(docs), "spark table join agg",
                         k=5, where_lang="de")
    assert de.column("doc_id").to_pylist() == [3]


def test_neighborhood_embedding_averages_host_blocks():
    import ray
    from record_matching_ray.config import PipelineConfig
    from record_matching_ray.pipelines.er import build_features
    from record_matching_ray.stages import blocking
    from record_matching_ray.stages.impute import neighborhood_embedding_averages
    from record_matching_ray.stages.scoring import build_payload_arrays
    from record_matching_ray.testgen import make_pages

    pages, _, _ = make_pages(120, 25, 13)
    cfg = PipelineConfig(use_lsh_blocks=False, use_name_blocks=False)
    feats = build_features(rd.from_arrow(pages), cfg, concurrency=2).materialize()
    out = {
        r["uid"]: (np.array(r["neighbor_mean"]), r["n_neighbors"])
        for r in neighborhood_embedding_averages(feats, cfg, num_partitions=4).take_all()
    }
    # expected: per host group, neighbor mean = (sum - self) / (m-1)
    uids_sorted, perm, urls, _n, _y, _mh, emb = build_payload_arrays(feats)
    hosts = {r["url"]: r["host"] for r in feats.select_columns(["url", "host"]).take_all()}
    by_host = {}
    for i, u in enumerate(urls):
        by_host.setdefault(hosts[u], []).append(i)
    checked = 0
    for h, members in by_host.items():
        if len(members) < 2 or not h:
            continue
        E = emb[members].astype(np.float64)
        total = E.sum(axis=0)
        for j, i in enumerate(members):
            uid = int(blocking.page_uids([urls[i]])[0])
            want = (total - E[j]) / (len(members) - 1)
            got, n_nb = out[uid]
            assert n_nb == len(members) - 1
            assert np.allclose(got, want, atol=1e-9)
            checked += 1
    assert checked > 10


def test_hybrid_search_rrf_fuses_both_rankers():
    """RRF must surface a doc that is strong in exactly one ranker, and
    score docs found by both above docs found by one at equal rank."""
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.stages.search import hybrid_search_rrf

    texts = (
        ["alpha beta gamma"] * 1          # 0: lexical hit for terms
        + ["spark table join window agg"]  # 1: dense exact match
        + ["alpha beta spark table join"]  # 2: both
        + ["unrelated words here doc"] * 5
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    out = hybrid_search_rrf(
        ds, "spark table join window agg", ["alpha", "beta"], k=5, pool=5
    )
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert 1 in rows and 2 in rows and 0 in rows
    # doc 2 appears in BOTH top pools -> two contributions; it must beat
    # doc 0 (sparse-only, same-or-worse ranks)
    assert rows[2]["rrf_score"] > rows[0]["rrf_score"]
    # ranks are 1..k dense
    assert sorted(r["rank"] for r in rows.values()) == list(range(1, len(rows) + 1))


def test_search_pool_merge_is_distributed_driver_rows_bounded():
    """VERDICT r3 item 3: at a forced tiny block size the candidate
    stream has many per-batch pools, but the qid-grouped distributed fold
    must hand the driver <= k rows (semantic) / <= pool rows (hybrid's
    sparse side) — and results must equal the single-partition run."""
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.stages.search import (
        semantic_search,
        vector_search_filtered,
    )

    texts = [f"common token doc{i} filler words" for i in range(64)]
    t = pa.table(
        {
            "doc_id": pa.array(range(64), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    many = rd.from_arrow(t).repartition(16)  # 16 per-batch pools
    one = rd.from_arrow(t)
    k = 5
    got = semantic_search(many, "common token doc3", k=k)
    want = semantic_search(one, "common token doc3", k=k)
    assert got.num_rows == k
    assert got.equals(want)

    # payload variant: same bound + payloads intact
    rng = np.random.RandomState(3)
    emb = rng.standard_normal((40, 8)).astype(np.float32)
    et = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float32()), 8
            ),
            "label": pa.array([f"L{i % 4}" for i in range(40)], pa.string()),
        }
    )
    got_v = vector_search_filtered(
        rd.from_arrow(et).repartition(10), emb[7], k=4, payload_cols=("label",)
    )
    want_v = vector_search_filtered(
        rd.from_arrow(et), emb[7], k=4, payload_cols=("label",)
    )
    assert got_v.num_rows == 4
    assert got_v.equals(want_v)
    assert got_v.column("vec_id")[0].as_py() == 7
    assert got_v.column("label")[0].as_py() == "L3"
