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
