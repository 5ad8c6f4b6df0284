"""End-to-end corpus curation composite: quality -> dedup -> decon."""

import pyarrow as pa
import ray.data as rd

from record_matching_ray.pipelines.curate import curate_corpus


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(2)


def test_curate_corpus_three_gates():
    good = "the cat sat on a mat and the dog sat in the yard of a house"
    docs = _ds(
        [
            (1, good),                          # survives
            (2, good),                          # exact dup of 1 -> dropped
            (3, "xxxx yyyy zzzz qqqq wwww"),    # no stopwords -> quality drop
            (4, "the bird flew over a lake and the fish swam in the deep sea now"),
            (5, "the mouse ran under a table and the cow ate in the green field ok"),
        ]
    )
    bench = _ds([(100, "the bird flew over a lake and the fish swam in the deep sea now")])
    out = curate_corpus(docs, bench, n=8, stop_ratio_min=0.1)
    rows = {r["doc_id"]: r["n_tokens"] for r in out.take_all()}
    # 1 survives (2 deduped away), 3 fails quality, 4 contaminated, 5 clean
    assert set(rows) == {1, 5}
    assert rows[1] == len(good.split())


def test_curate_corpus_empty_after_quality():
    docs = _ds([(1, "zz qq ww"), (2, "xx yy")])
    bench = _ds([(9, "anything at all here")])
    assert curate_corpus(docs, bench, stop_ratio_min=0.5).count() == 0
