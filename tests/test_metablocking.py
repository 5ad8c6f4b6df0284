"""Meta-blocking: block purging + CBS weighting + WEP pruning
(stages/metablocking.py)."""

import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.metablocking import metablocking_pairs


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_cbs_counts_shared_blocks():
    # docs 0 and 1 share all 4 first-5-token bigrams -> cbs 4;
    # doc 2 shares only the "c d" bigram with them -> cbs 1 each
    docs = _docs(
        [
            "a b c d e zz yy",
            "a b c d e xx ww",
            "q r c d f vv uu",
        ]
    )
    out = (
        metablocking_pairs(docs, prefix=5, min_block=2, max_block=8, prune="none")
        .to_pandas()
        .set_index(["left", "right"])["cbs"]
    )
    assert out[(0, 1)] == 4
    assert out[(0, 2)] == 1
    assert out[(1, 2)] == 1
    assert len(out) == 3


def test_wep_drops_below_mean_edges():
    docs = _docs(
        [
            "a b c d e zz yy",
            "a b c d e xx ww",
            "q r c d f vv uu",
        ]
    )
    # weights {4, 1, 1}, mean 2 -> only the cbs-4 edge survives cbs > mean
    out = metablocking_pairs(docs, prefix=5, min_block=2, max_block=8).to_pandas()
    assert len(out) == 1
    assert (out.loc[0, "left"], out.loc[0, "right"], out.loc[0, "cbs"]) == (0, 1, 4)


def test_block_purging_caps_hot_keys():
    # "a b" appears in all 6 docs -> purged at max_block=5; the remaining
    # bigrams of docs 4/5 are unique -> docs 4,5 pair with nobody
    docs = _docs(
        [
            "a b c d e",
            "a b c d e",
            "a b c d f",
            "a b c d f",
            "a b x y z",
            "a b p q r",
        ]
    )
    out = metablocking_pairs(
        docs, prefix=5, min_block=2, max_block=5, prune="none"
    ).to_pandas()
    got = set(zip(out["left"], out["right"]))
    assert got == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    # (0,1) share bigrams b-c, c-d, d-e (a-b purged) -> cbs 3
    assert out.set_index(["left", "right"]).loc[(0, 1), "cbs"] == 3


def test_short_docs_and_empty_result():
    docs = _docs(["a b", "c", ""])  # all shorter than prefix -> no keys
    out = metablocking_pairs(docs, prefix=5)
    assert out.count() == 0
    assert out.schema().names == ["left", "right", "cbs"]
