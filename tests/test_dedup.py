"""Dedup operator family: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (SURVEY.md §2.7 + training-data ops)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages import dedup

_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill and the rain falls softly on the old roof "
    "of the quiet house near the river bend in early autumn light"
)


def _docs_table():
    """10 docs: 0=1 (identical), 2 near-dup of 0 (one token changed),
    3 near-dup of 2, rest unrelated."""
    rng = np.random.RandomState(7)
    vocab = [f"tok{i}" for i in range(500)]
    texts = [
        _BASE,
        _BASE,
        _BASE.replace("lazy", "sleepy"),
        _BASE.replace("lazy", "sleepy").replace("rain", "snow"),
    ]
    for _ in range(6):
        texts.append(" ".join(rng.choice(vocab, 40)))
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )


def test_exact_dedup_groups_identical_texts():
    docs = rd.from_arrow(_docs_table())
    out = dedup.exact_dedup(docs).take_all()
    by_hash = {r["text_hash"]: r for r in out}
    assert len(out) == 9  # 10 docs, one exact duplicate pair
    dups = [r for r in out if r["cnt"] == 2]
    assert len(dups) == 1 and dups[0]["keep_id"] == 0


def test_minhash_neardup_finds_near_duplicates():
    docs = rd.from_arrow(_docs_table())
    pairs = {
        (r["left"], r["right"]): r["est_jaccard"]
        for r in dedup.minhash_neardup_pairs(docs, threshold=0.5).take_all()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # identical
    assert (0, 2) in pairs  # one-token edit
    assert (2, 3) in pairs
    # unrelated random docs never pair
    assert all(l < 4 and r < 4 for l, r in pairs)


def test_simhash_neardup_hamming():
    docs = rd.from_arrow(_docs_table())
    pairs = {
        (r["left"], r["right"]): r["hamming"]
        for r in dedup.simhash_neardup_pairs(docs, max_hamming=3).take_all()
    }
    assert pairs.get((0, 1)) == 0
    assert all(h <= 3 for h in pairs.values())
    assert all(l < 4 and r < 4 for l, r in pairs)


def test_ngram_jaccard_exact_verification():
    docs = rd.from_arrow(_docs_table())
    pairs = {
        (r["left"], r["right"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).take_all()
    }
    assert pairs.get((0, 1)) == 1.0
    # exact jaccard of the one-token edit: most 3-token shingles shared
    assert 0.5 <= pairs[(0, 2)] < 1.0


def test_embedding_neardup_cosine():
    rng = np.random.RandomState(11)
    base = rng.standard_normal(32).astype(np.float32)
    vecs = [base, base + rng.standard_normal(32).astype(np.float32) * 0.05]
    for _ in range(20):
        vecs.append(rng.standard_normal(32).astype(np.float32))
    embs = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(vecs).astype(np.float32), pa.float32()), 32
                ),
            }
        )
    )
    pairs = {
        (r["left"], r["right"]): r["cos_sim"]
        for r in dedup.embedding_neardup_pairs(
            embs, dim=32, threshold=0.95, n_bits=16, band_bits=4, n_tables=4
        ).take_all()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.95
    assert all((l, r) == (0, 1) for l, r in pairs)


def test_bucket_caps_are_observable_not_silent():
    """VERDICT r2 finding 2: near-dup bucket caps must emit the same
    observable `overflow` counter the ER blocker emits — an oversized
    synthetic bucket reports exactly the dropped-pair count on every
    emitted (pre-dedup) row."""
    assert dedup._bucket_overflow(5, 10) == 0
    # 7 members capped to 3: C(7,2) - C(3,2) = 21 - 3 = 18 pairs dropped
    assert dedup._bucket_overflow(7, 3) == 18

    # end-to-end: identical texts all land in one LSH bucket; cap it
    texts = [f"alpha beta gamma delta epsilon zeta eta theta" for _ in range(8)]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(8), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    # force the cap with a tiny max_bucket: count mode keeps the capped
    # pairs AND totals every dropped pair into one left=-1 sentinel row
    # that survives fold_candidate_pairs (ADVICE r3 item 1)
    out = dedup.minhash_neardup_pairs(docs, threshold=0.0, max_bucket=3)
    got = out.to_pandas().sort_values("left").reset_index(drop=True)
    sent = got[got["left"] < 0]
    real = got[got["left"] >= 0]
    # capped to 3 members -> C(3,2) = 3 surviving distinct pairs
    assert len(real) == 3
    assert (real["overflow"] == 0).all()
    # 8 identical docs -> every band bucket holds all 8, capped to 3:
    # C(8,2)-C(3,2) = 25 dropped per bucket, summed over the 16 bands
    assert len(sent) == 1
    assert sent.iloc[0]["overflow"] == 16 * 25
    # raise mode fails loudly instead of capping
    import pytest as _pytest

    with _pytest.raises(Exception, match="max_bucket"):
        dedup.minhash_neardup_pairs(
            docs, threshold=0.0, max_bucket=3, on_overflow="raise"
        ).materialize()


def test_fold_candidate_pairs_max_min():
    t = pa.table(
        {
            "left": pa.array([1, 1, 2, 1], pa.int64()),
            "right": pa.array([2, 2, 3, 2], pa.int64()),
            "v": pa.array([0.5, 0.9, 0.1, 0.7], pa.float64()),
        }
    )
    ds = rd.from_arrow(t)
    mx = dedup.fold_candidate_pairs(ds, "v", pa.float64(), take_max=True).to_pandas()
    mx = mx.sort_values(["left", "right"]).reset_index(drop=True)
    assert mx["v"].tolist() == [0.9, 0.1]
    mn = dedup.fold_candidate_pairs(ds, "v", pa.float64(), take_max=False).to_pandas()
    mn = mn.sort_values(["left", "right"]).reset_index(drop=True)
    assert mn["v"].tolist() == [0.5, 0.1]
