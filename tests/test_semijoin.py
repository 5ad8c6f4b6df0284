"""Bloom-filter build/membership and the broadcast Bloom semi-join."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from record_matching_ray.functions.bloom import bloom_contains, build_bloom
from record_matching_ray.stages.semijoin import bloom_semi_join


def test_bloom_no_false_negatives_and_bounded_fp():
    rng = np.random.RandomState(5)
    members = rng.choice(10_000_000, size=5000, replace=False).astype(np.int64)
    nb = int(np.ceil(np.log2(16 * len(members))))
    words = build_bloom(members, nb)
    assert bloom_contains(words, members, nb).all()  # never drops a member
    universe = np.setdiff1d(
        rng.choice(10_000_000, size=50_000, replace=False).astype(np.int64),
        members,
    )
    fp = bloom_contains(words, universe, nb).mean()
    assert fp < 0.01, fp  # ~0.24% expected at m/n=16, k=4


def test_bloom_merge_is_union():
    a = np.arange(0, 100, dtype=np.int64)
    b = np.arange(100, 200, dtype=np.int64)
    merged = build_bloom(a, 12) | build_bloom(b, 12)
    assert bloom_contains(merged, np.arange(0, 200, dtype=np.int64), 12).all()


def test_bloom_semi_join_exact_matches_set_filter():
    rng = np.random.RandomState(9)
    big_keys = rng.randint(0, 500, size=4000).astype(np.int64)
    small_keys = np.unique(rng.choice(500, size=60, replace=False)).astype(np.int64)
    big = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(big_keys, pa.int64()),
                "v": pa.array(np.arange(4000), pa.int64()),
            }
        )
    ).repartition(4)
    small = rd.from_arrow(pa.table({"pk": pa.array(small_keys, pa.int64())}))
    out = bloom_semi_join(big, "k", small, "pk").take_all()
    want = {(int(k), i) for i, k in enumerate(big_keys) if k in set(small_keys)}
    got = {(r["k"], r["v"]) for r in out}
    assert got == want


def test_bloom_semi_join_empty_small_side():
    big = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    )
    small = rd.from_arrow(pa.table({"pk": pa.array([], pa.int64())}))
    assert bloom_semi_join(big, "k", small, "pk").count() == 0


def test_bloom_anti_join_exact():
    rng = np.random.RandomState(13)
    big_keys = rng.randint(0, 300, size=2000).astype(np.int64)
    small_keys = np.unique(rng.choice(300, size=40, replace=False)).astype(np.int64)
    big = rd.from_arrow(pa.table({"k": pa.array(big_keys, pa.int64())})).repartition(3)
    small = rd.from_arrow(pa.table({"pk": pa.array(small_keys, pa.int64())}))
    out = bloom_semi_join(big, "k", small, "pk", anti=True).take_all()
    member = set(small_keys.tolist())
    assert sorted(r["k"] for r in out) == sorted(
        int(k) for k in big_keys if k not in member
    )
    # bloom-only anti is refused (FPs would drop rows)
    try:
        bloom_semi_join(big, "k", small, "pk", anti=True, exact=False)
        assert False, "expected ValueError"
    except ValueError:
        pass
