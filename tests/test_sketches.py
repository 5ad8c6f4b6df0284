"""HyperLogLog sketch tests: exact bit-level helpers, merge = union,
and the accuracy bound the estimator is supposed to deliver."""

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.functions.hashing import hash_strings, md5_lower64
from record_matching_ray.stages.sketches import (
    _bit_length_u64,
    _hll_registers,
    hll_estimate,
    hll_group_distinct,
)


def test_bit_length_u64_exact():
    w = np.array(
        [0, 1, 2, 3, 4, (1 << 52) - 1, 1 << 52, (1 << 52) + 1, (1 << 63), (1 << 64) - 1],
        dtype=np.uint64,
    )
    got = _bit_length_u64(w)
    assert got.tolist() == [int(x).bit_length() for x in w.tolist()]


def test_registers_match_reference_bit_split():
    p = 12
    h = hash_strings(np.array(["a", "b", "abc"], dtype=object), hash_fn=md5_lower64)
    idx, rho = _hll_registers(h, p)
    for k, i, r in zip(h.tolist(), idx.tolist(), rho.tolist()):
        assert i == k >> (64 - p)
        w = k & ((1 << (64 - p)) - 1)
        expect = (64 - p) - w.bit_length() + 1 if w else (64 - p) + 1
        assert r == expect


def _sketch(values, p=12):
    m = 1 << p
    h = hash_strings(np.asarray([str(v) for v in values], dtype=object),
                     hash_fn=md5_lower64)
    idx, rho = _hll_registers(h, p)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def test_merge_of_shards_equals_sketch_of_union():
    a = [f"u{i}" for i in range(5000)]
    b = [f"u{i}" for i in range(2500, 9000)]  # overlapping shards
    merged = np.maximum(_sketch(a), _sketch(b))
    assert np.array_equal(merged, _sketch(a + b))


def test_estimate_within_published_error_bound():
    p = 12  # stderr ~ 1.04 / sqrt(4096) = 1.6%; allow 4 sigma
    for n in (100, 3000, 50_000):
        est = hll_estimate(_sketch(range(n), p))
        assert abs(est - n) / n < 4 * 1.04 / np.sqrt(1 << p), (n, est)


def test_group_distinct_dataset(ray_session):
    rng = np.random.default_rng(7)
    groups = np.where(rng.random(20_000) < 0.5, "a", "b")
    vals = rng.integers(0, 4000, size=20_000)
    t = pa.table({"g": pa.array(groups.tolist(), pa.string()),
                  "v": pa.array(vals, pa.int64())})
    out = (
        hll_group_distinct(ray.data.from_arrow(t).repartition(8), "g", "v", p=12)
        .to_pandas()
        .set_index("g")
    )
    for g in ("a", "b"):
        exact = len(np.unique(vals[groups == g]))
        approx = out.loc[g, "approx_distinct"]
        assert abs(approx - exact) / exact < 0.07, (g, exact, approx)
        # dataset path must equal the in-process sketch bit-for-bit
        local = hll_estimate(_sketch(vals[groups == g]))
        assert abs(approx - local) < 1e-6


def test_distributed_auc_matches_local_rank_auc(ray_session):
    from record_matching_ray.stages.evaluate import distributed_auc

    rng = np.random.default_rng(3)
    s = rng.integers(0, 500, size=5000)  # heavy ties
    y = (rng.random(5000) < 1 / (1 + np.exp(-(s - 250) / 80.0))).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"s": pa.array(s, pa.int64()), "y": pa.array(y, pa.int64())})
    ).repartition(6)
    got = distributed_auc(ds, "s", "y").to_pandas().iloc[0]
    # local tie-average rank AUC reference
    order = np.argsort(s, kind="stable")
    ss, yy = s[order], y[order]
    ranks = np.empty(len(ss), np.float64)
    i = 0
    while i < len(ss):
        j = i
        while j < len(ss) and ss[j] == ss[i]:
            j += 1
        ranks[i:j] = (i + j + 1) / 2.0
        i = j
    n_pos = int(yy.sum()); n_neg = len(yy) - n_pos
    auc = (ranks[yy == 1].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    assert got["n_pos"] == n_pos and got["n_neg"] == n_neg
    assert abs(got["auc"] - round(auc, 6)) < 1e-9


def test_estimate_harmonic_sum_order_independent_extreme_rho():
    """ADVICE r3 item 5: once register terms span > 53 bits the float64
    termwise sum went order-dependent. The exact-integer path must give
    the identical estimate for any permutation of a register array that
    mixes rho=0 (empty), rho=1 and the max rho=52 (p=12)."""
    rng = np.random.RandomState(7)
    m = 1 << 12
    regs = np.zeros(m, dtype=np.uint8)
    regs[:1000] = 1
    regs[1000:1010] = 52  # extreme leading-zero runs (trillion-key scale)
    base = hll_estimate(regs)
    for _ in range(5):
        assert hll_estimate(rng.permutation(regs)) == base
    # exact value: harm = (m-1010)*2^0 + 1000*2^-1 + 10*2^-52, summed as
    # scaled integers -> one correctly-rounded division
    s = (m - 1010) * (1 << 64) + 1000 * (1 << 63) + 10 * (1 << 12)
    from record_matching_ray.stages.sketches import _alpha

    want = _alpha(m) * m * m / (s / (1 << 64))
    zeros = int((regs == 0).sum())
    if want <= 2.5 * m and zeros > 0:
        want = m * float(np.log(m / float(zeros)))
    assert base == want
