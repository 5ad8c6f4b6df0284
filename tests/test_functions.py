"""Unit tests for the scalar/batch kernels (the layer the reference never
tested — SURVEY.md §5 implication)."""

import numpy as np
import pytest

from record_matching_ray.functions import strsim
from record_matching_ray.functions.embed import cosine_rows, hashing_embed
from record_matching_ray.functions.hashing import (
    blake8,
    combine_rows,
    hash_strings,
    mix64,
    shingle_hashes,
)
from record_matching_ray.functions.logistic import (
    adjusted_rand_index,
    expit,
    fit_logistic,
    predict_proba,
    roc_auc,
)
from record_matching_ray.functions.minhash import MinHasher, jaccard_from_signatures
from record_matching_ray.functions.simhash import hamming64, simhash, simhash_chunks
from record_matching_ray.functions.union_find import UnionFind


def test_hash_strings_deterministic_and_stable():
    a = hash_strings(["foo", "bar", "foo"])
    assert a[0] == a[2] != a[1]
    assert a[0] == blake8("foo")  # process-independent
    b = hash_strings(["foo", "bar", "foo"])
    assert np.array_equal(a, b)


def test_hash_strings_nulls_get_distinct_hash():
    # ADVICE r1: factorize codes None as -1, which aliased uh[-1] (the
    # LAST unique's hash) and raised IndexError on an all-null batch
    h = hash_strings(["foo", None, "bar"])
    assert h[1] != h[0] and h[1] != h[2]
    assert h[1] != blake8("foo") and h[1] != blake8("bar")
    # deterministic across calls; all-null batch works
    h2 = hash_strings([None, None])
    assert h2[0] == h2[1] == h[1]
    # NaN treated like None
    h3 = hash_strings(["foo", float("nan")])
    assert h3[1] == h[1]


def test_shingle_hashes_window():
    h = hash_strings(["a", "b", "c", "d"])
    sh = shingle_hashes(h, 3)
    assert len(sh) == 2  # abc, bcd
    # short doc -> one shingle over all tokens
    assert len(shingle_hashes(h[:2], 3)) == 1
    assert len(shingle_hashes(np.empty(0, dtype=np.uint64), 3)) == 0


def test_combine_rows_order_sensitive():
    m1 = hash_strings(["a", "b"]).reshape(1, 2)
    m2 = hash_strings(["b", "a"]).reshape(1, 2)
    assert combine_rows(m1)[0] != combine_rows(m2)[0]


def test_minhash_estimates_jaccard():
    mh = MinHasher(num_perm=256)
    rng = np.random.RandomState(0)
    a = set(rng.randint(0, 10**12, 300).tolist())
    b = set(list(a)[:150]) | set(rng.randint(10**12, 2 * 10**12, 150).tolist())
    true_j = len(a & b) / len(a | b)
    flat = np.array(sorted(a) + sorted(b), dtype=np.uint64)
    offsets = np.array([0, len(a), len(a) + len(b)])
    sigs = mh.signatures(flat, offsets)
    est = jaccard_from_signatures(sigs[:1], sigs[1:2])[0]
    assert abs(est - true_j) < 0.1


def test_minhash_band_keys_collide_for_identical():
    mh = MinHasher(num_perm=64)
    flat = hash_strings([f"t{i}" for i in range(50)] * 2)
    offsets = np.array([0, 50, 100])
    sigs = mh.signatures(flat, offsets)
    bands = mh.band_keys(sigs, 16)
    assert np.array_equal(bands[0], bands[1])
    # different docs: no collisions expected
    flat2 = np.concatenate([flat[:50], hash_strings([f"u{i}" for i in range(50)])])
    sigs2 = mh.signatures(flat2, offsets)
    bands2 = mh.band_keys(sigs2, 16)
    assert not np.any(bands2[0] == bands2[1])


def test_simhash_near_dup_close_in_hamming():
    toks_a = [f"t{i}" for i in range(200)]
    toks_b = toks_a[:190] + [f"x{i}" for i in range(10)]  # 95% overlap
    toks_c = [f"z{i}" for i in range(200)]
    flat = hash_strings(toks_a + toks_b + toks_c)
    offsets = np.array([0, 200, 400, 600])
    sh = simhash(flat, offsets)
    assert hamming64(sh[0], sh[1]) < hamming64(sh[0], sh[2])
    assert hamming64(sh[0], sh[0]) == 0


def test_simhash_chunks_pigeonhole():
    h = np.array([0x1234_5678_9ABC_DEF0], dtype=np.uint64)
    h2 = np.array([0x1234_5678_9ABC_DEF1], dtype=np.uint64)  # 1 bit flip
    c1, c2 = simhash_chunks(h), simhash_chunks(h2)
    assert (c1[0] == c2[0]).sum() == 3  # 3 of 4 chunks still equal


def test_jaro_winkler_known_values():
    assert strsim.jaro_winkler("martha", "martha") == 1.0
    assert strsim.jaro_winkler("", "x") == 0.0
    assert abs(strsim.jaro("martha", "marhta") - 0.9444) < 1e-3
    assert abs(strsim.jaro_winkler("martha", "marhta") - 0.9611) < 1e-3
    assert abs(strsim.jaro("dixon", "dicksonx") - 0.7667) < 1e-3


def test_levenshtein():
    assert strsim.levenshtein("kitten", "sitting") == 3
    assert strsim.levenshtein_ratio("abc", "abc") == 1.0
    assert strsim.levenshtein_ratio("", "") == 1.0
    assert strsim.token_set_levenshtein("anna smith", "smith anna") == 1.0


def test_jaccard_tokens():
    assert strsim.jaccard_tokens("a b c", "a b c") == 1.0
    assert strsim.jaccard_tokens("a b", "c d") == 0.0
    assert strsim.jaccard_tokens("", "") == 1.0


def test_year_compat():
    assert strsim.year_compatibility(1900, 1900) == 1.0
    assert strsim.year_compatibility(1900, 1950) == 0.0
    assert strsim.year_compatibility(float("nan"), 1900) == 0.5
    batch = strsim.year_compat_batch([1900, np.nan], [1905, 1900])
    assert abs(batch[0] - 0.8) < 1e-9 and batch[1] == 0.5


def test_hashing_embed_cosine():
    toks_a = [f"t{i}" for i in range(100)]
    toks_b = toks_a[:90] + [f"x{i}" for i in range(10)]
    toks_c = [f"z{i}" for i in range(100)]
    flat = hash_strings(toks_a + toks_b + toks_c)
    offsets = np.array([0, 100, 200, 300])
    emb = hashing_embed(flat, offsets, dim=64)
    assert emb.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
    cos_ab = cosine_rows(emb[:1], emb[1:2])[0]
    cos_ac = cosine_rows(emb[:1], emb[2:3])[0]
    assert cos_ab > cos_ac


def test_fit_logistic_separable():
    rng = np.random.RandomState(0)
    X = rng.randn(400, 3)
    y = (X[:, 0] + 2 * X[:, 1] > 0).astype(float)
    b, w = fit_logistic(X, y)
    p = predict_proba(X, b, w)
    acc = ((p > 0.5) == y).mean()
    assert acc > 0.97
    assert roc_auc(y, p) > 0.99


def test_adjusted_rand_index():
    assert adjusted_rand_index([0, 0, 1, 1], [1, 1, 0, 0]) == 1.0
    assert adjusted_rand_index([0, 0, 1, 1], [0, 1, 0, 1]) < 0.01
    assert adjusted_rand_index([0, 1, 2], [5, 5, 5]) == pytest.approx(0.0)


def test_union_find():
    uf = UnionFind()
    uf.union("b", "a")
    uf.union("c", "b")
    uf.add("z")
    comp = uf.components()
    assert comp == {"a": "a", "b": "a", "c": "a", "z": "z"}


def test_expit_extremes():
    assert expit(np.array([1000.0]))[0] == 1.0
    assert expit(np.array([-1000.0]))[0] == 0.0
    assert abs(expit(np.array([0.0]))[0] - 0.5) < 1e-12


def test_mix64_no_trivial_collisions():
    xs = np.arange(10000, dtype=np.uint64)
    assert len(np.unique(mix64(xs))) == 10000


def test_soundex_classic_values_and_blocking():
    """Classic Soundex reference values (US-census variant: same-code
    letter adjacent to the first collapses into it) + the blocking
    application: phonetically-equal dirty names share a code."""
    from record_matching_ray.functions.strsim import soundex, soundex_batch

    for n, want in [
        ("Robert", "R163"),
        ("Rupert", "R163"),
        ("Ashcraft", "A226"),
        ("Tymczak", "T522"),
        ("Pfister", "P236"),
        ("Honeyman", "H555"),
        ("Jackson", "J250"),
        ("Washington", "W252"),
        ("Lee", "L000"),
        ("", ""),
        ("123", ""),
    ]:
        assert soundex(n) == want, n
    # blocking: spelling variants of one name collide, different names don't
    assert soundex("smith") == soundex("Smyth")
    assert soundex("smith") != soundex("jones")
    assert soundex_batch(["Robert", None, "Rupert"]) == ["R163", "", "R163"]


def test_damerau_levenshtein_known_and_properties():
    from record_matching_ray.functions.strsim import damerau_levenshtein as dl

    # unrestricted (full DL), not OSA: CA -> ABC is 2
    assert dl("CA", "ABC") == 2
    assert dl("abcd", "acbd") == 1          # adjacent transposition
    assert dl("smith", "smtih") == 1
    assert dl("", "") == 0
    assert dl("a", "") == 1 and dl("", "ab") == 2
    assert dl("banana", "bahama") == 2
    # symmetry + triangle inequality on a small sample
    import itertools
    import random

    random.seed(3)
    words = ["".join(random.choice("abc") for _ in range(random.randint(0, 6)))
             for _ in range(12)]
    for a, b in itertools.combinations(words, 2):
        assert dl(a, b) == dl(b, a)
    for a, b, c in itertools.combinations(words, 3):
        assert dl(a, c) <= dl(a, b) + dl(b, c)


def test_vectorized_kernels_bit_identical_to_scalar():
    """The codepoint-matrix kernels (VERDICT r2 item 1) must be
    BIT-identical to the scalar references — same greedy matching, same
    transposition count, same float expression order — on random unicode,
    empties, None, token reorders and equal strings."""
    import random

    import numpy as np

    from record_matching_ray.functions import strsim as S

    random.seed(7)
    alph = "abcdefgh XYZ,éü日本"

    def rnd():
        return "".join(random.choice(alph) for _ in range(random.randint(0, 16)))

    pairs = [(rnd(), rnd()) for _ in range(1500)]
    pairs += [
        ("", ""), ("", "x"), ("x", ""), ("a", "a"), ("a", "b"),
        ("martha", "marhta"), ("dixon", "dicksonx"),
        ("Smith, John", "John Smith"), ("ab", "ba"), (None, "x"), (None, None),
    ]
    for _ in range(100):
        a = rnd()
        pairs.append((a, a))
    L = [p[0] for p in pairs]
    R = [p[1] for p in pairs]

    def scal(fn):
        return np.array(
            [fn("" if a is None else a, "" if b is None else b) for a, b in pairs]
        )

    assert (scal(S.jaro_winkler) == S.jaro_winkler_vec(L, R)).all()
    assert (scal(S.levenshtein_ratio) == S.levenshtein_ratio_vec(L, R)).all()
    assert (
        scal(S.token_set_levenshtein) == S.token_set_levenshtein_vec(L, R)
    ).all()


def test_cached_pairwise_vec_hybrid():
    """Cache hits and vectorized misses must agree; a second pass (all
    hits) returns the same values; the per-string token memo fills."""
    import numpy as np

    from record_matching_ray.functions import strsim as S

    L = ["anna maria", "bob", "anna maria", "", "zed q"]
    R = ["maria anna", "rob", "maria anna", "", "q zed"]
    cache: dict = {}
    tok: dict = {}
    fn = lambda l, r: S.token_set_levenshtein_vec(l, r, token_memo=tok)  # noqa: E731
    v1 = S.cached_pairwise_vec(fn, L, R, cache)
    v2 = S.cached_pairwise_vec(fn, L, R, cache)
    ref = np.array([S.token_set_levenshtein(a, b) for a, b in zip(L, R)])
    assert (v1 == ref).all() and (v2 == ref).all()
    assert ("anna maria", "maria anna") in cache
    assert "anna maria" in tok and tok["anna maria"] == "anna maria"
