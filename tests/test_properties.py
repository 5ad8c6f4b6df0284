"""Property-based tests (hypothesis) for the similarity kernels, MinHash
estimator, and clustering equivalence — the unit layer SURVEY.md §5 adds
on top of the reference's end-to-end-only testing."""

import numpy as np
from hypothesis import given, settings, strategies as st

from record_matching_ray.functions import strsim
from record_matching_ray.functions.minhash import MinHasher
from record_matching_ray.functions.union_find import UnionFind

texts = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=40)


@given(texts, texts)
@settings(max_examples=200, deadline=None)
def test_jaro_winkler_bounds_symmetry_identity(a, b):
    v = strsim.jaro_winkler(a, b)
    assert 0.0 <= v <= 1.0
    assert abs(v - strsim.jaro_winkler(b, a)) < 1e-12
    if a:
        assert strsim.jaro_winkler(a, a) == 1.0


@given(texts, texts)
@settings(max_examples=200, deadline=None)
def test_levenshtein_metric_properties(a, b):
    d = strsim.levenshtein(a, b)
    assert d == strsim.levenshtein(b, a)
    assert d >= abs(len(a) - len(b))
    assert d <= max(len(a), len(b))
    assert (d == 0) == (a == b)


@given(texts, texts)
@settings(max_examples=200, deadline=None)
def test_token_set_levenshtein_order_invariant(a, b):
    # reordering tokens must not change the token-SET similarity
    ra = " ".join(reversed(a.split()))
    assert abs(
        strsim.token_set_levenshtein(a, b) - strsim.token_set_levenshtein(ra, b)
    ) < 1e-12


@given(st.lists(st.integers(0, 500), min_size=1, max_size=200, unique=True),
       st.lists(st.integers(0, 500), min_size=1, max_size=200, unique=True))
@settings(max_examples=50, deadline=None)
def test_minhash_estimates_jaccard(xs, ys):
    h = MinHasher(num_perm=128, seed=3)

    def sig(vals):
        arr = np.array(vals, dtype=np.uint64)
        return h.signatures(arr, np.array([0, len(arr)], dtype=np.int64))[0]

    sa, sb = sig(xs), sig(ys)
    est = (sa == sb).mean()
    inter = len(set(xs) & set(ys))
    true_j = inter / len(set(xs) | set(ys))
    assert abs(est - true_j) < 0.30  # 128 perms: sd ~= sqrt(j(1-j)/128) < .05
    if xs == ys:
        assert est == 1.0


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                max_size=80))
@settings(max_examples=100, deadline=None)
def test_vectorized_contraction_matches_union_find(edges):
    """_contract_batch (numpy min-label + pointer jumping) must preserve
    exactly the components the dict union-find produces."""
    import pyarrow as pa

    from record_matching_ray.stages.clustering import _contract_batch

    t = pa.table(
        {
            "left": pa.array([min(a, b) for a, b in edges], pa.int64()),
            "right": pa.array([max(a, b) for a, b in edges], pa.int64()),
        }
    )
    out = _contract_batch(t)
    # components from the contracted star edges == components from raw edges
    uf_raw, uf_con = UnionFind(), UnionFind()
    for a, b in edges:
        uf_raw.union(a, b)
    for l, r in zip(out.column("left").to_pylist(), out.column("right").to_pylist()):
        uf_con.union(l, r)
    nodes = {n for e in edges for n in e}
    for n in nodes:
        uf_con.add(n)
    assert uf_raw.components() == uf_con.components()


@given(st.floats(1800, 2020), st.floats(1800, 2020))
@settings(max_examples=200, deadline=None)
def test_year_compat_bounds_and_symmetry(y1, y2):
    v = strsim.year_compatibility(y1, y2)
    assert 0.0 <= v <= 1.0
    assert v == strsim.year_compatibility(y2, y1)
    assert strsim.year_compatibility(y1, y1) == 1.0


# ------------------------------------------------------------- decontaminate

word = st.text(alphabet="abcdef", min_size=1, max_size=4)
doc = st.lists(word, min_size=0, max_size=30).map(" ".join)


@given(doc, doc, st.integers(2, 5))
@settings(max_examples=100, deadline=None)
def test_ngram_hash_containment_iff_token_window_match(a, b, n):
    """A doc shares an n-gram hash with the benchmark iff it shares an
    actual token n-gram window (no hash-collision at this tiny alphabet
    scale; strict n-grams)."""
    from record_matching_ray.stages.decontaminate import _strict_ngram_hashes

    fa, _ = _strict_ngram_hashes([a], n)
    fb, _ = _strict_ngram_hashes([b], n)
    ta = a.strip().lower().split()
    tb = b.strip().lower().split()
    grams_a = {tuple(ta[i : i + n]) for i in range(max(len(ta) - n + 1, 0))}
    grams_b = {tuple(tb[i : i + n]) for i in range(max(len(tb) - n + 1, 0))}
    assert bool(set(fa) & set(fb)) == bool(grams_a & grams_b)
    assert len(fa) == max(len(ta) - n + 1, 0)


# ---------------------------------------------------------------- tf-idf

@given(doc, doc)
@settings(max_examples=100, deadline=None)
def test_tfidf_cosine_bounds_and_self_similarity(a, b):
    """Weighted cosine of nonnegative tf vectors is in [0, 1]; a doc with
    itself scores 1 (when non-empty)."""
    import numpy as np

    from record_matching_ray.functions.hashing import _U64
    from record_matching_ray.stages.tfidf import PairTfidfCosine, _doc_token_counts

    scorer = PairTfidfCosine((np.empty(0, dtype=_U64), np.empty(0), 1.0))

    def cos(x, y):
        import pyarrow as pa

        (ux, cx), (uy, cy) = _doc_token_counts([x, y])
        t = pa.table(
            {
                "left": pa.array([0], pa.int64()),
                "right": pa.array([1], pa.int64()),
                "tf_l": pa.array([np.concatenate([ux, cx.view(_U64)]).tobytes()], pa.binary()),
                "tf_r": pa.array([np.concatenate([uy, cy.view(_U64)]).tobytes()], pa.binary()),
            }
        )
        return scorer(t).column("tfidf_cos")[0].as_py()

    c = cos(a, b)
    assert -1e-9 <= c <= 1.0 + 1e-9
    if a.strip():
        assert abs(cos(a, a) - 1.0) < 1e-6


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=100),
        ),
        max_size=60,
    ),
    st.lists(st.integers(min_value=1, max_value=1000), max_size=5),
)
def test_fold_candidate_pairs_overflow_property(rows, overflows):
    """fold_candidate_pairs with overflow_col: real pairs fold to distinct
    (min,max) keeping the max value, and the output's single sentinel row
    totals EVERY input sentinel regardless of partitioning."""
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.stages.dedup import fold_candidate_pairs

    lefts, rights, vals, ovs = [], [], [], []
    for a, b, v in rows:
        if a == b:
            continue
        lefts.append(min(a, b))
        rights.append(max(a, b))
        vals.append(float(v))
        ovs.append(0)
    for o in overflows:
        lefts.append(-1)
        rights.append(-1)
        vals.append(0.0)
        ovs.append(o)
    t = pa.table(
        {
            "left": pa.array(lefts, pa.int64()),
            "right": pa.array(rights, pa.int64()),
            "v": pa.array(vals, pa.float64()),
            "overflow": pa.array(ovs, pa.int64()),
        }
    )
    out = fold_candidate_pairs(
        rd.from_arrow(t).repartition(3), "v", pa.float64(),
        take_max=True, overflow_col="overflow",
    ).to_pandas()
    if t.num_rows == 0:
        # empty Dataset loses its schema through to_pandas (Ray quirk,
        # cf. customers_no_orders docstring) — nothing to fold
        assert len(out) == 0
        return
    sent = out[out["left"] < 0]
    real = out[out["left"] >= 0]
    # brute force
    want: dict = {}
    for a, b, v in rows:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        want[k] = max(want.get(k, -1.0), float(v))
    got = {(r["left"], r["right"]): r["v"] for _, r in real.iterrows()}
    assert got == want
    assert (real["overflow"] == 0).all()
    total = sum(overflows)
    if total:
        assert len(sent) == 1 and sent.iloc[0]["overflow"] == total
    else:
        assert len(sent) == 0


# --- round-5 additions ------------------------------------------------------

doc_texts = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=60),
    min_size=2, max_size=12,
)


@given(doc_texts)
@settings(max_examples=30, deadline=None)
def test_lsa_encoder_properties(texts):
    """Unit norm (or exactly zero for vocab-less docs), determinism, and
    batch-split invariance — encode([a,b]) == encode([a]) + encode([b])."""
    from record_matching_ray.functions.encoder import LsaEncoder

    enc = LsaEncoder.fit(texts, dim=4)
    V = enc.encode(texts)
    assert V.shape == (len(texts), 4)
    norms = np.linalg.norm(V, axis=1)
    assert np.all((np.abs(norms - 1.0) < 1e-5) | (norms == 0.0))
    # batch-split invariance: per-row encoding is independent
    split = np.concatenate([enc.encode(texts[:1]), enc.encode(texts[1:])])
    assert np.array_equal(V, split)
    # refit determinism
    assert np.array_equal(LsaEncoder.fit(texts, dim=4).encode(texts), V)


@given(st.integers(10, 200), st.integers(1, 5), st.integers(0, 2**31 - 1))
@settings(max_examples=20, deadline=None)
def test_ari_hash_sample_threshold_monotone(n, k, seed):
    """The hash-threshold sample used by adjusted_rand_vs_truth keeps a
    NESTED subset as sample_n grows (threshold monotonicity) — the
    property that makes the sample consistent across re-runs at
    different sizes, unlike limit()."""
    from record_matching_ray.functions.hashing import hash_strings, mix64

    urls = [f"https://s{seed}.e{i}.com/p" for i in range(n)]
    h = mix64(
        hash_strings(urls).astype(np.uint64) ^ np.uint64(0x9E3779B97F4A7C15)
    )
    lo = np.uint64(int(0.3 * 2**64))
    hi = np.uint64(int(0.7 * 2**64))
    small = set(np.asarray(urls, dtype=object)[h < lo])
    large = set(np.asarray(urls, dtype=object)[h < hi])
    assert small <= large


@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=400),
    st.integers(1, 6),
)
@settings(max_examples=50, deadline=None)
def test_streamed_rows_equals_take_all(values, nparts):
    from record_matching_ray.stages.util import streamed_rows

    import pyarrow as pa
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"x": values})).repartition(nparts)
    got = sorted(r["x"] for r in streamed_rows(ds))
    assert got == sorted(values)
