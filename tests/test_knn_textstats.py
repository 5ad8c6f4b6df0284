"""KNN search (brute-force exact + LSH recall) and text-analysis ops."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages import knn, textstats


def _embs(n=200, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    return mat, rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), pa.float32()), dim
                ),
            }
        )
    ).repartition(4)


def _numpy_topk(mat, qi, k):
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(unit @ unit[qi], 6)
    order = np.lexsort((np.arange(len(mat)), -sims))
    return [int(i) for i in order if i != qi][:k]


def test_knn_bruteforce_matches_numpy():
    mat, embs = _embs()
    Q, qids = knn.load_query_matrix(embs, n_queries=3)
    out = knn.knn_bruteforce(embs, Q, qids, k=5)
    for qi in range(3):
        got = [
            r["nid"]
            for r in out.to_pylist()
            if r["qid"] == qi
        ]
        assert got == _numpy_topk(mat, qi, 5), f"query {qi}"


def test_knn_lsh_recall():
    mat, embs = _embs(n=400)
    Q, qids = knn.load_query_matrix(embs, n_queries=5)
    exact = knn.knn_bruteforce(embs, Q, qids, k=10).to_pylist()
    approx = knn.knn_lsh(embs, Q, qids, k=10, n_bits=8, n_tables=16).to_pylist()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["qid"], set()).add(r["nid"])
    hit = total = 0
    for r in approx:
        total += 1
        hit += r["nid"] in exact_sets[r["qid"]]
    # top-1 neighbors are near; random gaussian vectors have weak structure,
    # so demand moderate recall from the bucketed search
    assert total > 0 and hit / max(total, 1) >= 0.5


def test_token_stats_and_quality():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["the cat sat.", "a of and in the x y!?"],
        }
    )
    ts = textstats.token_stats(t).to_pylist()
    assert ts[0]["n_tokens"] == 3 and ts[0]["n_chars"] == len("the cat sat.")
    q = textstats.quality_stats(t).to_pylist()
    assert q[0]["stop_cnt"] == 1  # "the"
    assert q[0]["punct_cnt"] == 1  # "."
    assert q[1]["stop_cnt"] == 5
    assert q[1]["punct_cnt"] == 2  # "!" and "?"
    assert abs(q[1]["stop_ratio"] - round(5 / 7, 6)) < 1e-9


def test_langid_heuristic():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "the house of the king and the queen is in the town",
                "der Hund und die Katze sind nicht in der Stadt",
                "这是一个中文文档 的 测试 内容 很多汉字",
            ],
        }
    )
    out = {r["doc_id"]: r["lang_pred"] for r in textstats.langid(t).to_pylist()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "zh"


def test_winnow_fingerprints_deterministic_and_robust():
    a = textstats.winnow_fingerprints("the quick brown fox jumps over the dog")
    b = textstats.winnow_fingerprints("the quick brown fox jumps over the dog")
    assert np.array_equal(a, b)
    # local edit changes only some fingerprints
    c = textstats.winnow_fingerprints("the quick brown fox jumps over the cat")
    shared = len(np.intersect1d(a, c))
    assert 0 < shared < len(a) + 1 and shared >= len(a) // 2


def test_md5_lower64_matches_duckdb():
    """The SQL-parity contract: md5_lower64 == DuckDB md5_number_lower,
    the primitive the simhash/winnowing oracle conversions stand on."""
    import duckdb

    from record_matching_ray.functions.hashing import md5_lower64

    con = duckdb.connect()
    for s in ["hello", "", "a b c", "naïve café", "这是测试"]:
        (want,) = con.execute("SELECT md5_number_lower(?)", [s]).fetchone()
        assert md5_lower64(s) == want


def test_winnow_md5_matches_bruteforce():
    """winnow_fingerprints_md5 == brute-force winnowing reference
    (all k-gram md5 hashes, min per window, distinct) — the same
    semantics the DuckDB _WINNOW_SQL oracle recomputes."""
    from record_matching_ray.functions.hashing import md5_lower64

    def ref(text, k=8, window=4):
        n = len(text)
        if n < k:
            return {md5_lower64(text)}
        grams = [md5_lower64(text[i : i + k]) for i in range(n - k + 1)]
        if len(grams) <= window:
            return set(grams)
        return {
            min(grams[j : j + window]) for j in range(len(grams) - window + 1)
        }

    for text in [
        "the quick brown fox jumps over the lazy dog",
        "short",
        "exactly8!",
        "aaaaaaaaaaaaaaaaaaaa",
        "",
    ]:
        got = set(textstats.winnow_fingerprints_md5(text).tolist())
        assert got == ref(text), text


def test_knn_ivf_recall():
    import numpy as np
    import ray.data as rd
    from record_matching_ray.stages.knn import (
        knn_bruteforce, knn_ivf, load_query_matrix, train_ivf_centroids,
    )

    embs = rd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    ).materialize()
    Q, qids = load_query_matrix(embs, n_queries=5)
    exact = knn_bruteforce(embs, Q, qids, k=10)
    # near-uniform test vectors are IVF worst-case: neighbors sit at
    # cos ~0.5, so recall needs probing ~half the cells (real embedding
    # corpora concentrate neighbors far more)
    C = train_ivf_centroids(embs, n_centroids=32, sample_n=512)
    assert C.shape[1] == 64 and np.allclose(np.linalg.norm(C, axis=1), 1.0)
    approx = knn_ivf(embs, Q, qids, k=10, centroids=C, n_probe=16)
    ex = {(r["qid"], r["nid"]) for r in exact.to_pylist()}
    ap = {(r["qid"], r["nid"]) for r in approx.to_pylist()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.8, f"IVF recall@10 = {recall}"
    # deterministic across runs
    again = knn_ivf(embs, Q, qids, k=10, centroids=C, n_probe=16)
    assert approx.equals(again)


def test_approx_distinct_bound():
    import ray.data as rd
    from record_matching_ray.stages.textstats import approx_distinct

    docs = rd.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    )
    est, rse = approx_distinct(docs, "doc_id", precision_bits=12)
    true = 500
    assert abs(est - true) / true < 5 * rse + 0.02, (est, rse)
    # deterministic
    est2, _ = approx_distinct(docs, "doc_id", precision_bits=12)
    assert est == est2


def test_fingerprint_containment_pairs():
    """A copied-with-edits doc pair scores high containment; unrelated
    docs stay out; result matches a brute-force winnowing reference."""
    import itertools

    import ray.data as rd

    from record_matching_ray.stages.textstats import (
        fingerprint_containment_pairs,
        winnow_fingerprints,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today "
    texts = {
        1: base * 4,
        2: base * 4 + "with a small appended edit at the end",
        3: "completely different content about ray data pipelines and arrow",
        4: "yet another unrelated document concerning winnowing fingerprints",
    }
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in texts.items()]
    ).repartition(2)
    got = {
        (r["left"], r["right"]): r["containment"]
        for r in fingerprint_containment_pairs(
            ds, min_containment=0.5, num_partitions=4
        ).take_all()
    }
    fps = {i: set(winnow_fingerprints(t).tolist()) for i, t in texts.items()}
    want = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        shared = len(fps[a] & fps[b])
        cont = round(shared / min(len(fps[a]), len(fps[b])), 6)
        if cont >= 0.5:
            want[(a, b)] = cont
    assert (1, 2) in got and got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_unigram_logprob_vs_bruteforce():
    """Distributed unigram LM score == a hand-computed corpus model;
    rare-token docs score lower; min_count=2 default path is exact for
    singleton tokens."""
    import math
    from collections import Counter

    import ray.data as rd

    from record_matching_ray.stages.textstats import unigram_logprob

    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat on the mat",
        3: "zyxw qvut unique gibberish tokens here",
    }
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in texts.items()]
    ).repartition(2)
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_logprob(ds).take_all()
    }
    tf = Counter(tok for t in texts.values() for tok in t.lower().split())
    N = sum(tf.values())
    for i, t in texts.items():
        toks = t.lower().split()
        want = round(sum(math.log(tf[tok] / N) for tok in toks) / len(toks), 6)
        assert got[i][0] == len(toks)
        assert abs(got[i][1] - want) < 2e-6, (i, got[i], want)
    assert got[3][1] < got[1][1]  # gibberish scores lower


def test_bm25_vs_bruteforce():
    import math

    import ray.data as rd

    from record_matching_ray.stages.textstats import bm25_scores

    texts = {
        1: "data data pipeline over ray data",
        2: "hash join beats sort merge join here",
        3: "nothing relevant whatsoever",
        4: "data hash",
    }
    terms = ["data", "hash"]
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in texts.items()]
    ).repartition(2)
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(ds, terms).take_all()}

    toks = {i: t.lower().split() for i, t in texts.items()}
    N = len(texts)
    avgdl = sum(len(x) for x in toks.values()) / N
    k1, b = 1.2, 0.75
    for i in texts:
        s = 0.0
        for term in terms:
            df = sum(1 for x in toks.values() if term in x)
            tf = toks[i].count(term)
            if tf == 0:
                continue
            idf = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks[i]) / avgdl))
        assert abs(got[i] - round(s, 6)) < 2e-6, (i, got[i], s)
    assert got[3] == 0.0
    assert got[4] > got[2] > 0.0


def test_bpe_token_stats_counts():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["I've got 42 cats, don't I?", "hello  world", ""],
        }
    )
    out = {r["doc_id"]: r for r in textstats.bpe_token_stats(t).to_pylist()}
    # I | 've | " got" | " 42" | " cats" | "," | " don" | "'t" | " I" | "?"
    assert out[1]["n_bpe_tokens"] == 10
    assert out[2]["n_bpe_tokens"] == 3  # "hello" | "  " (ws run) | "world"
    assert out[3]["n_bpe_tokens"] == 0
    assert out[2]["n_ws_tokens"] == 2


def test_source_token_kl_vs_bruteforce():
    import math
    from collections import Counter

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.stages.textstats import source_token_kl

    docs = [
        ("a", "x y z x"),
        ("a", "x x q"),
        ("b", "z z z w"),
        ("b", "w w y"),
        ("c", "x y z w q"),
    ] * 4
    tbl = pa.table(
        {
            "source": pa.array([s for s, _ in docs], pa.string()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }
    )
    out = (
        source_token_kl(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .set_index("source")
    )
    # brute-force reference
    cst = Counter()
    for s, t in docs:
        for tok in t.split():
            cst[(s, tok)] += 1
    ns = Counter()
    ct = Counter()
    for (s, tok), c in cst.items():
        ns[s] += c
        ct[tok] += c
    n = sum(ns.values())
    for s in ns:
        kl = sum(
            (c / ns[s]) * math.log((c / ns[s]) / (ct[tok] / n))
            for (s2, tok), c in cst.items()
            if s2 == s
        )
        assert out.loc[s, "n_tokens"] == ns[s]
        assert abs(out.loc[s, "kl"] - kl) < 1e-6, s
    # KL is non-negative and zero only for a distribution equal to corpus
    assert (out["kl"] >= 0).all()


def test_dsir_logratio_vs_bruteforce():
    """DSIR log-ratio against an in-process reference (Laplace-smoothed
    bag-of-token models, target = flagged rows, source = corpus)."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.stages.textstats import dsir_logratio

    texts = ["a b a", "b c", "a a a a", "c c d", "", "d a b"]
    langs = ["en", "de", "en", "de", "en", "de"]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )
    ).repartition(3)
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_ratio"])
        for r in dsir_logratio(ds).take_all()
    }

    cs, ct = Counter(), Counter()
    for t, l in zip(texts, langs):
        for w in t.split():
            cs[w] += 1
            if l == "en":
                ct[w] += 1
    v, ns, nt = len(cs), sum(cs.values()), sum(ct.values())
    for d, t in enumerate(texts):
        toks = t.split()
        lp = sum(
            (math.log(ct[w] + 1) - math.log(nt + v))
            - (math.log(cs[w] + 1) - math.log(ns + v))
            for w in toks
        )
        assert got[d][0] == len(toks)
        assert abs(got[d][1] - round(lp, 6)) < 1e-9, d


def test_knn_pq_recall_and_exact_rerank():
    import numpy as np
    import ray.data as rd
    from record_matching_ray.stages.knn import (
        knn_bruteforce, knn_pq, load_query_matrix, train_pq_codebooks,
    )

    embs = rd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    ).materialize()
    Q, qids = load_query_matrix(embs, n_queries=5)
    exact = knn_bruteforce(embs, Q, qids, k=10)

    # generous config (16 subspaces x 64 codes, rerank 8): re-ranked
    # output must EQUAL brute force — same ids, same exact cosines
    B = train_pq_codebooks(embs, m_sub=16, n_codes=64, sample_n=512)
    assert B.shape == (16, 64, 4)
    full = knn_pq(embs, Q, qids, k=10, codebooks=B, rerank=8)
    assert full.equals(exact), "total-recall PQ config must match brute force"

    # lossy config (4 subspaces x 8 codes): recall degrades but stays
    # useful; scores are still EXACT cosines (re-rank contract)
    B2 = train_pq_codebooks(embs, m_sub=4, n_codes=8, sample_n=512)
    lossy = knn_pq(embs, Q, qids, k=10, codebooks=B2, rerank=4)
    ex = {(r["qid"], r["nid"]): r["cos_sim"] for r in exact.to_pylist()}
    ap = {(r["qid"], r["nid"]): r["cos_sim"] for r in lossy.to_pylist()}
    recall = len(set(ex) & set(ap)) / len(ex)
    assert recall >= 0.5, f"PQ recall@10 = {recall}"
    for key in set(ex) & set(ap):
        assert ex[key] == ap[key]  # exact re-ranked cosine, not ADC estimate
    # deterministic
    again = knn_pq(embs, Q, qids, k=10, codebooks=B2, rerank=4)
    assert lossy.equals(again)


def test_knn_ivf_pq_composite():
    import ray.data as rd
    from record_matching_ray.stages.knn import (
        knn_bruteforce, knn_ivf_pq, load_query_matrix,
    )

    embs = rd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    ).materialize()
    Q, qids = load_query_matrix(embs, n_queries=5)
    exact = knn_bruteforce(embs, Q, qids, k=10)
    # total-recall config: equal to brute force
    full = knn_ivf_pq(
        embs, Q, qids, k=10, n_centroids=16, n_probe=16,
        m_sub=16, n_codes=64, rerank=8,
    )
    assert full.equals(exact)
    # lossy pruning + lossy codes: useful recall, exact re-ranked scores
    lossy = knn_ivf_pq(
        embs, Q, qids, k=10, n_centroids=16, n_probe=8,
        m_sub=8, n_codes=16, rerank=4,
    )
    ex = {(r["qid"], r["nid"]): r["cos_sim"] for r in exact.to_pylist()}
    ap = {(r["qid"], r["nid"]): r["cos_sim"] for r in lossy.to_pylist()}
    recall = len(set(ex) & set(ap)) / len(ex)
    assert recall >= 0.4, f"IVF-PQ recall@10 = {recall}"
    for key in set(ex) & set(ap):
        assert ex[key] == ap[key]


def test_unicode_whitespace_tokenizes_like_re2_oracle(tmp_path, ray_session):
    """ADVICE r4: docs containing non-ASCII whitespace (U+00A0, U+2003)
    must tokenize identically in Python and in the RE2 '\\s+' oracle —
    Python's Unicode \\s would split on them, RE2's would not."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from record_matching_ray.stages.textstats import (
        DOC_TOKEN_ENTROPY_SQL,
        SOURCE_HAPAX_SQL,
        doc_token_entropy,
        source_hapax_ratio,
    )

    rows = [
        (1, "s1", "alpha beta alpha gamma"),
        (2, "s1", "x y x\ty \u00a0 y \u2003z"),
        (3, "s2", "plain ascii words only plain"),
        (4, "s2", ""),
    ]
    t = pa.table(
        {
            "doc_id": [r[0] for r in rows],
            "source": [r[1] for r in rows],
            "text": [r[2] for r in rows],
        }
    )
    path = tmp_path / "documents.parquet"
    pq.write_table(t, path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    docs = ray.data.read_parquet(str(path))

    def srt(df):
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    got = srt(doc_token_entropy(docs).to_pandas())
    want = srt(con.execute(DOC_TOKEN_ENTROPY_SQL).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got = srt(source_hapax_ratio(docs).to_pandas())
    want = srt(con.execute(SOURCE_HAPAX_SQL).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
