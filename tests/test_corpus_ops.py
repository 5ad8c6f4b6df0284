"""Round-2 corpus-curation operators: repetition stats, PII scrub,
deterministic sampling, sessionization, hopping windows, distributed
quantiles, heavy hitters, sequence packing."""

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from record_matching_ray.stages import packing, quantiles, sampling, scrub, temporal, textstats


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)


# ---------------------------------------------------------------- repetition


def test_repetition_stats_known_values():
    out = {
        r["doc_id"]: r
        for r in textstats.run_repetition(
            _docs(["a a a a", "w x y z", "", "one"])
        ).take_all()
    }
    # all-same doc: top word 4/4, bigrams all "a a" -> dup frac 1 - 1/3
    r = out[0]
    assert r["n_words"] == 4
    assert r["top_word_ratio"] == 1.0
    assert r["dup_bigram_frac"] == round(1 - 1 / 3, 6)
    assert r["top_bigram_ratio"] == 1.0
    assert r["word_entropy"] == 0.0
    # all-distinct doc: no repetition, max entropy ln(4)
    r = out[1]
    assert r["top_word_ratio"] == 0.25
    assert r["dup_bigram_frac"] == 0.0
    assert r["top_bigram_ratio"] == round(1 / 3, 6)
    assert r["word_entropy"] == round(np.log(4), 6)
    # empty + single-token docs: zero ratios, no crash
    assert out[2]["n_words"] == 0 and out[2]["word_entropy"] == 0.0
    assert out[3]["n_words"] == 1 and out[3]["dup_bigram_frac"] == 0.0


def test_repetition_matches_counter_oracle():
    rng = np.random.RandomState(7)
    texts = [
        " ".join(rng.choice(list("abcdefg"), size=rng.randint(2, 30)))
        for _ in range(50)
    ]
    out = {r["doc_id"]: r for r in textstats.run_repetition(_docs(texts)).take_all()}
    for i, t in enumerate(texts):
        toks = t.split()
        c = Counter(toks)
        bigrams = Counter(zip(toks, toks[1:]))
        nb = len(toks) - 1
        assert out[i]["top_word_ratio"] == round(max(c.values()) / len(toks), 6)
        assert out[i]["dup_bigram_frac"] == round(1 - len(bigrams) / nb, 6)
        assert out[i]["top_bigram_ratio"] == round(max(bigrams.values()) / nb, 6)
        ent = -sum((v / len(toks)) * np.log(v / len(toks)) for v in c.values())
        assert out[i]["word_entropy"] == pytest.approx(round(ent, 6), abs=2e-6)


# ---------------------------------------------------------------- PII scrub


def test_scrub_counts_and_redaction():
    texts = [
        "contact bob@example.com or alice@test.org now",
        "server at 10.0.0.1 and phone 555-123-4567",
        "clean text with no pii at all",
    ]
    out = {r["doc_id"]: r for r in scrub.run_scrub(_docs(texts)).take_all()}
    assert out[0]["n_emails"] == 2 and out[0]["n_ips"] == 0
    assert out[1]["n_ips"] == 1 and out[1]["n_phones"] == 1
    assert out[2]["n_emails"] == out[2]["n_ips"] == out[2]["n_phones"] == 0
    # unredacted text hashes unchanged; redacted text hash differs
    assert out[2]["redacted_md5"] == hashlib.md5(texts[2].encode()).hexdigest()
    expect = "server at <IP> and phone <PHONE>"
    assert out[1]["redacted_md5"] == hashlib.md5(expect.encode()).hexdigest()


def test_redact_text_tokens():
    red = scrub.redact_text(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["mail x@y.io ip 1.2.3.4 tel 555-123-4567"]),
            }
        )
    )
    assert red.column("text").to_pylist() == ["mail <EMAIL> ip <IP> tel <PHONE>"]


# ---------------------------------------------------------------- sampling


def test_sample_by_hash_deterministic_and_content_keyed():
    texts = [f"document number {i} padding words" for i in range(400)]
    a = sorted(r["doc_id"] for r in sampling.sample_by_hash(_docs(texts), rate=0.2).take_all())
    b = sorted(
        r["doc_id"]
        for r in sampling.sample_by_hash(
            _docs(texts).repartition(7), rate=0.2
        ).take_all()
    )
    assert a == b  # partition-layout independent
    assert 0.1 * 400 < len(a) < 0.3 * 400  # near the target rate
    # selection keys off content: the python-side rule reproduces it
    thr = sampling.rate_to_hex_threshold(0.2)
    expect = sorted(
        i for i, t in enumerate(texts)
        if hashlib.md5(t.encode()).hexdigest()[:8] < thr
    )
    assert a == expect


def test_stratified_sample_exact_n_per_stratum():
    texts = [f"text {i}" for i in range(90)]
    langs = [["en", "de", "fr"][i % 3] for i in range(90)]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(90), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )
    ).repartition(5)
    out = sampling.stratified_sample(ds, "lang", 4).take_all()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "de", "fr"}
    for lang, rows in by_lang.items():
        assert sorted(r["sample_rank"] for r in rows) == [1, 2, 3, 4]
        # the chosen rows are the n smallest md5s of that stratum
        want = sorted(
            (hashlib.md5(texts[i].encode()).hexdigest(), i)
            for i in range(90)
            if langs[i] == lang
        )[:4]
        assert sorted(r["doc_id"] for r in rows) == sorted(i for _, i in want)


# ---------------------------------------------------------------- sessions


def test_sessionize_gap_semantics():
    base = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60_000_000, "us")  # one minute
    rows = [
        (1, base, 1.0),
        (1, base + 10 * m, 2.0),       # same session (10 min gap)
        (1, base + 50 * m, 3.0),       # new session (40 min gap)
        (2, base, 5.0),                # other user, own session
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
    ).repartition(2)
    out = sorted(
        temporal.sessionize(ds, gap_minutes=30).take_all(),
        key=lambda r: (r["user_id"], r["session_start"]),
    )
    assert len(out) == 3
    s1, s2, s3 = out
    assert s1["user_id"] == 1 and s1["n_events"] == 2 and s1["sum_value_c"] == 300
    assert s2["user_id"] == 1 and s2["n_events"] == 1 and s2["sum_value_c"] == 300
    assert s3["user_id"] == 2 and s3["n_events"] == 1
    assert s1["session_end"] - s1["session_start"] == np.timedelta64(10, "m")


def test_hopping_window_each_event_in_two_windows():
    ts = [np.datetime64("2024-01-01T05:30:00", "us")]
    ds = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(["click"], pa.string()),
                "value": pa.array([1.5], pa.float64()),
            }
        )
    )
    out = sorted(
        temporal.hopping_window(ds, size_hours=2, hop_hours=1).take_all(),
        key=lambda r: r["window_start"],
    )
    assert len(out) == 2
    assert [np.datetime64(r["window_start"], "us") for r in out] == [
        np.datetime64("2024-01-01T04:00:00", "us"),
        np.datetime64("2024-01-01T05:00:00", "us"),
    ]
    assert all(r["cnt"] == 1 and r["sum_value_c"] == 150 for r in out)


# ---------------------------------------------------------------- quantiles


def test_group_quantiles_match_numpy_lower():
    rng = np.random.RandomState(11)
    groups = rng.choice(["a", "b", "c"], size=500)
    vals = rng.randint(0, 1000, size=500).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"g": pa.array(groups), "v": pa.array(vals, pa.int64())})
    ).repartition(6)
    out = quantiles.group_quantiles(ds, "g", "v", qs=(0.25, 0.5, 0.9))
    got = {(r["g"], r["q"]): r["value"] for r in out.take_all()}
    for g in "abc":
        sv = np.sort(vals[groups == g])
        for q in (0.25, 0.5, 0.9):
            assert got[(g, q)] == sv[int(np.floor((len(sv) - 1) * q))]


def test_approx_quantiles_within_rank_tolerance():
    rng = np.random.RandomState(5)
    vals = rng.lognormal(3, 1, size=20_000)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())})).repartition(8)
    est = quantiles.approx_quantiles(ds, "v", qs=(0.5, 0.9))
    sv = np.sort(vals)
    for q in (0.5, 0.9):
        lo = sv[int(len(sv) * max(q - 0.02, 0))]
        hi = sv[min(int(len(sv) * (q + 0.02)), len(sv) - 1)]
        assert lo <= est[q] <= hi


# ---------------------------------------------------------------- heavy hitters


def test_top_tokens_exact_vs_counter():
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(30)]
    p = np.arange(30, 0, -1.0)
    p /= p.sum()
    texts = [
        " ".join(rng.choice(vocab, size=20, p=p)) for _ in range(100)
    ]
    out = textstats.top_tokens(_docs(texts), k=10).take_all()
    c = Counter(tok for t in texts for tok in t.split())
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["token"], r["cnt"]) for r in out] == want
    assert [r["rank"] for r in out] == list(range(1, 11))


def test_misra_gries_guarantee():
    texts = ["hot " * 50 + "warm " * 20 + " ".join(f"u{i}" for i in range(40))] * 20
    mg = textstats.misra_gries_topk(_docs(texts), capacity=16)
    n = sum(len(t.split()) for t in texts)
    true = Counter(tok for t in texts for tok in t.split())
    # every token with true freq > N/capacity must survive, undercounted
    # by at most N/capacity
    for tok, cnt in true.items():
        if cnt > n / 16:
            assert tok in mg
            assert cnt - n / 16 <= mg[tok] <= cnt


# ---------------------------------------------------------------- profiles


def test_cluster_profiles_mode_and_ties():
    from record_matching_ray.stages.canonicalize import cluster_profiles

    assign = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
                "cluster_id": pa.array([0, 0, 0, 3, 3, 5], pa.int64()),
            }
        )
    ).repartition(2)
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
                "lang": pa.array(["en", "de", "en", "fr", "de", "zh"], pa.string()),
            }
        )
    ).repartition(3)
    out = {r["cluster_id"]: r for r in cluster_profiles(assign, docs).take_all()}
    assert out[0]["size"] == 3 and out[0]["top_cat"] == "en" and out[0]["n_cats"] == 2
    # tie between fr and de (1 each) -> lexicographic min "de"
    assert out[3]["size"] == 2 and out[3]["top_cat"] == "de" and out[3]["n_cats"] == 2
    assert out[5]["size"] == 1 and out[5]["top_cat"] == "zh"


# ---------------------------------------------------------------- packing


def test_pack_sequences_matches_global_prefix_sum():
    rng = np.random.RandomState(9)
    texts = [" ".join(["tok"] * rng.randint(1, 60)) for _ in range(200)]
    ds = _docs(texts)
    out = {r["doc_id"]: r for r in packing.pack_sequences(
        ds, cap=64, shard_size=37
    ).take_all()}
    assert len(out) == 200
    cum = 0
    for i, t in enumerate(texts):
        n = len(t.split())
        assert out[i]["n_tokens"] == n
        assert out[i]["first_seq"] == cum // 64
        assert out[i]["last_seq"] == (cum + n - 1) // 64
        cum += n
    # sequences cover the stream with no gaps
    lasts = [out[i]["last_seq"] for i in range(200)]
    firsts = [out[i]["first_seq"] for i in range(199 + 1)]
    for a, b in zip(lasts, firsts[1:]):
        assert b in (a, a + 1)


# ------------------------------------------------------------ decontamination


def test_decontaminate_flags_ngram_overlap():
    from record_matching_ray.stages.decontaminate import decontaminate

    bench = rd.from_arrow(
        pa.table(
            {
                "text": pa.array(
                    ["the quick brown fox jumps over the lazy dog"], pa.string()
                )
            }
        )
    )
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        # contains "quick brown fox jumps" (n=4, case-insensitive)
                        "I saw the QUICK Brown fox jumps right there",
                        # same words, different order -> clean
                        "fox brown quick jumps dog lazy the over",
                        # too short for any 4-gram
                        "quick brown fox",
                        # two hit positions: "the lazy dog" needs 4-grams --
                        # "over the lazy dog" and "jumps over the lazy"
                        "she ran jumps over the lazy dog home",
                    ],
                    pa.string(),
                ),
            }
        )
    ).repartition(2)
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=4).take_all()}
    assert out[0]["contaminated"] and out[0]["n_hits"] >= 1
    assert not out[1]["contaminated"] and out[1]["n_hits"] == 0
    assert not out[2]["contaminated"]  # < n tokens: no strict n-grams
    assert out[3]["contaminated"] and out[3]["n_hits"] == 2


def test_decontaminate_empty_benchmark():
    from record_matching_ray.stages.decontaminate import decontaminate

    bench = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["some text here okay"], pa.string()),
            }
        )
    )
    rows = decontaminate(docs, bench, n=2).take_all()
    assert rows[0]["n_hits"] == 0 and not rows[0]["contaminated"]


# ---------------------------------------------------------------- tf-idf


def test_tfidf_pair_cosine_matches_numpy_reference():
    import math

    from record_matching_ray.stages.tfidf import tfidf_pair_cosine

    texts = [
        "apple banana apple cherry",
        "apple banana date date",
        "cherry cherry cherry kiwi",
        "unrelated words entirely here",
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)
    pairs = rd.from_arrow(
        pa.table(
            {
                "left": pa.array([0, 0, 0], pa.int64()),
                "right": pa.array([1, 2, 3], pa.int64()),
            }
        )
    )
    out = {
        (r["left"], r["right"]): r["tfidf_cos"]
        for r in tfidf_pair_cosine(pairs, docs).take_all()
    }

    # driver-side reference: smoothed idf ln((N+1)/(df+1)), tf = raw count
    n = 4
    df = {}
    for t in texts:
        for tok in set(t.split()):
            df[tok] = df.get(tok, 0) + 1

    def vec(t):
        tf = {}
        for tok in t.split():
            tf[tok] = tf.get(tok, 0) + 1
        return {k: v * math.log((n + 1) / (df[k] + 1)) for k, v in tf.items()}

    def cos(a, b):
        va, vb = vec(a), vec(b)
        dot = sum(va[k] * vb.get(k, 0.0) for k in va)
        na = math.sqrt(sum(x * x for x in va.values()))
        nb = math.sqrt(sum(x * x for x in vb.values()))
        return round(dot / (na * nb), 6) if na and nb else 0.0

    assert abs(out[(0, 1)] - cos(texts[0], texts[1])) < 2e-6
    assert abs(out[(0, 2)] - cos(texts[0], texts[2])) < 2e-6
    assert out[(0, 3)] == 0.0  # no shared tokens


def test_tfidf_empty_pairs():
    from record_matching_ray.stages.tfidf import tfidf_pair_cosine

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["hello world"], pa.string()),
            }
        )
    )
    pairs = rd.from_arrow(
        pa.table(
            {"left": pa.array([], pa.int64()), "right": pa.array([], pa.int64())}
        )
    )
    assert tfidf_pair_cosine(pairs, docs).count() == 0


# ------------------------------------------------------------- string_agg


def test_customer_names_by_nation_ordered(tmp_path):
    import os

    import pyarrow.parquet as pq

    from record_matching_ray.pipelines.analytics import customer_names_by_nation

    t = pa.table(
        {
            "c_custkey": pa.array([5, 1, 3, 2, 4], pa.int64()),
            "c_nationkey": pa.array([0, 0, 1, 0, 1], pa.int64()),
            "c_name": pa.array(["e", "a", "c", "b", "d"], pa.string()),
        }
    )
    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(t, str(d / "customer.parquet"))
    out = {
        r["c_nationkey"]: r for r in customer_names_by_nation(str(d)).take_all()
    }
    # custkey order within nation, not input order
    assert out[0]["names"] == "a,b,e" and out[0]["n_customers"] == 3
    assert out[1]["names"] == "c,d" and out[1]["n_customers"] == 2


def test_weighted_sample_topk_exact_and_partition_invariant():
    """A-ES weighted top-k equals a local brute-force computation of the
    same keys, and is invariant to how the input is partitioned."""
    from record_matching_ray.functions.hashing import md5_lower64

    rng = np.random.default_rng(5)
    texts = [f"doc body {i} {rng.integers(1 << 30)}" for i in range(400)]
    weights = rng.integers(1, 200, size=400)
    rows = [
        {"doc_id": i, "text": t, "w": int(weights[i])}
        for i, t in enumerate(texts)
    ]
    u = np.array(
        [md5_lower64(t) for t in texts], dtype=np.uint64
    ).astype(np.float64) / 18446744073709551616.0
    wkey = np.round(u ** (1.0 / weights.astype(np.float64)), 9)
    order = np.lexsort((np.arange(400), -wkey))[:50]
    want = [(int(i), float(wkey[i])) for i in order]

    for parts in (1, 7):
        ds = rd.from_items(rows).repartition(parts)
        got = [
            (r["doc_id"], r["wkey"])
            for r in sampling.weighted_sample_topk(
                ds, weight_col="w", k=50, hash_col="text"
            ).take_all()
        ]
        assert got == want, parts


def test_approx_distinct_per_group_bound():
    """Grouped HLL: per-group estimates land within 3 RSE of truth, and
    register merging is partition-independent."""
    rng = np.random.default_rng(9)
    rows = []
    truth = {"a": 700, "b": 150, "c": 1}
    for g, n in truth.items():
        vals = [f"{g}-val-{i}" for i in range(n)]
        for _ in range(3):  # duplicates must not inflate the estimate
            for v in vals:
                rows.append({"g": g, "v": v})
    rng.shuffle(rows)
    for parts in (2, 9):
        ds = rd.from_items(rows).repartition(parts)
        out = {
            r["g"]: (r["est"], r["rse"])
            for r in textstats.approx_distinct_per_group(
                ds, "g", "v", precision_bits=10
            ).take_all()
        }
        assert set(out) == set(truth)
        for g, n in truth.items():
            est, rse = out[g]
            assert abs(est - n) <= max(3 * rse * n, 2), (g, est, n)


def test_event_value_median_interpolation(tmp_path):
    """Even-count groups interpolate (percentile_cont semantics)."""
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_type": pa.array(["a"] * 4 + ["b"] * 3, pa.string()),
            "value": pa.array([4.0, 1.0, 3.0, 2.0, 10.0, 30.0, 20.0]),
            # unused cols so the reader projection matters
            "event_id": pa.array(range(7), pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    from record_matching_ray.pipelines.analytics import event_value_median

    out = {r["event_type"]: (r["median_value"], r["n"])
           for r in event_value_median(str(tmp_path)).take_all()}
    assert out["a"] == (2.5, 4)  # (2+3)/2
    assert out["b"] == (20.0, 3)


# ---------------------------------------------------------------- chunking


def test_chunk_documents_overlap_and_tail():
    texts = ["a b c d e f g", "x y", ""]
    rows = packing.chunk_documents(
        _docs(texts), chunk_size=4, overlap=2
    ).take_all()
    got = {(r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"]) for r in rows}
    # step = 2: starts 0,2,4,6 for the 7-token doc
    assert got[(0, 0)] == (4, "a b c d")
    assert got[(0, 1)] == (4, "c d e f")
    assert got[(0, 2)] == (3, "e f g")
    assert got[(0, 3)] == (1, "g")
    assert got[(1, 0)] == (2, "x y")
    # empty doc emits nothing
    assert all(d != 2 for d, _ in got)
    assert len(got) == 5


def test_chunk_documents_rejects_bad_overlap():
    with pytest.raises(ValueError):
        packing.chunk_documents(_docs(["a"]), chunk_size=4, overlap=4)


# ---------------------------------------------------------------- bigram LM


def test_bigram_logprob_vs_bruteforce():
    import math

    texts = ["a b a b c", "a b", "c", "", "b c a b"]
    rows = textstats.bigram_logprob(_docs(texts)).take_all()
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"]) for r in rows}

    bigs, lefts = Counter(), Counter()
    for t in texts:
        toks = t.lower().split()
        for i in range(len(toks) - 1):
            bigs[(toks[i], toks[i + 1])] += 1
            lefts[toks[i]] += 1
    for d, t in enumerate(texts):
        toks = t.lower().split()
        nb = max(len(toks) - 1, 0)
        assert got[d][0] == nb
        if nb == 0:
            assert got[d][1] == 0.0
            continue
        lp = sum(
            math.log(bigs[(toks[i], toks[i + 1])]) - math.log(lefts[toks[i]])
            for i in range(nb)
        )
        assert abs(got[d][1] - round(lp / nb, 6)) < 1e-9


def test_event_value_mad_vs_numpy(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(4)
    types = np.array(["a", "b"])[rng.integers(0, 2, 400)]
    vals = rng.normal(50, 5, 400)
    vals[::41] += 100  # inject outliers
    pq.write_table(
        pa.table({"event_type": pa.array(types), "value": pa.array(vals)}),
        str(tmp_path / "events.parquet"),
    )
    from record_matching_ray.pipelines.analytics import event_value_mad

    got = event_value_mad(str(tmp_path)).to_pandas().set_index("event_type")
    for ty in ("a", "b"):
        v = np.sort(vals[types == ty])
        n = len(v)
        med = v[n // 2] if n % 2 else (v[n // 2 - 1] + v[n // 2]) / 2
        d = np.sort(np.abs(v - med))
        mad = d[n // 2] if n % 2 else (d[n // 2 - 1] + d[n // 2]) / 2
        row = got.loc[ty]
        assert row["median_value"] == round(float(med), 6)
        assert row["mad"] == round(float(mad), 6)
        assert row["n"] == n
        assert row["n_outliers"] == int((np.abs(v - med) > 3 * 1.4826 * mad).sum())
        assert row["n_outliers"] > 0


def test_orders_price_moments_vs_numpy(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(9)
    pr = np.array(["1-URGENT", "2-HIGH"])[rng.integers(0, 2, 600)]
    price = rng.lognormal(10, 0.5, 600)  # skewed, ~e4-magnitude
    pq.write_table(
        pa.table(
            {"o_orderpriority": pa.array(pr), "o_totalprice": pa.array(price)}
        ),
        str(tmp_path / "orders.parquet"),
    )
    from record_matching_ray.pipelines.analytics import orders_price_moments

    got = orders_price_moments(str(tmp_path)).to_pandas().set_index("o_orderpriority")
    for p in ("1-URGENT", "2-HIGH"):
        x = price[pr == p]
        n = len(x)
        mu = x.mean()
        m2 = ((x - mu) ** 2).sum() / n
        m3 = ((x - mu) ** 3).sum() / n
        m4 = ((x - mu) ** 4).sum() / n
        G1 = (m3 / m2**1.5) * np.sqrt(n * (n - 1)) / (n - 2)
        G2 = ((n + 1) * (m4 / m2**2 - 3) + 6) * (n - 1) / ((n - 2) * (n - 3))
        row = got.loc[p]
        assert abs(row["skew"] - round(float(G1), 6)) <= 1e-6
        assert abs(row["kurt"] - round(float(G2), 6)) <= 1e-6
        assert row["n"] == n
    assert (got["skew"] > 0.5).all()  # lognormal is right-skewed


def test_orders_checksum_order_independent(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(i, "OF"[i % 2]) for i in range(300)]
    t1 = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[1] for r in rows]),
        }
    )
    rev = rows[::-1]
    t2 = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rev], pa.int64()),
            "o_orderstatus": pa.array([r[1] for r in rev]),
        }
    )
    from record_matching_ray.pipelines.analytics import orders_checksum

    import os

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(d1), os.makedirs(d2)
    pq.write_table(t1, f"{d1}/orders.parquet")
    pq.write_table(t2, f"{d2}/orders.parquet")
    c1 = orders_checksum(d1)
    c2 = orders_checksum(d2)
    assert c1["checksum"][0] == c2["checksum"][0]
    assert c1["n_rows"][0] == 300
    # a single-row mutation changes the checksum
    t3 = t1.set_column(1, "o_orderstatus", pa.array(
        ["X" if i == 7 else r[1] for i, r in enumerate(rows)]))
    d3 = str(tmp_path / "c")
    os.makedirs(d3)
    pq.write_table(t3, f"{d3}/orders.parquet")
    assert orders_checksum(d3)["checksum"][0] != c1["checksum"][0]


def test_events_decayed_counts_vs_numpy(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(2)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + (rng.integers(0, 1000, 500) * 3_600_000_000).astype(
        "timedelta64[us]"
    )
    types = np.array(["a", "b", "c"])[rng.integers(0, 3, 500)]
    pq.write_table(
        pa.table({"event_type": pa.array(types), "ts": pa.array(ts)}),
        str(tmp_path / "events.parquet"),
    )
    from record_matching_ray.pipelines.analytics import events_decayed_counts

    got = (
        events_decayed_counts(str(tmp_path), tau_hours=72.0)
        .to_pandas()
        .set_index("event_type")
    )
    t_max = ts.max()
    for ty in "abc":
        age_h = (t_max - ts[types == ty]).astype("timedelta64[us]").astype(
            np.int64
        ) / 3.6e9
        exp = np.exp(-age_h / 72.0).sum()
        assert abs(got.loc[ty, "decayed_count"] - round(float(exp), 6)) <= 2e-6
        assert got.loc[ty, "n"] == (types == ty).sum()


def test_rendezvous_shard_consistency():
    """The consistent-hashing property: growing S -> S+1 relocates only
    the keys won by the NEW shard (~1/(S+1)); every other key keeps its
    shard. Balance stays near-uniform."""
    import numpy as np

    from record_matching_ray.stages.sharding import rendezvous_shard

    keys = list(range(5000))
    s8 = rendezvous_shard(keys, 8)
    s9 = rendezvous_shard(keys, 9)
    moved = s8 != s9
    # every moved key moved TO the new shard (id 8), never between old ones
    assert (s9[moved] == 8).all()
    frac = moved.mean()
    assert 0.06 <= frac <= 0.17, frac  # ~1/9 expected
    # near-uniform balance at S=8
    counts = np.bincount(s8, minlength=8)
    assert counts.min() > 0.7 * len(keys) / 8
    assert counts.max() < 1.3 * len(keys) / 8
    # deterministic
    assert (rendezvous_shard(keys, 8) == s8).all()


def test_skyline_2d_vs_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.stages.skyline import skyline_2d

    rng = np.random.default_rng(12)
    x = rng.integers(0, 50, 400).astype(np.float64)
    y = rng.integers(0, 50, 400).astype(np.float64)
    # plant exact duplicates of a likely-frontier point
    x[:3] = 0.0
    y[:3] = 49.0  # maximize_y: (0, 49) should be on the frontier twice+
    ds = rd.from_arrow(
        pa.table({"a": pa.array(x), "b": pa.array(y)})
    ).repartition(7)
    got = skyline_2d(ds, "a", "b", maximize_y=True)
    gx = got.column("a").to_numpy(zero_copy_only=False)
    gy = got.column("b").to_numpy(zero_copy_only=False)

    # brute-force dominance check: minimize a, maximize b
    def dominated(i):
        return (
            (x <= x[i]) & (y >= y[i]) & ((x < x[i]) | (y > y[i]))
        ).any()

    expect = sorted(
        (x[i], y[i]) for i in range(len(x)) if not dominated(i)
    )
    assert sorted(zip(gx, gy)) == expect
    # all planted duplicates of the frontier point survive (dominance is
    # strict-in-one: identical points never dominate each other)
    assert sum(1 for p in zip(gx, gy) if p == (0.0, 49.0)) >= 3


def test_lineitem_price_regression_vs_numpy(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(21)
    st = np.array(["O", "F"])[rng.integers(0, 2, 500)]
    q = rng.integers(1, 50, 500).astype(np.float64)
    price = 900.0 * q + rng.normal(0, 500, 500)
    pq.write_table(
        pa.table(
            {
                "l_linestatus": pa.array(st),
                "l_quantity": pa.array(q),
                "l_extendedprice": pa.array(price),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    from record_matching_ray.pipelines.analytics import lineitem_price_regression

    got = (
        lineitem_price_regression(str(tmp_path))
        .to_pandas()
        .set_index("l_linestatus")
    )
    for s in ("O", "F"):
        x, y = q[st == s], price[st == s]
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        row = got.loc[s]
        assert abs(row["slope"] - slope) < 1e-4
        assert abs(row["intercept"] - intercept) < 1e-2
        assert abs(row["r2"] - r * r) < 1e-6
        assert row["n"] == len(x)
        assert 850 < row["slope"] < 950  # recovers the planted coefficient


def test_orders_kanonymity_counts(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    # priorities x months: one group of 2 (violates k=5), one of 7
    pr = ["A"] * 2 + ["B"] * 7
    dates = np.array(
        ["2024-01-15"] * 2 + ["2024-02-10"] * 7, dtype="datetime64[us]"
    )
    pq.write_table(
        pa.table(
            {
                "o_orderpriority": pa.array(pr),
                "o_orderdate": pa.array(dates, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from record_matching_ray.pipelines.analytics import orders_kanonymity

    row = orders_kanonymity(str(tmp_path), k=5).to_pandas().iloc[0]
    assert row["n_groups"] == 2
    assert row["n_violating"] == 1
    assert row["n_rows_at_risk"] == 2
    assert row["min_group_size"] == 2


def test_lineitem_fk_check_detects_orphans(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"l_orderkey": pa.array([1, 1, 2, 3, 99], pa.int64())}),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, 2, 3, 4], pa.int64())}),
        str(tmp_path / "orders.parquet"),
    )
    from record_matching_ray.pipelines.analytics import lineitem_fk_check

    row = lineitem_fk_check(str(tmp_path)).iloc[0]
    assert row["n_fact_keys"] == 4      # distinct: 1,2,3,99
    assert row["n_dim_keys"] == 4
    assert row["n_orphan_keys"] == 1    # 99
