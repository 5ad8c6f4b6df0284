"""Intra-corpus duplicated n-gram rate (stages/dupspans.py) vs a
brute-force Counter oracle."""

from collections import Counter

import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.dupspans import dup_ngram_rate


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)


def _oracle(texts, n):
    """Per-doc (total, dup) over string n-grams, df counted on distinct docs."""
    doc_grams = []
    df = Counter()
    for t in texts:
        toks = t.strip().lower().split()
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        doc_grams.append(Counter(grams))
        for g in set(grams):
            df[g] += 1
    out = {}
    for i, cnt in enumerate(doc_grams):
        total = sum(cnt.values())
        if total == 0:
            continue
        dup = sum(m for g, m in cnt.items() if df[g] >= 2)
        out[i] = (total, dup)
    return out


def test_dup_ngram_rate_matches_bruteforce():
    texts = [
        "a b c d e f g h i j",          # shares the 3-gram stream with doc 1
        "a b c d e x y z w q",          # prefix overlap with doc 0
        "p q r s t u v w aa bb",        # unique
        "a b c d e f g h i j",          # exact duplicate of doc 0
        "short doc",                     # < n tokens -> absent from output
    ]
    n = 3
    res = {
        r["doc_id"]: (r["n_grams"], r["dup_grams"], r["dup_frac"])
        for r in dup_ngram_rate(_docs(texts), n=n).take_all()
    }
    exp = _oracle(texts, n)
    assert set(res) == set(exp)
    for i, (total, dup) in exp.items():
        rt, rd_, rf = res[i]
        assert (rt, rd_) == (total, dup), f"doc {i}"
        assert abs(rf - dup / total) < 1e-12
    # doc 4 has < 3 tokens: no row
    assert 4 not in res
    # exact duplicates are fully duplicated spans
    assert res[0][2] == 1.0 and res[3][2] == 1.0


def test_dup_ngram_rate_multiplicity_counted():
    # "x y z" occurs twice in doc 0 (multiplicity 2) and once in doc 1;
    # every occurrence counts toward dup_grams.
    texts = ["x y z x y z", "x y z only here", "nothing shared at all"]
    res = {
        r["doc_id"]: r for r in dup_ngram_rate(_docs(texts), n=3).take_all()
    }
    exp = _oracle(texts, 3)
    for i, (total, dup) in exp.items():
        assert res[i]["n_grams"] == total
        assert res[i]["dup_grams"] == dup
    assert res[0]["dup_grams"] >= 2  # both occurrences of the shared gram


def test_dup_ngram_rate_all_unique_corpus():
    texts = ["aa bb cc dd ee", "ff gg hh ii jj", "kk ll mm nn oo"]
    rows = dup_ngram_rate(_docs(texts), n=4).take_all()
    assert len(rows) == 3
    assert all(r["dup_grams"] == 0 and r["dup_frac"] == 0.0 for r in rows)


def test_dedup_spans_vs_bruteforce():
    """Span removal: tokens covered by any n-gram shared across >=2 docs
    are dropped; short docs pass through normalized; full coverage
    empties the text."""
    import numpy as np
    import ray.data as rd

    from record_matching_ray.stages.dupspans import dedup_spans

    boiler = "all rights reserved copyright two thousand twenty four inc"
    docs = [
        {"doc_id": 0, "text": f"Unique alpha words here {boiler} tail zero"},
        {"doc_id": 1, "text": f"Other beta stuff {boiler} trailing one"},
        {"doc_id": 2, "text": "Totally original content with no duplication at all whatsoever"},
        {"doc_id": 3, "text": "short doc"},
        {"doc_id": 4, "text": boiler},  # fully covered -> empty
        {"doc_id": 5, "text": boiler},
    ]
    n = 4
    out = {
        r["doc_id"]: r
        for r in dedup_spans(
            rd.from_items(docs).repartition(3), n=n, num_partitions=4
        ).take_all()
    }
    assert set(out) == set(range(6))

    # brute-force reference
    toks = {d["doc_id"]: d["text"].strip().lower().split() for d in docs}
    from collections import defaultdict

    owners = defaultdict(set)
    for i, ts in toks.items():
        for j in range(len(ts) - n + 1):
            owners[tuple(ts[j : j + n])].add(i)
    for i, ts in toks.items():
        covered = np.zeros(len(ts), dtype=bool)
        for j in range(len(ts) - n + 1):
            if len(owners[tuple(ts[j : j + n])]) >= 2:
                covered[j : j + n] = True
        want = " ".join(t for t, c in zip(ts, covered) if not c)
        assert out[i]["clean_text"] == want, i
        assert out[i]["n_tokens"] == len(ts)
        assert out[i]["n_removed"] == int(covered.sum())
    assert out[4]["clean_text"] == "" and out[5]["clean_text"] == ""
    assert out[3]["clean_text"] == "short doc"
