"""Skip-gram PMI co-occurrence (stages/cooccurrence.py) vs a Counter
oracle implementing the same spec."""

import math
from collections import Counter

import pyarrow as pa
import pytest
import ray.data as rd

from record_matching_ray.stages.cooccurrence import cooccurrence_pmi


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)


def _oracle(texts, window, min_count):
    pair = Counter()
    uni = Counter()
    for t in texts:
        toks = t.strip().lower().split()
        uni.update(toks)
        for i in range(len(toks)):
            for j in range(i + 1, min(i + window, len(toks) - 1) + 1):
                x, y = sorted((toks[i], toks[j]))
                pair[(x, y)] += 1
    n_pair = sum(pair.values())
    n_tok = sum(uni.values())
    out = {}
    for (x, y), c in pair.items():
        if c < min_count:
            continue
        pmi = math.log((c / n_pair) / ((uni[x] / n_tok) * (uni[y] / n_tok)))
        out[(x, y)] = (c, pmi)
    return out


@pytest.mark.parametrize("window,min_count", [(2, 2), (3, 1)])
def test_pmi_matches_bruteforce(window, min_count):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "cat and dog and cat",
        "on the mat the cat sat",
    ]
    res = {
        (r["tok_x"], r["tok_y"]): (r["pair_count"], r["pmi"])
        for r in cooccurrence_pmi(
            _docs(texts), window=window, min_count=min_count
        ).take_all()
    }
    exp = _oracle(texts, window, min_count)
    assert set(res) == set(exp)
    for k, (c, pmi) in exp.items():
        assert res[k][0] == c, k
        # engine rounds pmi to 6 decimals (oracle-parity convention)
        assert abs(res[k][1] - round(pmi, 6)) < 1e-9, k


def test_pmi_same_token_pair_counted():
    # "x x" within window: pair (x, x) exists and uses c_x^2 in the denominator
    texts = ["x x y", "x y x"]
    res = {
        (r["tok_x"], r["tok_y"]): r["pair_count"]
        for r in cooccurrence_pmi(_docs(texts), window=2, min_count=1).take_all()
    }
    exp = _oracle(texts, 2, 1)
    assert set(res) == set(exp)
    assert ("x", "x") in res and res[("x", "x")] == 2


def test_pmi_min_count_filters():
    texts = ["a b", "a b", "c d"]
    res = cooccurrence_pmi(_docs(texts), window=1, min_count=2).take_all()
    assert {(r["tok_x"], r["tok_y"]) for r in res} == {("a", "b")}
