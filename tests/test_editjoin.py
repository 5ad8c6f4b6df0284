"""Edit-distance similarity join: FastSS candidates must be complete
(every true pair found), the verify exact (no false pairs)."""

import numpy as np
import ray.data as rd

from record_matching_ray.functions.strsim import levenshtein
from record_matching_ray.stages.editjoin import (
    deletion_signatures,
    edit_distance_join,
)


def brute(names, k):
    out = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = levenshtein(names[i], names[j])
            if d <= k:
                out.add((i, j, d))
    return out


NAMES = [
    "jane smith",        # 0
    "jane smyth",        # 1  sub (d=1 of 0)
    "jane smith jr",     # 2
    "jan smith",         # 3  del (d=1 of 0)
    "janet smith",       # 4  ins (d=1 of 0, d=2 of 3)
    "john smith",        # 5
    "jane smith",        # 6  exact dup of 0
    "müller",            # 7  non-ASCII
    "muller",            # 8  d=1 of 7 (substitution across BMP chars)
    "mueller",           # 9  d=1 of 8, d=2 of 7
    "",                  # 10 empty string
    "a",                 # 11 d=1 of empty
    "completely different entry",  # 12
]


def test_editjoin_matches_bruteforce_k1_k2():
    rows = [{"id": i, "name": s} for i, s in enumerate(NAMES)]
    ds = rd.from_items(rows).repartition(4)
    for k in (1, 2):
        got = {
            (r["left"], r["right"], r["dist"])
            for r in edit_distance_join(ds, "id", "name", k=k).take_all()
        }
        assert got == brute(NAMES, k), k


def test_editjoin_k0_is_exact_dup():
    rows = [{"id": i, "name": s} for i, s in enumerate(NAMES)]
    ds = rd.from_items(rows).repartition(3)
    got = {
        (r["left"], r["right"])
        for r in edit_distance_join(ds, "id", "name", k=0).take_all()
    }
    assert got == {(0, 6)}


def test_deletion_signatures_complete_random():
    """Property: any pair within lev<=k shares >=1 signature (FastSS
    completeness) on random short strings over a tiny alphabet (dense in
    edit space, so ties/dups/near-misses all occur)."""
    rng = np.random.default_rng(7)
    strs = [
        "".join(rng.choice(list("abc"), size=rng.integers(1, 6)))
        for _ in range(80)
    ]
    for k in (1, 2):
        rows, sigs = deletion_signatures(strs, k)
        per = {}
        for r, s in zip(rows, sigs):
            per.setdefault(int(r), set()).add(int(s))
        for i in range(len(strs)):
            for j in range(i + 1, len(strs)):
                if levenshtein(strs[i], strs[j]) <= k:
                    assert per[i] & per[j], (strs[i], strs[j], k)


def test_jw_window_join_vs_bruteforce():
    """SNM + JW verify vs a brute-force window reference (incl. the
    rank-window semantics and canonical id ordering)."""
    from record_matching_ray.functions.strsim import jaro_winkler
    from record_matching_ray.stages.editjoin import jw_window_join

    rows = [{"id": i, "name": s} for i, s in enumerate(NAMES) if s]
    ds = rd.from_items(rows).repartition(3)
    window, thr = 4, 0.8
    got = {
        (r["left"], r["right"], round(r["jw"], 9))
        for r in jw_window_join(ds, "id", "name", window, thr).take_all()
    }
    order = sorted(rows, key=lambda r: (r["name"], r["id"]))
    want = set()
    for i in range(len(order)):
        for d in range(1, window):
            if i + d < len(order):
                a, b = order[i], order[i + d]
                jw = jaro_winkler(a["name"], b["name"])
                if jw >= thr:
                    lo, hi = sorted((a["id"], b["id"]))
                    want.add((lo, hi, round(jw, 9)))
    assert got == want


def test_soft_tfidf_pairs_vs_bruteforce():
    """Soft-TFIDF (Cohen et al. 2003) under SNM candidates vs an
    in-process reference: set-semantics corpus idf, theta-gated best-JW
    token matches with (jw DESC, tok ASC) tie-break, canonical min-id
    direction."""
    import math

    from record_matching_ray.functions.strsim import jaro_winkler
    from record_matching_ray.stages.tfidf import soft_tfidf_pairs

    rows = [{"id": i, "name": s} for i, s in enumerate(NAMES) if s]
    ds = rd.from_items(rows).repartition(3)
    window, theta, thr = 4, 0.85, 0.2
    got = {
        (r["left"], r["right"], r["soft_tfidf"])
        for r in soft_tfidf_pairs(
            ds, "id", "name", window=window, theta=theta, threshold=thr
        ).take_all()
    }

    n = len(rows)
    df: dict[str, int] = {}
    for r in rows:
        for t in set(r["name"].lower().split()):
            df[t] = df.get(t, 0) + 1
    idf = {t: math.log(n / c) for t, c in df.items()}

    def vec(s):
        toks = sorted(set(s.lower().split()))
        w = np.array([idf[t] for t in toks])
        nrm = float(np.sqrt((w * w).sum()))
        return toks, (w / nrm if nrm > 0 else w)

    def soft(a, b):
        ta, va = vec(a)
        tb, vb = vec(b)
        sim = 0.0
        for i, wl in enumerate(ta):
            jws = [jaro_winkler(wl, wr) for wr in tb]
            j = int(np.argmax(jws))
            if jws[j] >= theta:
                sim += va[i] * vb[j] * jws[j]
        return round(sim, 6)

    order = sorted(rows, key=lambda r: (r["name"], r["id"]))
    want = set()
    for i in range(len(order)):
        for d in range(1, window):
            if i + d < len(order):
                a, b = order[i], order[i + d]
                lo, hi = sorted((a["id"], b["id"]))
                aa = a["name"] if a["id"] == lo else b["name"]
                bb = b["name"] if a["id"] == lo else a["name"]
                s = soft(aa, bb)
                if s >= thr:
                    want.add((lo, hi, s))
    assert got == want


def test_set_jaccard_join_exact_vs_bruteforce():
    """Prefix filtering must be COMPLETE (every true pair found) and the
    verify exact — against brute-force set Jaccard, across partition
    counts."""
    from record_matching_ray.stages.editjoin import set_jaccard_join

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(60):
        k = rng.randint(2, 9)
        toks = list(rng.choice(vocab, size=k, replace=True))
        texts.append(" ".join(toks))
    # planted exact + near duplicates
    texts[7] = texts[3]
    texts[12] = texts[3] + " extraword"
    t = 0.6

    def brute():
        sets = [set(s.lower().split()) for s in texts]
        out = set()
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                if not sets[i] or not sets[j]:
                    continue
                inter = len(sets[i] & sets[j])
                jac = inter / len(sets[i] | sets[j])
                if jac >= t:
                    out.add((i, j, round(jac, 6)))
        return out

    want = brute()
    assert want, "fixture should contain true pairs"
    for nparts in (1, 4):
        ds = rd.from_items(
            [{"id": i, "text": s} for i, s in enumerate(texts)]
        ).repartition(nparts)
        got = {
            (r["left"], r["right"], r["jaccard"])
            for r in set_jaccard_join(ds, "id", "text", threshold=t).take_all()
        }
        assert got == want, nparts
