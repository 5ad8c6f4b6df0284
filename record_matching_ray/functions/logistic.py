"""Driver-side numpy logistic regression + metrics (no sklearn/scipy here).

Reference analogs: sklearn LogisticRegression(liblinear) on ordered distance
vectors (record_matching/main.py:444-486) and the manual gradient-descent
trainer (claude_poc/entity-resolution_v4.py:723-984). Training matrices are
small by design (labeled pairs only), so this runs on the driver; the
learned weights are broadcast to the scorer actor pool via ray.put.
"""

from __future__ import annotations

import numpy as np


def expit(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z, dtype=np.float64)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def fit_logistic(
    X: np.ndarray,
    y: np.ndarray,
    l2: float = 1e-3,
    lr: float = 0.5,
    iters: int = 2000,
    seed: int = 23,
) -> tuple[float, np.ndarray]:
    """Full-batch gradient descent with L2 (not on intercept).

    Returns (intercept, weights). Deterministic (fixed init, fixed order) —
    mirrors the reference's random_state=23 (main.py:468).
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    # standardize for conditioning; fold scaling back into weights at the end
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        p = expit(Xs @ w + b)
        g = p - y
        gw = Xs.T @ g / n + l2 * w
        gb = g.mean()
        w -= lr * gw
        b -= lr * gb
    w_orig = w / sd
    b_orig = b - float(mu @ w_orig)
    return b_orig, w_orig


def predict_proba(X: np.ndarray, intercept: float, weights: np.ndarray) -> np.ndarray:
    return expit(np.asarray(X, dtype=np.float64) @ np.asarray(weights) + intercept)


def roc_auc(y_true: np.ndarray, scores: np.ndarray) -> float:
    """Rank-based AUC (Mann-Whitney), ties handled by average rank."""
    y = np.asarray(y_true, dtype=bool)
    s = np.asarray(scores, dtype=np.float64)
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=np.float64)
    sorted_s = s[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return float((ranks[y].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def adjusted_rand_index(labels_a: np.ndarray, labels_b: np.ndarray) -> float:
    """ARI from two label arrays aligned by position (reference:
    sklearn.metrics.adjusted_rand_score vs CID, main.py:715-728)."""
    a = np.asarray(labels_a)
    b = np.asarray(labels_b)
    assert len(a) == len(b)
    _, ai = np.unique(a, return_inverse=True)
    _, bi = np.unique(b, return_inverse=True)
    n = len(a)
    nc = ai.max() + 1 if n else 0
    nk = bi.max() + 1 if n else 0
    cont = np.zeros((nc, nk), dtype=np.int64)
    np.add.at(cont, (ai, bi), 1)

    def comb2(x):
        return x * (x - 1) / 2.0

    sum_ij = comb2(cont.astype(np.float64)).sum()
    sum_a = comb2(cont.sum(axis=1).astype(np.float64)).sum()
    sum_b = comb2(cont.sum(axis=0).astype(np.float64)).sum()
    total = comb2(float(n))
    if total == 0:
        return 1.0
    expected = sum_a * sum_b / total
    max_index = (sum_a + sum_b) / 2.0
    if max_index == expected:
        return 1.0
    return float((sum_ij - expected) / (max_index - expected))
