"""Fellegi–Sunter probabilistic record linkage: sorted-neighborhood
blocking + unsupervised EM estimation of per-field m/u probabilities.

The reference learns pairwise weights SUPERVISED (logistic over labeled
pairs, record_matching/main.py train_weights); production linkage usually
has no labels, and the standard unsupervised answer (Fellegi & Sunter
1969; Winkler 1988 EM; the splink/fastLink model, all public) estimates

    m_f = P(field f agrees | pair is a match)
    u_f = P(field f agrees | pair is a non-match)
    p   = P(match)  (the class prior, "lambda")

by EM over the binary agreement vectors gamma of candidate pairs. The
per-field log2(m/u) match weights slot directly into the same scoring
shape the trained logistic uses.

Distributed layout (the scale story):
- candidate pairs come from ``sorted_neighborhood_pairs`` (Hernandez &
  Stolfo 1995): sort by a dirty key, pair each record with its ``window``
  successors. Global ranks are computed WITHOUT a global sort: an
  order-preserving coarse bucket of the sort key (prefix) -> per-bucket
  counts via batch partials -> driver prefix offsets (one int per bucket,
  broadcast) -> one groupby(bucket) local argsort per bucket. Pairing
  uses rank-group emission: row r goes to groups r//G and r//G+1
  (G=window-1); any window pair lands in exactly the right element's home
  group, so emission is unique by construction — no pair dedup shuffle.
- EM never materializes anything driver-side except the 2F+2 sufficient
  statistics: each iteration is ONE streaming pass over the (materialized
  once) gamma table computing batch partials of (sum w, sum w*gamma_f,
  sum (1-w), sum (1-w)*gamma_f, n) with the current parameters broadcast
  as plain floats; the driver reduces a handful of partial rows and
  updates the parameters. Iterations are bounded and fixed (default 8) so
  a SQL oracle can unroll them exactly.

Partitioning assumptions: one rank bucket's rows fit one group (pick
``bucket_prefix_len`` so key prefixes are fine-grained; ties within a
prefix stay together by construction), and one rank-group (2G rows) is
trivially small.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from record_matching_ray.stages.util import conformed

_EPS = 1e-6


def sorted_neighborhood_pairs(
    ds: ray.data.Dataset,
    sort_col: str,
    tie_col: str,
    payload_cols: list[str],
    window: int = 6,
    bucket_prefix_len: int = 4,
) -> ray.data.Dataset:
    """All pairs of rows whose global ranks (ORDER BY sort_col, tie_col)
    differ by 1..window-1. Output columns: l_<c>/r_<c> for each payload
    column plus l_rank/r_rank. See module docstring for the
    rank-without-global-sort plan."""
    if window < 2:
        raise ValueError("window must be >= 2")
    G = window - 1

    cols = [sort_col, tie_col] + [
        c for c in payload_cols if c not in (sort_col, tie_col)
    ]
    types = {c: ds.schema().base_schema.field(c).type for c in cols}

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column(sort_col).to_pylist()
        b = [("" if k is None else str(k))[:bucket_prefix_len] for k in keys]
        return t.select(cols).append_column("bucket", pa.array(b, pa.string()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")

    # per-bucket counts -> driver prefix offsets (one int per bucket)
    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["bucket"]), "bucket").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["bucket", "cnt"])

    totals = (
        bucketed.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum("cnt")
        .rename_columns({"sum(cnt)": "cnt"})
        .take_all()
    )  # one row per key prefix — driver-safe by construction
    totals.sort(key=lambda r: r["bucket"])
    offsets: dict[str, int] = {}
    acc = 0
    for r in totals:
        offsets[r["bucket"]] = acc
        acc += int(r["cnt"])
    offsets_ref = ray.put(offsets)

    def rank_and_emit(g: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref) if isinstance(offsets_ref, ray.ObjectRef) else offsets_ref
        n = g.num_rows
        keys = np.asarray(g.column(sort_col).to_pylist(), dtype=object)
        ties = np.asarray(g.column(tie_col).to_pylist(), dtype=object)
        order = np.lexsort((ties, keys))
        base = offs[g.column("bucket")[0].as_py()]
        ranks = np.empty(n, dtype=np.int64)
        ranks[order] = base + np.arange(n, dtype=np.int64)
        # each row -> rank-groups r//G and r//G+1
        grp = np.concatenate([ranks // G, ranks // G + 1])
        rows = np.concatenate([np.arange(n), np.arange(n)])
        out = {"pgroup": pa.array(grp, pa.int64()),
               "rank": pa.array(ranks[rows], pa.int64())}
        for c in cols:
            out[c] = g.column(c).take(pa.array(rows, pa.int64()))
        return pa.table(out)

    emitted = bucketed.groupby("bucket").map_groups(
        rank_and_emit, batch_format="pyarrow"
    )

    def group_pairs(g: pa.Table) -> pa.Table:
        pg = g.column("pgroup")[0].as_py()
        ranks = g.column("rank").to_numpy(zero_copy_only=False)
        uniq, first = np.unique(ranks, return_index=True)
        a, b = np.triu_indices(len(uniq), k=1)
        d = uniq[b] - uniq[a]
        # unique emission: keep pairs whose RIGHT element homes here
        keep = (d >= 1) & (d <= G) & (uniq[b] // G == pg)
        a, b = a[keep], b[keep]
        out = {
            "l_rank": pa.array(uniq[a], pa.int64()),
            "r_rank": pa.array(uniq[b], pa.int64()),
        }
        ai = pa.array(first[a], pa.int64())
        bi = pa.array(first[b], pa.int64())
        for c in cols:
            out[f"l_{c}"] = g.column(c).take(ai)
            out[f"r_{c}"] = g.column(c).take(bi)
        return pa.table(out)

    schema = pa.schema(
        [("l_rank", pa.int64()), ("r_rank", pa.int64())]
        + [(f"l_{c}", types[c]) for c in cols]
        + [(f"r_{c}", types[c]) for c in cols]
    )
    return conformed(
        emitted.groupby("pgroup").map_groups(group_pairs, batch_format="pyarrow"),
        schema,
    )


def fellegi_sunter_em(
    gammas: ray.data.Dataset,
    gamma_cols: list[str],
    iters: int = 8,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_p: float = 0.1,
    driver_max_rows: int = 2_000_000,
) -> pa.Table:
    """EM over binary agreement columns. Returns one row per field
    (field, m, u, match_weight, nonmatch_weight) plus a ``__lambda__``
    row carrying (p, 1-p) in (m, u); weights are log2 ratios on clamped
    probabilities.

    Hybrid finish (same shape as clustering's): when the gamma table is
    counted-small it collects ONCE (n x F int8 — a few MB per million
    pairs) and the fixed-point loop runs in numpy, skipping 8 rounds of
    per-iteration scheduling latency; beyond the bound each iteration is
    one streaming pass where only 2F+2 floats reach the driver per
    batch. Identical update equations either way."""
    F = len(gamma_cols)
    gam = gammas.select_columns(gamma_cols).materialize()
    m = np.full(F, init_m)
    u = np.full(F, init_u)
    p = float(init_p)

    if gam.count() <= driver_max_rows:
        mats = [
            np.stack(
                [
                    t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                    for c in gamma_cols
                ],
                axis=1,
            )
            for t in gam.iter_batches(batch_format="pyarrow", batch_size=None)
            if t.num_rows
        ]
        gf = (
            np.concatenate(mats)
            if mats
            else np.zeros((0, F), dtype=np.float64)
        )
        n = len(gf)
        for _ in range(iters):
            a = np.full(n, p)
            b = np.full(n, 1.0 - p)
            for f in range(F):
                a = a * np.where(gf[:, f] == 1.0, m[f], 1.0 - m[f])
                b = b * np.where(gf[:, f] == 1.0, u[f], 1.0 - u[f])
            w = a / (a + b)
            sw, snw = w.sum(), (1.0 - w).sum()
            for f in range(F):
                m[f] = (w * gf[:, f]).sum() / sw
                u[f] = ((1.0 - w) * gf[:, f]).sum() / snw
            p = sw / n
        return _em_result(gamma_cols, m, u, p)

    for _ in range(iters):
        mm, uu, pp = m.copy(), u.copy(), p

        def partial(t: pa.Table, mm=mm, uu=uu, pp=pp) -> pa.Table:
            n = t.num_rows
            a = np.full(n, pp)
            b = np.full(n, 1.0 - pp)
            for f, c in enumerate(gamma_cols):
                g = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                a = a * np.where(g == 1.0, mm[f], 1.0 - mm[f])
                b = b * np.where(g == 1.0, uu[f], 1.0 - uu[f])
            w = a / (a + b)
            row = {"sw": [float(w.sum())], "snw": [float((1.0 - w).sum())],
                   "n": [float(n)]}
            for f, c in enumerate(gamma_cols):
                g = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                row[f"swg{f}"] = [float((w * g).sum())]
                row[f"snwg{f}"] = [float(((1.0 - w) * g).sum())]
            return pa.table(row)

        parts = gam.map_batches(partial, batch_format="pyarrow").take_all()
        sw = sum(r["sw"] for r in parts)
        snw = sum(r["snw"] for r in parts)
        n_tot = sum(r["n"] for r in parts)
        for f in range(F):
            m[f] = sum(r[f"swg{f}"] for r in parts) / sw
            u[f] = sum(r[f"snwg{f}"] for r in parts) / snw
        p = sw / n_tot

    return _em_result(gamma_cols, m, u, p)


def _em_result(
    gamma_cols: list[str], m: np.ndarray, u: np.ndarray, p: float
) -> pa.Table:
    mc = np.clip(m, _EPS, 1 - _EPS)
    uc = np.clip(u, _EPS, 1 - _EPS)
    # round-6 output convention: 8 EM iterations accumulate ~1e-12 of
    # reduction-order float drift vs a SQL oracle; rounding at the
    # OUTPUT (never between iterations) makes the check exact
    return pa.table(
        {
            "field": pa.array(gamma_cols + ["__lambda__"], pa.string()),
            "m": pa.array(np.round(list(m) + [p], 6), pa.float64()),
            "u": pa.array(np.round(list(u) + [1.0 - p], 6), pa.float64()),
            "match_weight": pa.array(
                np.round(list(np.log2(mc / uc)) + [0.0], 6), pa.float64()
            ),
            "nonmatch_weight": pa.array(
                np.round(list(np.log2((1 - mc) / (1 - uc))) + [0.0], 6),
                pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# Term-frequency-adjusted match weights (Winkler 1989; splink's
# tf_adjustments): an exact agreement on a RARE value is far stronger
# evidence than on a common one, so the per-value u-probability replaces
# the field-level u for agreeing pairs.


def tf_adjusted_weights(
    ds: ray.data.Dataset,
    sort_col: str,
    tie_col: str,
    tf_col: str,
    m: float = 0.95,
    window: int = 6,
    bucket_prefix_len: int = 4,
) -> ray.data.Dataset:
    """Per-candidate-pair TF-adjusted Fellegi-Sunter weight on ``tf_col``.

    For pairs (from sorted-neighborhood blocking on ``sort_col``) that
    AGREE on ``tf_col`` = v the weight is log2(m / (cnt(v)/N)) — the
    value's own relative frequency is its u-probability; disagreeing
    pairs get the standard log2((1-m)/(1-u)) with the field-level
    u = sum_v (cnt(v)/N)^2 (the exact random-agreement probability).

    Scale shape: value frequencies collapse per batch to the field's
    VOCABULARY before one groupby-sum shuffle (categorical fields — the
    only kind TF adjustment applies to — have bounded vocabularies), and
    the (value -> count) table broadcasts into the stateless pair pass.
    Weights round to 6 decimals for oracle parity.

    Output: (l_<tie>, r_<tie>, agree bool, weight float64)."""

    def freq_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select([tf_col]), tf_col).aggregate([([], "count_all")])
        return g.rename_columns(["v", "cnt"])

    freqs = (
        ds.select_columns([tf_col])
        .map_batches(freq_partial, batch_format="pyarrow")
        .groupby("v")
        .sum("cnt")
        .take_all()
    )
    cnt_map = {r["v"]: int(r["sum(cnt)"]) for r in freqs}
    n_total = sum(cnt_map.values())
    u_field = sum((c / n_total) ** 2 for c in cnt_map.values())
    w_disagree = float(np.log2((1.0 - m) / (1.0 - u_field)))
    w_agree = {
        v: float(np.log2(m / (c / n_total))) for v, c in cnt_map.items()
    }
    ref = ray.put((w_agree, w_disagree))

    pairs = sorted_neighborhood_pairs(
        ds,
        sort_col=sort_col,
        tie_col=tie_col,
        payload_cols=[tf_col],
        window=window,
        bucket_prefix_len=bucket_prefix_len,
    )
    lt, rt = f"l_{tie_col}", f"r_{tie_col}"
    OUT = pa.schema(
        [
            (lt, pa.int64()),
            (rt, pa.int64()),
            ("agree", pa.bool_()),
            ("weight", pa.float64()),
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        wa, wd = ray.get(ref)
        lv = t.column(f"l_{tf_col}").to_pylist()
        rv = t.column(f"r_{tf_col}").to_pylist()
        agree = [a == b for a, b in zip(lv, rv)]
        w = np.array(
            [wa[a] if ag else wd for a, ag, b in zip(lv, agree, rv)],
            dtype=np.float64,
        )
        return pa.table(
            {
                lt: t.column(lt),
                rt: t.column(rt),
                "agree": pa.array(agree, pa.bool_()),
                "weight": pa.array(np.round(w, 6), pa.float64()),
            }
        )

    return conformed(pairs.map_batches(score, batch_format="pyarrow"), OUT)
