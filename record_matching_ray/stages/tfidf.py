"""Corpus-IDF TF-IDF cosine similarity over candidate pairs.

The reference computes per-pair TF-IDF cosine by fitting a vectorizer on
just the two strings of each pair (claude_poc_v2/...v2.py:1172-1208,
1268-1282) — a 2-doc IDF that SURVEY §2.8 maps to token-set similarity
because re-fitting per pair neither scales nor preserves interesting
semantics. This module implements the operation the reference was
reaching for, done right at corpus scale: ONE distributed
document-frequency pass gives true corpus IDF weights, broadcast once,
and every candidate pair gets an exact tf·idf cosine.

Scale shape (100 TB-safe):
- DF pass: per-batch (token-hash, partial-df) combine → one groupby sum
  whose row count is the corpus VOCABULARY, not its token count.
- Broadcast side is the df >= min_df head of the vocabulary (sorted u64
  hashes + idf weights). Tokens outside it take the default
  ``ln((N+1)/2)`` — EXACT for every df=1 token, which is the long tail
  that dominates a web vocabulary, so ``min_df=2`` loses nothing while
  bounding the broadcast by the repeated-vocabulary size.
- Pair scoring: candidates (bounded by the blocking stage) join twice
  against per-doc packed tf vectors, then a vectorized sorted-array
  intersection per pair — same join shape as dedup.ngram_jaccard_pairs.

Tokenization parity with the DuckDB oracle: ``lower().split()`` (empty
tokens impossible), token identity = 64-bit hash (functions/hashing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from record_matching_ray.functions.hashing import _U64, hash_strings


def _doc_token_counts(texts: list[str]) -> list[tuple[np.ndarray, np.ndarray]]:
    """Per doc: (sorted unique token hashes, counts) — one vectorized
    hash call over the batch's token stream."""
    token_lists = [s.lower().split() for s in texts]
    lens = np.array([len(x) for x in token_lists], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    flat = hash_strings([tok for toks in token_lists for tok in toks])
    out = []
    for i in range(len(texts)):
        seg = flat[offsets[i] : offsets[i + 1]]
        uh, cnt = np.unique(seg, return_counts=True)
        out.append((uh, cnt.astype(np.int64)))
    return out


def doc_frequencies(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(tok, df): number of documents containing each token. Shuffle rows
    = per-batch vocabulary, not tokens."""

    def partial(t: pa.Table) -> pa.Table:
        per_doc = _doc_token_counts(t.column(text_col).to_pylist())
        if per_doc:
            allu = np.concatenate([uh for uh, _ in per_doc])
        else:
            allu = np.empty(0, dtype=_U64)
        uh, c = np.unique(allu, return_counts=True)
        return pa.table(
            {
                "tok": pa.array(uh.view(np.int64), pa.int64()),
                "df": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("tok")
        .sum("df")
        .rename_columns({"sum(df)": "df"})
    )


def idf_table(
    docs: ray.data.Dataset,
    text_col: str = "text",
    min_df: int = 2,
) -> tuple[np.ndarray, np.ndarray, float, int]:
    """(sorted token hashes, idf weights, default_idf, n_docs).

    Smoothed IDF: ``ln((N+1)/(df+1))``. Only tokens with df >= min_df are
    materialized; the default covers the df < min_df tail exactly when
    min_df == 2."""
    n_docs = docs.count()
    parts_h, parts_d = [], []
    for t in doc_frequencies(docs, text_col).iter_batches(
        batch_format="pyarrow", batch_size=1 << 18
    ):
        h = t.column("tok").to_numpy(zero_copy_only=False)
        d = t.column("df").to_numpy(zero_copy_only=False)
        keep = d >= min_df
        parts_h.append(h[keep])
        parts_d.append(d[keep])
    if parts_h:
        h = np.concatenate(parts_h).view(_U64)
        d = np.concatenate(parts_d)
        order = np.argsort(h)
        h, d = h[order], d[order]
    else:
        h, d = np.empty(0, dtype=_U64), np.empty(0, dtype=np.int64)
    idf = np.log((n_docs + 1.0) / (d + 1.0))
    default_idf = float(np.log((n_docs + 1.0) / 2.0))
    return h, idf, default_idf, n_docs


class PairTfidfCosine:
    """Actor-pool pair scorer: IDF table read once per actor, vectorized
    sorted-intersection cosine per pair."""

    def __init__(self, idf_ref):
        self.toks, self.idf, self.default_idf = (
            ray.get(idf_ref) if isinstance(idf_ref, ray.ObjectRef) else idf_ref
        )

    def _weights(self, uh: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.toks, uh)
        pos = np.clip(pos, 0, max(len(self.toks) - 1, 0))
        if len(self.toks):
            found = self.toks[pos] == uh
            w = np.where(found, self.idf[pos], self.default_idf)
        else:
            w = np.full(len(uh), self.default_idf)
        return w

    def __call__(self, t: pa.Table) -> pa.Table:
        tl = t.column("tf_l").to_pylist()
        tr = t.column("tf_r").to_pylist()
        cos = np.empty(len(tl), dtype=np.float64)
        for i, (a, b) in enumerate(zip(tl, tr)):
            # blobs pack [sorted hashes || counts-as-u64]; split at midpoint
            ua = np.frombuffer(a, dtype=_U64)
            ub = np.frombuffer(b, dtype=_U64)
            half_a, half_b = len(ua) // 2, len(ub) // 2
            ca = ua[half_a:].view(np.int64)
            ua = ua[:half_a]
            cb = ub[half_b:].view(np.int64)
            ub = ub[:half_b]
            wa = ca * self._weights(ua)
            wb = cb * self._weights(ub)
            _, ia, ib = np.intersect1d(ua, ub, assume_unique=True, return_indices=True)
            dot = float(np.dot(wa[ia], wb[ib]))
            na = float(np.linalg.norm(wa))
            nb = float(np.linalg.norm(wb))
            cos[i] = dot / (na * nb) if na > 0 and nb > 0 else 0.0
        return pa.table(
            {
                "left": t.column("left"),
                "right": t.column("right"),
                "tfidf_cos": pa.array(np.round(cos, 6), pa.float64()),
            }
        )


def tfidf_pair_cosine(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(left, right, tfidf_cos) for each candidate pair.

    ``pairs``: (left, right) candidate ids — from any blocking stage
    (MinHash-LSH, SimHash, embedding-LSH). Join fan-out sizes to the
    counted candidate set like dedup.ngram_jaccard_pairs."""
    from record_matching_ray.stages.util import (
        cluster_parallelism,
        compact_nonempty,
        shuffle_partitions,
    )

    cand = pairs.select_columns(["left", "right"])
    cand, n_cand = compact_nonempty(cand, shuffle_partitions())
    empty = pa.table(
        {
            "left": pa.array([], pa.int64()),
            "right": pa.array([], pa.int64()),
            "tfidf_cos": pa.array([], pa.float64()),
        }
    )
    if n_cand == 0:
        return ray.data.from_arrow(empty)
    if num_partitions is None:
        num_partitions = max(1, min(shuffle_partitions(), -(-n_cand // 512)))

    toks, idf, default_idf, _n = idf_table(docs, text_col, min_df)
    idf_ref = ray.put((toks, idf, default_idf))

    def tf_blobs(t: pa.Table) -> pa.Table:
        per_doc = _doc_token_counts(t.column(text_col).to_pylist())
        # pack [sorted unique hashes || counts-as-u64] per doc: Acero's
        # hash join rejects list<> payloads (same workaround as
        # dedup.ngram_jaccard_pairs)
        blobs = pa.array(
            [np.concatenate([uh, cnt.view(_U64)]).tobytes() for uh, cnt in per_doc],
            pa.binary(),
        )
        return pa.table({id_col: t.column(id_col), "tf": blobs})

    sides = docs.map_batches(tf_blobs, batch_format="pyarrow")
    wide = cand.join(
        sides,
        join_type="inner",
        num_partitions=num_partitions,
        on=("left",),
        right_on=(id_col,),
    ).rename_columns({"tf": "tf_l"})
    wide = wide.join(
        sides,
        join_type="inner",
        num_partitions=num_partitions,
        on=("right",),
        right_on=(id_col,),
    ).rename_columns({"tf": "tf_r"})
    return wide.map_batches(
        PairTfidfCosine,
        fn_constructor_args=(idf_ref,),
        batch_format="pyarrow",
        concurrency=(1, cluster_parallelism()),
    )


# ---------------------------------------------------------------------------
# Soft-TFIDF hybrid comparator (Cohen, Ravikumar & Fienberg 2003)


def distinct_token_idf(
    ds: ray.data.Dataset, str_col: str
) -> tuple[dict[str, float], int]:
    """({token: ln(N/df)}, N) over DISTINCT tokens per record.

    The broadcast side is the string vocabulary itself (Soft-TFIDF needs
    the token TEXT for the secondary Jaro-Winkler distance, so hashes
    don't suffice); df counts shuffle one row per (batch, token) — the
    per-batch vocabulary, never the token stream."""

    def partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for s in t.column(str_col).to_pylist():
            toks.extend(set(("" if s is None else s).lower().split()))
        uh, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {
                "tok": pa.array(uh, pa.string()),
                "df": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    n = ds.count()
    df_rows = (
        ds.select_columns([str_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("tok")
        .sum("df")
        .take_all()
    )  # vocabulary-bounded by construction
    idf = {r["tok"]: float(np.log(n / r["sum(df)"])) for r in df_rows}
    return idf, n


class _SoftTfidfVerify:
    """Actor-pool verify: per unique (l,r) name pair, Soft-TFIDF
    similarity with theta-gated per-token best Jaro-Winkler matches.
    Memoized per unique string pair — SNM windows over a repetitive name
    column (e.g. adjective+noun part names) re-present the same pair
    many times per batch."""

    def __init__(self, idf_ref, theta: float):
        self.idf = ray.get(idf_ref) if isinstance(idf_ref, ray.ObjectRef) else idf_ref
        self.theta = theta
        self.cache: dict[tuple[str, str], float] = {}
        self.vcache: dict[str, tuple[list[str], np.ndarray]] = {}

    def _vec(self, s: str) -> tuple[list[str], np.ndarray]:
        got = self.vcache.get(s)
        if got is None:
            toks = sorted(set(s.lower().split()))
            w = np.array([self.idf.get(t, 0.0) for t in toks], dtype=np.float64)
            nrm = float(np.sqrt(np.sum(w * w)))
            got = self.vcache[s] = (toks, w / nrm if nrm > 0 else w)
        return got

    def _sim(self, a: str, b: str) -> float:
        from record_matching_ray.functions.strsim import jaro_winkler

        key = (a, b)
        got = self.cache.get(key)
        if got is not None:
            return got
        ta, va = self._vec(a)
        tb, vb = self._vec(b)
        sim = 0.0
        for i, wl in enumerate(ta):
            # tb is sorted ascending, so the FIRST max is the
            # lexicographically-smallest argmax — the oracle's
            # (jw DESC, tok ASC) tie-break
            jws = np.array([jaro_winkler(wl, wr) for wr in tb])
            j = int(np.argmax(jws)) if len(jws) else 0
            if len(jws) and jws[j] >= self.theta:
                sim += va[i] * vb[j] * float(jws[j])
        self.cache[key] = sim
        return sim

    def __call__(self, t: pa.Table) -> pa.Table:
        raise NotImplementedError  # bound in soft_tfidf_pairs


def soft_tfidf_pairs(
    ds: ray.data.Dataset,
    id_col: str,
    str_col: str,
    window: int = 6,
    theta: float = 0.9,
    threshold: float = 0.25,
) -> ray.data.Dataset:
    """Soft-TFIDF similarity join (Cohen, Ravikumar & Fienberg 2003,
    "A Comparison of String Distance Metrics for Name-Matching Tasks")
    under sorted-neighborhood candidates.

    SoftTFIDF(S,T) = sum over tokens w of S whose best Jaro-Winkler match
    v* in T has JW(w,v*) >= theta of V(w,S) * V(v*,T) * JW(w,v*), where
    V(w,S) = idf(w) / ||idf(S)||_2 over DISTINCT tokens (set semantics)
    and idf = ln(N / df). The direction is canonical: S is the min-id
    record of each pair. Ties in the argmax break to the
    lexicographically smallest v* so a SQL oracle (ORDER BY jw DESC,
    tok ASC) reproduces the exact same matches.

    Output: (left, right, soft_tfidf) with round(sim, 6) >= threshold,
    left < right. Replaces the hybrid comparator family the reference's
    per-pair TfidfVectorizer reached for (claude_poc_v2:1172-1208) with
    the published corpus-IDF formulation.

    Scale shape: one SNM rank shuffle (see fellegi.py — no global sort);
    idf vocabulary broadcast once via ray.put; verify is an actor pool
    memoized per unique name pair."""
    from record_matching_ray.stages.fellegi import sorted_neighborhood_pairs
    from record_matching_ray.stages.util import cluster_parallelism

    idf, _n = distinct_token_idf(ds, str_col)
    idf_ref = ray.put(idf)

    pairs = sorted_neighborhood_pairs(
        ds.select_columns([id_col, str_col]),
        sort_col=str_col,
        tie_col=id_col,
        payload_cols=[id_col],
        window=window,
    )

    class Verify(_SoftTfidfVerify):
        def __init__(self):
            super().__init__(idf_ref, theta)

        def __call__(self, t: pa.Table) -> pa.Table:
            names_l = t.column(f"l_{str_col}").to_pylist()
            names_r = t.column(f"r_{str_col}").to_pylist()
            li = t.column(f"l_{id_col}").to_numpy(zero_copy_only=False)
            ri = t.column(f"r_{id_col}").to_numpy(zero_copy_only=False)
            swap = li > ri
            sims = np.empty(len(names_l), dtype=np.float64)
            for i, (a, b) in enumerate(zip(names_l, names_r)):
                if swap[i]:
                    a, b = b, a
                sims[i] = self._sim(a or "", b or "")
            sims = np.round(sims, 6)
            keep = sims >= threshold
            return pa.table(
                {
                    "left": pa.array(np.minimum(li, ri)[keep], pa.int64()),
                    "right": pa.array(np.maximum(li, ri)[keep], pa.int64()),
                    "soft_tfidf": pa.array(sims[keep], pa.float64()),
                }
            )

    return pairs.map_batches(
        Verify,
        batch_format="pyarrow",
        concurrency=(1, cluster_parallelism()),
    )


def monge_elkan_pairs(
    ds: ray.data.Dataset,
    id_col: str,
    str_col: str,
    window: int = 6,
    threshold: float = 0.0,
) -> ray.data.Dataset:
    """Monge-Elkan hybrid comparator (Monge & Elkan 1996) under
    sorted-neighborhood candidates: ME(S,T) = mean over S's DISTINCT
    tokens of the best Jaro-Winkler match in T — Soft-TFIDF's ungated,
    unweighted ancestor (set semantics for SQL parity). Direction is
    canonical: S is the min-id record of each pair.

    Scale shape: one SNM rank shuffle, then a stateless memoized scan —
    all token-pair JW calls of a batch fuse into ONE vectorized kernel
    call; repeated name pairs within a batch dedupe first. Output
    (left, right, me) with round(me, 6) >= threshold, left < right."""
    from record_matching_ray.functions.strsim import jaro_winkler_batch
    from record_matching_ray.stages.fellegi import sorted_neighborhood_pairs
    from record_matching_ray.stages.util import conformed

    pairs = sorted_neighborhood_pairs(
        ds.select_columns([id_col, str_col]),
        sort_col=str_col,
        tie_col=id_col,
        payload_cols=[id_col],
        window=window,
    )
    OUT = pa.schema(
        [("left", pa.int64()), ("right", pa.int64()), ("me", pa.float64())]
    )

    def score(t: pa.Table) -> pa.Table:
        li = t.column(f"l_{id_col}").to_numpy(zero_copy_only=False)
        ri = t.column(f"r_{id_col}").to_numpy(zero_copy_only=False)
        nl = t.column(f"l_{str_col}").to_pylist()
        nr = t.column(f"r_{str_col}").to_pylist()
        lo = np.minimum(li, ri)
        hi = np.maximum(li, ri)
        # canonical direction: S = the min-id side's name
        s_names = [a if x <= y else b for a, b, x, y in zip(nl, nr, li, ri)]
        t_names = [b if x <= y else a for a, b, x, y in zip(nl, nr, li, ri)]
        # dedupe identical (S, T) string pairs, fuse all JW calls
        uniq: dict[tuple[str, str], int] = {}
        cross_a: list[str] = []
        cross_b: list[str] = []
        bounds = [0]
        a_sizes: list[int] = []
        for sn, tn in zip(s_names, t_names):
            k = (sn, tn)
            if k in uniq:
                continue
            uniq[k] = len(bounds) - 1
            at = sorted(set(sn.lower().split()))
            bt = sorted(set(tn.lower().split()))
            for x in at:
                cross_a.extend([x] * len(bt))
                cross_b.extend(bt)
            bounds.append(len(cross_a))
            a_sizes.append(len(at))
        jw = jaro_winkler_batch(cross_a, cross_b) if cross_a else np.empty(0)
        me_u = np.zeros(len(a_sizes), dtype=np.float64)
        for u, (st, en) in enumerate(zip(bounds[:-1], bounds[1:])):
            na = a_sizes[u]
            if en > st and na:
                m = jw[st:en].reshape(na, (en - st) // na)
                me_u[u] = float(np.mean(np.max(m, axis=1)))
        me = np.round(
            np.array([me_u[uniq[(sn, tn)]] for sn, tn in zip(s_names, t_names)]),
            6,
        )
        keep = me >= threshold
        return pa.table(
            {
                "left": pa.array(lo[keep], pa.int64()),
                "right": pa.array(hi[keep], pa.int64()),
                "me": pa.array(me[keep], pa.float64()),
            }
        )

    return conformed(pairs.map_batches(score, batch_format="pyarrow"), OUT)
