"""Edit-distance similarity self-join: all id pairs whose strings are
within Levenshtein distance <= k.

The classic ER fuzzy-key join the reference approximates with per-pair
``levenshtein_ratio`` over already-blocked candidates
(claude_poc_v1 name similarity, poc1:588-603); here it is a first-class
set-level operator with its own complete candidate generation, so it can
join on a dirty key WITHOUT a prior blocking stage.

Algorithm — FastSS deletion neighborhoods (Bocek et al. 2007, public):
two strings with lev(u, v) <= k share at least one variant obtained by
deleting <= k characters from each (delete the <= k non-aligned positions
of an optimal alignment). So:

1. signature stage (``map_batches``, fully vectorized): each string emits
   one 64-bit hash per deletion combo (|combo| <= k). Strings load once
   into an (n, L) uint32 codepoint matrix (numpy's fixed-width unicode
   view); each combo's hash is one masked weighted row-sum with wrapping
   uint64 polynomial weights — no per-row Python. Hash collisions only
   ever ADD candidates (verified exactly below), never lose pairs.
2. one hash shuffle on a COARSE partition key (``sig % P``, the repo's
   coarse-groupby pattern): equal signatures still co-locate, but Python
   dispatches once per partition, not once per tiny deletion-neighborhood
   bucket; one lexsort per partition walks every bucket. ``max_bucket``
   caps adversarial skew.
3. bucket-local exact verify: canonical (min,max) id pairs, length
   prefilter ``|len(a)-len(b)| <= k``, then memoized two-row-DP
   levenshtein — only on candidates, never all pairs.
4. pair dedup (the same pair appears in one bucket per shared variant):
   ``groupby(left, right).min(dist)``.

Scale notes: a string of length L emits C(L,<=k)+1 signatures (L+1 for
k=1) carrying the string itself — the same replication shape as the
MinHash band family (64-perm sig x 16 bands); meant for key-ish fields
(names, titles), not documents. Partitioning assumption: one signature
bucket fits one group (guaranteed by max_bucket).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.functions.hashing import _U64, mix64
from record_matching_ray.functions.strsim import levenshtein
from record_matching_ray.stages.util import conformed

_R = np.uint64(0x9E3779B97F4A7C15)  # odd -> invertible mod 2^64
_LEN_MIX = np.uint64(0xC2B2AE3D27D4EB4F)

_PAIR_SCHEMA = pa.schema(
    [("left", pa.int64()), ("right", pa.int64()), ("dist", pa.int64())]
)


def _codepoint_matrix(strings: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(n, L) uint32 codepoint matrix (0-padded) + per-row lengths."""
    arr = np.asarray(strings, dtype=np.str_)
    n = len(strings)
    L = arr.dtype.itemsize // 4
    if L == 0:  # all-empty batch
        return np.zeros((n, 0), np.uint32), np.zeros(n, np.int64)
    m = arr.view(np.uint32).reshape(n, L)
    lengths = (m != 0).sum(axis=1).astype(np.int64)
    return m, lengths


def deletion_signatures(
    strings: list[str], k: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """All (row_index, signature) pairs for deletion combos of size <= k.

    Returns (rows, sigs) as int64 arrays; a row with length l emits one
    signature per combo whose max deleted position < l. Vectorized across
    rows per combo (combos number C(L, <=k) — bounded by key length, not
    row count)."""
    m, lengths = _codepoint_matrix(strings)
    n, L = m.shape
    mu = m.astype(np.uint64)
    # R^t weights; deleting position set D gives surviving position t the
    # exponent t - |{d in D : d < t}| so variants of different sources align
    powers = np.empty(max(L, 1), dtype=np.uint64)
    p = np.uint64(1)
    for t in range(L):
        powers[t] = p
        p = p * _R
    rows_out: list[np.ndarray] = []
    sigs_out: list[np.ndarray] = []
    idx = np.arange(n, dtype=np.int64)
    for ndel in range(min(k, L) + 1):
        for combo in combinations(range(L), ndel):
            shift = np.zeros(L, dtype=np.int64)
            keep = np.ones(L, dtype=bool)
            for d in combo:
                keep[d] = False
                shift[d + 1 :] += 1
            w = np.where(keep, powers[np.arange(L) - shift], np.uint64(0))
            # valid rows: every deleted position exists (the empty variant
            # IS allowed — "" must pair with single-char strings at k=1)
            maxd = combo[-1] if combo else -1
            valid = lengths > maxd
            if not valid.any():
                continue
            h = (mu[valid] * w[None, :]).sum(axis=1, dtype=np.uint64)
            h ^= (lengths[valid] - ndel).astype(np.uint64) * _LEN_MIX
            rows_out.append(idx[valid])
            sigs_out.append(mix64(h).view(np.int64))
    if not rows_out:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(rows_out), np.concatenate(sigs_out)


def edit_distance_join(
    ds: ray.data.Dataset,
    id_col: str,
    str_col: str,
    k: int = 1,
    max_bucket: int = 4096,
) -> ray.data.Dataset:
    """Self-join: (left, right, dist) for every id pair with
    lev(str_a, str_b) <= k, left < right, exact and complete (FastSS
    candidates + exact verify). See module docstring for the plan."""
    if k < 0:
        raise ValueError("k must be >= 0")

    from record_matching_ray.stages.util import coarse_groupby_partitions

    P = coarse_groupby_partitions()

    def sig_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        strings = t.column(str_col).to_pylist()
        strings = ["" if s is None else s for s in strings]
        rows, sigs = deletion_signatures(strings, k)
        return pa.table(
            {
                "pk": pa.array(
                    (sigs.view(np.uint64) % np.uint64(P)).view(np.int64),
                    pa.int64(),
                ),
                "sig": pa.array(sigs, pa.int64()),
                "id": pa.array(ids[rows], pa.int64()),
                "s": pa.array([strings[r] for r in rows], pa.string()),
            }
        )

    def sweep_pairs(g: pa.Table) -> pa.Table:
        """One pass over a coarse partition: lexsort by (sig, id), then
        every signature bucket is a contiguous segment."""
        sig = g.column("sig").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sig))
        sig_s, id_s = sig[order], ids[order]
        strs_col = g.column("s")
        lefts: list[np.ndarray] = []
        rights: list[np.ndarray] = []
        dists: list[np.ndarray] = []
        cache: dict[tuple[str, str], int] = {}
        new_seg = np.concatenate(([True], sig_s[1:] != sig_s[:-1]))
        starts = np.nonzero(new_seg)[0].tolist() + [len(sig_s)]
        for si in range(len(starts) - 1):
            lo, hi = starts[si], starts[si + 1]
            if hi - lo < 2:
                continue
            seg = order[lo:hi]
            seg_ids = id_s[lo:hi]
            uniq, first = np.unique(seg_ids, return_index=True)
            if len(uniq) < 2:
                continue
            if len(uniq) > max_bucket:
                first = first[:max_bucket]
                uniq = uniq[:max_bucket]
            strs = [strs_col[int(seg[j])].as_py() for j in first]
            lens = np.asarray([len(s) for s in strs], dtype=np.int64)
            a, b = np.triu_indices(len(uniq), k=1)
            near = np.abs(lens[a] - lens[b]) <= k
            a, b = a[near], b[near]
            if len(a) == 0:
                continue
            dist = np.empty(len(a), dtype=np.int64)
            for i in range(len(a)):
                key = (strs[a[i]], strs[b[i]])
                d = cache.get(key)
                if d is None:
                    d = levenshtein(*key)
                    cache[key] = d
                dist[i] = d
            keep = dist <= k
            if keep.any():
                lefts.append(uniq[a[keep]])
                rights.append(uniq[b[keep]])
                dists.append(dist[keep])
        if not lefts:
            return _PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "left": pa.array(np.concatenate(lefts), pa.int64()),
                "right": pa.array(np.concatenate(rights), pa.int64()),
                "dist": pa.array(np.concatenate(dists), pa.int64()),
            }
        )

    cand = (
        ds.select_columns([id_col, str_col])
        .map_batches(sig_rows, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda g: sweep_pairs(g.drop_columns(["pk"])),
            batch_format="pyarrow",
        )
    )
    out = cand.groupby(["left", "right"]).min("dist")
    out = out.rename_columns({"min(dist)": "dist"})
    return conformed(out, _PAIR_SCHEMA)


def jw_window_join(
    ds: ray.data.Dataset,
    id_col: str,
    str_col: str,
    window: int = 6,
    threshold: float = 0.9,
) -> ray.data.Dataset:
    """Jaro-Winkler similarity join under sorted-neighborhood candidates:
    pairs within `window` ranks of each other (ORDER BY str, id) whose
    jaro_winkler(str_a, str_b) >= threshold. The SNM + JW combination is
    the classic dirty-key linkage join (Hernandez-Stolfo blocking, Winkler
    comparator); unlike edit_distance_join's FastSS it is heuristic —
    recall is bounded by the window, which is the documented SNM
    trade-off. Output: (left, right, jw), left/right in id order per pair.

    One rank shuffle (see fellegi.sorted_neighborhood_pairs); JW verify is
    memoized per unique pair inside the batch."""
    from record_matching_ray.functions.strsim import jaro_winkler_batch
    from record_matching_ray.stages.fellegi import sorted_neighborhood_pairs

    pairs = sorted_neighborhood_pairs(
        ds, sort_col=str_col, tie_col=id_col, payload_cols=[id_col],
        window=window,
    )

    def verify(t: pa.Table) -> pa.Table:
        a = t.column(f"l_{str_col}").to_pylist()
        b = t.column(f"r_{str_col}").to_pylist()
        jw = jaro_winkler_batch(a, b)
        keep = jw >= threshold
        li = t.column(f"l_{id_col}").to_numpy(zero_copy_only=False)
        ri = t.column(f"r_{id_col}").to_numpy(zero_copy_only=False)
        lo = np.minimum(li, ri)[keep]
        hi = np.maximum(li, ri)[keep]
        return pa.table(
            {
                "left": pa.array(lo, pa.int64()),
                "right": pa.array(hi, pa.int64()),
                "jw": pa.array(jw[keep], pa.float64()),
            }
        )

    return pairs.map_batches(verify, batch_format="pyarrow")


def dl_window_join(
    ds: ray.data.Dataset,
    id_col: str,
    str_col: str,
    window: int = 6,
    max_dist: int = 4,
) -> ray.data.Dataset:
    """Damerau-Levenshtein similarity join under sorted-neighborhood
    candidates: pairs within `window` ranks (ORDER BY str, id) whose FULL
    Damerau-Levenshtein distance (unrestricted transpositions,
    functions/strsim.damerau_levenshtein — matches DuckDB's
    damerau_levenshtein bit for bit, property-tested on 3000 random
    pairs) is <= max_dist. Same SNM machinery and recall trade-off as
    jw_window_join. Output: (left, right, dl)."""
    from record_matching_ray.functions.strsim import damerau_levenshtein_batch
    from record_matching_ray.stages.fellegi import sorted_neighborhood_pairs

    pairs = sorted_neighborhood_pairs(
        ds, sort_col=str_col, tie_col=id_col, payload_cols=[id_col],
        window=window,
    )

    def verify(t: pa.Table) -> pa.Table:
        a = t.column(f"l_{str_col}").to_pylist()
        b = t.column(f"r_{str_col}").to_pylist()
        dl = damerau_levenshtein_batch(a, b).astype(np.int64)
        keep = dl <= max_dist
        li = t.column(f"l_{id_col}").to_numpy(zero_copy_only=False)
        ri = t.column(f"r_{id_col}").to_numpy(zero_copy_only=False)
        lo = np.minimum(li, ri)[keep]
        hi = np.maximum(li, ri)[keep]
        return pa.table(
            {
                "left": pa.array(lo, pa.int64()),
                "right": pa.array(hi, pa.int64()),
                "dl": pa.array(dl[keep], pa.int64()),
            }
        )

    return pairs.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact set-similarity self-join: prefix filtering (AllPairs / PPJoin)


def set_jaccard_join(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> ray.data.Dataset:
    """All id pairs whose DISTINCT-token sets have Jaccard >= threshold —
    EXACT, via prefix filtering (Bayardo, Ma & Srikant 2007 "Scaling Up
    All Pairs Similarity Search"; the AllPairs/PPJoin candidate rule).
    Unlike the MinHash/SimHash family this has a recall GUARANTEE: if
    J(A,B) >= t, the first ``n - ceil(t*n) + 1`` tokens of each set in
    a shared global rarity order overlap, so every true pair surfaces in
    at least one prefix-token bucket. Output: (left, right, jaccard).

    Distributed layout: one DF pass bounded by the token vocabulary
    (same contract as tfidf.idf_table) gives the global order
    (df ASC, hash ASC — rarest first, so prefix buckets are the SMALL
    df groups by construction); ranks broadcast once via ray.put; one
    emit pass ships each record to its <= prefix-length buckets with its
    rank-sorted set packed as bytes; bucket-local exact verify with the
    PPJoin length filter t*|A| <= |B| <= |A|/t; pair dedup by groupby.
    At 100 TB the vocabulary head can be min_df-pruned like idf_table —
    df=1 tokens bucket nothing anyway (their groups have one member)."""
    import math

    import ray as _ray

    from record_matching_ray.functions.hashing import _U64, hash_strings
    from record_matching_ray.stages.tfidf import doc_frequencies
    from record_matching_ray.stages.util import conformed

    # global rarity order over DISTINCT-per-doc tokens
    df_rows = doc_frequencies(
        ds.map_batches(
            lambda t: pa.table(
                {
                    text_col: pa.array(
                        [
                            " ".join(sorted(set(("" if s is None else s).lower().split())))
                            for s in t.column(text_col).to_pylist()
                        ],
                        pa.string(),
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        text_col,
    ).take_all()  # vocabulary-bounded
    if df_rows:
        hs = np.array([r["tok"] for r in df_rows], dtype=np.int64).view(_U64)
        dfs = np.array([r["df"] for r in df_rows], dtype=np.int64)
        order = np.lexsort((hs, dfs))  # df asc, hash asc: rank j = hs[order[j]]
        sorted_h = np.sort(hs)
        rank_of_sorted = np.empty(len(hs), dtype=np.int64)
        rank_of_sorted[np.searchsorted(sorted_h, hs[order])] = np.arange(len(hs))
    else:
        sorted_h = np.empty(0, dtype=_U64)
        rank_of_sorted = np.empty(0, dtype=np.int64)
    ref = _ray.put((sorted_h, rank_of_sorted))

    def emit(t: pa.Table) -> pa.Table:
        sh, rk = _ray.get(ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        out_key, out_id, out_n, out_blob = [], [], [], []
        for i, s in enumerate(t.column(text_col).to_pylist()):
            toks = sorted(set(("" if s is None else s).lower().split()))
            if not toks:
                continue
            h = np.unique(hash_strings(toks))
            r = np.sort(rk[np.searchsorted(sh, h)])
            n = len(r)
            p = n - math.ceil(threshold * n) + 1
            blob = r.tobytes()
            for key in r[:p]:
                out_key.append(key)
                out_id.append(ids[i])
                out_n.append(n)
                out_blob.append(blob)
        return pa.table(
            {
                "key": pa.array(out_key, pa.int64()),
                "sid": pa.array(out_id, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "set": pa.array(out_blob, pa.binary()),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g.column("sid").to_numpy(zero_copy_only=False)
        uniq, idx = np.unique(ids, return_index=True)
        empty = pa.table(
            {
                "left": pa.array([], pa.int64()),
                "right": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if len(uniq) < 2:
            return empty
        ns = g.column("n").to_numpy(zero_copy_only=False)[idx]
        blobs = [g.column("set")[int(j)].as_py() for j in idx]
        a, b = np.triu_indices(len(uniq), k=1)
        # PPJoin length filter: t*na <= nb <= na/t
        lo = np.minimum(ns[a], ns[b])
        hi = np.maximum(ns[a], ns[b])
        ok = lo >= threshold * hi
        a, b = a[ok], b[ok]
        lefts, rights, jacs = [], [], []
        for i, j in zip(a, b):
            ua = np.frombuffer(blobs[i], dtype=np.int64)
            ub = np.frombuffer(blobs[j], dtype=np.int64)
            inter = len(np.intersect1d(ua, ub, assume_unique=True))
            jac = inter / (len(ua) + len(ub) - inter)
            if jac >= threshold:
                lefts.append(min(uniq[i], uniq[j]))
                rights.append(max(uniq[i], uniq[j]))
                jacs.append(round(jac, 6))
        return pa.table(
            {
                "left": pa.array(lefts, pa.int64()),
                "right": pa.array(rights, pa.int64()),
                "jaccard": pa.array(jacs, pa.float64()),
            }
        )

    cand = (
        ds.select_columns([id_col, text_col])
        .map_batches(emit, batch_format="pyarrow")
        .groupby("key")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    out = cand.groupby(["left", "right"]).max("jaccard")
    out = out.rename_columns({"max(jaccard)": "jaccard"})
    return conformed(
        out,
        pa.schema(
            [("left", pa.int64()), ("right", pa.int64()), ("jaccard", pa.float64())]
        ),
    )


def mutual_best_pairs(
    pairs: ray.data.Dataset,
    left_col: str = "left",
    right_col: str = "right",
    score_col: str = "jw",
) -> ray.data.Dataset:
    """One-to-one linking by symmetric best match: keep a candidate pair
    iff each side is the other's HIGHEST-scoring counterpart (ties broken
    by smaller counterpart id) — the standard reciprocal-best-hit rule
    that turns a many-to-many candidate set into high-precision 1:1 links
    without a global assignment solve.

    Distributed layout: symmetrize (2 rows per pair), per-batch argmax
    partials collapse each batch to one row per node before the ONE
    groupby(node) that finishes the argmax; mutuality needs NO join —
    each direction's winner re-emits its canonical (min, max) pair and a
    groupby counts both directions (the mutual_knn_edges pattern).
    Output: (left, right, score), left < right."""
    from record_matching_ray.stages.util import conformed

    def sym(t: pa.Table) -> pa.Table:
        l = t.column(left_col).to_numpy(zero_copy_only=False)
        r = t.column(right_col).to_numpy(zero_copy_only=False)
        s = t.column(score_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([l, r]), pa.int64()),
                "other": pa.array(np.concatenate([r, l]), pa.int64()),
                "s": pa.array(np.concatenate([s, s]), pa.float64()),
            }
        )

    def best_partial(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        other = t.column("other").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        # sort so each node's best row (s desc, other asc) comes first
        order = np.lexsort((other, -s, node))
        n_s, o_s, s_s = node[order], other[order], s[order]
        first = np.concatenate(([True], n_s[1:] != n_s[:-1]))
        return pa.table(
            {
                "node": pa.array(n_s[first], pa.int64()),
                "other": pa.array(o_s[first], pa.int64()),
                "s": pa.array(s_s[first], pa.float64()),
            }
        )

    winners = (
        pairs.map_batches(sym, batch_format="pyarrow")
        .map_batches(best_partial, batch_format="pyarrow")
        .groupby("node")
        .map_groups(best_partial, batch_format="pyarrow")
    )

    # mutuality via packed-int64 pair key (ids < 2^31, same contract as
    # fingerprint_containment's pair reduce) — composite-key native
    # groupby is a known Ray slow path
    _M = np.int64(1) << np.int64(32)

    def canon(t: pa.Table) -> pa.Table:
        n = t.column("node").to_numpy(zero_copy_only=False)
        o = t.column("other").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pk": pa.array(np.minimum(n, o) * _M + np.maximum(n, o), pa.int64()),
                "s_max": pa.array(s, pa.float64()),
                "votes": pa.array(np.ones(len(n), np.int64), pa.int64()),
            }
        )

    agg = (
        winners.map_batches(canon, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(
            ray.data.aggregate.Sum("votes"),
            ray.data.aggregate.Max("s_max"),
        )
    )

    OUT = pa.schema(
        [("left", pa.int64()), ("right", pa.int64()), (score_col, pa.float64())]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(votes)" not in t.column_names:
            return OUT.empty_table()
        keep = pa.compute.equal(t.column("sum(votes)"), 2)
        t = t.filter(keep)
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "left": pa.array(pk // _M, pa.int64()),
                "right": pa.array(pk % _M, pa.int64()),
                score_col: t.column("max(s_max)"),
            }
        )

    return conformed(agg.map_batches(finish, batch_format="pyarrow"), OUT)
