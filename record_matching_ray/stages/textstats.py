"""Text-analysis operators for large-scale training-data pipelines.

Token counting, quality scoring, language-ID and document fingerprinting
over a documents table — the text-curation companions to the ER engine
(the reference's analog is its field templating + completeness scoring,
claude_poc_v2/...v2.py:259-260, 370, 399-411; these are the web-corpus
generalizations).

All operators are stateless ``map_batches`` transforms over Arrow
batches. Oracle parity notes: ``token_stats`` and ``quality_stats`` are
written to match specific DuckDB SQL expressions token-for-token (see
__ray_entry__.oracle_sql) — tokenization is ``\\s+`` split of trimmed
text, punctuation is the class ``[.!?,;:]``, ratios are rounded to 6
decimals after a float64 division of the exact integer counts.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

import ray.data

# RE2's \s class ([\t\n\f\r ]), NOT Python's Unicode \s: the DuckDB
# oracles split with string_split_regex(..., '\s+') under RE2, so a
# Unicode-whitespace doc (e.g. U+00A0) must tokenize identically on
# both sides (ADVICE r4). \v is excluded on purpose — RE2 excludes it.
_WS_SPLIT = re.compile(r"[\t\n\f\r ]+")


def _ws_tokens(s: str) -> list:
    """ASCII-whitespace tokens of ``s``, empties dropped — parity with
    ``list_filter(string_split_regex(s, '\\s+'), x -> x <> '')``."""
    return [x for x in _WS_SPLIT.split(s) if x]
_PUNCT = re.compile(r"[.!?,;:]")
_CJK = re.compile(r"[一-鿿぀-ヿ]")

STOPWORDS = ("the", "a", "of", "and", "in")

# Per-language stopword profiles for the n-gram/stopword heuristic
# language ID (deterministic, dependency-free).
_LANG_WORDS = {
    "en": {"the", "of", "and", "a", "in", "to", "is", "that", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"},
    "es": {"el", "la", "y", "los", "las", "es", "una", "en", "que", "por"},
}


def token_stats(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens, n_chars — parity with
    ``len(string_split_regex(trim(text),'\\s+'))`` / ``length(text)``."""
    texts = batch.column("text").to_pylist()
    n_tokens = np.fromiter(
        (len(_WS_SPLIT.split(t.strip())) for t in texts), dtype=np.int64, count=len(texts)
    )
    n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def quality_stats(batch: pa.Table) -> pa.Table:
    """Quality-scoring features: stopword count, punctuation count,
    stopword ratio (round(stop_cnt/n_tokens, 6)). A low stopword ratio on
    natural text flags boilerplate/gibberish — standard web-corpus
    filtering signal."""
    texts = batch.column("text").to_pylist()
    stop = set(STOPWORDS)
    stop_cnt = np.empty(len(texts), dtype=np.int64)
    punct_cnt = np.empty(len(texts), dtype=np.int64)
    n_tokens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = _WS_SPLIT.split(t.strip())
        n_tokens[i] = len(toks)
        stop_cnt[i] = sum(1 for tok in toks if tok in stop)
        punct_cnt[i] = len(_PUNCT.findall(t))
    ratio = np.round(stop_cnt.astype(np.float64) / n_tokens, 6)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "stop_cnt": pa.array(stop_cnt, pa.int64()),
            "punct_cnt": pa.array(punct_cnt, pa.int64()),
            "stop_ratio": pa.array(ratio, pa.float64()),
        }
    )


def _langid_one(text: str) -> str:
    sample = text[:2000]
    if len(sample) and len(_CJK.findall(sample)) / len(sample) > 0.05:
        return "zh"
    toks = _WS_SPLIT.split(sample.lower().strip())[:256]
    best, best_hits = "en", -1
    for lang, words in _LANG_WORDS.items():
        hits = sum(1 for t in toks if t in words)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def langid(batch: pa.Table) -> pa.Table:
    """doc_id, lang_pred — stopword/CJK-ratio heuristic language ID."""
    texts = batch.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array([_langid_one(t) for t in texts], pa.string()),
        }
    )


def winnow_fingerprints(
    text: str, k: int = 8, window: int = 4
) -> np.ndarray:
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken 2003):
    rolling hash over k-char grams, keep the window minimum (rightmost on
    ties), dedup. Deterministic; used for plagiarism-style containment
    detection at corpus scale."""
    n = len(text)
    if n < k:
        h = hashlib.blake2b(text.encode(), digest_size=8).digest()
        return np.frombuffer(h, dtype=np.uint64)
    data = np.frombuffer(text.encode("utf-8", "replace")[: 4 * n], dtype=np.uint8)
    # polynomial rolling hash over bytes, vectorized via cumulative trick
    m = len(data)
    if m < k:
        data = np.pad(data, (0, k - m))
        m = k
    base = 1099511628211
    pw = np.array(
        [pow(base, i, 1 << 64) for i in range(k)], dtype=np.uint64
    )  # modular powers computed in Python ints (no uint64 overflow warning)
    # gram hash at i = sum(data[i+j] * base^(k-1-j))
    grams = np.zeros(m - k + 1, dtype=np.uint64)
    for j in range(k):
        grams += data[j : m - k + 1 + j].astype(np.uint64) * pw[k - 1 - j]
    if len(grams) <= window:
        return np.unique(grams)
    # window minimum via stride trick
    sw = np.lib.stride_tricks.sliding_window_view(grams, window)
    mins = sw.min(axis=1)
    return np.unique(mins)


def winnow_fingerprints_md5(text: str, k: int = 8, window: int = 4) -> np.ndarray:
    """Winnowing with md5-lower-64 gram hashes over k-CHAR grams —
    bit-identical to a DuckDB oracle (md5_number_lower(substr(text,i,k))
    + window-min + distinct), so the selection algorithm is independently
    SQL-verifiable. The rolling-hash variant above stays the scale path
    (no per-gram digest); same winnowing semantics, different gram hash."""
    from record_matching_ray.functions.hashing import md5_lower64

    n = len(text)
    if n < k:
        return np.array([md5_lower64(text)], dtype=np.uint64)
    grams = np.fromiter(
        (md5_lower64(text[i : i + k]) for i in range(n - k + 1)),
        dtype=np.uint64,
        count=n - k + 1,
    )
    if len(grams) <= window:
        return np.unique(grams)
    sw = np.lib.stride_tricks.sliding_window_view(grams, window)
    return np.unique(sw.min(axis=1))


def fingerprint_rows(
    batch: pa.Table,
    k: int = 8,
    window: int = 4,
    gram_hash: str = "rolling",
    with_nfp: bool = False,
) -> pa.Table:
    """Exploded (doc_id, fp) winnowing fingerprints — one row per selected
    fingerprint, the join-friendly layout for containment detection.
    ``with_nfp`` rides each doc's fingerprint count along on every row
    (a doc's fps all come from one batch), so downstream containment
    ratios need no separate per-doc size shuffle."""
    texts = batch.column("text").to_pylist()
    fn = winnow_fingerprints_md5 if gram_hash == "md5" else winnow_fingerprints
    fps = [fn(t, k, window) for t in texts]
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    reps = np.array([len(f) for f in fps], dtype=np.int64)
    flat = (
        np.concatenate(fps) if fps else np.empty(0, dtype=np.uint64)
    )
    cols = {
        "doc_id": pa.array(np.repeat(ids, reps), pa.int64()),
        "fp": pa.array(flat, pa.uint64()),
    }
    if with_nfp:
        cols["nfp"] = pa.array(np.repeat(reps, reps), pa.int64())
    return pa.table(cols)


def fingerprint_containment_pairs(
    docs,
    k: int = 8,
    window: int = 4,
    min_containment: float = 0.5,
    max_df: int = 64,
    gram_hash: str = "rolling",
    num_partitions: int | None = None,
):
    """Plagiarism-style containment detection (Schleimer et al. 2003 §5):
    pairs of docs sharing winnowing fingerprints, scored by
    ``containment = shared / min(nfp_a, nfp_b)`` and kept at
    ``>= min_containment``. Output: (left, right, shared, containment).

    Scale design — two bounded shuffles, no all-pairs:
    1. fp rows hash-partition by fingerprint; one vectorized sweep per
       partition segments its fps and emits pair partials only inside
       buckets of 2..max_df docs. ``max_df`` is the ubiquitous-gram
       guard (boilerplate 8-char substrings occur in most docs); it
       bounds per-fp fanout to max_df^2/2 and is part of the operator's
       CONTRACT (the SQL oracle applies the same document-frequency
       filter), not a silent cap.
    2. pair partials (packed l<<32|r int64 key — requires ids < 2^31;
       use the ER uid path beyond that) hash-partition once more and
       reduce to shared counts.
    """
    import ray.data  # noqa: F401  (docs is a ray.data.Dataset)

    from record_matching_ray.functions.hashing import _U64, mix64
    from record_matching_ray.stages.util import shuffle_partitions

    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions

    fps = docs.map_batches(
        fingerprint_rows,
        batch_format="pyarrow",
        fn_kwargs={
            "k": k,
            "window": window,
            "gram_hash": gram_hash,
            "with_nfp": True,
        },
    )

    def add_pk(t: pa.Table) -> pa.Table:
        f = t.column("fp").to_numpy(zero_copy_only=False).astype(_U64)
        return t.append_column(
            "pk",
            pa.array((mix64(f) % _U64(P)).astype(np.int64), pa.int64()),
        )

    PAIR_EMPTY = pa.schema(
        [("pairkey", pa.int64()), ("shared", pa.int64()), ("nfp_min", pa.int64())]
    )

    def bucket_sweep(g: pa.Table) -> pa.Table:
        """All fps of one hash partition: segment by fp, emit pair
        partials for 2..max_df-doc segments, pre-combine by pairkey."""
        f = g.column("fp").to_numpy(zero_copy_only=False).astype(_U64)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        nfp = g.column("nfp").to_numpy(zero_copy_only=False)
        if ids.size and int(ids.max()) >= 1 << 31:
            raise ValueError("doc_id >= 2^31: pairkey packing overflows")
        order = np.lexsort((ids, f))
        f_s, id_s, n_s = f[order], ids[order], nfp[order]
        new_seg = np.concatenate(([True], f_s[1:] != f_s[:-1]))
        starts = np.nonzero(new_seg)[0]
        ends = np.append(starts[1:], len(f_s))
        sizes = ends - starts
        keep = (sizes >= 2) & (sizes <= max_df)
        pk_parts, nf_parts = [], []
        for s, e in zip(starts[keep], ends[keep]):
            seg_ids, seg_nfp = id_s[s:e], n_s[s:e]
            a, b = np.triu_indices(e - s, k=1)
            pk_parts.append((seg_ids[a] << 32) | seg_ids[b])
            nf_parts.append(np.minimum(seg_nfp[a], seg_nfp[b]))
        if not pk_parts:
            return PAIR_EMPTY.empty_table()
        part = pa.table(
            {
                "pairkey": pa.array(np.concatenate(pk_parts), pa.int64()),
                "nfp_min": pa.array(np.concatenate(nf_parts), pa.int64()),
            }
        )
        agg = pa.TableGroupBy(part, "pairkey").aggregate(
            [("pairkey", "count"), ("nfp_min", "min")]
        )
        return agg.rename_columns(["pairkey", "shared", "nfp_min"])

    partials = (
        fps.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda g: bucket_sweep(g.drop_columns(["pk"])), batch_format="pyarrow"
        )
    )

    def add_pk2(t: pa.Table) -> pa.Table:
        pk2 = mix64(
            t.column("pairkey").to_numpy(zero_copy_only=False).astype(_U64)
        ) % _U64(P)
        return t.append_column("pk2", pa.array(pk2.astype(np.int64), pa.int64()))

    OUT_EMPTY = pa.schema(
        [
            ("left", pa.int64()),
            ("right", pa.int64()),
            ("shared", pa.int64()),
            ("containment", pa.float64()),
        ]
    )

    def reduce_pairs(g: pa.Table) -> pa.Table:
        pkx = g.column("pairkey").to_numpy(zero_copy_only=False)
        sh = g.column("shared").to_numpy(zero_copy_only=False)
        nm = g.column("nfp_min").to_numpy(zero_copy_only=False)
        if len(pkx) == 0:
            return OUT_EMPTY.empty_table()
        order = np.argsort(pkx, kind="stable")
        pk_s, sh_s, nm_s = pkx[order], sh[order], nm[order]
        new_seg = np.concatenate(([True], pk_s[1:] != pk_s[:-1]))
        starts = np.nonzero(new_seg)[0]
        shared = np.add.reduceat(sh_s, starts)
        nfp_min = nm_s[starts]  # per-doc constant, any representative
        cont = np.round(shared / nfp_min, 6)
        keepm = cont >= min_containment
        key = pk_s[starts][keepm]
        return pa.table(
            {
                "left": pa.array(key >> 32, pa.int64()),
                "right": pa.array(key & 0xFFFFFFFF, pa.int64()),
                "shared": pa.array(shared[keepm], pa.int64()),
                "containment": pa.array(cont[keepm], pa.float64()),
            }
        )

    return (
        partials.map_batches(add_pk2, batch_format="pyarrow")
        .groupby("pk2")
        .map_groups(
            lambda g: reduce_pairs(g.drop_columns(["pk2"])), batch_format="pyarrow"
        )
    )


def fingerprint_docs(batch: pa.Table, k: int = 8, window: int = 4) -> pa.Table:
    texts = batch.column("text").to_pylist()
    fps = [winnow_fingerprints(t, k, window) for t in texts]
    offsets = np.zeros(len(fps) + 1, dtype=np.int32)
    np.cumsum([len(f) for f in fps], out=offsets[1:])
    flat = np.concatenate(fps) if fps else np.empty(0, dtype=np.uint64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
            "fingerprints": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(flat, pa.uint64())
            ),
        }
    )


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    quality rules, adapted to this corpus' single-line texts):

    - top_word_ratio: occurrences of the most frequent token / n_words
    - dup_bigram_frac: 1 - distinct_bigrams / total_bigrams
    - top_bigram_ratio: occurrences of the most frequent bigram / total
    - word_entropy: Shannon entropy (nats) of the token distribution

    High duplicate-n-gram fractions flag boilerplate / keyword-stuffed
    pages. Fully vectorized across the batch: tokens of ALL docs are
    factorized once; per-doc aggregates come from reduceat over the
    doc-sorted (doc, code) key space — no per-row Python loop.

    Oracle parity (__ray_entry__.REPETITION_SQL): tokenization is the
    \\s+ split of trimmed text; ratios round(·, 6); empty/1-token docs
    yield 0.0 ratios and 0.0 entropy.
    """
    import pandas as pd

    texts = batch.column("text").to_pylist()
    n_docs = len(texts)
    token_lists = [_WS_SPLIT.split(t.strip()) if t.strip() else [] for t in texts]
    lens = np.array([len(toks) for toks in token_lists], dtype=np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    flat = [tok for toks in token_lists for tok in toks]
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
    V = max(len(uniq), 1)

    def seg_stats(keys: np.ndarray, seg_of_key) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """For sorted composite keys -> (per-doc n_distinct, per-doc max
        count, per-doc entropy-sum of counts*ln(counts))."""
        uk, counts = np.unique(keys, return_counts=True)
        segs = seg_of_key(uk)
        n_distinct = np.bincount(segs, minlength=n_docs)
        maxc = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(maxc, segs, counts)
        # sum of c*ln(c) per doc (entropy = ln(n) - sum/n)
        clnc = np.zeros(n_docs, dtype=np.float64)
        np.add.at(clnc, segs, counts * np.log(counts))
        return n_distinct, maxc, clnc

    # unigrams: key = doc * V + code
    if len(codes):
        _, top_w, w_clnc = seg_stats(
            doc_idx * V + codes, lambda uk: (uk // V).astype(np.int64)
        )
    else:
        top_w = np.zeros(n_docs, dtype=np.int64)
        w_clnc = np.zeros(n_docs, dtype=np.float64)
    n_words = lens
    safe_n = np.maximum(n_words, 1)
    top_word_ratio = np.round(top_w / safe_n, 6)
    entropy = np.where(n_words > 0, np.log(safe_n) - w_clnc / safe_n, 0.0)
    entropy = np.round(np.maximum(entropy, 0.0), 6)

    # bigrams within doc: positions where doc_idx[i] == doc_idx[i+1]
    n_bigrams = np.maximum(lens - 1, 0)
    if len(codes) > 1:
        same = doc_idx[:-1] == doc_idx[1:]
        bdoc = doc_idx[:-1][same]
        bkey = (bdoc * V + codes[:-1][same]) * V + codes[1:][same]
        nd_b, top_b, _ = seg_stats(bkey, lambda uk: (uk // (V * V)).astype(np.int64))
    else:
        nd_b = np.zeros(n_docs, dtype=np.int64)
        top_b = np.zeros(n_docs, dtype=np.int64)
    safe_b = np.maximum(n_bigrams, 1)
    dup_bigram_frac = np.round(
        np.where(n_bigrams > 0, 1.0 - nd_b / safe_b, 0.0), 6
    )
    top_bigram_ratio = np.round(np.where(n_bigrams > 0, top_b / safe_b, 0.0), 6)

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "top_word_ratio": pa.array(top_word_ratio, pa.float64()),
            "dup_bigram_frac": pa.array(dup_bigram_frac, pa.float64()),
            "top_bigram_ratio": pa.array(top_bigram_ratio, pa.float64()),
            "word_entropy": pa.array(entropy, pa.float64()),
        }
    )


def run_repetition(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(repetition_stats, batch_format="pyarrow")


def run_token_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(token_stats, batch_format="pyarrow")


def run_quality(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(quality_stats, batch_format="pyarrow")


def run_langid(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(langid, batch_format="pyarrow")


def run_fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(fingerprint_docs, batch_format="pyarrow")


def top_tokens(
    docs: ray.data.Dataset, k: int = 20, text_col: str = "text"
) -> ray.data.Dataset:
    """Exact corpus-wide heavy hitters: the k most frequent lowercase
    whitespace tokens, ties broken token-ascending.

    Scale shape: per-batch partial counts collapse each batch to its
    VOCABULARY (one row per distinct token per batch) before the single
    groupby-sum shuffle; the final top-k is a sort+limit over per-token
    totals (vocabulary-sized, not corpus-sized). Output (token, cnt,
    rank) with rank 1..k."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        toks = []
        for s in t.column(text_col).to_pylist():
            s = s.strip().lower()
            if s:
                toks.extend(_WS_SPLIT.split(s))
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        codes, uniq = pd.factorize(np.asarray(toks, dtype=object), sort=False)
        cnts = np.bincount(codes, minlength=len(uniq))
        return pa.table(
            {
                "token": pa.array(list(uniq), pa.string()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    totals = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
        .rename_columns({"sum(cnt)": "cnt"})
    )
    top = totals.sort(key=["cnt", "token"], descending=[True, False]).limit(k)
    rows = top.take_all()  # bounded: limit(k) rows reach the driver
    return ray.data.from_arrow(
        pa.table(
            {
                "token": pa.array([r["token"] for r in rows], pa.string()),
                "cnt": pa.array([r["cnt"] for r in rows], pa.int64()),
                "rank": pa.array(
                    np.arange(1, len(rows) + 1, dtype=np.int64), pa.int64()
                ),
            }
        )
    )


def misra_gries_topk(
    docs: ray.data.Dataset, capacity: int = 256, text_col: str = "text"
) -> dict[str, int]:
    """Misra-Gries heavy-hitter sketch: per-batch summaries of at most
    ``capacity`` counters, merged associatively on the driver. Guarantee:
    every token with true frequency > N/capacity survives, and each
    estimate undercounts by at most N/capacity (the pytest invariant).
    The at-scale variant of top_tokens when even the vocabulary is too
    wide for a full groupby (e.g. n-gram keys)."""

    def partial(t: pa.Table) -> pa.Table:
        counters: dict[str, int] = {}
        for s in t.column(text_col).to_pylist():
            s = s.strip().lower()
            for tok in _WS_SPLIT.split(s) if s else ():
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < capacity:
                    counters[tok] = 1
                else:
                    # decrement-all step (lazy: collect then prune)
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        return pa.table(
            {
                "token": pa.array(list(counters.keys()), pa.string()),
                "cnt": pa.array(list(counters.values()), pa.int64()),
            }
        )

    from record_matching_ray.stages.util import streamed_rows

    # one <=capacity-row partial per input block: streamed, never
    # materialized — at 10^6 blocks take_all() would hold 10^6 x capacity
    # rows on the driver (VERDICT r4 task 8)
    merged: dict[str, int] = {}
    for row in streamed_rows(
        docs.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow"
        )
    ):
        tok, c = row["token"], int(row["cnt"])
        merged[tok] = merged.get(tok, 0) + c
    if len(merged) > capacity:
        # keep the top `capacity` after merge (standard MG merge prune)
        cut = sorted(merged.values(), reverse=True)[capacity - 1]
        merged = {t: c for t, c in merged.items() if c >= cut}
    return merged


def approx_quantiles_invariant(
    ds: ray.data.Dataset, value_col: str, q: float = 0.5
) -> pa.Table:
    """Sketch-vs-exact invariant row for the correctness gate (same shape
    as the HLL doc_distinct_estimate): (n_rows, exact_q_value,
    within_tol) where exact is computed by the distributed exact
    histogram path and the sketch must land within 2%% rank tolerance."""
    from record_matching_ray.stages.quantiles import approx_quantiles

    from record_matching_ray.stages.quantiles import group_quantiles

    est = approx_quantiles(ds, value_col, qs=(q,))[q]
    # exact + rank-tolerance bounds via the DISTRIBUTED histogram path
    # (constant group; only the value histogram reaches any single node)
    one = ds.select_columns([value_col]).map_batches(
        lambda t: t.append_column(
            "g", pa.array(["all"] * t.num_rows, pa.string())
        ),
        batch_format="pyarrow",
    )
    q_lo, q_hi = max(0.0, q - 0.02), min(1.0, q + 0.02)
    from record_matching_ray.stages.util import bounded_take_all

    rows = {
        round(r["q"], 6): int(r["value"])
        for r in bounded_take_all(
            group_quantiles(one, "g", value_col, qs=(q_lo, q, q_hi)),
            16,  # one constant group x 3 quantiles
            "approx_quantiles_invariant",
        )
    }
    n = ds.count()
    exact = rows[round(q, 6)]
    within = bool(rows[round(q_lo, 6)] <= est <= rows[round(q_hi, 6)])
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "exact_q": pa.array([exact], pa.int64()),
            "within_tol": pa.array([within], pa.bool_()),
        }
    )


def approx_distinct(
    ds: "ray.data.Dataset", col: str, precision_bits: int = 12
) -> tuple[int, float]:
    """Approximate COUNT(DISTINCT col) via a Flajolet-Martin/HLL-style
    register sketch — the at-scale replacement for an exact distinct
    shuffle: each batch folds its values into 2^precision_bits max-rank
    registers (a few KB), registers merge associatively, only one small
    array per batch reaches the driver. Returns (estimate, relative
    standard error ~= 1.04/sqrt(m))."""
    import numpy as np

    from record_matching_ray.functions.hashing import _U64, hash_strings, mix64

    m = 1 << precision_bits

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_pylist()
        if vals and not isinstance(vals[0], str):
            vals = [str(v) for v in vals]
        h = mix64(hash_strings(vals))
        idx = (h & _U64(m - 1)).astype(np.int64)
        rest = (h >> np.uint64(precision_bits)).astype(np.uint64)
        # rank = leading-zero count of the remaining bits + 1
        width = 64 - precision_bits
        rank = np.zeros(len(h), dtype=np.int64)
        nonzero = rest != 0
        # log2 via float conversion is exact for < 2^53
        rank[nonzero] = width - np.floor(np.log2(rest[nonzero].astype(np.float64))).astype(np.int64)
        rank[~nonzero] = width + 1
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, idx, rank)
        return pa.table({"regs": pa.array([regs.tolist()], pa.list_(pa.int64()))})

    from record_matching_ray.stages.util import streamed_rows

    # one m-register partial per input block: streamed fold, constant
    # driver memory (take_all() would hold every block's registers)
    regs = np.zeros(m, dtype=np.int64)
    for row in streamed_rows(
        ds.select_columns([col]).map_batches(partial, batch_format="pyarrow")
    ):
        regs = np.maximum(regs, np.asarray(row["regs"], dtype=np.int64))
    # HLL estimate with small-range correction
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return int(round(est)), 1.04 / np.sqrt(m)


def unigram_logprob(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
):
    """CCNet-style unigram LM quality score per document: the mean
    ``ln(count(tok)/N)`` over the doc's token occurrences, under the
    corpus' own unigram distribution (Wenzek et al. 2020 score docs with
    a small LM the same way; the unigram model is its distributed,
    exactly-oracle-checkable core). Output: (doc_id, n_tokens,
    avg_logprob) — higher (less negative) = more typical text; extreme
    values flag boilerplate/gibberish.

    Scale shape (same contract as tfidf.doc_frequencies): the TF pass
    shuffles per-batch (token, partial-count) rows — vocabulary-bounded,
    not token-bounded; the broadcast side is the ``count >= min_count``
    vocabulary head plus the total-token scalar. Every absent token has
    EXACTLY count = min_count-1 = 1 (the df=1 long tail), so min_count=2
    loses nothing while bounding the broadcast. Scoring is one stateless
    map_batches against the broadcast table (ray.put once)."""
    import ray
    import ray.data  # noqa: F401

    from record_matching_ray.functions.hashing import _U64, hash_strings

    def tf_partial(t: pa.Table) -> pa.Table:
        token_lists = [_ws_tokens(s.lower()) for s in t.column(text_col).to_pylist()]
        flat = hash_strings([tok for toks in token_lists for tok in toks])
        uh, c = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "tok": pa.array(uh.view(np.int64), pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    tf = (
        docs.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("tok")
        .sum("cnt")
        .rename_columns({"sum(cnt)": "cnt"})
        .materialize()
    )
    total = tf.sum("cnt")
    # drop the zero-column empty blocks hash-shuffle groupbys can emit
    # (stages/util.py:10 documents the failure family) before concat
    parts = [
        t
        for t in (ray.get(r) for r in tf.filter(
            expr=f"cnt >= {int(min_count)}"
        ).to_arrow_refs())
        if t.num_rows and t.num_columns
    ]
    if parts:
        head_t = pa.concat_tables(parts)
        toks = head_t.column("tok").to_numpy(zero_copy_only=False).view(_U64)
        cnts = head_t.column("cnt").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
    else:
        toks = np.empty(0, dtype=_U64)
        cnts = np.empty(0, dtype=np.float64)
    order = np.argsort(toks)
    ref = ray.put((toks[order], np.log(cnts[order]) - np.log(float(total))))
    default_lp = np.log(float(min_count - 1)) - np.log(float(total))

    def score(t: pa.Table) -> pa.Table:
        stoks, slogp = ray.get(ref)
        token_lists = [_ws_tokens(s.lower()) for s in t.column(text_col).to_pylist()]
        lens = np.array([len(x) for x in token_lists], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        flat = hash_strings([tok for toks_ in token_lists for tok in toks_])
        if len(stoks) and len(flat):
            pos = np.searchsorted(stoks, flat)
            safe = np.clip(pos, 0, len(stoks) - 1)
            lp = np.where(stoks[safe] == flat, slogp[safe], default_lp)
        else:
            lp = np.full(len(flat), default_lp)
        sums = np.add.reduceat(
            np.concatenate([lp, [0.0]]), offsets[:-1]
        ) if len(lens) else np.empty(0)
        sums = np.where(lens > 0, sums, 0.0)
        avg = np.divide(sums, lens, out=np.zeros_like(sums), where=lens > 0)
        return pa.table(
            {
                "doc_id": t.column(id_col),
                "n_tokens": pa.array(lens, pa.int64()),
                "avg_logprob": pa.array(np.round(avg, 6), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def bm25_scores(
    docs,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 score of every document against a fixed term query
    (Robertson/Walker; the Lucene idf variant ln((N-df+0.5)/(df+0.5)+1))
    — the classic retrieval scorer next to the dense kNN family.
    Output: (doc_id, bm25) with bm25 = 0 for docs matching no term.

    Scale shape: ONE stats pass whose partial rows are a fixed-width
    vector [n_docs, n_tokens, df_0..df_T] per batch (T = |query_terms|,
    a handful), reduced by a driver-side Sum aggregate — no vocabulary
    shuffle at all, unlike the unigram/tfidf passes, because only the
    query's own terms need corpus statistics. The scoring pass is
    stateless map_batches: per-term tf via hashed-token compare +
    segmented reduceat."""
    from ray.data.aggregate import Sum

    from record_matching_ray.functions.hashing import hash_strings

    terms = [t.lower() for t in query_terms]
    T = len(terms)
    th = hash_strings(terms)

    def stats_partial(t: pa.Table) -> pa.Table:
        token_lists = [_ws_tokens(s.lower()) for s in t.column(text_col).to_pylist()]
        lens = np.array([len(x) for x in token_lists], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        flat = hash_strings([tok for toks in token_lists for tok in toks])
        cols = {
            "n_docs": pa.array([len(token_lists)], pa.int64()),
            "n_tokens": pa.array([int(lens.sum())], pa.int64()),
        }
        for i in range(T):
            eq = (flat == th[i]).astype(np.int64)
            per_doc = np.add.reduceat(
                np.concatenate([eq, [0]]), offsets[:-1]
            ) if len(lens) else np.empty(0, dtype=np.int64)
            per_doc = np.where(lens > 0, per_doc, 0)
            cols[f"df_{i}"] = pa.array([int((per_doc > 0).sum())], pa.int64())
        return pa.table(cols)

    agg = docs.map_batches(stats_partial, batch_format="pyarrow").aggregate(
        Sum(on="n_docs", alias_name="n_docs"),
        Sum(on="n_tokens", alias_name="n_tokens"),
        *[Sum(on=f"df_{i}", alias_name=f"df_{i}") for i in range(T)],
    )
    N = float(agg["n_docs"])
    avgdl = float(agg["n_tokens"]) / N if N else 1.0
    idf = np.array(
        [
            np.log((N - agg[f"df_{i}"] + 0.5) / (agg[f"df_{i}"] + 0.5) + 1.0)
            for i in range(T)
        ],
        dtype=np.float64,
    )

    def score(t: pa.Table) -> pa.Table:
        token_lists = [_ws_tokens(s.lower()) for s in t.column(text_col).to_pylist()]
        lens = np.array([len(x) for x in token_lists], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        flat = hash_strings([tok for toks in token_lists for tok in toks])
        dl = lens.astype(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        total = np.zeros(len(lens), dtype=np.float64)
        for i in range(T):
            eq = (flat == th[i]).astype(np.int64)
            tf = np.add.reduceat(
                np.concatenate([eq, [0]]), offsets[:-1]
            ) if len(lens) else np.empty(0, dtype=np.int64)
            tf = np.where(lens > 0, tf, 0).astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                contrib = idf[i] * tf * (k1 + 1.0) / (tf + norm)
            total += np.where(tf > 0, contrib, 0.0)
        return pa.table(
            {
                "doc_id": t.column(id_col),
                "bm25": pa.array(np.round(total, 6), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


# GPT-2-style pretokenizer, restricted to RE2 (no lookahead) so pyarrow's
# kernel and DuckDB's regexp_extract_all — both RE2, leftmost-first —
# count IDENTICAL matches. The brief's "BPE-ish regex" token counter:
# contractions, letter runs, digit runs, punctuation runs, whitespace.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_stats(batch: pa.Table) -> pa.Table:
    """doc_id, n_bpe_tokens, n_ws_tokens — BPE-ish pretoken count next to
    the whitespace count (their ratio is a tokenizer-cost estimator for
    training-data budgeting). Fully vectorized: one RE2 kernel call for
    the batch, no Python per row."""
    import pyarrow.compute as pc

    texts = batch.column("text")
    n_bpe = pc.count_substring_regex(texts, BPE_PRETOKEN_RE)
    txt = texts.to_pylist()
    n_ws = np.fromiter(
        (len(_WS_SPLIT.split(t.strip())) for t in txt), dtype=np.int64, count=len(txt)
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
            "n_ws_tokens": pa.array(n_ws, pa.int64()),
        }
    )


def approx_distinct_per_group(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    precision_bits: int = 10,
):
    """GROUP BY group_col, approx COUNT(DISTINCT value_col) — the grouped
    companion to approx_distinct. Per batch each group folds into its own
    2^b register array (one row per group per batch, the registers ride
    as a list column); one groupby(group) merges registers elementwise
    and estimates. Shuffle volume is O(groups x batches x 2^b) — bounded
    by the group vocabulary, never the row count.

    Returns a Dataset (group, est, rse) with rse = 1.04/sqrt(m)."""
    import numpy as np

    from record_matching_ray.functions.hashing import _U64, hash_strings, mix64

    m = 1 << precision_bits
    width = 64 - precision_bits

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(value_col).to_pylist()
        if vals and not isinstance(vals[0], str):
            vals = [str(v) for v in vals]
        groups = np.asarray(
            ["" if g is None else str(g) for g in t.column(group_col).to_pylist()],
            dtype=object,
        )
        h = mix64(hash_strings(vals))
        idx = (h & _U64(m - 1)).astype(np.int64)
        rest = (h >> np.uint64(precision_bits)).astype(np.uint64)
        rank = np.zeros(len(h), dtype=np.int64)
        nonzero = rest != 0
        rank[nonzero] = width - np.floor(
            np.log2(rest[nonzero].astype(np.float64))
        ).astype(np.int64)
        rank[~nonzero] = width + 1
        uniq, codes = np.unique(groups, return_inverse=True)
        regs = np.zeros((len(uniq), m), dtype=np.int64)
        np.maximum.at(regs, (codes, idx), rank)
        return pa.table(
            {
                group_col: pa.array(uniq.tolist(), pa.string()),
                "regs": pa.FixedSizeListArray.from_arrays(
                    pa.array(regs.ravel(), pa.int64()), m
                ),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        regs = (
            g.column("regs")
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(g.num_rows, m)
        )
        r = regs.max(axis=0)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.power(2.0, -r.astype(np.float64)))
        zeros = int((r == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        return pa.table(
            {
                group_col: pa.array([g.column(group_col)[0].as_py()], pa.string()),
                "est": pa.array([int(round(est))], pa.int64()),
                "rse": pa.array([1.04 / np.sqrt(m)], pa.float64()),
            }
        )

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(merge, batch_format="pyarrow")
    )


def source_token_kl(
    docs: ray.data.Dataset,
    text_col: str = "text",
    group_col: str = "source",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-group KL divergence KL(P_group || P_corpus) between unigram
    token distributions — the data-mixture diagnostic that quantifies how
    far each source's language drifts from the blended corpus (companion
    to source_mixture_weights' n^alpha shares).

    Scale shape: ONE token-pk shuffle. Each batch collapses to its
    (group, token) vocabulary; every row of a token lands in the same
    partition, so a single sweep finishes c_st AND the corpus marginal
    C_t per segment without a join. Group totals N_s are a counted-small
    driver relation (#groups rows) broadcast into the sweep. Per-group
    terms leave each partition pre-summed (rows = groups x partitions),
    so the final groupby is tiny. KL rounds to 6 decimals with the same
    expression tree as the DuckDB oracle: (c/ns) * ln((c/ns)/(ct/n))."""
    import pandas as pd

    from record_matching_ray.functions.hashing import hash_strings, mix64, _U64
    from record_matching_ray.stages.util import (
        conformed,
        coarse_groupby_partitions,
        shuffle_partitions,
    )

    if num_partitions is None:
        num_partitions = coarse_groupby_partitions()
    P = num_partitions

    PART = pa.schema(
        [
            ("pk", pa.int64()),
            ("g", pa.string()),
            ("tok", pa.string()),
            ("c", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        groups, toks = [], []
        for g, s in zip(
            t.column(group_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            s = s.strip().lower()
            if not s:
                continue
            ts = _WS_SPLIT.split(s)
            toks.extend(ts)
            groups.extend([g] * len(ts))
        if not toks:
            return PART.empty_table()
        fused = np.asarray(
            [g + "\x1f" + tk for g, tk in zip(groups, toks)], dtype=object
        )
        codes, uniq = pd.factorize(fused, sort=False)
        cnts = np.bincount(codes, minlength=len(uniq))
        gs, tks = zip(*(u.split("\x1f", 1) for u in uniq))
        pk = (mix64(hash_strings(list(tks))) % _U64(P)).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(pk, pa.int64()),
                "g": pa.array(list(gs), pa.string()),
                "tok": pa.array(list(tks), pa.string()),
                "c": pa.array(cnts, pa.int64()),
            }
        )

    # materialize the VOCABULARY-bounded partial relation (rows = distinct
    # (group, token) per batch, never the corpus) so the N_s pass below
    # doesn't re-tokenize the whole corpus a second time
    parts = conformed(
        docs.map_batches(partial, batch_format="pyarrow"), PART
    ).materialize()

    # group totals: vocabulary-row partials -> #groups rows on the driver
    from record_matching_ray.stages.util import bounded_take_all

    ns_rows = bounded_take_all(
        parts.map_batches(
            lambda t: pa.TableGroupBy(t.select(["g", "c"]), ["g"])
            .aggregate([("c", "sum")])
            .rename_columns(["g", "c"]),
            batch_format="pyarrow",
        )
        .groupby("g")
        .sum("c"),
        1_000_000,  # one row per distinct group key (source / lang)
        "per-group token totals",
    )
    ns_map = {r["g"]: float(r["sum(c)"]) for r in ns_rows}
    n_total = float(sum(ns_map.values()))

    def sweep(g: pa.Table) -> pa.Table:
        gs = np.asarray(g.column("g").to_pylist(), dtype=object)
        tks = np.asarray(g.column("tok").to_pylist(), dtype=object)
        cs = g.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((gs, tks))
        g_s, t_s, c_s = gs[order], tks[order], cs[order]
        n = len(order)
        # collapse duplicate (token, group) partials from different batches
        new_pair = np.concatenate(
            ([True], (t_s[1:] != t_s[:-1]) | (g_s[1:] != g_s[:-1]))
        )
        pair_id = np.cumsum(new_pair) - 1
        c_st = np.bincount(pair_id, weights=c_s)
        pg = g_s[new_pair]
        pt = t_s[new_pair]
        # corpus marginal per token segment
        new_tok = np.concatenate(([True], pt[1:] != pt[:-1]))
        tok_id = np.cumsum(new_tok) - 1
        ct = np.bincount(tok_id, weights=c_st)[tok_id]
        ns = np.asarray([ns_map[x] for x in pg], dtype=np.float64)
        p = c_st / ns
        term = p * np.log(p / (ct / n_total))
        uniq_g, gidx = np.unique(pg, return_inverse=True)
        acc = np.zeros(len(uniq_g), dtype=np.float64)
        np.add.at(acc, gidx, term)
        return pa.table(
            {
                group_col: pa.array(list(uniq_g), pa.string()),
                "kl_part": pa.array(acc, pa.float64()),
            }
        )

    acc = (
        parts.groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
        .groupby(group_col)
        .sum("kl_part")
    )

    OUT = pa.schema(
        [
            (group_col, pa.string()),
            ("n_tokens", pa.int64()),
            ("kl", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(kl_part)" not in t.column_names:
            return OUT.empty_table()
        gs = t.column(group_col).to_pylist()
        kl = t.column("sum(kl_part)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                group_col: pa.array(gs, pa.string()),
                "n_tokens": pa.array(
                    [int(ns_map[x]) for x in gs], pa.int64()
                ),
                "kl": pa.array(np.round(kl, 6), pa.float64()),
            }
        )

    return conformed(acc.map_batches(finish, batch_format="pyarrow"), OUT)


def bigram_logprob(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
):
    """Bigram-LM quality score per document: the mean
    ``ln(c(a,b) / cl(a))`` over the doc's adjacent token pairs, under the
    corpus' own bigram distribution (the conditional extension of
    unigram_logprob; cl(a) = total bigram occurrences with left token a).
    Output: (doc_id, n_bigrams, avg_logprob); docs with < 2 tokens score
    0 with n_bigrams = 0.

    Scale shape: ONE (bigram-hash, left-hash, partial-count) shuffle
    bounded by the corpus BIGRAM vocabulary; the left-context totals
    derive from that aggregate (a second, vocabulary-sized groupby — no
    second pass over the corpus). Broadcast heads keep count >= min_count
    rows; every dropped row has count EXACTLY min_count-1 = 1, so the
    default ln(1) = 0 term reproduces the full distribution bit for bit
    (same exact-tail contract as unigram_logprob / tfidf.idf_table)."""
    import ray
    import ray.data

    from record_matching_ray.functions.hashing import (
        _U64,
        combine_rows,
        hash_strings,
    )

    def _flat_bigrams(texts: list[str]):
        token_lists = [_ws_tokens(s.lower()) for s in texts]
        lens = np.array([len(x) for x in token_lists], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        flat = hash_strings([tok for toks in token_lists for tok in toks])
        if len(flat) < 2:
            return (
                lens,
                np.empty(0, dtype=_U64),
                np.empty(0, dtype=_U64),
            )
        valid = np.ones(len(flat) - 1, dtype=bool)
        # positions whose successor starts a new doc (and doc boundaries
        # at the very end) are not bigrams
        ends = offsets[1:-1] - 1
        valid[ends[ends >= 0]] = False
        pairs = np.ascontiguousarray(
            np.stack([flat[:-1], flat[1:]], axis=1)
        )
        bh = combine_rows(pairs)[valid]
        lh = flat[:-1][valid]
        return lens, bh, lh

    def bc_partial(t: pa.Table) -> pa.Table:
        _, bh, lh = _flat_bigrams(t.column(text_col).to_pylist())
        ub, idx, c = np.unique(bh, return_index=True, return_counts=True)
        return pa.table(
            {
                "bh": pa.array(ub.view(np.int64), pa.int64()),
                "lh": pa.array(lh[idx].view(np.int64), pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    bc = (
        docs.map_batches(bc_partial, batch_format="pyarrow")
        .groupby("bh")
        .aggregate(
            ray.data.aggregate.Sum(on="cnt", alias_name="cnt"),
            ray.data.aggregate.Min(on="lh", alias_name="lh"),
        )
        .materialize()
    )
    # left-context totals from the bigram aggregate — vocabulary-sized
    lc = bc.groupby("lh").sum("cnt").rename_columns({"sum(cnt)": "cl"})

    def _head(ds, key, val, floor):
        import ray as _ray

        parts = [
            t
            for t in (_ray.get(r) for r in ds.filter(
                expr=f"{val} >= {int(floor)}"
            ).to_arrow_refs())
            if t.num_rows and t.num_columns
        ]
        if not parts:
            return np.empty(0, dtype=_U64), np.empty(0, dtype=np.float64)
        tt = pa.concat_tables(parts)
        keys = tt.column(key).to_numpy(zero_copy_only=False).view(_U64)
        vals = tt.column(val).to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(keys)
        return keys[order], np.log(vals[order])

    b_keys, b_logc = _head(bc, "bh", "cnt", min_count)
    l_keys, l_logc = _head(lc, "lh", "cl", min_count)
    ref = ray.put((b_keys, b_logc, l_keys, l_logc))

    def _lookup(keys, logs, h):
        if len(keys) == 0 or len(h) == 0:
            return np.zeros(len(h), dtype=np.float64)
        pos = np.clip(np.searchsorted(keys, h), 0, len(keys) - 1)
        return np.where(keys[pos] == h, logs[pos], 0.0)  # ln(1) = 0 tail

    def score(t: pa.Table) -> pa.Table:
        bk, bl, lk, ll = ray.get(ref)
        lens, bh, lh = _flat_bigrams(t.column(text_col).to_pylist())
        lp = _lookup(bk, bl, bh) - _lookup(lk, ll, lh)
        nb = np.maximum(lens - 1, 0)
        boffsets = np.concatenate([[0], np.cumsum(nb)])
        sums = (
            np.add.reduceat(np.concatenate([lp, [0.0]]), boffsets[:-1])
            if len(lens)
            else np.empty(0)
        )
        sums = np.where(nb > 0, sums, 0.0)
        avg = np.divide(sums, nb, out=np.zeros_like(sums), where=nb > 0)
        return pa.table(
            {
                "doc_id": t.column(id_col),
                "n_bigrams": pa.array(nb, pa.int64()),
                "avg_logprob": pa.array(np.round(avg, 6), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_logratio(
    docs,
    target_col: str = "lang",
    target_value: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document
    ``log p_target(x) - log p_source(x)`` under Laplace-smoothed bag-of-
    token models, target = rows where ``target_col == target_value``,
    source = the whole corpus. High scores mark raw-corpus documents
    that look like the target domain — the DSIR resampling key.
    Output: (doc_id, n_tokens, log_ratio) with round(sum, 6).

    Scale shape: ONE tf pass emitting (token, corpus-count,
    target-count) partials — a single vocabulary-bounded shuffle covers
    both models; the smoothed log tables broadcast once (ray.put, the
    tfidf.idf_table contract); scoring is a stateless second pass.
    Laplace +1 smoothing uses V = corpus vocabulary size, so every
    corpus token has finite probability under both models."""
    import ray
    import ray.data  # noqa: F401

    from record_matching_ray.functions.hashing import _U64, hash_strings

    def tf_partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        is_t = np.array(
            [v == target_value for v in t.column(target_col).to_pylist()],
            dtype=bool,
        )
        token_lists = [_ws_tokens(s.lower()) for s in texts]
        lens = np.array([len(x) for x in token_lists], dtype=np.int64)
        flat = hash_strings([tok for toks in token_lists for tok in toks])
        tmask = np.repeat(is_t, lens)
        uh, inv, c = np.unique(flat, return_inverse=True, return_counts=True)
        ct = np.bincount(inv, weights=tmask.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "tok": pa.array(uh.view(np.int64), pa.int64()),
                "cs": pa.array(c.astype(np.int64), pa.int64()),
                "ct": pa.array(ct, pa.int64()),
            }
        )

    tf = (
        docs.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(
            ray.data.aggregate.Sum(on="cs", alias_name="cs"),
            ray.data.aggregate.Sum(on="ct", alias_name="ct"),
        )
        .materialize()
    )
    parts = [
        t
        for t in (ray.get(r) for r in tf.to_arrow_refs())
        if t.num_rows and t.num_columns
    ]
    if parts:
        tt = pa.concat_tables(parts)
        toks = tt.column("tok").to_numpy(zero_copy_only=False).view(_U64)
        cs = tt.column("cs").to_numpy(zero_copy_only=False).astype(np.float64)
        ct = tt.column("ct").to_numpy(zero_copy_only=False).astype(np.float64)
    else:
        toks = np.empty(0, dtype=_U64)
        cs = ct = np.empty(0, dtype=np.float64)
    order = np.argsort(toks)
    toks, cs, ct = toks[order], cs[order], ct[order]
    v = float(len(toks))
    n_s, n_t = float(cs.sum()), float(ct.sum())
    # per-token lp shared expression with the oracle:
    # (ln(ct+1) - ln(Nt+V)) - (ln(cs+1) - ln(Ns+V))
    lp_tab = (np.log(ct + 1.0) - np.log(n_t + v)) - (
        np.log(cs + 1.0) - np.log(n_s + v)
    )
    ref = ray.put((toks, lp_tab))

    def score(t: pa.Table) -> pa.Table:
        stoks, slp = ray.get(ref)
        token_lists = [_ws_tokens(s.lower()) for s in t.column(text_col).to_pylist()]
        lens = np.array([len(x) for x in token_lists], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        flat = hash_strings([tok for toks_ in token_lists for tok in toks_])
        if len(stoks) and len(flat):
            pos = np.clip(np.searchsorted(stoks, flat), 0, len(stoks) - 1)
            lp = np.where(stoks[pos] == flat, slp[pos], 0.0)
        else:
            lp = np.zeros(len(flat), dtype=np.float64)
        sums = (
            np.add.reduceat(np.concatenate([lp, [0.0]]), offsets[:-1])
            if len(lens)
            else np.empty(0)
        )
        sums = np.where(lens > 0, sums, 0.0)
        return pa.table(
            {
                "doc_id": t.column(id_col),
                "n_tokens": pa.array(lens, pa.int64()),
                "log_ratio": pa.array(np.round(sums, 6), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — mergeable frequency
# estimation, the sketch companion to the exact top_tokens shuffle


_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def count_min_sketch(
    docs: "ray.data.Dataset", text_col: str = "text", depth: int = 4, width: int = 4096
) -> tuple[np.ndarray, int]:
    """Corpus-wide token-frequency Count-Min sketch: per batch each of
    ``depth`` hash rows scatters token counts into ``width`` counters;
    one (depth*width)-int64 row per batch reaches the driver and merges
    by plain addition (the sketch is fully associative — on a real
    cluster the same partials would fold through a tree reduce). The
    point estimate min_d(row_d[h_d(x)]) never under-counts and
    over-counts by at most e/width * N with prob 1 - e^-depth.

    Returns (sketch[depth, width], N total token occurrences)."""
    if depth > len(_CMS_SEEDS):
        raise ValueError(f"depth <= {len(_CMS_SEEDS)} supported")
    from record_matching_ray.functions.hashing import hash_strings, mix64

    seeds = _CMS_SEEDS[:depth]

    def partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for s in t.column(text_col).to_pylist():
            s = (s or "").strip().lower()
            if s:
                toks.extend(_WS_SPLIT.split(s))
        sk = np.zeros((depth, width), dtype=np.int64)
        n = len(toks)
        if toks:
            # count each distinct token once, scatter with multiplicity
            import pandas as pd

            codes, uniq = pd.factorize(np.asarray(toks, dtype=object), sort=False)
            cnts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
            h = mix64(hash_strings(list(uniq)))
            for d in range(depth):
                idx = (mix64(h ^ seeds[d]) % np.uint64(width)).astype(np.int64)
                np.add.at(sk[d], idx, cnts)
        return pa.table(
            {
                "sk": pa.array([sk.reshape(-1).tolist()], pa.list_(pa.int64())),
                "n": pa.array([n], pa.int64()),
            }
        )

    from record_matching_ray.stages.util import streamed_rows

    # one (depth x width) partial sketch per input block: streamed fold,
    # constant driver memory (take_all() at 10^6 blocks would hold
    # ~blocks x depth x width x 8B at once)
    sk = np.zeros((depth, width), dtype=np.int64)
    total = 0
    for row in streamed_rows(
        docs.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow"
        )
    ):
        sk += np.asarray(row["sk"], dtype=np.int64).reshape(depth, width)
        total += int(row["n"])
    return sk, total


def count_min_estimate(
    sketch: np.ndarray, tokens: list[str], depth: int = 4, width: int = 4096
) -> np.ndarray:
    """Point estimates min over rows for each token."""
    from record_matching_ray.functions.hashing import hash_strings, mix64

    h = mix64(hash_strings(tokens))
    est = np.full(len(tokens), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        idx = (mix64(h ^ _CMS_SEEDS[d]) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, sketch[d, idx])
    return est


def count_min_topk_check(
    docs: "ray.data.Dataset",
    k: int = 20,
    text_col: str = "text",
    depth: int = 4,
    width: int = 4096,
) -> "ray.data.Dataset":
    """Invariant wrapper (same pattern as approx_quantiles_invariant):
    for the exact top-k tokens, the CMS estimate must satisfy the sketch
    guarantee est in [exact, exact + ceil(e/width * N)]. Emits the same
    (token, cnt, rank, ok=true) relation the SQL oracle recomputes
    exactly — a sketch failure flips ok and fails the value hash."""
    import ray.data as rd

    exact = top_tokens(docs, k=k, text_col=text_col).take_all()  # k rows
    sk, total = count_min_sketch(docs, text_col=text_col, depth=depth, width=width)
    toks = [r["token"] for r in exact]
    est = count_min_estimate(sk, toks, depth=depth, width=width)
    bound = int(np.ceil(np.e / width * total))
    out = pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "cnt": pa.array([r["cnt"] for r in exact], pa.int64()),
            "rank": pa.array([r["rank"] for r in exact], pa.int64()),
            "ok": pa.array(
                [
                    bool(e >= c and e - c <= bound)
                    for e, c in zip(est.tolist(), (r["cnt"] for r in exact))
                ],
                pa.bool_(),
            ),
        }
    )
    return rd.from_arrow(out)


def zipf_slope(docs, text_col: str = "text"):
    """Zipf rank-frequency fit over the corpus vocabulary: OLS slope and
    intercept of ln(count) on ln(rank), rank = frequency order. Healthy
    natural-language corpora sit near slope -1 (Zipf 1949); strong
    departures flag boilerplate floods or template spam — a corpus-level
    quality gate next to the per-doc Gopher/CCNet signals.

    Scale shape: the TF pass shuffles hashed (token, partial-count) rows
    (vocabulary-bounded, same contract as unigram_logprob); the rank
    regression needs only the COUNT HISTOGRAM (distinct count values,
    ~sqrt(corpus) rows), because tokens tied at the same count share a
    frequency, so permuting ranks inside a tie block leaves the (ln rank,
    ln count) multiset unchanged — the driver expands ranks 1..V from the
    histogram (V floats, vocab-bounded) and fits the same pairs the SQL
    row_number() oracle sees, without ever ranking tokens distributively.

    Output (one row): n_vocab, slope, intercept (round-6)."""
    import ray
    import ray.data

    from record_matching_ray.functions.hashing import hash_strings
    from record_matching_ray.stages.util import conformed, round6_sql

    def tf_partial(t: pa.Table) -> pa.Table:
        token_lists = [_ws_tokens(s.lower()) for s in t.column(text_col).to_pylist()]
        flat = hash_strings([tok for toks in token_lists for tok in toks])
        uh, c = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "tok": pa.array(uh.view(np.int64), pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    tf = (
        docs.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("tok")
        .sum("cnt")
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        name = "sum(cnt)" if "sum(cnt)" in t.column_names else "cnt"
        if t.num_rows == 0 or name not in t.column_names:
            return pa.table(
                {"c": pa.array([], pa.int64()), "k": pa.array([], pa.int64())}
            )
        c = t.column(name).to_numpy(zero_copy_only=False)
        vals, k = np.unique(c, return_counts=True)
        return pa.table(
            {"c": pa.array(vals.astype(np.int64), pa.int64()),
             "k": pa.array(k.astype(np.int64), pa.int64())}
        )

    from record_matching_ray.stages.util import bounded_take_all

    hist_rows = bounded_take_all(
        tf.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c")
        .sum("k"),
        1_000_000,  # one row per DISTINCT frequency value (<< vocabulary)
        "token frequency histogram",
    )
    cs = np.array([r["c"] for r in hist_rows], dtype=np.int64)
    ks = np.array([r.get("sum(k)", r.get("k")) for r in hist_rows], dtype=np.int64)
    order = np.argsort(-cs)  # frequency-descending rank blocks
    cs, ks = cs[order], ks[order]
    v = int(ks.sum())
    # expand: ranks 1..V; rank r falls in the block its prefix sum covers
    y = np.log(np.repeat(cs.astype(np.float64), ks))
    x = np.log(np.arange(1, v + 1, dtype=np.float64))
    mx, my = x.mean(), y.mean()
    sxx = float(np.sum((x - mx) * (x - mx)))
    sxy = float(np.sum((x - mx) * (y - my)))
    slope = sxy / sxx
    intercept = my - slope * mx
    return conformed(
        ray.data.from_arrow(
            pa.table(
                {
                    "n_vocab": pa.array([v], pa.int64()),
                    "slope": pa.array([float(round6_sql(slope))], pa.float64()),
                    "intercept": pa.array(
                        [float(round6_sql(intercept))], pa.float64()
                    ),
                }
            )
        ),
        pa.schema(
            [("n_vocab", pa.int64()), ("slope", pa.float64()),
             ("intercept", pa.float64())]
        ),
    )


ZIPF_SLOPE_SQL = r"""
WITH toks AS (
  SELECT unnest(list_filter(
           string_split_regex(lower(text), '\s+'), x -> x <> '')) AS tok
  FROM documents
),
tf AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
r AS (SELECT c, row_number() OVER (ORDER BY c DESC) AS rk FROM tf)
SELECT CAST(count(*) AS BIGINT) AS n_vocab,
       round(regr_slope(ln(c), ln(rk)), 6) AS slope,
       round(regr_intercept(ln(c), ln(rk)), 6) AS intercept
FROM r
"""


def doc_token_entropy(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc Shannon entropy (nats) of the token frequency distribution
    — the classic "is this doc degenerate repetition or diverse text"
    quality signal next to the Gopher repetition stats. Stateless
    per-batch pass; entropy = ln(n) - (1/n) * sum_tok c*ln(c) from exact
    integer counts, rounded half-away-from-zero at 6 decimals (the SQL
    oracle computes the identical expression from its own GROUP BY
    counts)."""
    import pyarrow as pa

    from record_matching_ray.stages.util import conformed, round6_sql

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ent = np.empty(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            toks = _ws_tokens(t.lower())
            n = len(toks)
            if n == 0:
                ent[i] = 0.0
                continue
            _, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            c = counts.astype(np.float64)
            ent[i] = np.log(n) - float(np.sum(c * np.log(c))) / n
        return pa.table(
            {
                "doc_id": batch.column(id_col),
                "entropy": pa.array(round6_sql(ent), pa.float64()),
            }
        )

    return conformed(
        docs.map_batches(stats, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("entropy", pa.float64())]),
    )


DOC_TOKEN_ENTROPY_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
),
cnt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
n AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY 1)
SELECT d.doc_id,
       round(CASE WHEN n.n IS NULL OR n.n = 0 THEN 0.0
                  ELSE ln(n.n) - (SELECT SUM(c * ln(c)) FROM cnt
                                  WHERE cnt.doc_id = d.doc_id) / n.n END,
             6) AS entropy
FROM documents d LEFT JOIN n ON n.doc_id = d.doc_id
"""


def source_hapax_ratio(docs, text_col: str = "text", source_col: str = "source"):
    """Per source: vocabulary size, hapax-legomena count (tokens seen
    exactly once across the source's docs) and their ratio — the
    long-tail vocabulary health check corpus curators run per domain.

    Shape: the source_token_kl layout — per-batch (source, token)
    vocabulary partials carrying pk = hash(token) % P, ONE pk shuffle
    co-locates every row of a token, and a vectorized per-partition
    sweep finishes the (source, token) counts and emits per-source
    (hapax, vocab) partials (rows = sources x partitions) for a tiny
    final groupby — never a composite-key native aggregate (the
    measured ~100x slow path). Ratio rounded 6, same expression as the
    oracle."""
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from record_matching_ray.functions.hashing import _U64, hash_strings, mix64
    from record_matching_ray.stages.util import (
        coarse_groupby_partitions,
        conformed,
        round6_sql,
    )

    P = coarse_groupby_partitions()
    PART = pa.schema(
        [
            ("pk", pa.int64()),
            ("source", pa.string()),
            ("tok", pa.string()),
            ("c", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        srcs_in = batch.column(source_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        groups, toks = [], []
        for s, t in zip(srcs_in, texts):
            ts = _ws_tokens(t.lower())
            toks.extend(ts)
            groups.extend([s] * len(ts))
        if not toks:
            return PART.empty_table()
        fused = np.asarray(
            [g + "\x1f" + tk for g, tk in zip(groups, toks)], dtype=object
        )
        codes, uniq = pd.factorize(fused, sort=False)
        cnts = np.bincount(codes, minlength=len(uniq))
        gs, tks = zip(*(u.split("\x1f", 1) for u in uniq))
        pk = (mix64(hash_strings(list(tks))) % _U64(P)).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(pk, pa.int64()),
                "source": pa.array(list(gs), pa.string()),
                "tok": pa.array(list(tks), pa.string()),
                "c": pa.array(cnts, pa.int64()),
            }
        )

    parts = conformed(docs.map_batches(partial, batch_format="pyarrow"), PART)

    def sweep(g: pa.Table) -> pa.Table:
        gs = np.asarray(g.column("source").to_pylist(), dtype=object)
        tks = np.asarray(g.column("tok").to_pylist(), dtype=object)
        cs = g.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((gs, tks))
        g_s, t_s, c_s = gs[order], tks[order], cs[order]
        new_pair = np.concatenate(
            ([True], (t_s[1:] != t_s[:-1]) | (g_s[1:] != g_s[:-1]))
        )
        seg = np.cumsum(new_pair) - 1
        totals = np.bincount(seg, weights=c_s.astype(np.float64)).astype(
            np.int64
        )
        pair_src = g_s[new_pair]
        out = pa.TableGroupBy(
            pa.table(
                {
                    "source": pa.array(pair_src, pa.string()),
                    "hapax": pa.array(
                        (totals == 1).astype(np.int64), pa.int64()
                    ),
                }
            ),
            "source",
        ).aggregate([("hapax", "sum"), ([], "count_all")])
        return out.rename_columns(["source", "hapax", "vocab"])

    folded = (
        parts.groupby("pk")
        .map_groups(sweep, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum(on="hapax", alias_name="hapax"),
            Sum(on="vocab", alias_name="vocab"),
        )
    )

    def ratio(t: pa.Table) -> pa.Table:
        h = t.column("hapax").to_numpy(zero_copy_only=False).astype(np.float64)
        v = t.column("vocab").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "source": t.column("source"),
                "vocab": t.column("vocab"),
                "hapax": t.column("hapax"),
                "hapax_ratio": pa.array(round6_sql(h / v), pa.float64()),
            }
        )

    return conformed(
        folded.map_batches(ratio, batch_format="pyarrow"),
        pa.schema(
            [
                ("source", pa.string()),
                ("vocab", pa.int64()),
                ("hapax", pa.int64()),
                ("hapax_ratio", pa.float64()),
            ]
        ),
    )


SOURCE_HAPAX_SQL = r"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
),
cnt AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2)
SELECT source,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hapax_ratio
FROM cnt GROUP BY 1
"""
