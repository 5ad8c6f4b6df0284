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

_WS_SPLIT = re.compile(r"\s+")
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


def run_token_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(token_stats, batch_format="pyarrow")


def run_quality(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(quality_stats, batch_format="pyarrow")


def run_langid(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(langid, batch_format="pyarrow")


def run_fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(fingerprint_docs, batch_format="pyarrow")


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

    regs = np.zeros(m, dtype=np.int64)
    for row in ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow"
    ).take_all():
        regs = np.maximum(regs, np.asarray(row["regs"], dtype=np.int64))
    # HLL estimate with small-range correction
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return int(round(est)), 1.04 / np.sqrt(m)
