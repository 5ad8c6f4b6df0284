"""PII scrubbing for web-corpus curation: detect + redact emails, IPv4
addresses and phone numbers before text ships to a training set.

Stateless ``map_batches`` transform (compiled regexes at module import,
shared by every task). The three patterns are deliberately RE2-compatible
(no lookbehind/backrefs) so a DuckDB ``regexp_extract_all`` /
``regexp_replace(..., 'g')`` oracle can replicate them token-for-token —
replacement runs email -> ipv4 -> phone in that fixed order on both sides
(order matters: an IP inside an already-redacted email must not double
count).

Scale: pure per-row regex work, no shuffle; the redacted text column is
emitted alongside an md5 so downstream exact-dedup can run on scrubbed
content without re-materializing it.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

import ray.data

# RE2-compatible patterns, identical strings passed to the SQL oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

_EMAIL = re.compile(EMAIL_RE)
_IPV4 = re.compile(IPV4_RE)
_PHONE = re.compile(PHONE_RE)

_ORDER = ((_EMAIL, "<EMAIL>"), (_IPV4, "<IP>"), (_PHONE, "<PHONE>"))


def scrub_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id, n_emails, n_ips, n_phones, redacted_md5.

    Counts are measured on the pre-redaction text with the same pattern
    order as redaction; redacted_md5 is the md5 hex of the text after all
    three replacements (the full redacted string stays worker-local — at
    corpus scale only the 32-byte digest rides the shuffle unless a
    caller asks for the text itself via ``redact_text``)."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    n_emails = np.empty(n, dtype=np.int64)
    n_ips = np.empty(n, dtype=np.int64)
    n_phones = np.empty(n, dtype=np.int64)
    digests = []
    for i, t in enumerate(texts):
        red = t
        counts = []
        for rx, token in _ORDER:
            counts.append(len(rx.findall(red)))
            red = rx.sub(token, red)
        n_emails[i], n_ips[i], n_phones[i] = counts
        digests.append(hashlib.md5(red.encode("utf-8", "surrogatepass")).hexdigest())
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_emails": pa.array(n_emails, pa.int64()),
            "n_ips": pa.array(n_ips, pa.int64()),
            "n_phones": pa.array(n_phones, pa.int64()),
            "redacted_md5": pa.array(digests, pa.string()),
        }
    )


def redact_text(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id + the redacted text itself (for pipelines that feed the
    scrubbed corpus onward instead of just auditing it)."""
    texts = batch.column(text_col).to_pylist()
    out = []
    for t in texts:
        for rx, token in _ORDER:
            t = rx.sub(token, t)
        out.append(t)
    return pa.table(
        {"doc_id": batch.column("doc_id"), "text": pa.array(out, pa.string())}
    )


def run_scrub(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(scrub_pii, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Blocklist / gazetteer phrase filtering (the C4 "bad words" pass and the
# dictionary-matching half of entity gazetteers): count occurrences of a
# fixed multi-word phrase set per document, drop documents with any hit.


def phrase_blocklist(
    docs: ray.data.Dataset,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(id, n_hits, kept) per document, where n_hits counts token-aligned
    occurrences of ANY blocklist phrase (token-sequence equality, like an
    Aho-Corasick automaton restricted to word boundaries) and kept means
    zero hits.

    Scale shape: phrases are tiny by definition, so they compile once —
    grouped by token length L, each phrase hashed with the same
    polynomial window combine the corpus side uses — and broadcast via
    ``ray.put``; the corpus pass is ONE stateless map_batches doing a
    sorted-array membership count per present phrase length. No shuffle,
    no join; nothing scales with corpus size but the stream.

    Tokenization parity with the SQL oracle: lowercase, \\s+ split of
    trimmed text, strict L-gram windows."""
    import ray

    from record_matching_ray.functions.hashing import _U64, combine_rows, hash_strings
    from record_matching_ray.stages.decontaminate import _strict_ngram_hashes

    by_len: dict[int, list[np.ndarray]] = {}
    for p in phrases:
        toks = p.strip().lower().split()
        if not toks:
            continue
        h = hash_strings(toks).astype(_U64)
        by_len.setdefault(len(toks), []).append(h)
    tables = {
        L: np.unique(combine_rows(np.stack(hs))) for L, hs in by_len.items()
    }
    ref = ray.put(tables)

    OUT = pa.schema(
        [(id_col, pa.int64()), ("n_hits", pa.int64()), ("kept", pa.bool_())]
    )

    def scan(t: pa.Table) -> pa.Table:
        tabs: dict[int, np.ndarray] = ray.get(ref)
        texts = t.column(text_col).to_pylist()
        hits = np.zeros(len(texts), dtype=np.int64)
        for L, sorted_h in tabs.items():
            flat, offsets = _strict_ngram_hashes(texts, L)
            if len(flat):
                pos = np.searchsorted(sorted_h, flat)
                pos = np.clip(pos, 0, len(sorted_h) - 1)
                is_hit = (sorted_h[pos] == flat).astype(np.int64)
                hits += np.add.reduceat(
                    np.concatenate([is_hit, [0]]), offsets[:-1]
                ) * (np.diff(offsets) > 0)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_hits": pa.array(hits, pa.int64()),
                "kept": pa.array(hits == 0, pa.bool_()),
            }
        )

    from record_matching_ray.stages.util import conformed

    return conformed(
        docs.select_columns([id_col, text_col]).map_batches(
            scan, batch_format="pyarrow"
        ),
        OUT,
    )
