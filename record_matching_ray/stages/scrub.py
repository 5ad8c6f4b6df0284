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
