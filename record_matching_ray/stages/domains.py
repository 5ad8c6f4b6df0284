"""Domain classification, entity-mention extraction, completeness flags.

Reference semantics re-expressed:
- keyword-list domain classification: ~130 keywords across 19 LCC
  domains matched against lowercased subject text, argmax match count ->
  ``primary_domain`` (claude_poc_v2/...v2.py:511-794). Here: a small
  declarative registry (DOMAIN_KEYWORDS) scored by total occurrence
  count, deterministic priority-ordered tie-break — same argmax shape,
  web vocabulary.
- entity-mention extraction: regex capitalized phrases from
  title/roles/subjects (poc2:376-397). Here: configurable pattern,
  default capitalized 2-word phrases.
- null/completeness flags: ``null_field_count``,
  ``context_completeness = 1 - nulls/n`` (poc2:259-260, 370, 399-411).

All three are stateless ``map_batches`` transforms; patterns/keyword sets
compile once per process (module constants), never per batch.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# Declarative domain registry (SURVEY.md §2.14: adding a domain = adding
# an entry; priority = dict order, ties break toward earlier entries).
DOMAIN_KEYWORDS: dict[str, tuple[str, ...]] = {
    "query": ("join", "scan", "filter", "agg", "group", "sort"),
    "streaming": ("stream", "window", "batch"),
    "storage": ("table", "row", "column", "hash"),
    "ml": ("vector", "spark", "data"),
}

_DOMAIN_RES: dict[str, re.Pattern] = {
    d: re.compile(r"\b(" + "|".join(map(re.escape, kws)) + r")\b")
    for d, kws in DOMAIN_KEYWORDS.items()
}

MENTION_PATTERN = r"([A-Z][a-z]+ [A-Z][a-z]+)"  # poc2:382-390 analog


def classify_domains(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(id cols…) + per-domain score + primary_domain. Scores are total
    keyword-occurrence counts; primary is the max-score domain (priority
    order on ties), 'unknown' when nothing matches."""
    texts = batch.column(text_col).to_pylist()
    names = list(DOMAIN_KEYWORDS)
    scores = {
        d: [len(_DOMAIN_RES[d].findall(t or "")) for t in texts] for d in names
    }
    primary = []
    for i in range(len(texts)):
        best, best_s = "unknown", 0
        for d in names:
            if scores[d][i] > best_s:
                best, best_s = d, scores[d][i]
        primary.append(best)
    cols = {"doc_id": batch.column("doc_id")}
    for d in names:
        cols[f"s_{d}"] = pa.array(scores[d], pa.int64())
    cols["primary_domain"] = pa.array(primary, pa.string())
    return pa.table(cols)


def extract_mentions(
    batch: pa.Table, text_col: str = "text", pattern: str = MENTION_PATTERN
) -> pa.Table:
    """Per-doc mention list + count via one compiled regex (non-
    overlapping leftmost matches — identical semantics to DuckDB/RE2
    ``regexp_extract_all``)."""
    rex = re.compile(pattern)
    texts = batch.column(text_col).to_pylist()
    mentions = [rex.findall(t or "") for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "mentions": pa.array(mentions, pa.list_(pa.string())),
            "n_mentions": pa.array([len(m) for m in mentions], pa.int64()),
        }
    )


def completeness_flags(
    batch: pa.Table, fields: tuple[str, ...] = ("text", "lang", "source")
) -> pa.Table:
    """null_field_count + completeness = 1 - nulls/len(fields), nulls
    meaning SQL NULL or empty string — vectorized pyarrow.compute."""
    n_fields = len(fields)
    null_count = None
    for f in fields:
        col = batch.column(f)
        is_missing = pc.or_(
            pc.is_null(col), pc.equal(pc.coalesce(col, ""), "")
        )
        as_int = pc.cast(is_missing, pa.int64())
        null_count = as_int if null_count is None else pc.add(null_count, as_int)
    completeness = pc.round(
        pc.subtract(
            1.0, pc.divide(pc.cast(null_count, pa.float64()), float(n_fields))
        ),
        ndigits=6,
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "null_field_count": null_count,
            "completeness": completeness,
        }
    )


def run_domains(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(classify_domains, batch_format="pyarrow")


def run_mentions(
    docs: ray.data.Dataset, pattern: str = MENTION_PATTERN
) -> ray.data.Dataset:
    return docs.map_batches(
        extract_mentions, fn_kwargs={"pattern": pattern}, batch_format="pyarrow"
    )


def run_completeness(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(completeness_flags, batch_format="pyarrow")
