"""URL canonicalization + URL-level exact dedup over web-page tables.

The north-star blocking key family starts from "canonical-URL-host"; the
reference dedups whole records by content hash only
(record_matching/main.py:89-93). Common-Crawl-style curation needs the
URL side too: the same page is fetched as http/https, with/without
``www.``, with tracking params (``utm_*``, ``fbclid``, ``gclid``), with a
fragment, or with a trailing slash. Canonicalizing before URL dedup
collapses those families without touching page content.

Canonical form (mirrored exactly by the DuckDB oracle in
``__ray_entry__._URL_CANON_CTE`` — keep the two in sync):

1. drop the fragment (everything from the first ``#``);
2. parse ``scheme://authority`` + path + query; a URL with no
   ``scheme://`` prefix canonicalizes to its lowercased fragment-stripped
   self with host ``''``;
3. host = lowercased authority, leading ``www.`` stripped, default ports
   ``:80``/``:443`` stripped — the scheme itself is dropped (http/https
   duplicates collapse);
4. path keeps its case, trailing ``/``s stripped;
5. query params split on ``&``; empty params and tracking params
   (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``ref``, ``referrer``)
   dropped; the rest sorted lexicographically and rejoined;
6. canonical = host + path (+ ``?`` + query if any params survive).

Scale shape: canonicalization is a stateless ``map_batches`` (compiled
regexes, no lookups — embarrassingly parallel); ``url_dedup`` is the
exact-dedup shuffle specialized to the canonical URL key with per-batch
partial combine, so the shuffle moves one row per (canon_url, batch).
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

from record_matching_ray.stages.util import conformed

_AUTH_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)([^?#]*)")
_TRACKER_RE = re.compile(
    r"^(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid|ref|referrer)(=|$)"
)
_PORT_RE = re.compile(r":(80|443)$")


def canonicalize_url(url: str) -> tuple[str, str]:
    """Returns (host, canon_url). Pure function of the URL string."""
    s = url.split("#", 1)[0]
    m = _AUTH_RE.match(s)
    if not m:
        return "", s.lower()
    host = _PORT_RE.sub("", m.group(1).lower())
    if host.startswith("www."):
        host = host[4:]
    path = m.group(2).rstrip("/")
    qpos = s.find("?")
    query = s[qpos + 1 :] if qpos >= 0 else ""
    params = sorted(p for p in query.split("&") if p and not _TRACKER_RE.match(p))
    canon = host + path + ("?" + "&".join(params) if params else "")
    return host, canon


def canonicalize_urls(
    pages: ray.data.Dataset, url_col: str = "url"
) -> ray.data.Dataset:
    """Adds (host, canon_url) columns. Stateless map_batches."""

    def per_batch(t: pa.Table) -> pa.Table:
        hosts: list[str] = []
        canons: list[str] = []
        for u in t.column(url_col).to_pylist():
            h, c = canonicalize_url(u or "")
            hosts.append(h)
            canons.append(c)
        return t.append_column("host", pa.array(hosts, pa.string())).append_column(
            "canon_url", pa.array(canons, pa.string())
        )

    return pages.map_batches(per_batch, batch_format="pyarrow")


def url_dedup(
    pages: ray.data.Dataset, url_col: str = "url"
) -> ray.data.Dataset:
    """(canon_url, cnt, keep_url) per distinct canonical URL — the
    exact-dedup shuffle (stages/dedup.py:exact_dedup) keyed on the
    canonical form. keep_url = lexicographic min of the raw URLs in the
    family (deterministic representative)."""

    def partial(t: pa.Table) -> pa.Table:
        canons = [
            canonicalize_url(u or "")[1] for u in t.column(url_col).to_pylist()
        ]
        g = pa.TableGroupBy(
            pa.table(
                {
                    "canon_url": pa.array(canons, pa.string()),
                    "u": t.column(url_col).cast(pa.string()),
                }
            ),
            "canon_url",
        ).aggregate([("u", "count"), ("u", "min")])
        return g.rename_columns(["canon_url", "cnt", "keep_url"])

    partials = pages.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("canon_url").aggregate(
        ray.data.aggregate.Sum(on="cnt", alias_name="cnt"),
        ray.data.aggregate.Min(on="keep_url", alias_name="keep_url"),
    )
    return conformed(
        out,
        pa.schema(
            [
                ("canon_url", pa.string()),
                ("cnt", pa.int64()),
                ("keep_url", pa.string()),
            ]
        ),
    )
