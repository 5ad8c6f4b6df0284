"""Deterministic synthetic web-page corpus generator (FIXTURES.md §1-3).

Mirrors the role of the reference's labeled benchmark corpus
(benchmark_data_records.csv + benchmark_data_matches_expanded_small.csv +
CID cluster labels, record_matching/context.py:114-115, main.py:717) recast
onto the (url, warc_ts, html, text, lang) web-page shape required by
BASELINE.json input_hint.

Guarantees:
- fully deterministic for a given (n_pages, n_entities, seed);
- `text` is exactly extract_text(html) (the byte-identical invariant);
- pages of one entity share a canonical host (mostly) AND high shingle
  overlap, so host + MinHash-LSH blocking co-blocks all true pairs —
  mirroring the reference finding that its blocking key covered 100% of
  true matches (claude_poc/blocking_analysis_.../report.txt);
- Zipf-skewed host distribution with head domains (hot-block salting
  tests) and a long-tailed cluster-size distribution with one giant
  entity (reference: 316 clusters, max size 398, 89% singletons).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

from record_matching_ray.stages.extract import extract_text

_VOCAB = [
    f"w{i:03d}" for i in range(400)
] + "the a of and in record match entity page data web site archive library author title work press journal review index".split()

_FIRST = [
    "anna", "boris", "carla", "david", "elena", "franz", "grace", "henry",
    "irene", "jacob", "karin", "louis", "maria", "nils", "olga", "peter",
    "quinn", "rosa", "stefan", "tanja", "ulrich", "vera", "walter", "xenia",
]
_LAST = [
    "schubert", "smith", "mueller", "garcia", "tanaka", "ivanov", "dubois",
    "rossi", "kim", "novak", "larsen", "haddad", "okafor", "silva", "wang",
    "kowalski", "berg", "fischer", "moreau", "costa", "weber", "janssen",
]
_LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]
_EPOCH = _dt.datetime(2024, 1, 1)


def _entity_sizes(n_pages: int, n_entities: int, rng: np.random.RandomState) -> np.ndarray:
    """Long-tailed sizes summing to n_pages: one giant (~5% of pages),
    a zipf body, many singletons."""
    sizes = np.ones(n_entities, dtype=np.int64)
    remaining = n_pages - n_entities
    if remaining <= 0:
        return sizes
    giant = min(remaining // 2, max(2, int(0.05 * n_pages)))
    sizes[0] += giant
    remaining -= giant
    if remaining > 0:
        w = 1.0 / np.arange(2, n_entities + 2) ** 1.5
        w /= w.sum()
        extra = rng.multinomial(remaining, w)
        sizes += extra
    return sizes


def make_pages(
    n_pages: int, n_entities: int, seed: int = 42
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Returns (pages, labeled_pairs, truth_clusters) Arrow tables.

    pages: url, warc_ts (timestamp[us]), html (binary), text, lang
    labeled_pairs: left, right, match (FIXTURES.md §2)
    truth_clusters: url, entity_id (FIXTURES.md §3)
    """
    rng = np.random.RandomState(seed)
    sizes = _entity_sizes(n_pages, n_entities, rng)

    # hosts: a few Zipf head domains shared by many entities + per-entity
    # canonical hosts
    n_head = max(2, n_entities // 50)
    head_hosts = [f"portal{i}.example.com" for i in range(n_head)]

    urls, htmls, texts, langs, ts_list = [], [], [], [], []
    entity_of: list[int] = []
    pos_pairs: list[tuple[str, str]] = []
    entity_meta = []

    for e in range(n_entities):
        first = _FIRST[rng.randint(len(_FIRST))]
        last = _LAST[rng.randint(len(_LAST))]
        year = int(1800 + rng.randint(220))
        base_tokens = [
            _VOCAB[i] for i in rng.randint(0, len(_VOCAB), size=60 + rng.randint(120))
        ]
        canonical = f"{last}-{first}{e}.example.org"
        lang = _LANGS[rng.randint(len(_LANGS))]
        entity_meta.append((first, last, year, base_tokens, canonical, lang))

    for e in range(n_entities):
        first, last, year, base_tokens, canonical, lang = entity_meta[e]
        size = int(sizes[e])
        e_urls = []
        for p in range(size):
            # ~25% of pages land on a Zipf head domain (hot blocks)
            if rng.rand() < 0.25:
                host = head_hosts[
                    min(int(rng.zipf(1.7)) - 1, n_head - 1)
                ]
            else:
                host = canonical
            url = f"https://{host}/{last}/{e}/{p}"
            toks = list(base_tokens)
            # perturb: token swaps + suffix edit, keep >=90% shingle overlap
            n_swap = rng.randint(0, max(1, len(toks) // 20))
            for _ in range(n_swap):
                i = rng.randint(len(toks))
                toks[i] = _VOCAB[rng.randint(len(_VOCAB))]
            if rng.rand() < 0.5:
                toks += [_VOCAB[rng.randint(len(_VOCAB))] for _ in range(rng.randint(1, 4))]
            # name variants: "First Last", "Last, First", abbreviated
            r = rng.rand()
            if r < 0.5:
                disp = f"{first.capitalize()} {last.capitalize()}"
            elif r < 0.8:
                disp = f"{last.capitalize()}, {first.capitalize()}"
            else:
                disp = f"{first[0].upper()}. {last.capitalize()}"
            body = f"{disp} b. {year} " + " ".join(toks)
            html = (
                f"<html><head><title>{disp}</title></head>"
                f"<body><h1>{disp}</h1><p>{body}</p></body></html>"
            ).encode()
            urls.append(url)
            htmls.append(html)
            texts.append(extract_text(html))
            langs.append(lang)
            ts_list.append(_EPOCH + _dt.timedelta(seconds=int(rng.randint(0, 365 * 86400))))
            entity_of.append(e)
            e_urls.append(url)
        # labeled positive pairs: full expansion for small entities,
        # deterministic sampling for big ones (the giant entity at large
        # n_pages would otherwise expand to O(size^2) tuples — 11.5M for
        # a 4800-page entity — and dominate generation time)
        m = len(e_urls)
        total_pairs = m * (m - 1) // 2
        max_labeled = 5000
        if total_pairs <= max_labeled:
            for i in range(m):
                for j in range(i + 1, m):
                    a, b = sorted((e_urls[i], e_urls[j]))
                    pos_pairs.append((a, b))
        else:
            seen_pp: set[tuple[str, str]] = set()
            while len(seen_pp) < max_labeled:
                i, j = rng.randint(0, m, size=2)
                if i == j:
                    continue
                a, b = sorted((e_urls[i], e_urls[j]))
                seen_pp.add((a, b))
            pos_pairs.extend(sorted(seen_pp))

    # hard negatives: sampled cross-entity pairs sharing a head host or a
    # last name (mirrors hard-negative sampling, poc1:684-710)
    n_neg = min(len(pos_pairs), 2 * n_pages)
    neg_pairs: set[tuple[str, str]] = set()
    url_arr = np.array(urls, dtype=object)
    ent_arr = np.array(entity_of)
    tries = 0
    while len(neg_pairs) < n_neg and tries < 20 * n_neg:
        tries += 1
        i, j = rng.randint(0, len(urls), size=2)
        if ent_arr[i] == ent_arr[j]:
            continue
        a, b = sorted((url_arr[i], url_arr[j]))
        neg_pairs.add((a, b))

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts_list, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    lefts = [p[0] for p in pos_pairs] + [p[0] for p in sorted(neg_pairs)]
    rights = [p[1] for p in pos_pairs] + [p[1] for p in sorted(neg_pairs)]
    matches = [True] * len(pos_pairs) + [False] * len(neg_pairs)
    labeled = pa.table(
        {
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "match": pa.array(matches, pa.bool_()),
        }
    )
    truth = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "entity_id": pa.array(entity_of, pa.int64()),
        }
    )
    return pages, labeled, truth


def write_pages_dir(
    out_dir: str, n_pages: int, n_entities: int, seed: int = 42, shards: int = 4
) -> dict[str, str]:
    """Write pages/labeled_pairs/truth_clusters parquet under out_dir,
    pages sharded into `shards` files (resumable-input layout)."""
    import os
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pages, labeled, truth = make_pages(n_pages, n_entities, seed)
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    n = pages.num_rows
    per = (n + shards - 1) // shards
    for s in range(shards):
        chunk = pages.slice(s * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(pages_dir, f"part-{s:05d}.parquet"))
    pq.write_table(labeled, os.path.join(out_dir, "labeled_pairs.parquet"))
    pq.write_table(truth, os.path.join(out_dir, "truth_clusters.parquet"))
    return {
        "pages": pages_dir,
        "labeled_pairs": os.path.join(out_dir, "labeled_pairs.parquet"),
        "truth_clusters": os.path.join(out_dir, "truth_clusters.parquet"),
    }
