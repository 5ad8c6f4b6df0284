"""Flagship pipeline bound to the driver's `documents` table.

Adapts the generic web-page ER pipeline (pipelines/er.py — the north-rule
three-stage dataflow) to the test corpus' documents table
(doc_id, text, lang, source, n_chars): each doc becomes a page row with a
synthetic stable url `doc://{source}/{doc_id:010d}`, blocking runs on
MinHash-LSH band keys alone (source is not an identity signal the way a
web host is), and the output clusters are near-duplicate document groups
— exactly the near-dedup role the reference's whole pipeline plays
(SURVEY.md §2.7: "the entire pipeline *is* near-dedup").
"""

from __future__ import annotations

import dataclasses

import pyarrow as pa

import ray.data

from record_matching_ray.config import PipelineConfig
from record_matching_ray.pipelines.er import run_er


DOCS_CFG = dataclasses.replace(
    PipelineConfig(),
    use_host_blocks=False,  # LSH-only blocking for the doc corpus
)


def docs_to_pages(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents (doc_id, text, lang, source) -> page-shaped rows
    (url, text, lang). url is a stable function of (source, doc_id)."""

    def shape(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        srcs = t.column("source").to_pylist()
        urls = [f"doc://{s}/{i:010d}" for s, i in zip(srcs, ids)]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "text": t.column("text"),
                "lang": t.column("lang"),
            }
        )

    return docs.map_batches(shape, batch_format="pyarrow")


def cluster_documents(
    sf_dir: str,
    cfg: PipelineConfig | None = None,
    out_dir: str | None = None,
) -> ray.data.Dataset:
    """documents.parquet -> (url, cluster_id) near-dup clusters."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    pages = docs_to_pages(docs)
    res = run_er(pages, cfg or DOCS_CFG, out_dir=out_dir, input_key=sf_dir)
    return res["clusters"]


def canonical_documents(sf_dir: str, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """One canonical row per near-dup document cluster."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    pages = docs_to_pages(docs)
    res = run_er(pages, cfg or DOCS_CFG, input_key=sf_dir)
    return res["canonical"]
