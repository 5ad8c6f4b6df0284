"""Schema-asserted sources and partitioned sinks.

The reference registers every table with an explicit pyarrow schema
(record_matching/context.py:110-168: 13 Parquet tables + 2 CSVs); a
schema drift fails at registration, not mid-query. Same contract here:
``read_table`` prunes to the requested columns at the parquet reader
(only those columns leave storage) and asserts the declared types on the
first block.

``write_stage_parquet`` is the resumable-output sink: one directory per
stage, multiple files (never one giant file), so a failed run skips
finished partitions via the stage manifest (state/manifest.py).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

# input_hint contract (BASELINE.json): Common-Crawl-style web pages
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

LABELED_PAIRS_SCHEMA = pa.schema(
    [("left", pa.string()), ("right", pa.string()), ("match", pa.bool_())]
)


def _assert_schema(ds: ray.data.Dataset, expected: pa.Schema) -> ray.data.Dataset:
    got = ds.schema()
    for field in expected:
        if field.name not in got.names:
            raise ValueError(f"missing column {field.name!r}; got {got.names}")
        actual = got.base_schema.field(field.name).type
        if actual != field.type:
            raise TypeError(
                f"column {field.name!r}: expected {field.type}, got {actual}"
            )
    return ds


def read_table(
    path: str,
    schema: pa.Schema | None = None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Parquet reader with column pruning + optional schema assertion.
    ``columns`` also narrows the asserted schema."""
    ds = ray.data.read_parquet(path, columns=columns)
    if schema is not None:
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
        _assert_schema(ds, schema)
    return ds


def read_pages(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return read_table(path, PAGES_SCHEMA, columns)


def read_labeled_pairs(path: str) -> ray.data.Dataset:
    """Labeled pair corpus — parquet or CSV (reference: matches CSV at
    context.py:115)."""
    if path.endswith(".csv"):
        ds = ray.data.read_csv(path)
    else:
        ds = ray.data.read_parquet(path)
    return _assert_schema(ds, LABELED_PAIRS_SCHEMA)


def write_stage_parquet(
    ds: ray.data.Dataset, stage_dir: str, num_rows_per_file: int | None = None
) -> None:
    ds.write_parquet(stage_dir, num_rows_per_file=num_rows_per_file)
