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


def read_jsonl(
    path: str,
    schema: pa.Schema | None = None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """JSON-lines reader (the interchange format of web-corpus tooling —
    one JSON object per line, .jsonl/.json files or directories of them).
    JSON has no reader-level column pruning (rows must parse whole), so
    ``columns`` is a post-read projection — prefer parquet for wide
    tables; this source exists for ingest boundaries."""
    ds = ray.data.read_json(path)
    if schema is not None:
        check = (
            pa.schema([schema.field(c) for c in columns]) if columns else schema
        )
        _assert_schema(ds, check)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """JSON-lines sink: one .json file per block (never one giant file)."""
    ds.write_json(out_dir)


def export_training_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    rows_per_shard: int = 1 << 16,
) -> dict:
    """Training-data export: fixed-size parquet shards + a shards.json
    index (file, rows, bytes per shard; totals) so a downstream trainer
    can assign shards to data-loader workers and resume by skipping
    finished ones — the deliverable format of a curation pipeline.

    Row counts come from the written parquet footers (no extra dataset
    pass). Shard size is bounded by ``rows_per_shard`` via the writer; a
    100 TB export is many shards across many files, never one file."""
    import json
    import os

    import pyarrow.parquet as pq

    # Ray's num_rows_per_file is a floor, not a cap — split blocks to the
    # shard size first so each written file is <= rows_per_shard.
    ds = ds.repartition(target_num_rows_per_block=rows_per_shard)
    ds.write_parquet(out_dir)
    shards = []
    for fn in sorted(os.listdir(out_dir)):
        if not fn.endswith(".parquet"):
            continue
        full = os.path.join(out_dir, fn)
        shards.append(
            {
                "file": fn,
                "rows": pq.read_metadata(full).num_rows,
                "bytes": os.path.getsize(full),
            }
        )
    index = {
        "shards": shards,
        "total_rows": sum(s["rows"] for s in shards),
        "total_bytes": sum(s["bytes"] for s in shards),
        "rows_per_shard": rows_per_shard,
    }
    with open(os.path.join(out_dir, "shards.json"), "w") as f:
        json.dump(index, f, indent=1, sort_keys=True)
    return index


def read_arrow_ipc(
    path: str,
    schema: pa.Schema | None = None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Arrow IPC / Feather-v2 reader (the zero-copy interchange format of
    Arrow-native tooling). Ray 2.49 has no built-in IPC datasource, so
    files are listed driver-side (names only) and each is opened INSIDE a
    task via ``from_items(paths).flat_map``-style ``map_batches`` —
    reading stays distributed and memory-maps per worker; only the path
    list touches the driver. IPC supports reader-level column projection,
    so ``columns`` prunes at the file, like parquet."""
    import os

    import pyarrow.feather as feather

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".arrow", ".feather", ".ipc"))
        )
    else:
        files = [path]
    paths_ds = ray.data.from_items([{"path": p} for p in files])

    def load(t: pa.Table) -> pa.Table:
        tables = [
            feather.read_table(p, columns=columns)
            for p in t.column("path").to_pylist()
        ]
        return pa.concat_tables(tables) if tables else pa.table({})

    ds = paths_ds.map_batches(load, batch_format="pyarrow", batch_size=1)
    if schema is not None:
        check = (
            pa.schema([schema.field(c) for c in columns]) if columns else schema
        )
        _assert_schema(ds, check)
    return ds


def write_arrow_ipc(ds: ray.data.Dataset, out_dir: str) -> list[str]:
    """Arrow IPC sink: one .arrow file per block, written inside the
    tasks (never one giant file, nothing concatenated on the driver).
    Returns the written paths."""
    import os
    import uuid

    import pyarrow.feather as feather

    os.makedirs(out_dir, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        p = os.path.join(out_dir, f"block-{uuid.uuid4().hex}.arrow")
        feather.write_feather(t, p, compression="zstd")
        return pa.table({"path": pa.array([p], pa.string())})

    return [
        r["path"]
        for r in ds.map_batches(
            dump, batch_format="pyarrow", batch_size=None
        ).take_all()
    ]
