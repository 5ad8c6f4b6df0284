"""Deequ-style declarative data-validation metrics over a Dataset.

At 100 TB ingest you assert table health BEFORE running pipelines:
completeness (non-null rate), uniqueness (distinct rate), compliance
(predicate pass rate), accepted values, pattern match rate — the metric
vocabulary of Schelter et al., "Automating Large-Scale Data Quality
Verification" (VLDB 2018, Amazon Deequ). The reference has no
equivalent; its ingest trusts the extractor (record_matching/main.py's
readers assume well-formed rows).

Scale shape: all row-local rules for a table are fused into ONE
``map_batches`` pass emitting a single partial-counts row per batch (a
few int64s), then summed driver-side — zero shuffle. Uniqueness rules
each take the standard one-hash-shuffle exact distinct (per-batch unique
-> groupby -> count), the same shape as stages/dedup.py:exact_dedup.
Results are a handful of scalar rows — materializing them is not a
whole-dataset materialization.

Rule kinds (value is always a rate in [0, 1], rounded to 6 decimals so
the DuckDB oracle's float path cannot drift):

- ``completeness``: fraction of rows with col non-null;
- ``uniqueness``: exact distinct(col) / rows (nulls excluded, matching
  SQL ``COUNT(DISTINCT col)``);
- ``compliance``: fraction satisfying a vectorized predicate
  ``fn(pyarrow.ChunkedArray) -> BooleanArray`` (nulls fail);
- ``accepted_values``: fraction with col in a fixed value set;
- ``pattern``: fraction of string col matching an RE2 regex (nulls fail).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


@dataclass(frozen=True)
class Rule:
    kind: str  # completeness | uniqueness | compliance | accepted_values | pattern
    col: str
    name: str | None = None  # output rule label; defaults to kind
    predicate: Callable[[pa.ChunkedArray], Any] | None = None  # compliance
    values: tuple = ()  # accepted_values
    regex: str = ""  # pattern

    def label(self) -> str:
        return self.name or self.kind


def _rule_hits(rule: Rule, col: pa.ChunkedArray) -> int:
    if rule.kind == "completeness":
        return len(col) - col.null_count
    if rule.kind == "compliance":
        ok = rule.predicate(col)
        return pc.sum(pc.fill_null(ok, False)).as_py() or 0
    if rule.kind == "accepted_values":
        ok = pc.is_in(col, value_set=pa.array(list(rule.values), col.type))
        return pc.sum(pc.fill_null(ok, False)).as_py() or 0
    if rule.kind == "pattern":
        ok = pc.match_substring_regex(col, rule.regex)
        return pc.sum(pc.fill_null(ok, False)).as_py() or 0
    raise ValueError(f"unknown rule kind {rule.kind!r}")


def check_rules(ds: ray.data.Dataset, rules: list[Rule]) -> ray.data.Dataset:
    """One row per rule: (rule, col, value). Row-local rules share one
    zero-shuffle pass; each distinct uniqueness column adds one exact
    count-distinct shuffle."""
    local = [r for r in rules if r.kind != "uniqueness"]
    uniq = [r for r in rules if r.kind == "uniqueness"]

    def partial(t: pa.Table) -> pa.Table:
        counts = [t.num_rows] + [
            _rule_hits(r, t.column(r.col)) for r in local
        ]
        names = ["__rows"] + [f"h{i}" for i in range(len(local))]
        return pa.table({n: pa.array([c], pa.int64()) for n, c in zip(names, counts)})

    # sum the per-batch partial rows driver-side: output is one tiny row
    # per batch, so take_all here is a scalar reduction, not a
    # materialization of the input
    agg: dict[str, int] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        for k, v in row.items():
            agg[k] = agg.get(k, 0) + int(v)
    n_rows = agg.get("__rows", 0)

    out_rule: list[str] = []
    out_col: list[str] = []
    out_val: list[float] = []
    for i, r in enumerate(local):
        out_rule.append(r.label())
        out_col.append(r.col)
        out_val.append(round(agg.get(f"h{i}", 0) / n_rows, 6) if n_rows else 0.0)

    for r in uniq:
        def to_keys(t: pa.Table, c=r.col) -> pa.Table:
            u = pc.unique(pc.drop_null(t.column(c).combine_chunks()))
            return pa.table({"k": u})

        n_distinct = (
            ds.map_batches(to_keys, batch_format="pyarrow").groupby("k").count().count()
        )
        out_rule.append(r.label())
        out_col.append(r.col)
        out_val.append(round(n_distinct / n_rows, 6) if n_rows else 0.0)

    return ray.data.from_arrow(
        pa.table(
            {
                "rule": pa.array(out_rule, pa.string()),
                "col": pa.array(out_col, pa.string()),
                "value": pa.array(out_val, pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# Column profiling (the Deequ/Glue "profiler" sibling of check_rules):
# per-column row/null/exact-distinct counts in two bounded shuffles.


def profile_table(
    ds: ray.data.Dataset, columns: list[str]
) -> ray.data.Dataset:
    """(column, n_rows, n_null, n_distinct) per profiled column.

    Scale shape (the Deequ-profiler layout): row/null totals for ALL
    columns ride one zero-shuffle batch-partial pass; each column adds
    one exact count-distinct shuffle over its PER-BATCH-UNIQUED value
    hashes (shuffle bounded by the column vocabulary — the same
    one-shuffle-per-uniqueness-rule contract as check_rules). Nulls are
    excluded from distinct (SQL COUNT(DISTINCT) semantics); values
    stringify via repr-stable str() before hashing (equality modulo
    64-bit collisions, the exact_dedup contract)."""
    from record_matching_ray.functions.hashing import hash_strings

    def totals_partial(t: pa.Table) -> pa.Table:
        cols = {"__rows": pa.array([t.num_rows], pa.int64())}
        for i, c in enumerate(columns):
            cols[f"nn{i}"] = pa.array([t.column(c).null_count], pa.int64())
        return pa.table(cols)

    agg: dict[str, int] = {}
    for row in (
        ds.select_columns(columns)
        .map_batches(totals_partial, batch_format="pyarrow")
        .take_all()
    ):
        for k, v in row.items():
            agg[k] = agg.get(k, 0) + int(v)
    n_rows = agg.get("__rows", 0)

    n_distinct: list[int] = []
    for c in columns:

        def to_keys(t: pa.Table, c=c) -> pa.Table:
            vals = [str(v) for v in t.column(c).to_pylist() if v is not None]
            if not vals:
                return pa.table({"k": pa.array([], pa.int64())})
            h = np.unique(hash_strings(vals)).view(np.int64)
            return pa.table({"k": pa.array(h, pa.int64())})

        n_distinct.append(
            ds.select_columns([c])
            .map_batches(to_keys, batch_format="pyarrow")
            .groupby("k")
            .count()
            .count()
        )

    out = pa.table(
        {
            "column": pa.array(columns, pa.string()),
            "n_rows": pa.array([n_rows] * len(columns), pa.int64()),
            "n_null": pa.array(
                [agg.get(f"nn{i}", 0) for i in range(len(columns))], pa.int64()
            ),
            "n_distinct": pa.array(n_distinct, pa.int64()),
        }
    )
    return ray.data.from_arrow(out)
