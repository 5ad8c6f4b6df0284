"""Mergeable cardinality sketches: HyperLogLog distinct-count estimation.

Flajolet-Fu-Gandouet-Meunier 2007 ("HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm") with the standard
linear-counting small-range correction. The reference has no sketch
layer — its dedup table is an exact content-hash map
(record_matching/context.py:15-20) — but a 100-TB corpus audit wants
O(2^p)-byte per-group distinct counts without a COUNT(DISTINCT)
shuffle of the raw key stream.

Ray shape (one pass, no raw-key shuffle):
- per-batch partial: hash keys (md5 lower-64, the SQL-recomputable
  variant), fold to one ``m = 2^p``-byte register blob per group seen
  in the batch — the batch's contribution collapses to
  ``groups x 4 KiB`` regardless of row count;
- one small ``groupby(group)`` over blob rows (rows = batches x groups,
  never rows of input), ``map_groups`` merges with ``np.maximum`` and
  reads the estimate off the registers.

The estimator is EXACTLY recomputable by a SQL oracle: the hash is
DuckDB's ``md5_number_lower``, the register index / rank split is pure
bit arithmetic (``bin()`` + ``ltrim`` gives an exact leading-zero
count), and the harmonic sum adds exact powers of two. See
``HLL_SQL`` in pipelines/analytics.py for the oracle template.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.functions.hashing import hash_strings, md5_lower64
from record_matching_ray.stages.util import conformed, round6_sql

_U64 = np.uint64


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length of a uint64 array (0 -> 0).

    Binary-search clz — no float log2, which goes inexact above 2^53.
    """
    bl = np.zeros(w.shape, dtype=np.int64)
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (_U64(1) << _U64(shift))
        bl[big] += shift
        v[big] >>= _U64(shift)
    bl[w > 0] += 1
    return bl


def _hll_registers(keys: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register_index, rho) for a uint64 hash array.

    index = top p bits; rho = 1 + leading zeros of the low (64-p) bits
    within their own width = 65 - p - bit_length(low_bits).
    """
    idx = (keys >> _U64(64 - p)).astype(np.int64)
    w = keys & ((_U64(1) << _U64(64 - p)) - _U64(1))
    rho = (65 - p) - _bit_length_u64(w)
    return idx, rho


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(registers: np.ndarray) -> float:
    """HLL estimate from a uint8 register array (linear-counting branch
    below 2.5m when empty registers remain; no 64-bit-hash large-range
    correction needed).

    The harmonic sum is computed as an EXACT integer scaled by 2^64
    (rho <= 64 always), then correctly rounded once by the final int/int
    division — order-independent regardless of the rho spread, so the
    bit-for-bit oracle claim holds at any cardinality (ADVICE r3 item 5:
    float64 termwise sums go order-dependent once terms span > 53 bits;
    the SQL oracle sums the same HUGEINT expression)."""
    m = len(registers)
    counts = np.bincount(registers.astype(np.int64), minlength=1)
    s_int = sum(int(c) << (64 - r) for r, c in enumerate(counts.tolist()) if c)
    harm = s_int / (1 << 64)
    e = _alpha(m) * m * m / harm
    zeros = int(np.count_nonzero(registers == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * float(np.log(m / float(zeros)))
    return e


def hll_group_distinct(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    p: int = 12,
) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT value) per group via mergeable HLL.

    Output: (group, registers_used int64, approx_distinct float64
    rounded 6). Standard error ~ 1.04/sqrt(2^p) (~1.6% at p=12).

    Values are hashed as their canonical STRING form (ints via str())
    so the SQL oracle's ``md5_number_lower(CAST(x AS VARCHAR))``
    recomputes bit-identical registers.
    """
    m = 1 << p
    BLOB = pa.schema([(group_col, pa.string()), ("regs", pa.binary())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], pa.string()),
                 "regs": pa.array([], pa.binary())}
            )
        groups = np.asarray(t.column(group_col).to_pylist(), dtype=object)
        raw = t.column(value_col).to_numpy(zero_copy_only=False)
        strs = np.asarray([str(x) for x in raw], dtype=object)
        h = hash_strings(strs, hash_fn=md5_lower64)
        idx, rho = _hll_registers(h, p)
        out_g, out_b = [], []
        order = np.argsort(groups, kind="stable")
        groups, idx, rho = groups[order], idx[order], rho[order]
        start = 0
        n = len(groups)
        for i in range(1, n + 1):
            if i == n or groups[i] != groups[start]:
                regs = np.zeros(m, dtype=np.uint8)
                np.maximum.at(regs, idx[start:i], rho[start:i].astype(np.uint8))
                out_g.append(groups[start])
                out_b.append(regs.tobytes())
                start = i
        return pa.table(
            {group_col: pa.array(out_g, pa.string()),
             "regs": pa.array(out_b, pa.binary())}
        )

    blobs = conformed(
        ds.select_columns([group_col, value_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        BLOB,
    )

    OUT = pa.schema(
        [
            (group_col, pa.string()),
            ("registers_used", pa.int64()),
            ("approx_distinct", pa.float64()),
        ]
    )

    def merge(g: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.uint8)
        for b in g.column("regs").to_pylist():
            regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
        used = int(np.count_nonzero(regs))
        est = hll_estimate(regs)
        return pa.table(
            {
                group_col: pa.array([g.column(group_col)[0].as_py()], pa.string()),
                "registers_used": pa.array([used], pa.int64()),
                "approx_distinct": pa.array(
                    [float(round6_sql(est))], pa.float64()
                ),
            }
        )

    out = blobs.groupby(group_col).map_groups(merge, batch_format="pyarrow")
    return conformed(out, OUT)


def HLL_SQL(group_expr: str, value_expr: str, table: str, p: int = 12) -> str:
    """DuckDB oracle recomputing hll_group_distinct bit-for-bit.

    Same hash (md5_number_lower of the string form), same index/rho bit
    split (bin()+ltrim leading-zero count is exact), same estimator with
    the linear-counting branch.
    """
    m = 1 << p
    alpha = _alpha(m)
    return f"""
WITH h AS (
  SELECT {group_expr} AS grp,
         md5_number_lower(CAST({value_expr} AS VARCHAR)) AS hv
  FROM {table}
),
reg AS (
  SELECT grp,
         hv >> {64 - p} AS idx,
         MAX({65 - p} - length(ltrim(bin(hv & ((1::UBIGINT << {64 - p}) - 1)), '0'))) AS rho
  FROM h GROUP BY 1, 2
),
agg AS (
  -- exact HUGEINT harmonic sum scaled by 2^64 (order-independent; one
  -- correctly-rounded CAST at the end) — mirrors hll_estimate exactly
  SELECT grp,
         count(*) AS used,
         CAST(SUM(CAST(1 AS HUGEINT) << (64 - rho))
              + ({m} - count(*)) * (CAST(1 AS HUGEINT) << 64)
              AS DOUBLE) / pow(2.0, 64) AS harm
  FROM reg GROUP BY 1
)
SELECT grp AS {group_expr.split('.')[-1]},
       CAST(used AS BIGINT) AS registers_used,
       round(
         CASE WHEN CAST({alpha!r} AS DOUBLE) * {m} * {m} / harm <= 2.5 * {m}
                   AND used < {m}
              THEN {m} * ln({m} / CAST({m} - used AS DOUBLE))
              ELSE CAST({alpha!r} AS DOUBLE) * {m} * {m} / harm END,
         6) AS approx_distinct
FROM agg
"""
