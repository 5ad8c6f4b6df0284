"""Temporal operators Ray Data lacks natively: as-of join, tumbling-window
aggregate, per-group top-k.

The reference has no event-time semantics (SURVEY.md §2.13: batch only),
but a web-scale pipeline over (url, warc_ts, …) needs them; these follow
the custom-operator recipe from the build brief: express as
map_batches + groupby().map_groups compositions, and document the
partitioning assumption.

Partitioning assumptions:
- ``asof_join``: both sides hash-partition by join key (one shuffle each);
  the per-key time-merge happens inside a partition. Assumes a single
  key's rows fit one partition (keys are users/customers — bounded).
- ``tumbling_window``: two-level aggregate, batch partials then one
  shuffle keyed by (window, group) — never materializes raw events per
  window.
- ``topk_per_group``: batch-local top-k prune first (only k rows per key
  per batch shuffle), exact merge per key after.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from record_matching_ray.functions.hashing import _U64, mix64
from record_matching_ray.stages.util import compact_nonempty, conformed, round6_sql, shuffle_partitions


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    num_partitions: int | None = None,
    direction: str = "backward",
) -> ray.data.Dataset:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same key (nulls when none) — the
    classic backward as-of join (DuckDB ``ASOF LEFT JOIN`` semantics).
    ``direction="forward"`` flips the comparison: the SMALLEST
    ``right_ts`` >= ``left_ts`` (next-following match), implemented by
    negating the sort key — the sweep itself is direction-agnostic.

    The right side must be deterministic per (key, ts): pre-dedup it
    upstream if (key, ts) repeats. Implementation: both sides tagged and
    hash-partitioned by key (pk = mix64(key) mod P), one map_groups per
    partition runs a vectorized sort + per-key searchsorted merge.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    fwd = direction == "forward"
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions

    # resolve schemas ONCE on the driver: the tag closures must capture
    # plain type objects, never the Dataset handles (a captured Dataset
    # re-resolves .schema() inside every task — measured as the whole
    # right-side pipeline re-executing per batch)
    lcols = list(left.schema().names)
    l_types = {c: left.schema().base_schema.field(c).type for c in lcols}
    r_types = {c: right.schema().base_schema.field(c).type for c in right_payload}
    rpay = right_payload

    def tag_left(t: pa.Table) -> pa.Table:
        keys = t.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "pk": pa.array(
                (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
            ),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8()),
            "k": pa.array(keys, pa.int64()),
            "t": t.column(left_ts),
        }
        for c in lcols:
            cols[f"l_{c}"] = t.column(c)
        for c in rpay:
            cols[f"r_{c}"] = pa.nulls(t.num_rows, r_types[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        keys = t.column(right_on).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "pk": pa.array(
                (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
            ),
            "side": pa.array(np.ones(t.num_rows, dtype=np.int8), pa.int8()),
            "k": pa.array(keys, pa.int64()),
            "t": t.column(right_ts),
        }
        for c in lcols:
            cols[f"l_{c}"] = pa.nulls(t.num_rows, l_types[c])
        for c in rpay:
            cols[f"r_{c}"] = t.column(c)
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def merge(g: pa.Table) -> pa.Table:
        # Fully vectorized sweep — no per-row Python: ONE lexsort of the
        # combined partition by (key, ts, right-before-left), then a
        # running maximum.accumulate of right-row positions gives every
        # left row its most recent right row at or before its ts; a final
        # key-equality check invalidates carries across key boundaries.
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("k").to_numpy(zero_copy_only=False)
        ts = g.column("t").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        n = len(side)
        # right (side=1) sorts BEFORE left at equal (key, ts): the match
        # is inclusive in both directions; forward negates the time axis
        tsv = ts.astype(np.int64)
        if fwd:
            tsv = -tsv
        order = np.lexsort(((side == 0).astype(np.int8), tsv, keys))
        o_keys = keys[order]
        is_r = side[order] == 1
        pos_r = np.where(is_r, np.arange(n, dtype=np.int64), -1)
        last_r = np.maximum.accumulate(pos_r)
        l_pos = np.nonzero(~is_r)[0]  # left rows, in (key, ts) order
        cand = last_r[l_pos]
        safe = np.clip(cand, 0, None)
        valid = (cand >= 0) & (o_keys[safe] == o_keys[l_pos])
        match = np.where(valid, order[safe], -1)
        orig_l = order[l_pos]  # original partition indices of left rows
        cols = {}
        take_l = pa.array(orig_l, pa.int64())
        for c in lcols:
            cols[c] = g.column(f"l_{c}").take(take_l)
        matched = pa.array(np.where(valid, match, 0), pa.int64(), mask=~valid)
        for c in rpay:
            cols[c] = g.column(f"r_{c}").take(matched)
        return pa.table(cols)

    return tagged.groupby("pk").map_groups(merge, batch_format="pyarrow")


def tumbling_window(
    events: ray.data.Dataset,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    unit: str = "hour",
) -> ray.data.Dataset:
    """Tumbling event-time windows: floor(ts, unit) x group ->
    (window, group, cnt, sum_value_c). Batch partials first — the shuffle
    moves one row per (window, group) per batch, not raw events. Value
    sums are exact integer cents (float-parity convention,
    pipelines/analytics.py)."""
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import conformed

    def partial(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t.column(ts_col), unit=unit)
        cents = pc.cast(pc.round(pc.multiply(t.column(value_col), 100.0)), pa.int64())
        tt = pa.table(
            {
                "window": win,
                group_col: t.column(group_col),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64), pa.int64()),
                "value_c": cents,
            }
        )
        g = pa.TableGroupBy(tt, ["window", group_col]).aggregate(
            [("one", "sum"), ("value_c", "sum")]
        )
        return g.rename_columns(["window", group_col, "cnt", "sum_value_c"])

    out = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["window", group_col])
        .aggregate(
            Sum(on="cnt", alias_name="cnt"),
            Sum(on="sum_value_c", alias_name="sum_value_c"),
        )
    )
    return conformed(
        out,
        pa.schema(
            [
                ("window", pa.timestamp("us")),
                (group_col, pa.string()),
                ("cnt", pa.int64()),
                ("sum_value_c", pa.int64()),
            ]
        ),
    )


def sessionize(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Gap-based sessionization: a user's events belong to one session
    while consecutive gaps are <= gap_minutes; a larger gap starts a new
    session. Output one row per session:
    (user, session_start, session_end, n_events, sum_value_c).

    Partitioning assumption (same as asof_join): hash-partition by user,
    so one user's events land in one partition; the per-partition sweep
    is a single lexsort + vectorized boundary scan — session ids never
    materialize, only per-session aggregates leave the worker. Session
    boundaries depend only on timestamps (equal-ts ties share a session),
    so the output is deterministic under any within-key input order."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions
    gap_us = np.int64(gap_minutes * 60_000_000)

    def add_pk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = pc.cast(pc.round(pc.multiply(t.column(value_col), 100.0)), pa.int64())
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(keys, pa.int64()),
                "t": t.column(ts_col),
                "value_c": cents,
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        keys = g.column("k").to_numpy(zero_copy_only=False)
        ts = g.column("t").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        vals = g.column("value_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, keys))
        k_s, t_s, v_s = keys[order], ts[order], vals[order]
        ti = t_s.astype(np.int64)
        n = len(order)
        new_sess = np.ones(n, dtype=bool)
        if n > 1:
            new_sess[1:] = (k_s[1:] != k_s[:-1]) | ((ti[1:] - ti[:-1]) > gap_us)
        starts = np.nonzero(new_sess)[0]
        ends = np.append(starts[1:], n)
        cum = np.concatenate(([0], np.cumsum(v_s)))
        return pa.table(
            {
                key_col: pa.array(k_s[starts], pa.int64()),
                "session_start": pa.array(t_s[starts], pa.timestamp("us")),
                "session_end": pa.array(t_s[ends - 1], pa.timestamp("us")),
                "n_events": pa.array(ends - starts, pa.int64()),
                "sum_value_c": pa.array(cum[ends] - cum[starts], pa.int64()),
            }
        )

    return (
        events.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(sweep, batch_format="pyarrow")
    )


def scd2_intervals(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tie_col: str = "event_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Slowly-changing-dimension type-2 history: collapse each key's
    event stream into state validity intervals — one row per run of the
    same state, (key, state, valid_from = run's first ts, valid_to = next
    run's first ts, NULL while current). The standard dimension-history
    build a warehouse runs after CDC ingest.

    Same hash-partition-by-key + lexsort sweep as sessionize; ties at
    equal ts break by tie_col so the run structure is deterministic under
    any input order (the SQL mirror orders by the same (ts, tie) pair)."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions

    def add_pk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64),
                    pa.int64(),
                ),
                "k": pa.array(keys, pa.int64()),
                "t": t.column(ts_col),
                "tie": pc.cast(t.column(tie_col), pa.int64()),
                "state": t.column(state_col),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        keys = g.column("k").to_numpy(zero_copy_only=False)
        ts = g.column("t").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        tie = g.column("tie").to_numpy(zero_copy_only=False)
        states = np.asarray(g.column("state").to_pylist(), dtype=object)
        order = np.lexsort((tie, ts, keys))
        k_s, t_s, s_s = keys[order], ts[order], states[order]
        n = len(order)
        new_run = np.ones(n, dtype=bool)
        if n > 1:
            # NULL-state run boundaries mirror the SQL oracle's
            # `prev_state IS NULL OR prev_state <> state` predicate under
            # three-valued logic: a row FOLLOWING a NULL state always
            # starts a new run (prev IS NULL), while a NULL row following
            # a non-NULL one does NOT (x <> NULL is NULL, not TRUE) — it
            # joins the previous run as a tail. numpy object identity
            # (None == None) would get both cases wrong on nullable
            # states; current TPC-H-style states are never null, so this
            # is hash-neutral there.
            is_null = np.fromiter(
                (s is None for s in s_s), dtype=bool, count=n
            )
            prev_null, cur_null = is_null[:-1], is_null[1:]
            differs = ~prev_null & ~cur_null & (s_s[1:] != s_s[:-1])
            new_run[1:] = (k_s[1:] != k_s[:-1]) | prev_null | differs
        starts = np.nonzero(new_run)[0]
        ends = np.append(starts[1:], n)
        # valid_to = next run's start ts within the same key, else NULL
        vt = np.empty(len(starts), dtype="datetime64[us]")
        same_key = np.zeros(len(starts), dtype=bool)
        if len(starts) > 1:
            same_key[:-1] = k_s[starts[1:]] == k_s[starts[:-1]]
            vt[:-1] = t_s[starts[1:]]
        return pa.table(
            {
                key_col: pa.array(k_s[starts], pa.int64()),
                state_col: pa.array(list(s_s[starts]), pa.string()),
                "valid_from": pa.array(t_s[starts], pa.timestamp("us")),
                "valid_to": pa.array(vt, pa.timestamp("us"), mask=~same_key),
                "n_events": pa.array(ends - starts, pa.int64()),
            }
        )

    return (
        events.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(sweep, batch_format="pyarrow")
    )


def hopping_window(
    events: ray.data.Dataset,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    size_hours: int = 2,
    hop_hours: int = 1,
) -> ray.data.Dataset:
    """Hopping (sliding) event-time windows: windows of ``size_hours``
    starting every ``hop_hours`` on whole-hour boundaries; an event lands
    in size/hop windows. Same partial-aggregate shape as tumbling_window
    — events replicate size/hop times INSIDE the batch partial, so the
    shuffle still moves one row per (window, group) per batch."""
    assert size_hours % hop_hours == 0, "size must be a multiple of hop"
    k = size_hours // hop_hours
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import conformed

    def partial(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t.column(ts_col), unit="hour")
        base64 = np.asarray(base.to_numpy(zero_copy_only=False), "datetime64[us]")
        cents = (
            pc.cast(pc.round(pc.multiply(t.column(value_col), 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        groups = t.column(group_col)
        wins, cols_g, cols_v = [], [], []
        for i in range(k):
            wins.append(base64 - np.timedelta64(i * hop_hours, "h"))
            cols_g.append(groups)
            cols_v.append(cents)
        tt = pa.table(
            {
                "window_start": pa.array(np.concatenate(wins), pa.timestamp("us")),
                group_col: pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                     for c in cols_g]
                ),
                "one": pa.array(np.ones(k * t.num_rows, dtype=np.int64), pa.int64()),
                "value_c": pa.array(np.concatenate(cols_v), pa.int64()),
            }
        )
        g = pa.TableGroupBy(tt, ["window_start", group_col]).aggregate(
            [("one", "sum"), ("value_c", "sum")]
        )
        return g.rename_columns(["window_start", group_col, "cnt", "sum_value_c"])

    out = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", group_col])
        .aggregate(
            Sum(on="cnt", alias_name="cnt"),
            Sum(on="sum_value_c", alias_name="sum_value_c"),
        )
    )
    return conformed(
        out,
        pa.schema(
            [
                ("window_start", pa.timestamp("us")),
                (group_col, pa.string()),
                ("cnt", pa.int64()),
                ("sum_value_c", pa.int64()),
            ]
        ),
    )


def topk_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    order_col: str,
    k: int,
    tie_col: str,
    keep_cols: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact top-k rows per group by (order_col desc, tie_col asc) — the
    window-function ``row_number() OVER (PARTITION BY g ORDER BY v DESC)``
    shape. Batch-local prune to k rows per (batch, group) bounds the
    shuffle payload; the per-group merge is exact."""

    def local_prune(t: pa.Table) -> pa.Table:
        gk = t.column(group_col).to_numpy(zero_copy_only=False)
        ov = t.column(order_col).to_numpy(zero_copy_only=False)
        tv = t.column(tie_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tv, -ov, gk))
        gk_s = gk[order]
        bounds = np.nonzero(np.concatenate(([True], gk_s[1:] != gk_s[:-1], [True])))[0]
        keep: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            keep.append(order[s : min(s + k, e)])
        idx = np.concatenate(keep) if keep else np.empty(0, dtype=np.int64)
        return t.take(pa.array(idx, pa.int64()))

    def final(g: pa.Table) -> pa.Table:
        t = local_prune(g)
        ov = t.column(order_col).to_numpy(zero_copy_only=False)
        tv = t.column(tie_col).to_numpy(zero_copy_only=False)
        rank = np.empty(t.num_rows, dtype=np.int64)
        gk = t.column(group_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tv, -ov, gk))
        r = 0
        prev = None
        for i in order:
            r = r + 1 if gk[i] == prev else 1
            prev = gk[i]
            rank[i] = r
        return t.append_column("rank", pa.array(rank, pa.int64()))

    pruned = ds.select_columns(
        list(dict.fromkeys([group_col, order_col, tie_col] + keep_cols))
    ).map_batches(local_prune, batch_format="pyarrow")
    return pruned.groupby(group_col).map_groups(final, batch_format="pyarrow")


def running_total(
    ds: ray.data.Dataset,
    key_col: str = "o_custkey",
    order_col: str = "o_orderdate",
    tie_col: str = "o_orderkey",
    value_col: str = "o_totalprice",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Cumulative windowed sum per key: for each row, the running total
    of ``value_col`` over the key's rows ordered by (order_col, tie_col)
    — ``SUM() OVER (PARTITION BY key ORDER BY ord, tie)``.

    Same partitioning contract as sessionize: hash-partition by key, one
    vectorized lexsort + segment cumsum per partition; no sorted global
    shuffle, no per-row loop. Values accumulate as exact integer cents so
    the result is addition-order independent (windowed float SUM in other
    engines uses segment trees — cents make parity exact)."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions

    def add_pk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = pc.cast(pc.round(pc.multiply(t.column(value_col), 100.0)), pa.int64())
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(keys, pa.int64()),
                "o": t.column(order_col),
                "tie": t.column(tie_col),
                "value_c": cents,
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        keys = g.column("k").to_numpy(zero_copy_only=False)
        o = g.column("o").to_numpy(zero_copy_only=False)
        tie = g.column("tie").to_numpy(zero_copy_only=False)
        v = g.column("value_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, o, keys))
        k_s, o_s, t_s, v_s = keys[order], o[order], tie[order], v[order]
        cum = np.cumsum(v_s)
        # subtract each key-segment's preceding total (segment cumsum)
        new_seg = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        starts = np.nonzero(new_seg)[0]
        seg_id = np.cumsum(new_seg) - 1
        base = np.where(starts > 0, cum[starts - 1], 0)
        run = cum - base[seg_id]
        return pa.table(
            {
                key_col: pa.array(k_s, pa.int64()),
                tie_col: pa.array(t_s, pa.int64()),
                "running_cents": pa.array(run, pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col, order_col, tie_col, value_col])
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
    )


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    lo_offset_us: int,
    hi_offset_us: int,
    closed: str = "both",
    right_prefix: str = "",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Interval (range) join: every (left, right) pair with equal keys and
    ``right_ts`` inside ``[left_ts+lo, left_ts+hi]`` (``closed="left"``
    makes the upper bound exclusive) — SQL's
    ``JOIN ... ON k AND rt BETWEEN lt+lo AND lt+hi``. Inner semantics:
    left rows with no right row in range emit nothing.

    Same partitioning contract as asof_join (one hash shuffle per side,
    per-key merge inside a partition), but the merge emits ALL rows in
    range, not just the latest. The per-partition match is a fully
    vectorized rank-space composite-key searchsorted: right rows sort by
    (key, ts); both dimensions compress to dense ranks so the composite
    ``code*M + rank`` fits int64 at any key/timestamp magnitude; two
    searchsorted calls give each left row its contiguous match range, and
    the repeat/arange expansion is linear in output size. Output size is
    the true join cardinality — pick windows accordingly at scale.

    ``right_prefix`` renames payload columns (required for self-joins
    where payload names collide with left columns)."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions
    if closed not in ("both", "left"):
        raise ValueError(f"closed must be 'both' or 'left', got {closed!r}")

    lcols = list(left.schema().names)
    l_types = {c: left.schema().base_schema.field(c).type for c in lcols}
    r_types = {c: right.schema().base_schema.field(c).type for c in right_payload}
    rpay = right_payload

    def tag_left(t: pa.Table) -> pa.Table:
        keys = t.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "pk": pa.array(
                (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
            ),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8()),
            "k": pa.array(keys, pa.int64()),
            "t": t.column(left_ts),
        }
        for c in lcols:
            cols[f"l_{c}"] = t.column(c)
        for c in rpay:
            cols[f"r_{c}"] = pa.nulls(t.num_rows, r_types[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        keys = t.column(right_on).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "pk": pa.array(
                (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
            ),
            "side": pa.array(np.ones(t.num_rows, dtype=np.int8), pa.int8()),
            "k": pa.array(keys, pa.int64()),
            "t": t.column(right_ts),
        }
        for c in lcols:
            cols[f"l_{c}"] = pa.nulls(t.num_rows, l_types[c])
        for c in rpay:
            cols[f"r_{c}"] = t.column(c)
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def out_schema() -> pa.Schema:
        fields = [(c, l_types[c]) for c in lcols]
        fields += [(f"{right_prefix}{c}", r_types[c]) for c in rpay]
        return pa.schema(fields)

    def merge(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("k").to_numpy(zero_copy_only=False)
        ts = (
            g.column("t")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        is_r = side == 1
        r_idx = np.nonzero(is_r)[0]
        l_idx = np.nonzero(~is_r)[0]
        empty = pa.table(
            {f.name: pa.array([], f.type) for f in out_schema()}
        )
        if len(r_idx) == 0 or len(l_idx) == 0:
            return empty
        rk, rt = keys[r_idx], ts[r_idx]
        order_r = np.lexsort((rt, rk))
        rk_s, rt_s = rk[order_r], rt[order_r]
        uk = np.unique(rk_s)
        ut = np.unique(rt_s)
        M = np.int64(len(ut) + 2)
        code_r = np.searchsorted(uk, rk_s)
        c_r = code_r * M + np.searchsorted(ut, rt_s)
        lk, lt = keys[l_idx], ts[l_idx]
        code_l = np.searchsorted(uk, lk)
        safe = np.clip(code_l, 0, len(uk) - 1)
        valid = uk[safe] == lk
        r_lo = np.searchsorted(ut, lt + lo_offset_us, side="left")
        r_hi = np.searchsorted(
            ut, lt + hi_offset_us, side="right" if closed == "both" else "left"
        )
        lo_i = np.searchsorted(c_r, safe * M + r_lo, side="left")
        hi_i = np.searchsorted(c_r, safe * M + r_hi, side="left")
        counts = np.where(valid, hi_i - lo_i, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        rep_l = np.repeat(l_idx, counts)
        offs = np.cumsum(counts) - counts
        pos = np.arange(total, dtype=np.int64) - np.repeat(offs, counts) + np.repeat(
            lo_i, counts
        )
        rep_r = r_idx[order_r[pos]]
        cols = {}
        take_l = pa.array(rep_l, pa.int64())
        take_r = pa.array(rep_r, pa.int64())
        for c in lcols:
            cols[c] = g.column(f"l_{c}").take(take_l)
        for c in rpay:
            cols[f"{right_prefix}{c}"] = g.column(f"r_{c}").take(take_r)
        return pa.table(cols)

    return tagged.groupby("pk").map_groups(merge, batch_format="pyarrow")


def lag_delta(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-key previous-row timestamp and gap:
    ``LAG(ts) OVER (PARTITION BY key ORDER BY ts, tie)`` plus
    ``delta_us = ts - prev_ts`` (null for each key's first row).

    Same partitioning contract as running_total: hash-partition by key,
    one vectorized lexsort per partition, shifted compare against the
    previous sorted row, key-boundary rows nulled. The gap is exact
    integer microseconds so oracle parity needs no float rounding."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions

    def add_pk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(keys, pa.int64()),
                "t": t.column(ts_col),
                "tie": t.column(tie_col),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        keys = g.column("k").to_numpy(zero_copy_only=False)
        ts = g.column("t").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        tie = g.column("tie").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, keys))
        k_s, t_s, tie_s = keys[order], ts[order], tie[order]
        same_key = np.concatenate(([False], k_s[1:] == k_s[:-1]))
        prev = np.empty_like(t_s)
        prev[1:] = t_s[:-1]
        prev[0] = t_s[0]
        delta = t_s.astype(np.int64) - prev.astype(np.int64)
        mask = ~same_key
        return pa.table(
            {
                key_col: pa.array(k_s, pa.int64()),
                tie_col: pa.array(tie_s, pa.int64()),
                ts_col: pa.array(t_s, pa.timestamp("us")),
                "prev_ts": pa.array(
                    np.where(same_key, prev, t_s), pa.timestamp("us"), mask=mask
                ),
                "delta_us": pa.array(delta, pa.int64(), mask=mask),
            }
        )

    return (
        ds.select_columns([key_col, ts_col, tie_col])
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
    )


def lead_first_last(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Forward-looking / partition-edge window functions per key:
    ``LEAD(ts)``, ``FIRST_VALUE(tie)`` and ``LAST_VALUE(tie)`` over
    ``(PARTITION BY key ORDER BY ts, tie)``, with LAST_VALUE on the full
    partition frame (``ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    FOLLOWING`` — SQL's default running frame makes LAST_VALUE the
    current row, which is trivial).

    FIRST/LAST carry the *tie column's* value at the ordering's edges —
    the value rides the (ts, tie) sort order rather than being a min/max
    of itself, which is the part a plain aggregate can't express.

    Same partitioning contract as lag_delta: hash-partition by key, one
    vectorized lexsort per partition, shifted compare + segment-edge
    gathers; timestamps and ids stay exact integers so oracle parity
    needs no rounding."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions

    def add_pk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(keys, pa.int64()),
                "t": t.column(ts_col),
                "tie": t.column(tie_col),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        keys = g.column("k").to_numpy(zero_copy_only=False)
        ts = g.column("t").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        tie = g.column("tie").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, keys))
        k_s, t_s, tie_s = keys[order], ts[order], tie[order]
        n = len(k_s)
        # next row belongs to the same key -> LEAD exists
        same_next = np.concatenate((k_s[:-1] == k_s[1:], [False]))
        nxt = np.empty_like(t_s)
        if n:
            nxt[:-1] = t_s[1:]
            nxt[-1] = t_s[-1]
        # segment edges: first/last sorted row of each key run
        new_seg = (
            np.concatenate(([True], k_s[1:] != k_s[:-1]))
            if n
            else np.zeros(0, dtype=bool)
        )
        seg_id = np.cumsum(new_seg) - 1
        starts = np.nonzero(new_seg)[0]
        ends = np.concatenate((starts[1:], [n])) - 1 if n else starts
        return pa.table(
            {
                key_col: pa.array(k_s, pa.int64()),
                tie_col: pa.array(tie_s, pa.int64()),
                ts_col: pa.array(t_s, pa.timestamp("us")),
                "next_ts": pa.array(
                    np.where(same_next, nxt, t_s), pa.timestamp("us"), mask=~same_next
                ),
                "first_id": pa.array(tie_s[starts[seg_id]], pa.int64()),
                "last_id": pa.array(tie_s[ends[seg_id]], pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col, ts_col, tie_col])
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
    )


def moving_window_sum(
    ds: ray.data.Dataset,
    key_col: str = "o_custkey",
    order_col: str = "o_orderdate",
    tie_col: str = "o_orderkey",
    value_col: str = "o_totalprice",
    window: int = 7,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Rolling row-window aggregate per key:
    ``SUM/COUNT(...) OVER (PARTITION BY key ORDER BY ord, tie
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.

    Same contract as running_total (hash-partition by key, one lexsort
    per partition); the rolling sum is two gathers into a zero-padded
    segment-aware cumsum — no per-row loop, no window materialization.
    Values accumulate as exact integer cents (addition-order independent,
    so the oracle needs no float tolerance); ``win_n`` is the actual
    window row count (< window near each key's start)."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions
    w = int(window)

    def add_pk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = pc.cast(pc.round(pc.multiply(t.column(value_col), 100.0)), pa.int64())
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(keys, pa.int64()),
                "o": t.column(order_col),
                "tie": t.column(tie_col),
                "value_c": cents,
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        keys = g.column("k").to_numpy(zero_copy_only=False)
        o = g.column("o").to_numpy(zero_copy_only=False)
        tie = g.column("tie").to_numpy(zero_copy_only=False)
        v = g.column("value_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, o, keys))
        k_s, t_s, v_s = keys[order], tie[order], v[order]
        n = len(order)
        cp = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(v_s, out=cp[1:])
        new_seg = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        seg_start = np.nonzero(new_seg)[0][seg_id]
        i = np.arange(n, dtype=np.int64)
        lo = np.maximum(seg_start, i - (w - 1))
        return pa.table(
            {
                key_col: pa.array(k_s, pa.int64()),
                tie_col: pa.array(t_s, pa.int64()),
                "mov_sum_c": pa.array(cp[i + 1] - cp[lo], pa.int64()),
                "win_n": pa.array(i + 1 - lo, pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col, order_col, tie_col, value_col])
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
    )


def ntile_per_group(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    tie_col: str,
    n_tiles: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """``NTILE(k) OVER (PARTITION BY key ORDER BY ord, tie)`` — each
    key's rows split into k ranked buckets, the first n%k buckets one
    row larger (SQL's exact sizing rule). Output: one row per input row
    (key, tie, tile 1-based).

    Same contract as the other window ops: hash-partition by key, one
    lexsort per partition, vectorized per-segment position -> closed-form
    bucket index. Assumes a key's rows fit one partition (same as
    asof/running_total — keys are categorical/user-grained)."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions
    k = int(n_tiles)

    def add_pk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if pa.types.is_integer(keys.type):
            kh = keys.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            # stable (blake) — never Python hash(), which is seed-dependent
            from record_matching_ray.functions.hashing import hash_strings

            kh = hash_strings(keys.to_pylist()).view(np.int64)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(kh.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "k": keys,
                "o": t.column(order_col),
                "tie": t.column(tie_col),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        keys = np.asarray(g.column("k").to_pylist(), dtype=object)
        o = g.column("o").to_numpy(zero_copy_only=False)
        tie = g.column("tie").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, o, keys))
        k_s, t_s = keys[order], tie[order]
        n = len(order)
        new_seg = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        starts = np.nonzero(new_seg)[0]
        ends = np.append(starts[1:], n)
        seg_n = (ends - starts)[seg_id]
        pos = np.arange(n, dtype=np.int64) - starts[seg_id]
        big = seg_n // k + 1
        n_big = seg_n % k
        cut = n_big * big
        small = np.maximum(seg_n // k, 1)
        tile = np.where(
            pos < cut, pos // big, n_big + (pos - cut) // small
        ) + 1
        take = pa.array(order, pa.int64())
        return pa.table(
            {
                key_col: pa.array(k_s.tolist(), g.column("k").type),
                tie_col: pa.array(t_s, pa.int64()),
                # the ranked value rides along — downstream aggregates
                # need no join to recover it
                order_col: g.column("o").take(take),
                "tile": pa.array(tile, pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col, order_col, tie_col])
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
    )


def rank_per_group(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    tie_col: str,
    descending: bool = True,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """``RANK()`` and ``DENSE_RANK() OVER (PARTITION BY key ORDER BY value
    [DESC])`` — SQL tie semantics: equal values share a rank, RANK leaves
    gaps after ties, DENSE_RANK does not. ``tie_col`` is NOT part of the
    ordering (so ties are real); it rides along to identify rows. Output:
    one row per input row (key, tie, value, rank, dense_rank).

    Same contract as ntile_per_group: hash-partition by key, one lexsort
    per partition, vectorized run detection — rank = position of the
    value-run's first row within its key segment + 1, dense_rank = the
    run's ordinal within its segment. Assumes a key's rows fit one
    partition (keys are categorical/user-grained). ``value_col`` must be
    integer for exact tie parity with SQL (use cents, not float prices)."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions

    def add_pk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if pa.types.is_integer(keys.type):
            kh = keys.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            from record_matching_ray.functions.hashing import hash_strings

            kh = hash_strings(keys.to_pylist()).view(np.int64)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(kh.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "k": keys,
                "v": t.column(value_col),
                "tie": t.column(tie_col),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        keys = np.asarray(g.column("k").to_pylist(), dtype=object)
        v = g.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        tie = g.column("tie").to_numpy(zero_copy_only=False)
        vo = -v if descending else v
        order = np.lexsort((tie, vo, keys))
        k_s, v_s, t_s = keys[order], v[order], tie[order]
        n = len(order)
        new_seg = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        new_run = np.concatenate(([True], (k_s[1:] != k_s[:-1]) | (v_s[1:] != v_s[:-1])))
        seg_starts = np.nonzero(new_seg)[0]
        seg_id = np.cumsum(new_seg) - 1
        pos = np.arange(n, dtype=np.int64) - seg_starts[seg_id]
        run_id = np.cumsum(new_run) - 1
        run_starts = np.nonzero(new_run)[0]
        # RANK: 1 + position (within segment) of the first row of this
        # value-run; DENSE_RANK: run ordinal within segment
        rank = pos[run_starts[run_id]] + 1
        dense = run_id - run_id[seg_starts[seg_id]] + 1
        return pa.table(
            {
                key_col: pa.array(k_s.tolist(), g.column("k").type),
                tie_col: pa.array(t_s, pa.int64()),
                value_col: pa.array(v_s, pa.int64()),
                "rank": pa.array(rank, pa.int64()),
                "dense_rank": pa.array(dense, pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col, value_col, tie_col])
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
    )


def dist_rank_per_group(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    tie_col: str,
    descending: bool = True,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """``PERCENT_RANK()`` and ``CUME_DIST() OVER (PARTITION BY key ORDER
    BY value [DESC])`` — SQL semantics: percent_rank = (rank-1)/(n-1)
    (0.0 for a 1-row partition), cume_dist = (#rows preceding or peer)/n.
    Same distributed contract as rank_per_group (hash-partition by key,
    one lexsort per partition, vectorized value-run detection); both
    outputs are single divisions of exact integers, so no rounding is
    needed for oracle parity. Output: (key, tie, value, percent_rank,
    cume_dist)."""
    from record_matching_ray.functions.hashing import hash_strings

    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions

    def add_pk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if pa.types.is_integer(keys.type):
            kh = keys.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            kh = hash_strings(keys.to_pylist()).view(np.int64)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(kh.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "k": keys,
                "v": t.column(value_col),
                "tie": t.column(tie_col),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        keys = np.asarray(g.column("k").to_pylist(), dtype=object)
        v = g.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        tie = g.column("tie").to_numpy(zero_copy_only=False)
        vo = -v if descending else v
        order = np.lexsort((tie, vo, keys))
        k_s, v_s, t_s = keys[order], v[order], tie[order]
        n = len(order)
        new_seg = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        new_run = np.concatenate(
            ([True], (k_s[1:] != k_s[:-1]) | (v_s[1:] != v_s[:-1]))
        )
        seg_starts = np.nonzero(new_seg)[0]
        seg_id = np.cumsum(new_seg) - 1
        seg_ends = np.concatenate((seg_starts[1:], [n]))  # exclusive
        seg_len = seg_ends[seg_id] - seg_starts[seg_id]
        pos = np.arange(n, dtype=np.int64) - seg_starts[seg_id]
        run_id = np.cumsum(new_run) - 1
        run_starts = np.nonzero(new_run)[0]
        run_ends = np.concatenate((run_starts[1:], [n]))  # exclusive
        rank = pos[run_starts[run_id]] + 1
        # run end relative to segment start = rows preceding-or-peer
        peers_through = run_ends[run_id] - seg_starts[seg_id]
        with np.errstate(divide="ignore", invalid="ignore"):
            pr = np.where(
                seg_len > 1, (rank - 1) / np.maximum(seg_len - 1, 1), 0.0
            )
        cd = peers_through / seg_len
        return pa.table(
            {
                key_col: pa.array(k_s.tolist(), g.column("k").type),
                tie_col: pa.array(t_s, pa.int64()),
                value_col: pa.array(v_s, pa.int64()),
                "percent_rank": pa.array(pr, pa.float64()),
                "cume_dist": pa.array(cd, pa.float64()),
            }
        )

    return (
        ds.select_columns([key_col, value_col, tie_col])
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# sequential funnel


def funnel_steps(
    events: ray.data.Dataset,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Sequential conversion funnel: per user, how many of ``steps`` were
    completed IN ORDER — step k counts only if an event of its type
    occurs strictly after the user's earliest valid step k-1 time.

    Output (user_id, steps_completed) for every user with at least one
    event of any step type (0 if none of them is the first step).

    Ray shape: non-step events are dropped AT THE SCAN (the stream that
    shuffles is only funnel-relevant rows); then the standard pk-by-user
    hash partition and ONE vectorized sweep — per step, a masked
    ``np.minimum.at`` computes every user's earliest valid time
    simultaneously (loop over the fixed step list, never over users).
    Determinism: ties (equal timestamps) require STRICTLY increasing
    times between steps, so the result is order-independent."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions
    step_list = [str(s) for s in steps]
    step_idx = {s: i for i, s in enumerate(step_list)}

    def add_pk(t: pa.Table) -> pa.Table:
        typ = t.column(type_col).to_pylist()
        sidx = np.array([step_idx.get(x, -1) for x in typ], dtype=np.int64)
        keep = sidx >= 0
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        ts = (
            t.column(ts_col)
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)[keep]
        )
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64),
                    pa.int64(),
                ),
                "k": pa.array(keys, pa.int64()),
                "t": pa.array(ts, pa.int64()),
                "s": pa.array(sidx[keep], pa.int64()),
            }
        )

    OUT = pa.schema([("user_id", pa.int64()), ("steps_completed", pa.int64())])
    SENTINEL = np.iinfo(np.int64).max

    def sweep(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return OUT.empty_table()
        k = g.column("k").to_numpy(zero_copy_only=False)
        ts = g.column("t").to_numpy(zero_copy_only=False)
        sidx = g.column("s").to_numpy(zero_copy_only=False)
        uk, seg = np.unique(k, return_inverse=True)
        prev = np.full(len(uk), np.iinfo(np.int64).min, dtype=np.int64)
        completed = np.zeros(len(uk), dtype=np.int64)
        alive = np.ones(len(uk), dtype=bool)
        for si in range(len(step_list)):
            cand = (sidx == si) & alive[seg] & (ts > prev[seg])
            best = np.full(len(uk), SENTINEL, dtype=np.int64)
            np.minimum.at(best, seg[cand], ts[cand])
            hit = best < SENTINEL
            completed[hit] += 1
            prev = best
            alive = alive & hit
            if not alive.any():
                break
        return pa.table(
            {
                "user_id": pa.array(uk, pa.int64()),
                "steps_completed": pa.array(completed, pa.int64()),
            }
        )

    from record_matching_ray.stages.util import conformed

    return conformed(
        events.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow"
        ),
        OUT,
    )


# ---------------------------------------------------------------------------
# cohort retention


def cohort_retention(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "month",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Cohort retention at ``granularity`` ('month' or 'day'): users
    grouped by their first-event period; one output row per
    (cohort period, offset periods) counting the distinct users from
    that cohort active in that period.

    Ray shape: ONE user-keyed hash shuffle (the standard pk pattern) —
    the per-partition sweep derives each user's cohort month (min ts)
    and distinct active months in the same pass, emitting bounded
    (cohort, offset) rows; a tiny groupby sums user counts. No join: a
    user's history is co-partitioned by construction. Months are
    datetime64[M] ordinals, so offset arithmetic is integer-exact and
    matches SQL date_trunc/datediff."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions
    if granularity not in ("month", "day"):
        raise ValueError(f"granularity must be month|day, got {granularity}")
    unit = "M" if granularity == "month" else "D"

    def add_pk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64),
                    pa.int64(),
                ),
                "k": pa.array(keys, pa.int64()),
                "t": t.column(ts_col),
            }
        )

    PART = pa.schema(
        [
            ("cohort_m", pa.int64()),
            ("offset_periods", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def sweep(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return PART.empty_table()
        k = g.column("k").to_numpy(zero_copy_only=False)
        months = (
            g.column("t")
            .to_numpy(zero_copy_only=False)
            .astype(f"datetime64[{unit}]")
            .astype(np.int64)
        )
        # distinct (user, month), then per-user first month by sort order
        order = np.lexsort((months, k))
        k_s, m_s = k[order], months[order]
        first_row = np.r_[True, k_s[1:] != k_s[:-1]]
        seg = np.cumsum(first_row) - 1
        cohort = m_s[first_row][seg]  # per row: its user's first month
        keep = np.r_[True, (k_s[1:] != k_s[:-1]) | (m_s[1:] != m_s[:-1])]
        g2 = pa.TableGroupBy(
            pa.table(
                {
                    "cohort_m": pa.array(cohort[keep], pa.int64()),
                    "offset_periods": pa.array(
                        (m_s - cohort)[keep], pa.int64()
                    ),
                }
            ),
            ["cohort_m", "offset_periods"],
        ).aggregate([([], "count_all")])
        return g2.rename_columns(["cohort_m", "offset_periods", "n"]).cast(PART)

    from record_matching_ray.stages.util import conformed

    part = conformed(
        events.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow"
        ),
        PART,
    )
    acc = part.groupby(["cohort_m", "offset_periods"]).sum("n")

    OUT = pa.schema(
        [
            ("cohort_period", pa.timestamp("us")),
            ("offset_periods", pa.int64()),
            ("n_users", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(n)" not in t.column_names:
            return OUT.empty_table()
        cm = (
            t.column("cohort_m")
            .to_numpy(zero_copy_only=False)
            .astype(f"datetime64[{unit}]")
            .astype("datetime64[us]")
        )
        return pa.table(
            {
                "cohort_period": pa.array(cm, pa.timestamp("us")),
                "offset_periods": t.column("offset_periods"),
                "n_users": t.column("sum(n)"),
            }
        )

    return conformed(acc.map_batches(finish, batch_format="pyarrow"), OUT)


def time_range_window(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_us: int = 3_600_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Time-based RANGE window aggregate per key:
    ``SUM/COUNT(...) OVER (PARTITION BY key ORDER BY ts
    RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)``.

    Completes the window family next to the ROWS-window
    (``moving_window_sum``): the frame is every row of the same key whose
    timestamp falls in ``[ts - window, ts]`` — boundary inclusive and
    PEER-inclusive (rows sharing the current timestamp are in the frame
    even when they sort after it), which is SQL's exact RANGE rule.

    Same contract as the other window ops: hash-partition by key, one
    lexsort per partition; the frame sum is two ``searchsorted`` bounds
    into a segment-aware prefix sum — no per-row loop, no frame
    materialization. Values accumulate as exact integer micro-units
    (round(value * 1e6)), so summation is order-independent and the
    DuckDB oracle needs no float tolerance."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions
    w = np.int64(window_us)

    def add_pk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        micros = pc.cast(
            pc.round(pc.multiply(t.column(value_col), 1_000_000.0)), pa.int64()
        )
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(keys, pa.int64()),
                "t": pc.cast(t.column(ts_col), pa.int64()),  # us since epoch
                "rid": t.column(id_col),
                "value_c": micros,
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        keys = g.column("k").to_numpy(zero_copy_only=False)
        ts = g.column("t").to_numpy(zero_copy_only=False)
        rid = g.column("rid").to_numpy(zero_copy_only=False)
        v = g.column("value_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((rid, ts, keys))
        k_s, t_s, r_s, v_s = keys[order], ts[order], rid[order], v[order]
        n = len(order)
        cp = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(v_s, out=cp[1:])
        new_seg = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        # fused rank-space composite key (same trick as asof_join): rank
        # timestamps against the partition's unique-ts table so
        # (segment, rank) fits an int64 monotone composite, then TWO
        # whole-partition searchsorted calls bound every row's frame —
        # no per-key loop
        ut = np.unique(t_s)
        M = np.int64(len(ut) + 1)
        rank = np.searchsorted(ut, t_s, side="left")
        comp = seg_id * M + rank
        lo = np.searchsorted(
            comp, seg_id * M + np.searchsorted(ut, t_s - w, side="left"), side="left"
        )
        hi = np.searchsorted(comp, seg_id * M + rank, side="right")
        return pa.table(
            {
                id_col: pa.array(r_s, pa.int64()),
                "win_sum_c": pa.array(cp[hi] - cp[lo], pa.int64()),
                "win_n": pa.array(hi - lo, pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col, ts_col, value_col, id_col])
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
    )


def latest_snapshot(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    payload_cols: tuple[str, ...] = ("event_type", "value"),
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Latest-wins snapshot merge (CDC/upsert compaction): collapse a
    keyed change stream to ONE row per key — the row with the greatest
    ``(ts, id)`` — i.e. SQL's
    ``row_number() OVER (PARTITION BY key ORDER BY ts DESC, id DESC) = 1``.

    Scale shape: each batch first prunes locally to one candidate row per
    key it sees (argmax inside the batch — the combiner), so the shuffle
    moves at most keys x batches rows, never the stream; one int-pk
    hash shuffle + per-partition sweep finishes exactly."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions
    cols = [key_col, ts_col, id_col, *payload_cols]

    def prune(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(t.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        rid = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((rid, ts, keys))
        k_s = keys[order]
        last = np.concatenate((k_s[1:] != k_s[:-1], [True]))
        take = pa.array(order[last], pa.int64())
        out = t.select(cols).take(take)
        pk = (mix64(k_s[last].astype(_U64)) % _U64(P)).astype(np.int64)
        return out.append_column("pk", pa.array(pk, pa.int64()))

    def sweep(g: pa.Table) -> pa.Table:
        keys = g.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(g.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        rid = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((rid, ts, keys))
        k_s = keys[order]
        last = np.concatenate((k_s[1:] != k_s[:-1], [True]))
        return g.select(cols).take(pa.array(order[last], pa.int64()))

    return (
        ds.select_columns(cols)
        .map_batches(prune, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
    )


def event_transitions(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    type_col: str = "event_type",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """First-order Markov transition counts + probabilities over each
    key's event sequence: for consecutive events (by ``ts, tie`` within a
    key), count (src_type, dst_type) and emit
    ``prob = cnt / sum(cnt per src)`` rounded to 6 decimals — the
    session-flow / clickstream transition-matrix primitive.

    Partitioning contract matches lag_delta (hash-partition by key, one
    vectorized lexsort per partition, shifted same-key compare). The
    transition relation is type-vocabulary-bounded (|types|² rows), so
    the partial counts per partition and the final probability pass are
    both tiny regardless of corpus size."""
    if num_partitions is None:
        num_partitions = shuffle_partitions()
    P = num_partitions

    def add_pk(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(keys.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(keys, pa.int64()),
                "t": t.column(ts_col),
                "tie": t.column(tie_col),
                "ty": t.column(type_col),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        keys = g.column("k").to_numpy(zero_copy_only=False)
        ts = g.column("t").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        tie = g.column("tie").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, keys))
        k_s = keys[order]
        ty = g.column("ty").take(pa.array(order, pa.int64()))
        same_next = np.concatenate((k_s[:-1] == k_s[1:], [False]))
        idx = np.nonzero(same_next)[0]
        pairs = pa.table(
            {
                "src": ty.take(pa.array(idx, pa.int64())),
                "dst": ty.take(pa.array(idx + 1, pa.int64())),
            }
        )
        agg = pa.TableGroupBy(pairs, ["src", "dst"]).aggregate([([], "count_all")])
        return agg.rename_columns(["src", "dst", "cnt"])

    counts = (
        ds.select_columns([key_col, ts_col, tie_col, type_col])
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
    )
    counts = conformed(
        counts,
        pa.schema([("src", pa.string()), ("dst", pa.string()), ("cnt", pa.int64())]),
    )
    total = (
        counts.groupby(["src", "dst"]).sum("cnt").rename_columns({"sum(cnt)": "cnt"})
    )
    total = conformed(
        total,
        pa.schema([("src", pa.string()), ("dst", pa.string()), ("cnt", pa.int64())]),
    )
    # |types|² rows: one block, vectorized per-src normalization
    small, _ = compact_nonempty(total, 1)

    def add_prob(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("src").to_pylist(), dtype=object)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        tot = np.zeros(len(src), np.float64)
        for s in np.unique(src.astype(str)):
            m = src == s
            tot[m] = cnt[m].sum()
        return t.append_column(
            "prob", pa.array(round6_sql(cnt / tot), pa.float64())
        )

    out = small.map_batches(add_prob, batch_format="pyarrow")
    return conformed(
        out,
        pa.schema(
            [
                ("src", pa.string()),
                ("dst", pa.string()),
                ("cnt", pa.int64()),
                ("prob", pa.float64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival over per-user activity spans


def kaplan_meier(
    events: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    unit_us: int = 3_600_000_000,
    censor_horizon: int = 720,
) -> ray.data.Dataset:
    """Kaplan-Meier (1958) survival estimate of user activity lifetime:
    duration = span between a user's first and last event in whole time
    units (boundary crossings, matching SQL date_diff); a user whose
    last event is >= ``censor_horizon`` units before the corpus end is
    an observed churn (event), later users are right-censored.
    S(t) = prod_{t_i <= t} (1 - d_i / n_i), computed as
    exp(cumsum(ln(1 - d/n))) — the same expression tree the SQL window
    oracle evaluates.

    Scale shape: one user-keyed shuffle folds the stream to per-user
    (first, last); the KM sweep runs over the DURATION HISTOGRAM
    (distinct lifetimes, time-domain-bounded), never per user.

    Output: (t_unit, n_risk, d_events, survival round-6), one row per
    distinct duration."""
    from ray.data.aggregate import Max, Min, Sum

    from record_matching_ray.stages.util import round6_sql

    def span_partial(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        u, ts = u[order], ts[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        f = np.minimum.reduceat(ts, starts)
        l = np.maximum.reduceat(ts, starts)
        return pa.table(
            {
                "u": pa.array(u[starts], pa.int64()),
                "f": pa.array(f, pa.int64()),
                "l": pa.array(l, pa.int64()),
            }
        )

    spans = (
        events.select_columns([user_col, ts_col])
        .map_batches(span_partial, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Min(on="f", alias_name="f"), Max(on="l", alias_name="l"))
    )

    # pass 1: the global corpus end (one aggregate scalar); pass 2 folds
    # per-user spans to the (duration, churn, count) histogram, with
    # durations and censoring both as boundary-crossing unit diffs
    # (== SQL date_diff semantics)
    mx = events.select_columns([ts_col]).max(ts_col)
    mx_us = int(pa.scalar(mx).cast(pa.int64()).as_py())

    def km_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"dur": pa.array([], pa.int64()),
                 "d": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        fname = "f" if "f" in t.column_names else "min(f)"
        lname = "l" if "l" in t.column_names else "max(l)"
        f = t.column(fname).to_numpy(zero_copy_only=False)
        l = t.column(lname).to_numpy(zero_copy_only=False)
        dur = l // unit_us - f // unit_us
        ev = ((mx_us // unit_us - l // unit_us) >= censor_horizon).astype(
            np.int64
        )
        uniq, inv = np.unique(dur, return_inverse=True)
        d = np.zeros(len(uniq), np.int64)
        n = np.zeros(len(uniq), np.int64)
        np.add.at(d, inv, ev)
        np.add.at(n, inv, 1)
        return pa.table(
            {"dur": pa.array(uniq, pa.int64()),
             "d": pa.array(d, pa.int64()),
             "n": pa.array(n, pa.int64())}
        )

    hist = (
        spans.map_batches(km_partial, batch_format="pyarrow")
        .groupby("dur")
        .aggregate(Sum(on="d", alias_name="d"), Sum(on="n", alias_name="n"))
        .take_all()
    )
    dur = np.array([r["dur"] for r in hist], np.int64)
    d = np.array([r.get("sum(d)", r.get("d")) for r in hist], np.int64)
    n = np.array([r.get("sum(n)", r.get("n")) for r in hist], np.int64)
    order = np.argsort(dur)
    dur, d, n = dur[order], d[order], n[order]
    tot = int(n.sum())
    prior = np.concatenate([[0], np.cumsum(n)[:-1]])
    nr = tot - prior
    if np.any(d >= nr):
        raise ValueError(
            "Kaplan-Meier degenerate tail: every at-risk user churns at "
            "some duration (survival hits exact 0; the SQL oracle's "
            "ln(0) errors the same way) — extend censor_horizon"
        )
    surv = np.exp(np.cumsum(np.log(1.0 - d / nr.astype(np.float64))))
    return ray.data.from_arrow(
        pa.table(
            {
                "t_unit": pa.array(dur, pa.int64()),
                "n_risk": pa.array(nr.astype(np.int64), pa.int64()),
                "d_events": pa.array(d, pa.int64()),
                "survival": pa.array(round6_sql(surv), pa.float64()),
            }
        )
    )
