"""Market-basket co-occurrence mining (association-rule support + lift).

For every pair of parts bought together in at least ``min_support``
orders: the pair's co-occurrence count and its lift
``P(x,y) / (P(x)·P(y)) = pair_count · n_orders / (cnt_x · cnt_y)``
(Agrawal et al. 1993 2-itemset counting).

Reference analog: none (the reference has no basket ops); the
within-group pair expansion follows the same discipline as its cluster
self-join → pair expansion (record_matching/main.py:697-712) per
SURVEY §2.4 — pairs exist only WITHIN a basket, never a global cross
join.

Scale design:
- One hash shuffle co-locates each order's lines (key = orderkey);
  pair expansion is O(k²) per basket with k bounded by basket size.
- Because the partition key IS the basket key, per-partition distinct
  (order, part) sets are globally disjoint — so per-part basket counts
  and the distinct-basket count fall out of the SAME sweep as tagged
  partial rows (one shuffle feeds all three aggregates; the dupspans
  tagged-union pattern).
- Pair counting packs (x, y) into one int64 key (valid while part keys
  fit 31 bits — asserted) so the wide count shuffle is int-keyed,
  matching the engine's pair-shuffle rule (stages/dedup.py:
  fold_candidate_pairs rationale: composite-key aggregates were
  measured ~100× slower at scale).
- The per-part count relation is catalog-bounded (≤ #parts), so the
  final lift computation joins it twice via small hash joins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.functions.hashing import mix64
from record_matching_ray.stages.util import (
    compact_nonempty,
    conformed,
    round6_sql,
    shuffle_partitions,
)

_U64 = np.uint64


def copurchase_lift(
    lineitem: ray.data.Dataset,
    min_support: int = 2,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(x, y, pair_count, lift) for part pairs co-ordered in >=
    min_support orders; x < y; lift rounded to 6 decimals."""
    P = num_partitions or shuffle_partitions()

    def add_pk(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(o.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "o": pa.array(o, pa.int64()),
                "p": t.column("l_partkey"),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        """Tagged partial rows from one basket-complete partition:
        kind 0 = (packed pair key, count), kind 1 = (part key, basket
        count), kind 2 = (0, distinct-basket count)."""
        o = g.column("o").to_numpy(zero_copy_only=False)
        p = g.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                "kind": pa.array([], pa.int64()),
                "key": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if len(o) == 0:
            return empty
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        # distinct (order, part) within the partition (globally distinct
        # too: the partition key is the order)
        keep = np.concatenate(([True], (o[1:] != o[:-1]) | (p[1:] != p[:-1])))
        o, p = o[keep], p[keep]
        new_seg = np.concatenate(([True], o[1:] != o[:-1]))
        starts = np.nonzero(new_seg)[0]
        sizes = np.diff(np.append(starts, len(o)))
        # pair expansion: all segments of one size at once (basket sizes
        # are tiny and few — no per-basket Python dispatch)
        pair_keys: list[np.ndarray] = []
        for k in np.unique(sizes):
            if k < 2:
                continue
            s = starts[sizes == k]
            ii, jj = np.triu_indices(int(k), k=1)
            x = p[(s[:, None] + ii[None, :]).ravel()]
            y = p[(s[:, None] + jj[None, :]).ravel()]
            assert (x < (1 << 31)).all() and (y < (1 << 31)).all(), (
                "copurchase_lift packs part keys into one int64; keys must "
                "fit 31 bits (use a wider packing for larger catalogs)"
            )
            pair_keys.append((x << np.int64(31)) | y)
        parts_k, parts_c = np.unique(p, return_counts=True)
        rows = [
            pa.table(
                {
                    "kind": pa.array(np.ones(len(parts_k), np.int64)),
                    "key": pa.array(parts_k, pa.int64()),
                    "c": pa.array(parts_c.astype(np.int64), pa.int64()),
                }
            ),
            pa.table(
                {
                    "kind": pa.array([np.int64(2)]),
                    "key": pa.array([np.int64(0)]),
                    "c": pa.array([np.int64(len(starts))]),
                }
            ),
        ]
        if pair_keys:
            pk_all, pk_c = np.unique(np.concatenate(pair_keys), return_counts=True)
            rows.append(
                pa.table(
                    {
                        "kind": pa.array(np.zeros(len(pk_all), np.int64)),
                        "key": pa.array(pk_all, pa.int64()),
                        "c": pa.array(pk_c.astype(np.int64), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(rows)

    tagged = (
        lineitem.select_columns(["l_orderkey", "l_partkey"])
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow"
        )
    )
    tagged = conformed(
        tagged,
        pa.schema([("kind", pa.int64()), ("key", pa.int64()), ("c", pa.int64())]),
    )
    # kinds 1 and 2 are catalog-bounded (≤ #parts + P rows) — partial
    # rows are already distinct per partition for kind 2 and per
    # (partition, part) for kind 1, so a single sum per key finishes them.
    tagged, _ = compact_nonempty(tagged, P)

    import pyarrow.compute as pc

    def only(kind: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("kind"), kind)).drop_columns(["kind"])

        return fn

    part_counts = (
        tagged.map_batches(only(1), batch_format="pyarrow")
        .groupby("key")
        .sum("c")
        .rename_columns({"key": "pkey", "sum(c)": "pcnt"})
    )
    part_counts = conformed(
        part_counts, pa.schema([("pkey", pa.int64()), ("pcnt", pa.int64())])
    )
    n_orders = int(
        sum(
            b.column("c").to_numpy().sum()
            for b in tagged.map_batches(only(2), batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )

    pairs = (
        tagged.map_batches(only(0), batch_format="pyarrow").groupby("key").sum("c")
    )
    pairs = conformed(
        pairs, pa.schema([("key", pa.int64()), ("sum(c)", pa.int64())])
    )

    def unpack(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy(zero_copy_only=False)
        c = t.column("sum(c)").to_numpy(zero_copy_only=False)
        m = c >= min_support
        k, c = k[m], c[m]
        return pa.table(
            {
                "x": pa.array(k >> np.int64(31), pa.int64()),
                "y": pa.array(k & np.int64((1 << 31) - 1), pa.int64()),
                "pair_count": pa.array(c, pa.int64()),
            }
        )

    sup = pairs.map_batches(unpack, batch_format="pyarrow")
    nj = max(1, min(8, P))
    j = sup.join(
        part_counts, join_type="inner", num_partitions=nj,
        on=("x",), right_on=("pkey",),
    ).rename_columns({"pcnt": "cx"})
    j = j.join(
        part_counts, join_type="inner", num_partitions=nj,
        on=("y",), right_on=("pkey",),
    ).rename_columns({"pcnt": "cy"})

    def finish(t: pa.Table) -> pa.Table:
        c = t.column("pair_count").to_numpy(zero_copy_only=False).astype(np.float64)
        cx = t.column("cx").to_numpy(zero_copy_only=False).astype(np.float64)
        cy = t.column("cy").to_numpy(zero_copy_only=False).astype(np.float64)
        lift = round6_sql(c * float(n_orders) / (cx * cy))
        return pa.table(
            {
                "x": t.column("x"),
                "y": t.column("y"),
                "pair_count": t.column("pair_count"),
                "lift": pa.array(lift, pa.float64()),
            }
        )

    out = j.map_batches(finish, batch_format="pyarrow")
    return conformed(
        out,
        pa.schema(
            [
                ("x", pa.int64()),
                ("y", pa.int64()),
                ("pair_count", pa.int64()),
                ("lift", pa.float64()),
            ]
        ),
    )


def triple_support(
    lineitem: ray.data.Dataset,
    min_support: int = 2,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Frequent 3-itemsets: (x, y, z, triple_count) for part triples
    co-ordered in >= min_support orders, x < y < z — the Apriori level-3
    sweep on top of copurchase_lift's level-2.

    Same scale discipline: basket-key shuffle, per-partition size-grouped
    combination expansion (no per-basket dispatch), and the wide count
    shuffle rides ONE int64 key — three part keys packed 21 bits each
    (asserted; catalogs past 2M parts need the two-column fallback)."""
    from itertools import combinations

    P = num_partitions or shuffle_partitions()

    def add_pk(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(o.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "o": pa.array(o, pa.int64()),
                "p": t.column("l_partkey"),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        o = g.column("o").to_numpy(zero_copy_only=False)
        p = g.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {"key": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
        )
        if len(o) == 0:
            return empty
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        keep = np.concatenate(([True], (o[1:] != o[:-1]) | (p[1:] != p[:-1])))
        o, p = o[keep], p[keep]
        starts = np.nonzero(np.concatenate(([True], o[1:] != o[:-1])))[0]
        sizes = np.diff(np.append(starts, len(o)))
        keys: list[np.ndarray] = []
        for k in np.unique(sizes):
            if k < 3:
                continue
            s = starts[sizes == k]
            combo = np.array(list(combinations(range(int(k)), 3)), np.int64)
            xi = p[(s[:, None] + combo[None, :, 0]).ravel()]
            yi = p[(s[:, None] + combo[None, :, 1]).ravel()]
            zi = p[(s[:, None] + combo[None, :, 2]).ravel()]
            assert (zi < (1 << 21)).all(), (
                "triple_support packs three part keys into one int64; keys "
                "must fit 21 bits (two-column fallback for larger catalogs)"
            )
            keys.append((xi << np.int64(42)) | (yi << np.int64(21)) | zi)
        if not keys:
            return empty
        uk, uc = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table(
            {"key": pa.array(uk, pa.int64()),
             "c": pa.array(uc.astype(np.int64), pa.int64())}
        )

    counts = (
        lineitem.select_columns(["l_orderkey", "l_partkey"])
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow"
        )
        .groupby("key")
        .sum("c")
    )
    counts = conformed(
        counts, pa.schema([("key", pa.int64()), ("sum(c)", pa.int64())])
    )

    def unpack(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy(zero_copy_only=False)
        c = t.column("sum(c)").to_numpy(zero_copy_only=False)
        m = c >= min_support
        k, c = k[m], c[m]
        mask21 = np.int64((1 << 21) - 1)
        return pa.table(
            {
                "x": pa.array(k >> np.int64(42), pa.int64()),
                "y": pa.array((k >> np.int64(21)) & mask21, pa.int64()),
                "z": pa.array(k & mask21, pa.int64()),
                "triple_count": pa.array(c, pa.int64()),
            }
        )

    out = counts.map_batches(unpack, batch_format="pyarrow")
    return conformed(
        out,
        pa.schema(
            [("x", pa.int64()), ("y", pa.int64()), ("z", pa.int64()),
             ("triple_count", pa.int64())]
        ),
    )
