"""Iterative graph algorithms beyond connected components: PageRank.

Synchronous power iteration of
``r'(v) = (1-d)/N + d * sum_{u->v} r(u)/deg(u)``
(the non-normalized classic; isolated nodes hold (1-d)/N). Fixed
iteration count so the result is deterministic and SQL-reproducible —
the DuckDB oracle unrolls the same iterations as chained CTEs.

Two execution plans, chosen by a counted gate exactly like the ER
scorer's broadcast-vs-join split:

- broadcast (nodes <= max_broadcast_nodes): the rank vector is a numpy
  array broadcast via ray.put each iteration; every edge batch emits
  per-batch partial dst sums (one vocabulary-bounded shuffle per
  iteration, nothing else moves). Right for graphs whose NODE set fits
  the driver even when the EDGE set is huge.
- join (the general 100 TB path): ranks stay a Dataset; each iteration
  is edges ⋈ ranks (on src) -> groupby(dst).sum -> left-join back onto
  the node table, materialized per iteration to keep lineage flat. No
  driver-side structure scales with the graph.

Both paths compute identical values (pytest pins them to each other and
to the oracle formula).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from record_matching_ray.stages.util import (
    compact_nonempty,
    conformed,
    shuffle_partitions,
)

RANK_SCHEMA = pa.schema([("node", pa.int64()), ("rank", pa.float64())])


def _degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["src"]), "src").aggregate([([], "count_all")])
        return g.rename_columns(["src", "deg"])

    out = (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("src")
        .sum("deg")
        .rename_columns({"sum(deg)": "deg"})
    )
    return conformed(out, pa.schema([("src", pa.int64()), ("deg", pa.int64())]))


def pagerank(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    iters: int = 5,
    damping: float = 0.85,
    max_broadcast_nodes: int = 2_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(node, rank) after ``iters`` synchronous iterations.

    ``edges``: (src, dst) int64 — include BOTH directions for an
    undirected graph. ``nodes``: (node,) int64, the full vertex set
    (isolated vertices included)."""
    P = num_partitions or shuffle_partitions()
    d = float(damping)

    nodes = conformed(nodes.select_columns(["node"]), pa.schema([("node", pa.int64())]))
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(RANK_SCHEMA.empty_table())
    base = (1.0 - d) / n_nodes

    if n_nodes <= max_broadcast_nodes:
        return _pagerank_broadcast(edges, nodes, n_nodes, iters, d, base)
    return _pagerank_join(edges, nodes, n_nodes, iters, d, base, P)


def _pagerank_broadcast(edges, nodes, n_nodes, iters, d, base):
    """Rank vector on the driver (counted gate), edges streamed per
    iteration; one dst-keyed partial-sum shuffle per iteration."""
    node_ids = np.sort(
        np.concatenate(
            [
                t.column("node").to_numpy(zero_copy_only=False)
                for r in nodes.to_arrow_refs()
                if (t := ray.get(r)).num_rows and t.num_columns
            ]
        )
    )
    # materialize edges FIRST: the degree pass and every iteration read
    # the same blocks instead of re-executing the upstream edge pipeline
    edges = edges.materialize()
    deg_ds = _degrees(edges)
    deg_parts = [
        ray.get(r)
        for r in deg_ds.to_arrow_refs()
    ]
    deg_parts = [t for t in deg_parts if t.num_rows and t.num_columns]
    if deg_parts:
        dt = pa.concat_tables(deg_parts)
        dsrc = dt.column("src").to_numpy(zero_copy_only=False)
        ddeg = dt.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(dsrc)
        dsrc, ddeg = dsrc[order], ddeg[order]
    else:
        dsrc = np.empty(0, dtype=np.int64)
        ddeg = np.empty(0, dtype=np.float64)

    ranks = np.full(n_nodes, 1.0 / n_nodes, dtype=np.float64)
    for _ in range(iters):
        ref = ray.put(ranks)

        def contrib(t: pa.Table) -> pa.Table:
            r = ray.get(ref)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            si = np.searchsorted(node_ids, src)
            di = np.searchsorted(dsrc, src)
            w = r[si] / ddeg[di]
            g = pa.TableGroupBy(
                pa.table(
                    {
                        "dst": pa.array(dst, pa.int64()),
                        "w": pa.array(w, pa.float64()),
                    }
                ),
                "dst",
            ).aggregate([("w", "sum")])
            return g.rename_columns(["dst", "w"])

        parts = [
            ray.get(r2)
            for r2 in edges.map_batches(
                contrib, batch_format="pyarrow"
            ).to_arrow_refs()
        ]
        parts = [t for t in parts if t.num_rows and t.num_columns]
        new = np.full(n_nodes, base, dtype=np.float64)
        if parts:
            pt = pa.concat_tables(parts)
            di = np.searchsorted(node_ids, pt.column("dst").to_numpy(zero_copy_only=False))
            np.add.at(new, di, d * pt.column("w").to_numpy(zero_copy_only=False))
        ranks = new

    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(node_ids, pa.int64()),
                "rank": pa.array(np.round(ranks, 9), pa.float64()),
            }
        )
    )


def _pagerank_join(edges, nodes, n_nodes, iters, d, base, P):
    """General path: ranks stay distributed; per iteration one
    edges⋈ranks join, one dst groupby, one node left-join; materialized
    so lineage stays flat."""
    deg = _degrees(edges)
    edges_deg = edges.join(
        deg, join_type="inner", num_partitions=P, on=("src",)
    ).materialize()

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "rank": pa.array(
                    np.full(t.num_rows, 1.0 / n_nodes), pa.float64()
                ),
            }
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()
    nodes_m = nodes.materialize()

    for _ in range(iters):
        r_in, n_r = compact_nonempty(ranks, P)
        joined = edges_deg.join(
            r_in, join_type="inner", num_partitions=P, on=("src",), right_on=("node",)
        )

        def per_edge(t: pa.Table) -> pa.Table:
            w = (
                t.column("rank").to_numpy(zero_copy_only=False)
                / t.column("deg").to_numpy(zero_copy_only=False)
            )
            g = pa.TableGroupBy(
                pa.table(
                    {"dst": t.column("dst"), "w": pa.array(w, pa.float64())}
                ),
                "dst",
            ).aggregate([("w", "sum")])
            return g.rename_columns(["dst", "w"])

        sums = (
            joined.map_batches(per_edge, batch_format="pyarrow")
            .groupby("dst")
            .sum("w")
            .rename_columns({"sum(w)": "w"})
        )
        sums = conformed(sums, pa.schema([("dst", pa.int64()), ("w", pa.float64())]))
        sums, n_s = compact_nonempty(sums, P)
        if n_s == 0:
            merged = nodes_m.map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node"),
                        "rank": pa.array(
                            np.full(t.num_rows, base), pa.float64()
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        else:
            left = nodes_m.join(
                sums,
                join_type="left_outer",
                num_partitions=P,
                on=("node",),
                right_on=("dst",),
            )

            def fold(t: pa.Table) -> pa.Table:
                w = t.column("w").to_numpy(zero_copy_only=False)
                w = np.where(np.isnan(w), 0.0, w)
                return pa.table(
                    {
                        "node": t.column("node"),
                        "rank": pa.array(base + d * w, pa.float64()),
                    }
                )

            merged = left.map_batches(fold, batch_format="pyarrow")
        ranks = conformed(merged, RANK_SCHEMA).materialize()

    def round9(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "rank": pa.array(
                    np.round(t.column("rank").to_numpy(zero_copy_only=False), 9),
                    pa.float64(),
                ),
            }
        )

    return ranks.map_batches(round9, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# triangle counting (node-iterator on canonical edges)

EDGE_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])
TRI_SCHEMA = pa.schema([("node", pa.int64()), ("triangles", pa.int64())])


def triangle_counts(
    edges: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-node triangle counts of an undirected simple graph.

    ``edges``: canonical (a, b) int64 with a < b, distinct. Node-iterator
    on the id orientation: every triangle x < y < z is found exactly once
    as wedge (y, z) centered at x closed by edge (y, z). Returns
    (node, triangles) for nodes in >= 1 triangle.

    Ray shape: wedge generation is ONE hash shuffle of the edge list
    (pk = mix64(a) mod P, vectorized triu sweep per a-segment — the
    repo's standard pk-partition pattern, cf. stages/temporal.py:49);
    closing-edge detection is a TAGGED UNION of wedges and edges through
    one more (a, b)-keyed shuffle (same design as the as-of join — no
    Acero join, so a triangle-free / empty wedge side can't trip the
    empty-partition join bug rayfix.py documents); per-node counting is
    a groupby over 3 rows per triangle. Skew note: id orientation bounds
    wedges per center by its degree^2 — for power-law graphs swap in
    degree orientation before the sweep (not needed for kNN graphs,
    whose degree is ~k by construction).
    """
    from record_matching_ray.functions.hashing import mix64
    from record_matching_ray.stages.util import conformed, shuffle_partitions

    P = num_partitions or shuffle_partitions()
    edges = conformed(edges.select_columns(["a", "b"]), EDGE_SCHEMA)

    def add_pk(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        pk = (mix64(a) % np.uint64(P)).astype(np.int64)
        return t.append_column("pk", pa.array(pk, pa.int64()))

    WEDGE = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("center", pa.int64())]
    )

    def wedge_sweep(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return WEDGE.empty_table()
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        outs_l, outs_r, outs_c = [], [], []
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        bounds = np.r_[starts, len(a)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            nb = b[s:e]  # sorted ascending (lexsort tie order)
            i, j = np.triu_indices(len(nb), k=1)
            outs_l.append(nb[i])
            outs_r.append(nb[j])
            outs_c.append(np.full(len(i), a[s], dtype=np.int64))
        if not outs_l:
            return WEDGE.empty_table()
        return pa.table(
            {
                "a": pa.array(np.concatenate(outs_l), pa.int64()),
                "b": pa.array(np.concatenate(outs_r), pa.int64()),
                "center": pa.array(np.concatenate(outs_c), pa.int64()),
            }
        )

    wedges = conformed(
        edges.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda g: wedge_sweep(g.drop_columns(["pk"])),
            batch_format="pyarrow",
        ),
        WEDGE,
    )

    # tagged union: edge rows carry center = -1; a wedge (a, b, center)
    # closes a triangle iff its (a, b) segment also holds an edge row.
    TAGGED = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("center", pa.int64()), ("pk2", pa.int64())]
    )

    def tag_pairs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        center = (
            t.column("center").to_numpy(zero_copy_only=False)
            if "center" in t.column_names
            else np.full(len(a), -1, dtype=np.int64)
        )
        pk2 = (
            mix64(mix64(a.astype(np.uint64)) ^ b.astype(np.uint64))
            % np.uint64(P)
        ).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(a.astype(np.int64), pa.int64()),
                "b": pa.array(b.astype(np.int64), pa.int64()),
                "center": pa.array(center.astype(np.int64), pa.int64()),
                "pk2": pa.array(pk2, pa.int64()),
            }
        )

    tagged = conformed(
        wedges.map_batches(tag_pairs, batch_format="pyarrow"), TAGGED
    ).union(conformed(edges.map_batches(tag_pairs, batch_format="pyarrow"), TAGGED))

    def close_sweep(g: pa.Table) -> pa.Table:
        empty = pa.schema([("node", pa.int64())]).empty_table()
        if g.num_rows == 0:
            return empty
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        c = g.column("center").to_numpy(zero_copy_only=False)
        order = np.lexsort((c, b, a))
        a, b, c = a[order], b[order], c[order]
        seg = np.cumsum(np.r_[0, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        has_edge = np.zeros(seg[-1] + 1, dtype=bool)
        has_edge[seg[c == -1]] = True
        keep = (c != -1) & has_edge[seg]
        if not keep.any():
            return empty
        nodes = np.concatenate([a[keep], b[keep], c[keep]])
        return pa.table({"node": pa.array(nodes, pa.int64())})

    counts = (
        tagged.groupby("pk2")
        .map_groups(
            lambda g: close_sweep(g.drop_columns(["pk2"])),
            batch_format="pyarrow",
        )
        .groupby("node")
        .count()
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "count()" not in t.column_names:
            return TRI_SCHEMA.empty_table()
        return t.rename_columns(["node", "triangles"]).cast(TRI_SCHEMA)

    return conformed(counts.map_batches(finish, batch_format="pyarrow"), TRI_SCHEMA)


# ---------------------------------------------------------------------------
# k-core decomposition (fixed-round synchronous peeling)


def k_core(
    edges: ray.data.Dataset,
    k: int = 3,
    rounds: int = 8,
    max_broadcast_nodes: int = 10_000_000,
) -> ray.data.Dataset:
    """Nodes surviving ``rounds`` synchronous peels of degree < k, with
    their within-core degree: (node, core_deg).

    Synchronous peeling (one round removes ALL current degree<k nodes at
    once) converges to the true k-core; a fixed round count makes the
    result deterministic and SQL-reproducible — the DuckDB oracle unrolls
    the same rounds as chained CTEs (same design as pagerank's oracle).
    Converged rounds are no-ops on both sides, so ``rounds`` only needs
    to exceed the peel depth, not match it exactly.

    ``edges``: canonical (a, b) int64, a < b, distinct.

    Ray shape: per round, ONE degree groupby over the (shrinking) edge
    list; the survivor set — bounded by the node count, not the edge
    count — broadcasts via ray.put into a vectorized membership filter
    (sorted-array searchsorted), and the filtered edge list is
    materialized to keep lineage flat across rounds (same per-iteration
    materialize as pagerank's join plan). For graphs whose SURVIVOR SET
    exceeds ``max_broadcast_nodes``, swap the membership filter for two
    semi-joins on (a) and (b) — the gate raises rather than silently
    degrading."""
    from record_matching_ray.stages.util import conformed

    EDGE = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    OUT = pa.schema([("node", pa.int64()), ("core_deg", pa.int64())])
    cur = conformed(edges.select_columns(["a", "b"]), EDGE).materialize()

    def degrees(es: ray.data.Dataset) -> ray.data.Dataset:
        def both(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            g = pa.TableGroupBy(
                pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64())}),
                "node",
            ).aggregate([([], "count_all")])
            return g.rename_columns(["node", "deg"])

        out = (
            es.map_batches(both, batch_format="pyarrow")
            .groupby("node")
            .sum("deg")
            .rename_columns({"sum(deg)": "deg"})
        )
        return conformed(out, pa.schema([("node", pa.int64()), ("deg", pa.int64())]))

    n_prev = cur.count()
    for _ in range(rounds):
        if n_prev == 0:
            break
        deg = degrees(cur)

        keep_chunks = []
        for t in deg.iter_batches(batch_format="pyarrow", batch_size=65536):
            if t.num_rows == 0 or "node" not in t.column_names:
                continue
            d = t.column("deg").to_numpy(zero_copy_only=False)
            keep_chunks.append(
                t.column("node").to_numpy(zero_copy_only=False)[d >= k]
            )
        survivors = (
            np.sort(np.concatenate(keep_chunks))
            if keep_chunks
            else np.empty(0, np.int64)
        )
        if len(survivors) > max_broadcast_nodes:
            raise ValueError(
                f"k_core broadcast gate: {len(survivors)} survivors > "
                f"{max_broadcast_nodes}; use the semi-join variant"
            )
        surv_ref = ray.put(survivors)

        def filt(t: pa.Table) -> pa.Table:
            s = ray.get(surv_ref) if isinstance(surv_ref, ray.ObjectRef) else surv_ref
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)

            def member(x):
                if len(s) == 0:
                    return np.zeros(len(x), bool)
                i = np.searchsorted(s, x)
                i[i >= len(s)] = len(s) - 1
                return s[i] == x

            return t.filter(pa.array(member(a) & member(b)))

        cur = conformed(
            cur.map_batches(filt, batch_format="pyarrow"), EDGE
        ).materialize()
        n_now = cur.count()
        if n_now == n_prev:
            break
        n_prev = n_now

    deg = degrees(cur)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return OUT.empty_table()
        return t.rename_columns(["node", "core_deg"]).cast(OUT)

    return conformed(deg.map_batches(finish, batch_format="pyarrow"), OUT)


def bfs_hops(
    edges: ray.data.Dataset,
    source: int,
    max_hops: int = 8,
    broadcast_gate: int = 2_000_000,
) -> ray.data.Dataset:
    """Single-source BFS hop distances over an undirected edge list
    (src/dst int64), bounded at ``max_hops`` — reachability rings for
    graph-shaped ER diagnostics ("how far does this identity bleed?").

    Iterative frontier expansion, one pass over the edge Dataset per
    hop: the visited/frontier sets live on the driver and are broadcast
    via ray.put into a stateless map_batches filter (same counted gate
    as pagerank/k_core — BFS ring sizes are bounded by the node set;
    the gate raises before the driver set exceeds ``broadcast_gate``
    ids, where a distributed semi-join frontier would take over).
    Bounded hops make the SQL oracle expressible as a depth-limited
    recursive CTE with UNION dedup (rows bounded by nodes x hops).

    Output: (node, hops) for every node within max_hops of source,
    source included at 0.
    """
    # materialize the edge list once: every hop re-scans it, and leaving
    # it lazy would re-execute the whole upstream pipeline (e.g. an
    # edit-distance join) once per hop
    edges = edges.select_columns(["src", "dst"]).materialize()
    n_edges = edges.count()
    if n_edges <= broadcast_gate:
        # counted local finish (clustering.py's hybrid-CC gate pattern):
        # below the gate the whole edge list is driver-affordable and a
        # local CSR BFS beats max_hops scheduled passes; above it the
        # per-hop distributed scan below takes over
        parts = [
            t
            for t in (ray.get(r) for r in edges.to_arrow_refs())
            if t.num_rows and t.num_columns  # hash shuffles emit
            # zero-column empty blocks (stages/util.py:10 failure family)
        ]
        t = (
            pa.concat_tables(parts)
            if parts
            else pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        )
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        und_s = np.concatenate([s, d])
        und_d = np.concatenate([d, s])
        order = np.argsort(und_s, kind="stable")
        und_s, und_d = und_s[order], und_d[order]
        uniq_nodes = np.unique(und_s)
        row_start = np.searchsorted(und_s, uniq_nodes)
        row_end = np.r_[row_start[1:], len(und_s)]
        dist_l: dict[int, int] = {int(source): 0}
        frontier_l = [int(source)]
        for hop in range(1, max_hops + 1):
            nxt: list[int] = []
            for u in frontier_l:
                j = np.searchsorted(uniq_nodes, u)
                if j >= len(uniq_nodes) or uniq_nodes[j] != u:
                    continue
                for v in und_d[row_start[j]:row_end[j]]:
                    vi = int(v)
                    if vi not in dist_l:
                        dist_l[vi] = hop
                        nxt.append(vi)
            if not nxt:
                break
            frontier_l = nxt
        nodes = np.fromiter(dist_l.keys(), dtype=np.int64)
        hops = np.fromiter((dist_l[int(n)] for n in nodes), dtype=np.int64)
        order = np.argsort(nodes)
        return conformed(
            ray.data.from_arrow(
                pa.table(
                    {"node": pa.array(nodes[order], pa.int64()),
                     "hops": pa.array(hops[order], pa.int64())}
                )
            ),
            pa.schema([("node", pa.int64()), ("hops", pa.int64())]),
        )
    dist: dict[int, int] = {int(source): 0}
    frontier = {int(source)}
    for hop in range(1, max_hops + 1):
        if not frontier:
            break
        if len(dist) > broadcast_gate:
            raise RuntimeError(
                f"bfs_hops broadcast gate: {len(dist)} visited ids > "
                f"{broadcast_gate}; switch to the distributed semi-join "
                "frontier for this graph"
            )
        f_ref = ray.put(np.fromiter(frontier, dtype=np.int64))

        def nbrs(t: pa.Table) -> pa.Table:
            f = ray.get(f_ref) if isinstance(f_ref, ray.ObjectRef) else f_ref
            f = np.sort(f)
            s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
            d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            hits_s = np.searchsorted(f, s)
            hits_s = (hits_s < len(f)) & (f[np.clip(hits_s, 0, len(f) - 1)] == s)
            hits_d = np.searchsorted(f, d)
            hits_d = (hits_d < len(f)) & (f[np.clip(hits_d, 0, len(f) - 1)] == d)
            out = np.unique(np.concatenate([d[hits_s], s[hits_d]]))
            return pa.table({"node": pa.array(out, pa.int64())})

        # per-batch unique then driver set-union — ring sizes are under
        # the same counted gate as the frontier broadcast, and this
        # avoids one all-to-all shuffle per hop
        frontier = set()
        for b in edges.map_batches(nbrs, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            for n in b.column("node").to_numpy(zero_copy_only=False):
                if int(n) not in dist:
                    frontier.add(int(n))
        for n in frontier:
            dist[n] = hop
    nodes = np.fromiter(dist.keys(), dtype=np.int64)
    hops = np.fromiter((dist[int(n)] for n in nodes), dtype=np.int64)
    order = np.argsort(nodes)
    return conformed(
        ray.data.from_arrow(
            pa.table(
                {"node": pa.array(nodes[order], pa.int64()),
                 "hops": pa.array(hops[order], pa.int64())}
            )
        ),
        pa.schema([("node", pa.int64()), ("hops", pa.int64())]),
    )


def adamic_adar(
    edges: ray.data.Dataset,
    broadcast_gate: int = 5_000_000,
) -> ray.data.Dataset:
    """Adamic-Adar link-prediction scores (Adamic & Adar 2003) for every
    NON-adjacent pair sharing at least one neighbor:
    AA(x,y) = sum over common neighbors z of 1/ln(deg(z)).

    Ray shape: undirected adjacency co-locates on a coarse center-node
    partition key; each partition lexsorts by center and emits the
    center's neighbor pairs with weight 1/ln(deg) in one sweep (a center
    needs deg >= 2 to emit, so ln(deg) > 0 always). Per-pair sums go
    through an EXACT packed (l<<32|r) int key — ids are asserted < 2^31,
    the uid contract of the small-id graphs this serves; hub centers are
    the blow-up risk at scale and belong behind the k_core / cap family
    first. Direct edges are removed by a count-gated broadcast of the
    packed edge set.

    Output: (left, right, aa round-6), left < right.
    """
    from record_matching_ray.stages.util import (
        coarse_groupby_partitions,
        round6_sql,
    )

    edges = edges.select_columns(["src", "dst"]).materialize()
    n_parts = coarse_groupby_partitions()

    def und(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) and (s.max() >= 2**31 or d.max() >= 2**31 or s.min() < 0):
            raise ValueError("adamic_adar packed-pair path requires ids in [0, 2^31)")
        z = np.concatenate([s, d])
        nb = np.concatenate([d, s])
        return pa.table(
            {
                "pk": pa.array((z % n_parts).astype(np.int64), pa.int64()),
                "z": pa.array(z, pa.int64()),
                "nb": pa.array(nb, pa.int64()),
            }
        )

    def center_pairs(g: pa.Table) -> pa.Table:
        z = g.column("z").to_numpy(zero_copy_only=False)
        nb = g.column("nb").to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, z))
        z, nb = z[order], nb[order]
        # enforce the undirected-simple-graph contract instead of assuming
        # it (ADVICE r3 item 3): duplicate / bidirectional input rows and
        # self-loops would inflate deg(z), double-count pair weights, and
        # pack left==right pairs. pk = z mod P co-locates every row of a
        # center, so consecutive-dedup here is a global per-center dedup.
        if len(z):
            keep = np.r_[True, (z[1:] != z[:-1]) | (nb[1:] != nb[:-1])]
            keep &= nb != z
            z, nb = z[keep], nb[keep]
        starts = np.flatnonzero(np.r_[True, z[1:] != z[:-1]])
        ends = np.r_[starts[1:], len(z)]
        keys_out, w_out = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            w = 1.0 / np.log(float(m))
            nbrs = nb[s:e]  # sorted ascending within the center
            a, b = np.triu_indices(m, k=1)
            keys_out.append((nbrs[a] << 32) | nbrs[b])
            w_out.append(np.full(len(a), w, np.float64))
        if not keys_out:
            return pa.table(
                {"key": pa.array([], pa.int64()),
                 "w": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "key": pa.array(np.concatenate(keys_out), pa.int64()),
                "w": pa.array(np.concatenate(w_out), pa.float64()),
            }
        )

    from ray.data.aggregate import Sum

    sums = (
        edges.map_batches(und, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(center_pairs, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum(on="w", alias_name="w"))
    )

    n_edges = edges.count()
    if n_edges > broadcast_gate:
        raise RuntimeError(
            f"adamic_adar edge-set broadcast gate: {n_edges} edges > "
            f"{broadcast_gate}; use a distributed anti-join for the "
            "direct-edge removal"
        )
    eparts = [
        t
        for t in (ray.get(r) for r in edges.to_arrow_refs())
        if t.num_rows and t.num_columns
    ]
    et = (
        pa.concat_tables(eparts)
        if eparts
        else pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    )
    es = et.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    ed = et.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    lo = np.minimum(es, ed)
    hi = np.maximum(es, ed)
    edge_keys_ref = ray.put(np.unique((lo << 32) | hi))

    OUT = pa.schema(
        [("left", pa.int64()), ("right", pa.int64()), ("aa", pa.float64())]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return OUT.empty_table()
        name = "w" if "w" in t.column_names else "sum(w)"
        if name not in t.column_names or "key" not in t.column_names:
            return OUT.empty_table()
        keys = t.column("key").to_numpy(zero_copy_only=False)
        w = t.column(name).to_numpy(zero_copy_only=False)
        ek = (
            ray.get(edge_keys_ref)
            if isinstance(edge_keys_ref, ray.ObjectRef)
            else edge_keys_ref
        )
        pos = np.clip(np.searchsorted(ek, keys), 0, max(len(ek) - 1, 0))
        is_edge = (len(ek) > 0) & (ek[pos] == keys)
        keep = ~is_edge
        keys, w = keys[keep], w[keep]
        return pa.table(
            {
                "left": pa.array(keys >> 32, pa.int64()),
                "right": pa.array(keys & 0xFFFFFFFF, pa.int64()),
                "aa": pa.array(round6_sql(w), pa.float64()),
            }
        )

    return conformed(sums.map_batches(finalize, batch_format="pyarrow"), OUT)


def local_clustering_coefficient(
    edges: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-node local clustering coefficient of an undirected simple
    graph (Watts & Strogatz 1998): cc(v) = 2*T(v) / (deg(v)*(deg(v)-1))
    for deg(v) >= 2, where T(v) = triangles through v.

    Composition of the engine's existing distributed pieces: the
    node-iterator triangle sweep (triangle_counts — one pk shuffle +
    tagged-union closing-edge pass) and a degree partial fold, met by
    one small join keyed on node id. Nodes with deg >= 2 and zero
    triangles report cc = 0 (left join + fill), matching the oracle.

    ``edges``: canonical (a, b) int64, a < b, distinct. Output:
    (node, degree, triangles, cc round-6)."""
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import (
        conformed,
        round6_sql,
        shuffle_partitions,
    )

    P = num_partitions or shuffle_partitions()
    tri = triangle_counts(edges, num_partitions=P)

    def deg_partial(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        nodes, counts = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "degree": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    deg = conformed(
        edges.select_columns(["a", "b"])
        .map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum(on="degree", alias_name="degree")),
        pa.schema([("node", pa.int64()), ("degree", pa.int64())]),
    )
    wide = deg.join(
        tri.rename_columns({"node": "tnode"}),
        join_type="left_outer",
        num_partitions=P,
        on=("node",),
        right_on=("tnode",),
    )

    OUT = pa.schema(
        [
            ("node", pa.int64()),
            ("degree", pa.int64()),
            ("triangles", pa.int64()),
            ("cc", pa.float64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        d = t.column("degree").to_numpy(zero_copy_only=False).astype(np.int64)
        tr = t.column("triangles").to_pylist()
        tri_f = np.array([0 if x is None else int(x) for x in tr], np.int64)
        keep = d >= 2
        d, tri_f = d[keep], tri_f[keep]
        nodes = t.column("node").to_numpy(zero_copy_only=False)[keep]
        cc = round6_sql(2.0 * tri_f / (d * (d - 1.0)))
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "degree": pa.array(d, pa.int64()),
                "triangles": pa.array(tri_f, pa.int64()),
                "cc": pa.array(cc, pa.float64()),
            }
        )

    return conformed(wide.map_batches(finalize, batch_format="pyarrow"), OUT)


def component_modularity(
    edges: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Newman modularity of the connected-component partition of an
    undirected simple graph — the standard "how clustered is this
    similarity graph" quality scalar next to triangles / clustering
    coefficient.

    Components have zero cut edges, so the general
    Q = sum_c (e_c/m - (d_c/2m)^2) collapses EXACTLY to
    Q = 1 - sum_c (m_c/m)^2 with m_c the per-component edge count —
    all-integer until one final division, so the SQL oracle (recursive
    component CTE + the identical expression) matches to round-6.

    Shuffle shape: one distributed CC pass, one hash join tagging each
    edge with its LEFT endpoint's component (both endpoints share it by
    definition), a per-batch partial count per component, and a global
    sum of squares — per-component rows never reach the driver; only
    (sum m_c^2, n_components, m) do. Emits one row
    (m_edges, n_components, modularity)."""
    from record_matching_ray.stages.clustering import connected_components
    from record_matching_ray.stages.util import conformed, shuffle_partitions

    if num_partitions is None:
        num_partitions = shuffle_partitions()
    edges = edges.select_columns(["left", "right"]).materialize()
    m = edges.count()
    schema = pa.schema(
        [
            ("m_edges", pa.int64()),
            ("n_components", pa.int64()),
            ("modularity", pa.float64()),
        ]
    )
    if m == 0:
        return ray.data.from_arrow(
            pa.table(
                {"m_edges": pa.array([0], pa.int64()),
                 "n_components": pa.array([0], pa.int64()),
                 "modularity": pa.array([0.0], pa.float64())}
            )
        )
    labels = connected_components(edges).rename_columns(
        {"url": "left", "cluster_id": "comp"}
    )
    tagged = edges.join(
        labels, join_type="inner", num_partitions=num_partitions,
        on=("left",), right_on=("left",),
    )

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["comp"]), ["comp"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["comp", "mc"])

    per_comp = (
        tagged.map_batches(count_partial, batch_format="pyarrow")
        .groupby("comp")
        .sum("mc")
    )

    def sq_partial(t: pa.Table) -> pa.Table:
        mc = t.column("sum(mc)").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sq_exact = int((mc.astype(object) ** 2).sum())  # unbounded ints
        if sq_exact > (1 << 62):
            # sum of m_c^2 <= m^2: crossing 2^62 needs a >1.5e9-edge
            # component — fail loudly rather than silently wrap (the
            # engine's exact-integer convention; widen to a 2-limb
            # representation if such graphs ever matter)
            raise OverflowError(
                "component_modularity: sum(m_c^2) exceeds the int64 "
                "partial-sum budget"
            )
        return pa.table(
            {
                "sq": pa.array([sq_exact], pa.int64()),
                "nc": pa.array([len(mc)], pa.int64()),
            }
        )

    parts = per_comp.map_batches(sq_partial, batch_format="pyarrow")
    sq = parts.sum("sq")
    nc = parts.sum("nc")
    from record_matching_ray.stages.util import round6_sql

    q = round6_sql(np.array([1.0 - sq / (float(m) * float(m))]))[0]
    return conformed(
        ray.data.from_arrow(
            pa.table(
                {
                    "m_edges": pa.array([m], pa.int64()),
                    "n_components": pa.array([int(nc)], pa.int64()),
                    "modularity": pa.array([q], pa.float64()),
                }
            )
        ),
        schema,
    )
