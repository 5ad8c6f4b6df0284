"""S4 — transitive clustering: connected components over an edge Dataset.

Replaces the reference's driver-resident scipy DisjointSet over a streamed
prediction table (record_matching/main.py:629-651) and networkx
connected_components (claude_poc_v2/...v2.py:1929-1960) with distributed
min-label propagation (Hash-to-Min flavored):

    labels[u] = u  initially
    each round:
      aug edges = graph edges ∪ label links (u, label[u])   # safe shortcut:
                  # label[u] is always in u's component, so augmenting keeps
                  # components identical while halving path lengths
      every node's current label is offered to all its aug-neighbors via ONE
      tagged union + groupby(key) pass (no Dataset.join):
        rows (key=node, kind=0, payload=label)          carry the label
        rows (key=b,    kind=1, payload=a) per directed  carry the receivers
      per group: emit (node=receiver, label=group label) for all receivers
      new labels = groupby(node).min(label)              # second shuffle
    until the (node,label) relation's order-independent checksum is stable.

Labels only ever decrease (lexicographic min url), so the fixpoint is
deterministic and cluster_id = min url of its component — the
deterministic-id rule the tests and resume-identity checks rely on
(SURVEY.md §7.5). Two hash shuffles per round, keys = node; O(log n)
rounds in practice thanks to the label-link shortcuts.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from record_matching_ray.functions.hashing import _U64, hash_strings, mix64
from record_matching_ray.functions.union_find import UnionFind


def _col_hash(col: pa.ChunkedArray | pa.Array) -> "np.ndarray":
    """64-bit hash of a key column — string or integer (uid) keys."""
    import numpy as np

    if pa.types.is_string(col.type):
        return hash_strings(col.to_pylist())
    return mix64(col.to_numpy(zero_copy_only=False).astype(_U64))


def _label_checksum(labels: ray.data.Dataset) -> int:
    """Order-independent uint64 checksum of the (node, label) relation —
    fixpoint detection without joining against the previous round."""

    def partial(t: pa.Table) -> pa.Table:
        h = mix64(_col_hash(t.column("node")) ^ mix64(_col_hash(t.column("label"))))
        return pa.table({"partial": pa.array([int(h.sum(dtype=_U64))], pa.uint64())})

    total = 0
    for row in labels.map_batches(partial, batch_format="pyarrow").take_all():
        total = (total + int(row["partial"])) & 0xFFFFFFFFFFFFFFFF
    return total


def _min_label_per_node(
    candidates: ray.data.Dataset, key_type: pa.DataType
) -> ray.data.Dataset:
    """groupby(node).min(label), with a per-batch partial combine first so
    the shuffle moves one row per (node, batch), not one per candidate."""

    def partial_min(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["node", "label"]), "node").aggregate(
            [("label", "min")]
        )
        return g.rename_columns(["node", "label"])

    partials = candidates.map_batches(partial_min, batch_format="pyarrow")
    out = partials.groupby("node").min("label")
    out = out.rename_columns({"min(label)": "label"})
    # groupby emits zero-column empty blocks for empty hash partitions;
    # conform them so the next round's join doesn't choke (util.conformed)
    from record_matching_ray.stages.util import conformed

    return conformed(
        out, pa.schema([("node", key_type), ("label", key_type)])
    )


def _propagate_round(
    labels: ray.data.Dataset,
    directed_edges: ray.data.Dataset,
    num_partitions: int,
    key_type: pa.DataType,
) -> ray.data.Dataset:
    """One round: every node's label flows to its aug-neighborhood.

    aug edges = graph edges ∪ label links (u <-> label[u], both directions);
    one hash-shuffle join (Acero kernel per partition) attaches label[src],
    then groupby(node).min(label) folds the offers in.
    """

    def label_links(t: pa.Table) -> pa.Table:
        node = t.column("node").combine_chunks()
        label = t.column("label").combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([node, label]),
                "dst": pa.concat_arrays([label, node]),
            }
        )

    aug = directed_edges.union(
        labels.map_batches(label_links, batch_format="pyarrow")
    )
    msgs = aug.join(
        labels,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("node",),
    ).map_batches(
        lambda t: pa.table({"node": t.column("dst"), "label": t.column("label")}),
        batch_format="pyarrow",
    )
    return _min_label_per_node(msgs.union(labels), key_type)


def _contract_batch(t: pa.Table) -> pa.Table:
    """Connectivity contraction within one edge block: replace the block's
    edges by star edges (node -> block-local component min). A per-entity
    clique of k nodes collapses from k(k-1)/2 edges to k-1 — the big
    shrink before any shuffle (partial-combine idea applied to
    connectivity).

    Fully vectorized: dense-relabel via np.unique (ascending, so the min
    dense index IS the min key), then min-label rounds with pointer
    jumping — O((E+N) log N) numpy ops, no Python per-edge loop (the dict
    union-find it replaces spent ~1us/edge; at 18M edges that was the
    hidden serial half of the clustering stage)."""
    import numpy as np

    key_type = t.schema.field("left").type
    src_col = t.column("left")
    if len(src_col) == 0:
        return pa.table(
            {"left": pa.array([], key_type), "right": pa.array([], key_type)}
        )
    if pa.types.is_string(key_type):
        src = np.asarray(src_col.to_pylist(), dtype=object)
        dst = np.asarray(t.column("right").to_pylist(), dtype=object)
    else:
        src = src_col.to_numpy(zero_copy_only=False)
        dst = t.column("right").to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s, d = inv[: len(src)], inv[len(src) :]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        nxt = lab.copy()
        np.minimum.at(nxt, s, lab[d])
        np.minimum.at(nxt, d, lab[s])
        nxt = nxt[nxt]  # pointer jumping halves chain lengths
        nxt = nxt[nxt]
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    mask = lab != np.arange(len(nodes), dtype=np.int64)
    return pa.table(
        {
            "left": pa.array(nodes[lab[mask]], key_type),
            "right": pa.array(nodes[mask], key_type),
        }
    )


def contract_edges(edges: ray.data.Dataset, rounds: int = 3) -> ray.data.Dataset:
    """Shrink an edge set while preserving connectivity: per-block
    contraction, then alternate co-location orientation and contract
    again. Output approaches one star edge per non-singleton node;
    correctness does NOT depend on convergence — the hybrid finish
    (driver union-find or label propagation) absorbs whatever remains.

    Co-location between rounds is a HASH partition on the orientation
    column (pk = mix64(key) mod P -> groupby(pk)), not a global sort:
    grouping only needs equal keys in one partition, and the hash shuffle
    skips the range-sampling pass and total-order merge a sort pays.

    The orientation alternation matters: round 1 emits star edges
    (rep -> node); a node shared by two stars appears on the RIGHT side
    under different reps, so co-locating by `right` is what lets the next
    per-block contraction merge those stars. Co-locating by `left` twice
    (the original bug) left ~4.5M of 17.8M edges uncontracted and pushed
    the clustering onto the slow loop."""
    import numpy as np

    from record_matching_ray.stages.util import coarse_groupby_partitions

    n_parts = coarse_groupby_partitions()
    out = edges.select_columns(["left", "right"])
    for r in range(rounds):
        if r > 0:
            col = "right" if r % 2 == 1 else "left"

            def add_pk(t: pa.Table, _col=col) -> pa.Table:
                h = _col_hash(t.column(_col).combine_chunks())
                return t.append_column(
                    "pk",
                    pa.array((h % _U64(n_parts)).astype(np.int64), pa.int64()),
                )

            out = (
                out.map_batches(add_pk, batch_format="pyarrow")
                .groupby("pk")
                .map_groups(
                    lambda g: _contract_batch(g.select(["left", "right"])),
                    batch_format="pyarrow",
                )
            )
        else:
            out = out.map_batches(_contract_batch, batch_format="pyarrow")
    return out


def connected_components(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset | None = None,
    max_iters: int = 50,
    pre_contract: bool = True,
    driver_max_edges: int | None = 2_000_000,
) -> ray.data.Dataset:
    """edges (left, right) [+ optional nodes (url)] -> (url, cluster_id).

    cluster_id = lexicographic min url of the component. Isolated nodes
    (in `nodes` but no edge) form singleton clusters.

    Hybrid finish: distributed per-block contraction always runs first
    (cliques collapse to stars before any shuffle); if the CONTRACTED
    edge set is provably small (counted, <= driver_max_edges) the final
    union-find runs on the driver — same min-url labels, none of the
    per-round shuffle latency — and node labeling stays distributed via a
    broadcast component map. Beyond the threshold (true web scale: the
    contracted set is ~1 edge per non-singleton page) the label-
    propagation loop below takes over. Both paths are oracle-tested to
    produce identical clusters. Reference semantics: driver DisjointSet
    over ALL edges (record_matching/main.py:629-651) — here the driver
    only ever sees the contracted remainder.
    """
    sch = edges.schema()
    if sch is None or "left" not in sch.names:
        # empty edge set (no blocks carry a schema) — every node is a
        # singleton; key type comes from the node relation
        key_type = (
            nodes.schema().base_schema.field("url").type
            if nodes is not None
            else pa.int64()
        )
    else:
        key_type = sch.types[sch.names.index("left")]

    if pre_contract:
        edges = contract_edges(edges).materialize()
        if driver_max_edges is not None and edges.count() <= driver_max_edges:
            return _finish_on_driver(edges, nodes, key_type)

    def directed(t: pa.Table) -> pa.Table:
        l = t.column("left").combine_chunks()
        r = t.column("right").combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([l, r]),
                "dst": pa.concat_arrays([r, l]),
            }
        )

    from record_matching_ray.stages.util import shuffle_partitions

    # Partition count: the session's CPU count, NOT the input block count.
    # Post-contraction label/edge relations are ~1 row per node; a shuffle
    # with num_blocks partitions (e.g. 71 from a big scored stage) makes
    # every round pay aggregator-startup contention that dwarfs the work.
    num_partitions = shuffle_partitions()

    directed_edges = (
        edges.select_columns(["left", "right"])
        .map_batches(directed, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )

    def init_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("src"), "label": t.column("src")})

    seeds = directed_edges.map_batches(init_rows, batch_format="pyarrow")
    if nodes is not None:
        seeds = seeds.union(
            nodes.select_columns(["url"]).map_batches(
                lambda t: pa.table(
                    {"node": t.column("url"), "label": t.column("url")}
                ),
                batch_format="pyarrow",
            )
        )
    # repartition before materialize: merges away the zero-column empty
    # blocks hash-shuffle groupbys emit for empty partitions, which would
    # otherwise poison the next round's Acero join (first-block schema)
    labels = (
        _min_label_per_node(seeds, key_type).repartition(num_partitions).materialize()
    )
    checksum = _label_checksum(labels)

    for _ in range(max_iters):
        new_labels = (
            _propagate_round(labels, directed_edges, num_partitions, key_type)
            .repartition(num_partitions)
            .materialize()
        )
        new_checksum = _label_checksum(new_labels)
        labels = new_labels
        if new_checksum == checksum:
            break
        checksum = new_checksum

    return labels.rename_columns({"node": "url", "label": "cluster_id"})


def _finish_on_driver(
    contracted: ray.data.Dataset,
    nodes: ray.data.Dataset | None,
    key_type: pa.DataType,
) -> ray.data.Dataset:
    """Union-find over the (small, counted) contracted edge set; labels
    broadcast back and applied to the node Dataset distributed."""
    import ray as _ray

    rows = contracted.take_all()
    comp = connected_components_driver([(r["left"], r["right"]) for r in rows])
    comp_ref = _ray.put(comp)

    if nodes is None:
        items = sorted(comp.items())
        return ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([k for k, _ in items], key_type),
                    "cluster_id": pa.array([v for _, v in items], key_type),
                }
            )
        )

    def label_batch(t: pa.Table) -> pa.Table:
        m = _ray.get(comp_ref) if isinstance(comp_ref, _ray.ObjectRef) else comp_ref
        urls = t.column("url").to_pylist()
        return pa.table(
            {
                "url": pa.array(urls, key_type),
                "cluster_id": pa.array([m.get(u, u) for u in urls], key_type),
            }
        )

    return nodes.select_columns(["url"]).map_batches(
        label_batch, batch_format="pyarrow"
    )


def connected_components_driver(
    edge_pairs: list[tuple[str, str]], nodes: list[str] | None = None
) -> dict[str, str]:
    """Driver union-find oracle (reference semantics, main.py:629-651)."""
    uf = UnionFind()
    for a, b in edge_pairs:
        uf.union(a, b)
    for n in nodes or []:
        uf.add(n)
    return uf.components()
