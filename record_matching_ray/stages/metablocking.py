"""Meta-blocking: block purging + common-blocks-scheme (CBS) edge
weighting + weight-edge pruning (WEP) over a token-bigram block
collection (Papadakis, Koutrika, Palpanas, Nejdl, "Meta-Blocking: Taking
Entity Resolution to the Next Level", TKDE 2014).

The reference prunes candidate pairs with a single ANN-distance
threshold (record_matching/main.py:552-577); meta-blocking is the
schema-agnostic alternative for redundancy-positive blocking: a pair
that co-occurs in MANY blocks is likelier to match, so edges of the
block graph are weighted by shared-block count and the weak half is
dropped before any expensive pairwise scoring.

Pipeline shape (every step bounded — 100 TB-safe):

1. key emission — stateless ``map_batches``: each doc emits its distinct
   token bigrams among the first ``prefix`` lowercased tokens (docs
   shorter than ``prefix`` emit nothing), keys carried as 64-bit hashes;
2. block purging — per-batch partial counts then ONE combinable hash
   shuffle over one row per distinct key; keys outside
   [``min_block``, ``max_block``] are dropped BEFORE any group shuffle,
   so a stop-word key never lands 1e11 rows on one task;
3. bounded block groupby — key rows semi-joined (inner hash join) to the
   surviving keys, then ``groupby(key).map_groups`` emits triu pairs;
   every group has <= ``max_block`` rows by construction;
4. CBS weights — pair-keyed count groupby (cbs = number of shared
   blocks);
5. WEP pruning — keep edges whose weight exceeds the global mean,
   compared integer-exactly as ``cbs * n_edges > sum_cbs`` so the oracle
   (which must make the same float-free comparison) cannot drift.

The token stream is consumed twice (counting + join side), like
stages/dupspans.py — both passes read only (id, text).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.functions.hashing import hash_strings
from record_matching_ray.stages.util import (
    compact_nonempty,
    conformed,
    shuffle_partitions,
)

_EDGE_SCHEMA = pa.schema(
    [("left", pa.int64()), ("right", pa.int64()), ("cbs", pa.int64())]
)


def _empty_edges() -> ray.data.Dataset:
    return ray.data.from_arrow(_EDGE_SCHEMA.empty_table())


def metablocking_pairs(
    docs: ray.data.Dataset,
    prefix: int = 5,
    min_block: int = 2,
    max_block: int = 8,
    prune: str = "wep",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(left, right, cbs) edges of the pruned block graph, left < right.

    prune: "wep" keeps edges with cbs strictly above the global mean
    weight; "none" returns all weighted edges.
    """

    def key_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_keys: list[str] = []
        out_ids: list[int] = []
        for i, s in zip(ids, texts):
            toks = (s or "").lower().split()
            if len(toks) < prefix:
                continue
            bigrams = [
                toks[j] + " " + toks[j + 1] for j in range(prefix - 1)
            ]
            for k in dict.fromkeys(bigrams):
                out_keys.append(k)
                out_ids.append(i)
        kh = (
            hash_strings(out_keys).view(np.int64)
            if out_keys
            else np.array([], np.int64)
        )
        return pa.table(
            {
                "key": pa.array(kh, pa.int64()),
                "doc_id": pa.array(out_ids, pa.int64()),
            }
        )

    keys = docs.map_batches(key_rows, batch_format="pyarrow")

    # -- block purging: combinable count shuffle over one row per key
    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "key").aggregate([("doc_id", "count")])
        return g.rename_columns(["key", "cnt"])

    counts = (
        keys.map_batches(count_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(ray.data.aggregate.Sum(on="cnt", alias_name="cnt"))
    )
    survivors = conformed(
        counts, pa.schema([("key", pa.int64()), ("cnt", pa.int64())])
    ).map_batches(
        lambda t: t.filter(
            pa.compute.and_(
                pa.compute.greater_equal(t.column("cnt"), min_block),
                pa.compute.less_equal(t.column("cnt"), max_block),
            )
        ).select(["key"]),
        batch_format="pyarrow",
    )
    # one row per surviving key — bounded; compact so no join block is
    # empty and the fan-out tracks the data (see dedup.ngram_jaccard_pairs)
    survivors, n_surv = compact_nonempty(survivors, shuffle_partitions())
    if n_surv == 0:
        return _empty_edges()
    num_partitions = max(1, min(shuffle_partitions(), -(-n_surv // 512)))

    keyed = keys.join(
        survivors,
        join_type="inner",
        num_partitions=num_partitions,
        on=("key",),
    )

    def emit_pairs(g: pa.Table) -> pa.Table:
        ids = np.unique(g.column("doc_id").to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table(
                {"left": pa.array([], pa.int64()), "right": pa.array([], pa.int64())}
            )
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "left": pa.array(ids[a], pa.int64()),
                "right": pa.array(ids[b], pa.int64()),
            }
        )

    pairs = keyed.groupby("key").map_groups(emit_pairs, batch_format="pyarrow")
    edges = (
        pairs.groupby(["left", "right"])
        .aggregate(ray.data.aggregate.Count(alias_name="cbs"))
    )
    edges = conformed(edges.select_columns(["left", "right", "cbs"]), _EDGE_SCHEMA)
    if prune == "none":
        return edges

    # -- WEP: materialize the bounded edge relation once, take exact
    # integer totals, keep cbs * n_edges > sum_cbs (== cbs > mean without
    # a float divide; overflows only past ~1e17 edges per int64)
    m = edges.materialize()
    n_edges = m.count()
    if n_edges == 0:
        return _empty_edges()
    sum_cbs = m.aggregate(ray.data.aggregate.Sum(on="cbs", alias_name="s"))["s"]

    def wep(t: pa.Table) -> pa.Table:
        c = t.column("cbs").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(c * n_edges > sum_cbs))

    return m.map_batches(wep, batch_format="pyarrow")
