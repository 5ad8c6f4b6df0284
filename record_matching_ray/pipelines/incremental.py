"""Incremental entity resolution — two contracts over a completed run:

- ``incremental_assign``: assign a NEW batch to IMMUTABLE base clusters
  (this module's top half; the standard nightly-increment contract);
- ``run_er_incremental``: EXACT fold — recompute the full clustering
  with only new-touching pairs scored; may merge base clusters when a
  new page bridges them (bottom of this module).

The reference pipeline is batch-only (run everything, rebuild all
clusters — main.py's single pass); at web scale the corpus is ~static
and new crawl arrives daily, so incremental work must cost O(new batch),
not O(corpus). Assign-only semantics:

- existing clusters are IMMUTABLE — new evidence never merges or splits
  base clusters (that is a periodic full re-run's job);
- a new page joins the base cluster it matches (score >= tau through the
  same blocking + fused scorer as run_er);
- new pages matching each other (and no base page) form new clusters,
  labeled min-url exactly like the batch pipeline;
- a new page matching TWO base clusters bridges them: it gets one
  deterministic pick (the component's min contracted label) and the
  ambiguity stays observable in the returned edge set.

Dataflow (everything bounded by the new batch except one optional
shuffle over the base cluster table):

1. features(new)  — same ExtractFeatures actor pool as run_er.
2. blocking over base ∪ new features (block keys must see both sides),
   then pairs filtered to those touching a new uid — the new-uid set is
   a broadcast (the new batch is bounded by design: it's an increment).
   Base-base pairs are dropped BEFORE scoring, so scoring is O(new).
3. fused scoring -> edges, exactly run_er's scorer.
4. contract base endpoints to their cluster: pseudo-uid = NEGATIVE
   stable hash of the base cluster_id (page uids are non-negative by
   construction, so the spaces cannot collide). Base cluster lookup is
   count-gated: broadcast dict when the cluster table is small, else a
   tagged-union shuffle on uid (never an Acero join — edge sets can be
   empty, see stages/util.py on empty-block join poisoning).
5. connected_components over the contracted edges + all new uids as
   nodes (isolated new pages become singletons). A component whose label
   is negative contains a base cluster -> adopt that cluster_id; a
   non-negative label is the min new uid -> cluster_id = its url.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from record_matching_ray.config import PipelineConfig
from record_matching_ray.functions.hashing import blake8, mix64, _U64
from record_matching_ray.pipelines.er import build_features
from record_matching_ray.stages import blocking, scoring
from record_matching_ray.stages.clustering import connected_components
from record_matching_ray.stages.util import conformed, shuffle_partitions


def _pseudo_uid(cluster_ids: list[str]) -> np.ndarray:
    """Negative stable uid per base cluster_id — disjoint from page_uids
    (which clear the top bit, i.e. are non-negative)."""
    h = np.fromiter(
        (blake8(c) for c in cluster_ids), dtype=np.uint64, count=len(cluster_ids)
    )
    return (-((mix64(h) >> _U64(1)).astype(np.int64)) - 1).astype(np.int64)


def _attach_base_clusters(
    edges: ray.data.Dataset,
    base_clusters: ray.data.Dataset,
    broadcast_max_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """edges (left, right) in uid space -> contracted edges where any
    BASE endpoint is replaced by its cluster's negative pseudo-uid.

    Broadcast plan under the counted gate; tagged-union shuffle plan
    (one groupby on uid, no join) beyond it."""
    n_base = base_clusters.count()
    if n_base <= broadcast_max_rows:
        mapping: dict[int, int] = {}
        for t in base_clusters.iter_batches(batch_format="pyarrow", batch_size=None):
            urls = t.column("url").to_pylist()
            cids = t.column("cluster_id").to_pylist()
            uids = blocking.page_uids(urls)
            ps = _pseudo_uid(cids)
            for u, p in zip(uids, ps):
                mapping[int(u)] = int(p)
        map_ref = ray.put(mapping)

        def contract(t: pa.Table) -> pa.Table:
            m = ray.get(map_ref) if isinstance(map_ref, ray.ObjectRef) else map_ref
            out = {}
            for c in ("left", "right"):
                u = t.column(c).to_numpy(zero_copy_only=False)
                out[c] = pa.array(
                    [m.get(int(x), int(x)) for x in u], pa.int64()
                )
            return pa.table(out)

        return edges.select_columns(["left", "right"]).map_batches(
            contract, batch_format="pyarrow"
        )

    # 100TB plan: tagged union keyed by uid, swept per COARSE pk partition
    # (one vectorized pass per partition, never a group per uid). Rows:
    # (uid, pseudo, -1, -1) from the base cluster table; (uid, 0, edge_id,
    # side) from both edge endpoints. edge_id is a content hash of the
    # pair (deterministic across runs; collisions ~|edges|^2/2^63).
    P = shuffle_partitions()

    def base_rows(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        uids = blocking.page_uids(urls)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(uids.astype(_U64)) % _U64(P)).astype(np.int64),
                    pa.int64(),
                ),
                "uid": pa.array(uids, pa.int64()),
                "pseudo": pa.array(
                    _pseudo_uid(t.column("cluster_id").to_pylist()), pa.int64()
                ),
                "edge_id": pa.array(np.full(len(urls), -1), pa.int64()),
                "side": pa.array(np.full(len(urls), -1, np.int8), pa.int8()),
            }
        )

    def edge_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        l = t.column("left").to_numpy(zero_copy_only=False).astype(np.int64)
        r = t.column("right").to_numpy(zero_copy_only=False).astype(np.int64)
        eid = (
            mix64(l.astype(_U64) * _U64(0x9E3779B97F4A7C15) ^ r.astype(_U64))
            >> _U64(1)
        ).astype(np.int64)
        uid = np.concatenate([l, r])
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(uid.astype(_U64)) % _U64(P)).astype(np.int64),
                    pa.int64(),
                ),
                "uid": pa.array(uid, pa.int64()),
                "pseudo": pa.array(np.zeros(2 * n, np.int64), pa.int64()),
                "edge_id": pa.array(np.concatenate([eid, eid]), pa.int64()),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(n, np.int8), np.ones(n, np.int8)]
                    ),
                    pa.int8(),
                ),
            }
        )

    schema = pa.schema(
        [
            ("pk", pa.int64()),
            ("uid", pa.int64()),
            ("pseudo", pa.int64()),
            ("edge_id", pa.int64()),
            ("side", pa.int8()),
        ]
    )
    tagged = conformed(
        base_clusters.map_batches(base_rows, batch_format="pyarrow"), schema
    ).union(
        conformed(
            edges.select_columns(["left", "right"]).map_batches(
                edge_rows, batch_format="pyarrow"
            ),
            schema,
        )
    )

    def rewrite(g: pa.Table) -> pa.Table:
        uid = g.column("uid").to_numpy(zero_copy_only=False)
        pseudo = g.column("pseudo").to_numpy(zero_copy_only=False)
        eid = g.column("edge_id").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, uid))  # base rows (eid=-1) first per uid
        uid_s, ps_s, eid_s, side_s = (
            uid[order], pseudo[order], eid[order], side[order]
        )
        new_seg = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        starts = np.nonzero(new_seg)[0]
        # base row, if present, sorts first in its uid segment (eid=-1)
        seg_pseudo = np.where(
            eid_s[starts] < 0, ps_s[starts], uid_s[starts]
        )
        euid = seg_pseudo[seg_id]
        is_edge = eid_s >= 0
        return pa.table(
            {
                "pk2": pa.array(
                    (mix64(eid_s[is_edge].astype(_U64)) % _U64(P)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "edge_id": pa.array(eid_s[is_edge], pa.int64()),
                "side": pa.array(side_s[is_edge], pa.int8()),
                "euid": pa.array(euid[is_edge], pa.int64()),
            }
        )

    rewritten = tagged.groupby("pk").map_groups(
        lambda g: rewrite(g.drop_columns(["pk"])), batch_format="pyarrow"
    )

    def reassemble(g: pa.Table) -> pa.Table:
        eid = g.column("edge_id").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        euid = g.column("euid").to_numpy(zero_copy_only=False)
        le = np.lexsort((eid[side == 0],))
        re = np.lexsort((eid[side == 1],))
        lefts, l_eid = euid[side == 0][le], eid[side == 0][le]
        rights, r_eid = euid[side == 1][re], eid[side == 1][re]
        # eids match 1:1 by construction; guard anyway
        n = min(len(lefts), len(rights))
        ok = l_eid[:n] == r_eid[:n]
        return pa.table(
            {
                "left": pa.array(lefts[:n][ok], pa.int64()),
                "right": pa.array(rights[:n][ok], pa.int64()),
            }
        )

    return rewritten.groupby("pk2").map_groups(
        lambda g: reassemble(g.drop_columns(["pk2"])), batch_format="pyarrow"
    )


def incremental_assign(
    new_pages: ray.data.Dataset,
    base_features: ray.data.Dataset,
    base_clusters: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    weights: tuple[float, np.ndarray] | None = None,
    broadcast_max_rows: int = 2_000_000,
    fused_max_rows: int = 4_000_000,
) -> dict:
    """Assign new pages to existing clusters (see module docstring).

    Returns {"assignments": Dataset(url, cluster_id, from_base),
    "features": the new batch's feature table, "edges": the scored edge
    set (uid space, new-touching only)}. ``base_features`` must carry the
    same feature schema run_er's build_features emits; pass the
    checkpointed features stage of the base run."""
    cfg = cfg or PipelineConfig()

    feats_new = build_features(new_pages, cfg).materialize()

    # new-uid broadcast set (the increment is bounded by design)
    new_urls: list[str] = []
    for t in feats_new.select_columns(["url"]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        new_urls.extend(t.column("url").to_pylist())
    new_uid_ref = ray.put(np.sort(blocking.page_uids(new_urls).astype(np.int64)))
    uid_to_url_ref = ray.put(
        {int(u): s for u, s in zip(blocking.page_uids(new_urls), new_urls)}
    )

    all_feats = base_features.union(feats_new).materialize()
    hot = blocking.compute_hot_hosts(all_feats, cfg)
    pairs = blocking.generate_candidate_pairs(all_feats, cfg, hot)

    def touching_new(t: pa.Table) -> pa.Table:
        s = ray.get(new_uid_ref) if isinstance(new_uid_ref, ray.ObjectRef) else new_uid_ref
        l = t.column("left").to_numpy(zero_copy_only=False).astype(np.int64)
        r = t.column("right").to_numpy(zero_copy_only=False).astype(np.int64)
        # sorted-array membership: vectorized searchsorted, no Python loop
        li = np.searchsorted(s, l)
        ri = np.searchsorted(s, r)
        in_l = (li < len(s)) & (s[np.minimum(li, len(s) - 1)] == l)
        in_r = (ri < len(s)) & (s[np.minimum(ri, len(s) - 1)] == r)
        return t.filter(pa.array(in_l | in_r))

    pairs_new = pairs.map_batches(touching_new, batch_format="pyarrow")
    # same scoring-plan gate as run_er: fused broadcast scorer while the
    # payload is counted-small, double-hash-join plan beyond
    if all_feats.count() <= fused_max_rows:
        edges_ds = scoring.score_pairs_fused(pairs_new, all_feats, cfg, weights)
    else:
        wide = blocking.attach_pair_payload(
            pairs_new, all_feats, cfg, shuffle_partitions(),
            broadcast_max_rows=0, restore_urls=False,
        )
        edges_ds = scoring.edges_from_scores(
            scoring.score_pairs(wide, cfg, weights), cfg
        )
    edges = conformed(
        edges_ds, pa.schema([("left", pa.int64()), ("right", pa.int64())])
    ).materialize()

    contracted = _attach_base_clusters(edges, base_clusters, broadcast_max_rows)

    def new_nodes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pa.array(
                    blocking.page_uids(t.column("url").to_pylist()), pa.int64()
                )
            }
        )

    comps = connected_components(
        contracted,
        nodes=feats_new.select_columns(["url"]).map_batches(
            new_nodes, batch_format="pyarrow"
        ),
        max_iters=cfg.max_cc_iters,
    )

    # pseudo-uid -> base cluster_id (relation bounded by #base clusters
    # under the same broadcast gate; beyond it this dict is still only the
    # DISTINCT cluster ids, ~n_base/avg_cluster_size)
    pseudo_map: dict[int, str] = {}
    for t in base_clusters.select_columns(["cluster_id"]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        cids = t.column("cluster_id").to_pylist()
        for p, c in zip(_pseudo_uid(cids), cids):
            pseudo_map[int(p)] = c
    pseudo_ref = ray.put(pseudo_map)

    def label(t: pa.Table) -> pa.Table:
        pm = ray.get(pseudo_ref) if isinstance(pseudo_ref, ray.ObjectRef) else pseudo_ref
        um = (
            ray.get(uid_to_url_ref)
            if isinstance(uid_to_url_ref, ray.ObjectRef)
            else uid_to_url_ref
        )
        uids = t.column("url").to_numpy(zero_copy_only=False)
        labels = t.column("cluster_id").to_numpy(zero_copy_only=False)
        keep = [int(u) in um for u in uids]  # only new pages get rows
        urls, cids, from_base = [], [], []
        for u, lab, k in zip(uids, labels, keep):
            if not k:
                continue
            urls.append(um[int(u)])
            if int(lab) < 0:
                cids.append(pm[int(lab)])
                from_base.append(True)
            else:
                cids.append(um[int(lab)])
                from_base.append(False)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "cluster_id": pa.array(cids, pa.string()),
                "from_base": pa.array(from_base, pa.bool_()),
            }
        )

    assignments = conformed(
        comps.map_batches(label, batch_format="pyarrow"),
        pa.schema(
            [
                ("url", pa.string()),
                ("cluster_id", pa.string()),
                ("from_base", pa.bool_()),
            ]
        ),
    )
    return {"assignments": assignments, "features": feats_new, "edges": edges}

# ---------------------------------------------------------------------------
# EXACT fold mode (vs the assign-only contract above): fold the new batch
# into a run_er checkpoint reproducing the FULL-batch clustering exactly.
# Unlike incremental_assign, the fold MAY merge previously separate base
# clusters when a new page bridges them (min-label components are
# order-independent, so incremental == batch — tests/test_incremental.py).
# Expensive work is proportional to the increment: block keys over old
# come from the 3-column features checkpoint (stateless map), pair
# emission is restricted to new-touching pairs, and within-old edges are
# reused verbatim from the checkpoint.


from record_matching_ray.pipelines.er import _restore_cluster_urls
from record_matching_ray.state import manifest as mf


def _fold_registry(out_dir: str) -> list[dict]:
    """folds.json: the append-only log of fold checkpoints chained onto a
    base run_er checkpoint. Each entry: {"n", "key", "features", "edges",
    "fingerprint"} with stage dirs relative to out_dir; folds written by
    the touched-component path (round 4+) additionally carry an O(increment)
    cluster DELTA — {"assign": "assign_f<n>", "relabel": {old_cluster_id:
    new_cluster_id}} — so the next fold's component pass never re-closes
    the whole corpus edge list."""
    import json
    import os

    path = os.path.join(out_dir, "folds.json")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)


def _append_fold_registry(out_dir: str, entry: dict) -> None:
    import json
    import os
    import uuid

    folds = _fold_registry(out_dir)
    folds.append(entry)
    path = os.path.join(out_dir, "folds.json")
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(folds, f, indent=1)
    os.replace(tmp, path)


def _compose_relabel(first: dict[str, str], then: dict[str, str]) -> dict[str, str]:
    """Composition (apply `first`, then `then`) of two sparse relabel maps
    (identity outside their keys). Both maps are O(touched components)."""
    out = {k: then.get(v, v) for k, v in first.items()}
    for k, v in then.items():
        if k not in out:
            out[k] = v
    return {k: v for k, v in out.items() if k != v}


def _apply_relabel(ds: ray.data.Dataset, relabel: dict[str, str]) -> ray.data.Dataset:
    """Stream (url, cluster_id) through a small broadcast relabel map —
    one zero-shuffle map pass; rows outside the map pass through."""
    if not relabel:
        return ds
    import pyarrow.compute as pc

    keys = list(relabel.keys())
    vals = [relabel[k] for k in keys]
    ref = ray.put((keys, vals))

    def fn(t: pa.Table) -> pa.Table:
        k, v = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        t = t.combine_chunks()
        cid = t.column("cluster_id")
        idx = pc.index_in(cid, value_set=pa.array(k, pa.string()))
        cand = pc.take(pa.array(v, pa.string()), pc.fill_null(idx, 0))
        return pa.table(
            {
                "url": t.column("url"),
                "cluster_id": pc.if_else(pc.is_valid(idx), cand, cid),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _cluster_state(old_out_dir: str, folds: list[dict]) -> ray.data.Dataset:
    """Current full-corpus (url, cluster_id) after the base run and every
    registered fold delta: base clusters relabeled by R1..RN, union each
    fold's assign table relabeled by the SUFFIX of later folds' maps.
    Lazy — one pruned parquet read per stage, zero shuffles."""
    import os

    # suffix[i] = R_{i+1} ∘ ... ∘ R_N (what must still be applied to rows
    # materialized at fold i); comp accumulates from the last fold back.
    comp: dict[str, str] = {}
    suffix: list[dict[str, str]] = [{} for _ in folds]
    for i in reversed(range(len(folds))):
        suffix[i] = dict(comp)
        comp = _compose_relabel(folds[i].get("relabel", {}), comp)
    ds = _apply_relabel(
        mf.read_stage(
            os.path.join(old_out_dir, "clusters"), columns=["url", "cluster_id"]
        ),
        comp,
    )
    for i, fe in enumerate(folds):
        ds = ds.union(
            _apply_relabel(
                mf.read_stage(
                    os.path.join(old_out_dir, fe["assign"]),
                    columns=["url", "cluster_id"],
                ),
                suffix[i],
            )
        )
    return ds


def _sorted_lookup(
    sorted_keys: np.ndarray, query: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(positions, hit_mask) of `query` in `sorted_keys` — vectorized
    searchsorted membership with explicit bounds + equality checks (no
    silent neighbor resolution)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(query), np.int64), np.zeros(len(query), bool)
    pos = np.searchsorted(sorted_keys, query)
    safe = np.minimum(pos, len(sorted_keys) - 1)
    return safe, (pos < len(sorted_keys)) & (sorted_keys[safe] == query)


def _fold_touched_components(
    edges_new: ray.data.Dataset,
    new_features: ray.data.Dataset,
    state: ray.data.Dataset,
    uid_remap: dict | None,
    max_cc_iters: int,
) -> tuple[ray.data.Dataset, dict[str, str], pa.Table]:
    """Touched-component fold clustering — O(increment), never O(corpus
    edges). Components of the old graph whose members touch no new edge
    endpoint cannot change under min-label connected components (labels
    are monotone mins over a superset graph), so:

    1. contract every old endpoint of `edges_new` to its old component's
       label uid (the cluster_id url's uid — min uid of the component,
       by _restore_cluster_urls construction), via one pruned zero-shuffle
       scan of the O(corpus) cluster STATE filtered by a broadcast sorted
       endpoint array (bounded by the increment's blocking fan-out);
    2. run connected_components over ONLY the contracted new edges, with
       nodes = new uids ∪ touched label uids (singleton new pages included);
    3. since each contracted label IS the min uid of its old component,
       the small CC's min label equals the full union CC's min label —
       exact equivalence with the replaced full-edge-list pass
       (tests/test_incremental.py pins partition equality vs batch run);
    4. emit (full clusters Dataset = state relabeled by the O(touched)
       string map ∪ new assignments, the relabel map, the assignment
       table) — the two latter are the fold's O(increment) delta.

    Replaces the per-fold full-recompute shape of the reference
    (record_matching/main.py:629-651 DisjointSet over ALL edges)."""
    # new uid <-> url (the increment is bounded by design)
    new_urls: list[str] = []
    for t in new_features.select_columns(["url"]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        new_urls.extend(t.column("url").to_pylist())
    new_uids = blocking.page_uids(new_urls, uid_remap).astype(np.int64)
    order = np.argsort(new_uids)
    new_uids_sorted = new_uids[order]
    new_urls_sorted = np.asarray(new_urls, dtype=object)[order]

    # old endpoints of the new-touching edge set
    l_parts: list[np.ndarray] = []
    r_parts: list[np.ndarray] = []
    for t in edges_new.select_columns(["left", "right"]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        l_parts.append(
            t.column("left").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        r_parts.append(
            t.column("right").to_numpy(zero_copy_only=False).astype(np.int64)
        )
    ends = (
        np.unique(np.concatenate(l_parts + r_parts))
        if l_parts
        else np.empty(0, np.int64)
    )
    _, is_new_end = _sorted_lookup(new_uids_sorted, ends)
    old_ends = ends[~is_new_end]  # np.unique output: already sorted

    # touched old uids -> (uid, old cluster_id): one streaming scan of the
    # cluster state, broadcast filter, O(touched) rows back to the driver
    ends_ref = ray.put(old_ends)
    remap_local = uid_remap

    def probe(t: pa.Table) -> pa.Table:
        s = ray.get(ends_ref) if isinstance(ends_ref, ray.ObjectRef) else ends_ref
        t = t.combine_chunks()
        uids = blocking.page_uids(t.column("url").to_pylist(), remap_local)
        pos = np.searchsorted(s, uids)
        safe = np.minimum(pos, max(len(s) - 1, 0))
        hit = (
            (pos < len(s)) & (s[safe] == uids)
            if len(s)
            else np.zeros(len(uids), bool)
        )
        return pa.table(
            {
                "uid": pa.array(uids[hit], pa.int64()),
                "cid": t.column("cluster_id").filter(pa.array(hit)),
            }
        )

    touched = conformed(
        state.map_batches(probe, batch_format="pyarrow"),
        pa.schema([("uid", pa.int64()), ("cid", pa.string())]),
    ).take_all()
    t_uid = np.asarray([r["uid"] for r in touched], np.int64)
    t_cid = [r["cid"] for r in touched]
    if len(t_uid) != len(old_ends):
        raise ValueError(
            f"cluster state covers {len(t_uid)} of {len(old_ends)} old edge "
            "endpoints — checkpointed clusters are inconsistent with the "
            "features/edges checkpoints (stale or partial state)"
        )
    t_order = np.argsort(t_uid)
    t_uid_sorted = t_uid[t_order]
    t_lab = blocking.page_uids(t_cid, uid_remap).astype(np.int64)[t_order]
    t_cid_sorted = np.asarray(t_cid, dtype=object)[t_order]

    # contracted new edges: old endpoint -> its component label uid
    contract_ref = ray.put((t_uid_sorted, t_lab))

    def contract(t: pa.Table) -> pa.Table:
        ou, lab = (
            ray.get(contract_ref)
            if isinstance(contract_ref, ray.ObjectRef)
            else contract_ref
        )
        out = {}
        for c in ("left", "right"):
            u = (
                t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            if len(ou):
                pos = np.searchsorted(ou, u)
                safe = np.minimum(pos, len(ou) - 1)
                hit = (pos < len(ou)) & (ou[safe] == u)
                u = np.where(hit, lab[safe], u)
            out[c] = u
        keep = out["left"] != out["right"]
        return pa.table(
            {
                "left": pa.array(out["left"][keep], pa.int64()),
                "right": pa.array(out["right"][keep], pa.int64()),
            }
        )

    contracted = edges_new.select_columns(["left", "right"]).map_batches(
        contract, batch_format="pyarrow"
    )
    node_uids = np.unique(np.concatenate([new_uids_sorted, t_lab]))
    comps = connected_components(
        contracted,
        nodes=ray.data.from_arrow(
            pa.table({"url": pa.array(node_uids, pa.int64())})
        ),
        max_iters=max_cc_iters,
    )  # O(increment + touched components) rows
    node_parts: list[np.ndarray] = []
    final_parts: list[np.ndarray] = []
    for t in comps.iter_batches(batch_format="pyarrow", batch_size=None):
        node_parts.append(
            t.column("url").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        final_parts.append(
            t.column("cluster_id").to_numpy(zero_copy_only=False).astype(np.int64)
        )
    node = np.concatenate(node_parts) if node_parts else np.empty(0, np.int64)
    final = np.concatenate(final_parts) if final_parts else np.empty(0, np.int64)

    # label uid -> cluster_id string (old label's url IS its cluster_id;
    # a new uid's url comes from the increment). Dedup t_lab (many touched
    # uids share one component).
    lab_u, lab_first = np.unique(t_lab, return_index=True)
    lab_str = t_cid_sorted[lab_first]

    pn, hn = _sorted_lookup(new_uids_sorted, final)
    pl, hl = _sorted_lookup(lab_u, final)
    if not (hn | hl).all():
        bad = final[~(hn | hl)][:3]
        raise ValueError(
            f"component labels {bad.tolist()} are neither new uids nor "
            "touched old labels — contraction invariant violated"
        )
    # masked assignment (not np.where) — either side's array may be empty
    fstr = np.empty(len(final), dtype=object)
    fstr[hn] = new_urls_sorted[pn[hn]]
    rest = hl & ~hn
    fstr[rest] = lab_str[pl[rest]]

    is_new_node = _sorted_lookup(new_uids_sorted, node)[1]
    pn2 = _sorted_lookup(new_uids_sorted, node[is_new_node])[0]
    assign_tbl = pa.table(
        {
            "url": pa.array(new_urls_sorted[pn2].tolist(), pa.string()),
            "cluster_id": pa.array(fstr[is_new_node].tolist(), pa.string()),
        }
    )
    pl2, hl2 = _sorted_lookup(lab_u, node[~is_new_node])
    if not hl2.all():
        raise ValueError("old component node missing from touched-label map")
    old_strs = lab_str[pl2]
    new_strs = fstr[~is_new_node]
    changed = old_strs != new_strs
    relabel: dict[str, str] = dict(
        zip(old_strs[changed].tolist(), new_strs[changed].tolist())
    )
    clusters = _apply_relabel(state, relabel).union(
        ray.data.from_arrow(assign_tbl)
    )
    return clusters, relabel, assign_tbl


def run_er_incremental(
    new_pages: ray.data.Dataset,
    cfg: PipelineConfig,
    old_out_dir: str,
    old_input_key: str,
    weights: tuple[float, np.ndarray] | None = None,
    num_partitions: int | None = None,
    append_checkpoint: bool = False,
    fold_key: str = "",
    verify_exact: bool = True,
) -> dict:
    """Fold `new_pages` into the completed `run_er(out_dir=old_out_dir,
    input_key=old_input_key)` checkpoint — plus any folds already
    APPENDED to it (folds.json). Requires the batch run's `features` and
    `edges` stages (and every registered fold's) to be complete for the
    same cfg fingerprint AND the same weights digest (raises otherwise —
    a fold over a stale, differently-configured, or differently-WEIGHTED
    checkpoint would silently mix scoring semantics: within-old edges are
    reused verbatim, so they must come from the same model that scores
    the new-touching pairs).

    ``append_checkpoint=True`` persists THIS fold as a new partition
    (features_f<N>/ + edges_f<N>/, registered in folds.json) so the next
    increment chains on top — the append-only nightly-crawl shape: each
    fold writes O(increment) bytes, never rewrites the corpus.

    EXACTNESS CONTRACT — exact under STABLE BLOCKING only. The fold
    reproduces the full-batch clustering bit-for-bit
    (tests/test_incremental.py::test_chained_folds_equal_batch) iff the
    blocking the base run used still agrees with what a batch run over
    the union would use: (a) the hot-host set is unchanged, and (b) no
    block of the union blocking exceeds the pair cap (m <= m_cap ==>
    neither the base run nor the hypothetical union run truncated any
    block, so old-old candidate sets are identical). A violated
    precondition yields a valid APPROXIMATE fold — all new-touching pairs
    under current blocking are scored, old edges are reused — but cluster
    equality with a from-scratch batch run is no longer guaranteed.
    ``verify_exact=True`` (default) checks both conditions (one counted
    host pass + a distributed block-size count map — no per-block driver
    rows) and reports them in the returned ``exact`` / ``exact_reasons``
    keys, warning when the fold is approximate; ``verify_exact=False``
    skips the audit and reports ``exact=None``.

    Returns {"features_new", "pairs", "edges_new", "clusters", "exact",
    "exact_reasons"} where clusters covers the FULL corpus (base + all
    folds + new)."""
    import os

    from record_matching_ray.pipelines.er import weights_digest

    fp = cfg.fingerprint() + weights_digest(weights) + ":" + old_input_key
    fdir = os.path.join(old_out_dir, "features")
    edir = os.path.join(old_out_dir, "edges")
    check = [(fdir, fp, "features"), (edir, fp, "edges")]
    folds = _fold_registry(old_out_dir)
    for fe in folds:
        check.append((os.path.join(old_out_dir, fe["features"]),
                      fe["fingerprint"], fe["features"]))
        check.append((os.path.join(old_out_dir, fe["edges"]),
                      fe["fingerprint"], fe["edges"]))
    for sdir, want_fp, name in check:
        if not mf.is_complete(sdir, want_fp):
            raise ValueError(
                f"incremental fold needs a complete '{name}' checkpoint in "
                f"{old_out_dir} for fingerprint {want_fp!r} — run run_er first"
            )
    if num_partitions is None:
        from record_matching_ray.stages.util import shuffle_partitions

        num_partitions = max(8, shuffle_partitions())

    feat_dirs = [fdir] + [os.path.join(old_out_dir, fe["features"]) for fe in folds]
    edge_dirs = [edir] + [os.path.join(old_out_dir, fe["edges"]) for fe in folds]

    def read_feats(columns: list[str]) -> ray.data.Dataset:
        ds = mf.read_stage(feat_dirs[0], columns=columns)
        for d in feat_dirs[1:]:
            ds = ds.union(mf.read_stage(d, columns=columns))
        return ds

    old_block_cols = read_feats(["url", "host", "name", "minhash"])
    old_edges = mf.read_stage(edge_dirs[0])
    for d in edge_dirs[1:]:
        old_edges = old_edges.union(mf.read_stage(d))

    # S1' — features for the increment only
    new_features = build_features(new_pages, cfg).materialize()

    # uid collision audit (cfg.uid_mode="checked64"): reuse the base
    # run's persisted remap verbatim (old edges reference those ids) and
    # extend it for new-url collisions only — frozen old urls never move
    uid_remap: dict | None = None
    if cfg.uid_mode == "checked64":
        import json

        import numpy as _np

        base_remap: dict[str, int] = {}
        rp = os.path.join(old_out_dir, "uid_remap.json")
        if os.path.exists(rp):
            with open(rp) as f:
                base_remap = {k: int(v) for k, v in json.load(f).items()}

        def _flag(frozen: bool):
            import pyarrow as _pa  # `pa` is function-local further down

            def fn(t):
                return t.append_column(
                    "frozen",
                    _pa.array(_np.full(t.num_rows, frozen, bool), _pa.bool_()),
                )

            return fn

        flagged = (
            read_feats(["url"])
            .map_batches(_flag(True), batch_format="pyarrow")
            .union(
                new_features.select_columns(["url"]).map_batches(
                    _flag(False), batch_format="pyarrow"
                )
            )
        )
        uid_remap = blocking.build_uid_remap(flagged, base_remap=base_remap)
        if append_checkpoint and uid_remap:
            import uuid as _uuid

            tmp = rp + ".tmp-" + _uuid.uuid4().hex[:8]
            with open(tmp, "w") as f:
                json.dump(uid_remap, f)
            os.replace(tmp, rp)

    # hot hosts over the union (head domains shift as the crawl grows)
    hot = blocking.compute_hot_hosts(
        read_feats(["host"]).union(new_features.select_columns(["host"])),
        cfg,
    )

    # exactness audit (see docstring): hot-set stability + zero pair-cap
    # truncation anywhere in the union blocking. Both are count-bounded —
    # the block-size check folds to a (size, n_blocks) map, never one
    # driver row per block key.
    exact: bool | None = None
    exact_reasons: list[str] = []
    if verify_exact:
        hot_old = blocking.compute_hot_hosts(read_feats(["host"]), cfg)
        if set(hot_old) != set(hot):
            exact_reasons.append(
                "hot-host set changed between base and union blocking "
                f"(base {sorted(set(hot_old) - set(hot))!r} vs union "
                f"{sorted(set(hot) - set(hot_old))!r} differ) — old-old "
                "blocks would salt differently in a batch rerun"
            )
        union_feats = read_feats(
            ["url", "host", "name", "minhash"]
        ).union(new_features.select_columns(["url", "host", "name", "minhash"]))
        stats = blocking.block_size_stats(union_feats, cfg, hot_hosts=set(hot))
        n_over = stats.get("blocks_over_pair_cap", 0)
        if n_over:
            exact_reasons.append(
                f"{n_over} union block(s) exceed the pair cap "
                f"(<= {stats.get('capped_pairs_lost_upper_bound', 0)} pairs "
                "truncated) — base/union core+spokes truncations can differ"
            )
        exact = not exact_reasons
        if not exact:
            import warnings

            warnings.warn(
                "incremental fold is APPROXIMATE (blocking not stable): "
                + "; ".join(exact_reasons),
                stacklevel=2,
            )

    # S2' — new-touching candidate pairs
    pairs = blocking.generate_incremental_pairs(
        old_block_cols, new_features, cfg, hot, uid_remap=uid_remap
    )

    # S3' — score them. Payload side must cover old AND new pages (a
    # cross pair needs both sides); same counted broadcast gate as run_er.
    payload_union = read_feats(["url"] + blocking.PAIR_PAYLOAD).union(
        new_features.select_columns(["url"] + blocking.PAIR_PAYLOAD)
    )
    n_union = payload_union.count()
    # 4M fused gate, same as run_er (round 4: the old 1M gate pushed a
    # 1.5M-page fold onto the double-hash-join plan — a 300MB broadcast
    # replaced a 67M-wide-row shuffle)
    if n_union <= 4_000_000 and not cfg.keep_scored and not cfg.emit_features:
        edges_new = scoring.score_pairs_fused(
            pairs, payload_union, cfg, weights, uid_remap=uid_remap
        )
    else:
        wide = blocking.attach_pair_payload(
            pairs, payload_union, cfg, num_partitions, restore_urls=False,
            uid_remap=uid_remap,
        )
        edges_new = scoring.edges_from_scores(
            scoring.score_pairs(wide, cfg, weights), cfg
        )

    # S4' — components over the union edge list; nodes = every page uid
    # so singleton pages keep their own cluster
    import pyarrow as pa

    def uid_nodes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pa.array(
                    blocking.page_uids(t.column("url").to_pylist(), uid_remap),
                    pa.int64(),
                )
            }
        )

    fold_entry: dict | None = None
    if append_checkpoint:
        # persist THIS fold's features/edges BEFORE clustering so
        # edges_new executes once (the components pass reads it back)
        n = len(folds) + 1
        ffold = f"features_f{n}"
        efold = f"edges_f{n}"
        fold_fp = fp + f":fold{n}:{fold_key}"
        mf.write_stage(new_features, os.path.join(old_out_dir, ffold), fold_fp)
        mf.write_stage(edges_new, os.path.join(old_out_dir, efold), fold_fp)
        edges_new = mf.read_stage(os.path.join(old_out_dir, efold))
        fold_entry = {
            "n": n,
            "key": fold_key,
            "features": ffold,
            "edges": efold,
            "fingerprint": fold_fp,
        }
    # S4' — touched-component fast path (O(increment), VERDICT r3 item 1):
    # requires the base run's `clusters` checkpoint and an O(increment)
    # cluster delta (assign + relabel) for every prior fold. Falls back to
    # the full union-edge-list components pass for pre-delta checkpoints.
    cdir = os.path.join(old_out_dir, "clusters")
    fast = mf.is_complete(cdir, fp) and all(
        fe.get("assign")
        and "relabel" in fe
        and mf.is_complete(os.path.join(old_out_dir, fe["assign"]), fe["fingerprint"])
        for fe in folds
    )
    if fast:
        if not append_checkpoint:
            edges_new = edges_new.materialize()
        state = _cluster_state(old_out_dir, folds)
        clusters, relabel, assign_tbl = _fold_touched_components(
            edges_new, new_features, state, uid_remap, cfg.max_cc_iters
        )
        if fold_entry is not None:
            afold = f"assign_f{fold_entry['n']}"
            mf.write_stage(
                ray.data.from_arrow(assign_tbl),
                os.path.join(old_out_dir, afold),
                fold_entry["fingerprint"],
            )
            fold_entry["assign"] = afold
            fold_entry["relabel"] = relabel
    else:
        url_union = read_feats(["url"]).union(
            new_features.select_columns(["url"])
        )
        uclusters = connected_components(
            old_edges.select_columns(["left", "right"]).union(
                edges_new.select_columns(["left", "right"])
            ),
            nodes=url_union.map_batches(uid_nodes, batch_format="pyarrow"),
            max_iters=cfg.max_cc_iters,
        )
        clusters = _restore_cluster_urls(
            uclusters, url_union, num_partitions, uid_remap=uid_remap
        )
    if fold_entry is not None:
        _append_fold_registry(old_out_dir, fold_entry)
    return {
        "features_new": new_features,
        "pairs": pairs,
        "edges_new": edges_new,
        "clusters": clusters,
        "exact": exact,
        "exact_reasons": exact_reasons,
    }
