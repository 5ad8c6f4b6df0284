"""S2 — blocking + candidate-pair generation (the shuffle stage).

Replaces the reference's global ANN candidate generation — one CUDA tensor
over all vectors + beam search (record_matching/main.py:175-191, 552-577)
and Qdrant HNSW search per record (claude_poc/entity-resolution_v4.py:302-356)
— with distributed key blocking:

  features --map_batches--> (block_key, url) rows          [explode, stateless]
           --groupby(block_key).map_groups--> (left, right) candidate pairs
           --groupby([left,right]).map_groups--> deduped pairs
           --join(features) x2--> pairs with both sides' payloads

Block keys: canonical host + MinHash-LSH band keys. Skew handling is
EXPLICIT (the reference silently caps neighbor lists at 100 and merely logs
lost matches, poc1:1556-1559): blocks larger than cfg.hot_block_limit are
salted into cfg.n_salts sub-blocks by a secondary url hash, and any residual
oversized block emits at most cfg.max_pairs_per_block pairs — both events
are counted in observable columns, never silent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from record_matching_ray.config import PipelineConfig
from record_matching_ray.functions.hashing import _U64, hash_strings, mix64
from record_matching_ray.stages.extract import minhash_matrix
from record_matching_ray.functions.minhash import MinHasher

# Columns carried to the scorer for each pair side. minhash rides along
# (packed to binary) so f_jaccard is a vectorized signature comparison in
# the scorer instead of a per-pair Python set op on token strings.
PAIR_PAYLOAD = ["name", "minhash", "year", "embedding"]


_HASHER_CACHE: dict[tuple[int, int], MinHasher] = {}


def _hasher(num_perm: int, seed: int = 7) -> MinHasher:
    key = (num_perm, seed)
    h = _HASHER_CACHE.get(key)
    if h is None:
        h = _HASHER_CACHE[key] = MinHasher(num_perm, seed)
    return h


def page_uids(urls, remap: dict | None = None) -> np.ndarray:
    """Stable 64-bit page id: mix64(blake8(url)). The pair pipeline moves
    ONLY these ids through its shuffles (urls are ~100B, uids 8B — the
    pair-dedup shuffle and its lexsorts get ~10x cheaper); urls are
    restored from the feature table at payload-attach. Collision odds at
    bench scale are ~n^2/2^64 (negligible); for 10^12-page deployments
    set cfg.uid_mode="checked64": run_er builds a collision-audit remap
    (build_uid_remap) and threads it here, so the O(50)-at-10^12
    colliding urls get deterministic unique ids while every shuffle keeps
    the 8B int64 wire format. Stored as NON-NEGATIVE int64 (top bit
    cleared): several Ray/Arrow/pandas aggregate paths overflow on uint64
    values above 2^63 and silently fall back to pickled Python objects,
    which breaks downstream casts."""
    base = (mix64(hash_strings(urls)) >> _U64(1)).astype(np.int64)
    if remap:
        # remap is tiny (expected collisions only) — n dict membership
        # probes, writes only on the rare hits
        for i, u in enumerate(urls):
            v = remap.get(u)
            if v is not None:
                base[i] = v
    return base


_H2_SALT = _U64(0xA5A5A5A55A5A5A5A)


def build_uid_remap(
    urls_flagged: ray.data.Dataset,
    n_parts: int | None = None,
    base_remap: dict | None = None,
) -> dict[str, int]:
    """Collision audit for cfg.uid_mode="checked64": find 63-bit uid
    collisions between DISTINCT urls and deterministically remap the
    colliding MOVABLE urls to fresh unique ids.

    Input: dataset with columns (url: string, frozen: bool). Frozen rows
    (e.g. an incremental fold's already-clustered base corpus, whose
    edges reference the old ids) never move; in a collision group every
    non-frozen url is remapped. Two frozen urls can only collide if the
    base run itself was unchecked — raises in that case.

    Distributed shape: per-batch distinct (uid, h2, frozen) partials
    where h2 is an INDEPENDENT second 64-bit hash witnessing url
    distinctness (double-collision odds ~2^-127) — 17B/row, one int-keyed
    shuffle; only colliding uids (expected n^2/2^64 ~ 50 at 10^12 pages)
    reach the driver, then ONE more pruned pass collects their urls. New
    ids are salted rehashes verified unique against the collision
    neighborhood AND against the corpus via a final membership scan
    (retry loop, expected 1 iteration)."""
    from record_matching_ray.stages.util import coarse_groupby_partitions

    if n_parts is None:
        n_parts = coarse_groupby_partitions()
    P = n_parts
    base_remap = base_remap or {}

    def partial(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        uid = page_uids(urls, base_remap)
        h2 = (mix64(hash_strings(urls) ^ _H2_SALT) >> _U64(1)).astype(np.int64)
        arr = np.unique(np.stack([uid, h2], axis=1), axis=0)
        return pa.table(
            {
                "uid": pa.array(arr[:, 0], pa.int64()),
                "h2": pa.array(arr[:, 1], pa.int64()),
                "pk": pa.array(
                    (arr[:, 0].astype(_U64) % _U64(P)).astype(np.int64), pa.int64()
                ),
            }
        )

    def colliding(g: pa.Table) -> pa.Table:
        uid = g.column("uid").to_numpy(zero_copy_only=False)
        h2 = g.column("h2").to_numpy(zero_copy_only=False)
        order = np.lexsort((h2, uid))
        uid, h2 = uid[order], h2[order]
        # distinct (uid, h2): the same url seen in several batches (or on
        # both the frozen and movable side) collapses to one witness
        keep = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (h2[1:] != h2[:-1]))
        )
        uid, h2 = uid[keep], h2[keep]
        new_u = np.concatenate(([True], uid[1:] != uid[:-1]))
        grp = np.cumsum(new_u) - 1
        counts = np.bincount(grp)
        bad = counts[grp] > 1
        return pa.table(
            {
                "uid": pa.array(uid[bad], pa.int64()),
                "h2": pa.array(h2[bad], pa.int64()),
            }
        )

    cols = (
        urls_flagged.map_batches(partial, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(colliding, batch_format="pyarrow")
    )
    bad_rows = [
        t
        for t in cols.iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows and "uid" in t.schema.names
    ]
    if not bad_rows:
        return dict(base_remap)
    bad = pa.concat_tables(bad_rows)
    bad_uids = set(bad.column("uid").to_pylist())

    import ray as _ray

    bad_ref = _ray.put(bad_uids)

    def gather_urls(t: pa.Table) -> pa.Table:
        s = _ray.get(bad_ref) if isinstance(bad_ref, _ray.ObjectRef) else bad_ref
        urls = t.column("url").to_pylist()
        uid = page_uids(urls, base_remap)
        fz = t.column("frozen").to_numpy(zero_copy_only=False)
        keep = np.fromiter((int(u) in s for u in uid), dtype=bool, count=len(urls))
        return pa.table(
            {
                "url": pa.array(
                    [u for u, k in zip(urls, keep) if k], pa.string()
                ),
                "uid": pa.array(uid[keep], pa.int64()),
                "frozen": pa.array(fz[keep], pa.bool_()),
            }
        )

    hits = [
        t
        for t in urls_flagged.map_batches(gather_urls, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows and "url" in t.schema.names
    ]
    ht = pa.concat_tables(hits)
    # distinct urls (a url may appear on both sides / several batches —
    # frozen wins)
    rows: dict[str, tuple[int, bool]] = {}
    for u, i, f in zip(
        ht.column("url").to_pylist(),
        ht.column("uid").to_pylist(),
        ht.column("frozen").to_pylist(),
    ):
        prev = rows.get(u)
        rows[u] = (int(i), bool(f) or (prev[1] if prev else False))
    groups: dict[int, list[tuple[str, bool]]] = {}
    for u, (i, f) in rows.items():
        groups.setdefault(i, []).append((u, f))
    taken = set(groups.keys()) | set(base_remap.values())
    remap: dict[str, int] = dict(base_remap)
    for i in sorted(groups):
        members = sorted(groups[i])
        if len(members) < 2:
            continue  # the collision was with itself across flags
        frozen_members = [u for u, f in members if f]
        if len(frozen_members) > 1:
            raise ValueError(
                "two FROZEN urls collide on uid — the base run was not "
                f"collision-checked: {frozen_members[:2]!r}"
            )
        # first frozen member (or deterministic first) keeps the id
        keep_url = frozen_members[0] if frozen_members else members[0][0]
        for u, _f in members:
            if u == keep_url:
                continue
            k = 1
            while True:
                cand = int(
                    (
                        mix64(hash_strings([u]) ^ (_H2_SALT + _U64(k)))
                        >> _U64(1)
                    )[0]
                )
                if cand not in taken:
                    taken.add(cand)
                    remap[u] = cand
                    break
                k += 1
    if len(remap) == len(base_remap):
        return remap
    # final corpus-wide uniqueness scan: do any EXISTING uids equal a
    # freshly assigned id? (odds ~|remap| * n / 2^63 — one cheap pruned
    # pass; retry the clashing assignments if it ever fires)
    fresh = {u: v for u, v in remap.items() if base_remap.get(u) != v}
    cand_ref = _ray.put(set(fresh.values()))

    def clash(t: pa.Table) -> pa.Table:
        s = _ray.get(cand_ref) if isinstance(cand_ref, _ray.ObjectRef) else cand_ref
        urls = t.column("url").to_pylist()
        uid = page_uids(urls, base_remap)
        hit = [u for u, i in zip(urls, uid) if int(i) in s]
        return pa.table({"url": pa.array(hit, pa.string())})

    clashes = [
        t
        for t in urls_flagged.map_batches(clash, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows and "url" in t.schema.names
    ]
    clash_urls = (
        set(pa.concat_tables(clashes).column("url").to_pylist())
        if clashes
        else set()
    )
    clash_urls -= set(remap)  # a remapped url's OLD id may clash freely
    if clash_urls:
        # bump the clashing assignments to the next free salt
        clash_ids = {
            int(i)
            for i in page_uids(sorted(clash_urls), base_remap)
        }
        for u in sorted(fresh):
            if remap[u] in clash_ids:
                k = 1000  # disjoint salt range for the retry
                while True:
                    cand = int(
                        (
                            mix64(hash_strings([u]) ^ (_H2_SALT + _U64(k)))
                            >> _U64(1)
                        )[0]
                    )
                    if cand not in taken and cand not in clash_ids:
                        taken.add(cand)
                        remap[u] = cand
                        break
                    k += 1
    return remap


def emit_block_keys(
    batch: pa.Table,
    cfg: PipelineConfig,
    hot_hosts: set[str] | None = None,
    uid_remap: dict | None = None,
) -> pa.Table:
    """map_batches fn: features -> long (block_key: uint64, uid: uint64).

    Emits the host block key plus `lsh_bands` band keys per page. Hot-host
    salting: hosts in the (small, task-broadcast) hot_hosts set — estimated
    frequency above cfg.hot_block_limit — are pre-salted into cfg.n_salts
    sub-blocks by a secondary per-page hash. Stateless task: the
    permutation bank is a process-level cached constant.

    (An exactly-once emission scheme — suppress pairs owned by the host
    block or an earlier colliding band — was tried and reverted: it is
    inconsistent with per-block caps, because a suppressing block cannot
    know whether the owning block's membership cap dropped the pair, and
    the inconsistency fragments clusters. Duplicate emissions are instead
    removed by the int-keyed dedup shuffle in dedup_pairs.)
    """
    hot_hosts = hot_hosts or set()
    n = batch.num_rows
    uids = page_uids(batch.column("url").to_pylist(), uid_remap)
    out_keys: list[np.ndarray] = []
    out_idx: list[np.ndarray] = []

    if cfg.use_host_blocks:
        hosts = batch.column("host").to_pylist()
        url_salt = (
            mix64(uids.astype(_U64)) % _U64(cfg.n_salts)
            if hot_hosts
            else np.zeros(n, dtype=_U64)
        )
        host_hash = mix64(hash_strings(hosts))
        is_hot = np.fromiter((h in hot_hosts for h in hosts), dtype=bool, count=n)
        salted = np.where(is_hot, host_hash * _U64(31) + url_salt + _U64(1), host_hash)
        keep = np.fromiter((h != "" for h in hosts), dtype=bool, count=n)
        out_keys.append(salted[keep])
        out_idx.append(np.nonzero(keep)[0])

    if cfg.use_name_blocks and "name" in batch.column_names:
        # Exact-key family on the normalized name: catches cross-host pages
        # of the same entity even when every MinHash band misses (bands are
        # probabilistic; at J~=0.7 a 16x4 scheme misses ~0.7% of true
        # pairs). XOR namespace constant keeps name keys disjoint from
        # host keys. Hot names (the "john smith" problem) are bounded by
        # the oversized-block core+spokes cap downstream, with overflow
        # counted — never silent.
        names = batch.column("name").to_pylist()
        name_hash = mix64(hash_strings(names) ^ _U64(0xC2B2AE3D27D4EB4F))
        keep = np.fromiter((bool(nm) for nm in names), dtype=bool, count=n)
        out_keys.append(name_hash[keep])
        out_idx.append(np.nonzero(keep)[0])

    if cfg.use_lsh_blocks:
        sigs = minhash_matrix(batch.column("minhash"), cfg.num_perm)
        bands = _hasher(cfg.num_perm).band_keys(sigs, cfg.lsh_bands)  # (n, bands)
        out_keys.append(bands.ravel())
        out_idx.append(np.repeat(np.arange(n, dtype=np.int64), cfg.lsh_bands))

    keys = np.concatenate(out_keys) if out_keys else np.empty(0, dtype=_U64)
    idx = np.concatenate(out_idx) if out_idx else np.empty(0, dtype=np.int64)
    return pa.table(
        {
            "block_key": pa.array(keys, pa.uint64()),
            "uid": pa.array(uids[idx], pa.int64()),
        }
    )


def _emit_pairs_in_block(group: pa.Table, max_pairs: int) -> pa.Table:
    """All (min,max) url pairs within one block, capped at max_pairs.

    The cap is deterministic (urls sorted first) and the number of pairs
    dropped is reported in the `overflow` column (counter, same value on
    every emitted row of the block)."""
    urls = np.array(sorted(set(group.column("url").to_pylist())), dtype=object)
    keys = np.zeros(len(urls), dtype=_U64)
    return _emit_pairs_segments(urls, keys, max_pairs)


def _emit_pairs_segments(
    ids: np.ndarray, keys: np.ndarray, max_pairs: int
) -> pa.Table:
    """Pairs for MANY blocks at once: rows sorted by (key, id); each
    consecutive run of one key is a block. All-numpy — no per-block
    Python dispatch (Ray's map_groups pays ~1ms of dispatch per group,
    which at ~50k tiny LSH blocks dominates the whole blocking stage).
    Works on uint64 uids (hot path) or url strings (object dtype)."""
    id_type = pa.string() if ids.dtype == object else pa.int64()
    order = np.lexsort((ids, keys))
    ids, keys = ids[order], keys[order]
    # segment boundaries
    bounds = np.nonzero(np.concatenate(([True], keys[1:] != keys[:-1], [True])))[0]
    lefts: list[np.ndarray] = []
    rights: list[np.ndarray] = []
    overflows: list[np.ndarray] = []
    n_hubs = 2
    for s, e in zip(bounds[:-1], bounds[1:]):
        # dedup ids within a block (same id can arrive via several rows)
        block = np.unique(ids[s:e])
        m = len(block)
        if m < 2:
            continue
        total = m * (m - 1) // 2
        m_cap = int((2 * max_pairs) ** 0.5) + 1
        if m <= m_cap:
            ii, jj = np.triu_indices(m, k=1)
            lefts.append(block[ii])
            rights.append(block[jj])
            overflows.append(np.zeros(len(ii), dtype=np.int64))
            continue
        # Oversized block: bound WORK as well as output. Emitting the
        # lexicographic pair-slice would exclude most members entirely and
        # fragment their component, so emit a dense CORE (all pairs among
        # the m_cap smallest ids) plus HUB SPOKES (first n_hubs ids paired
        # with every remaining member) — every member keeps a path into
        # the block's component at O(max_pairs + n_hubs*m) cost; the
        # uncounted remainder lands in the overflow counter.
        core = block[:m_cap]
        ii, jj = np.triu_indices(m_cap, k=1)
        spokes_l = np.repeat(np.arange(n_hubs), m - m_cap)
        spokes_r = np.tile(np.arange(m_cap, m), n_hubs)
        l = np.concatenate([core[ii], block[spokes_l]])
        r = np.concatenate([core[jj], block[spokes_r]])
        emitted = len(l)
        lefts.append(l)
        rights.append(r)
        overflows.append(np.full(emitted, total - emitted, dtype=np.int64))
    if not lefts:
        return pa.table(
            {
                "left": pa.array([], id_type),
                "right": pa.array([], id_type),
                "overflow": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "left": pa.array(np.concatenate(lefts), id_type),
            "right": pa.array(np.concatenate(rights), id_type),
            "overflow": pa.array(np.concatenate(overflows), pa.int64()),
        }
    )


def _emit_new_touching_segments(
    ids: np.ndarray, keys: np.ndarray, is_new: np.ndarray, max_pairs: int
) -> pa.Table:
    """Pairs for many blocks at once, restricted to pairs that TOUCH a
    new member (incremental ER): new x new plus new x old. Blocks with no
    new member emit nothing — their pairs were already scored by the
    batch run whose edges the incremental fold unions back in. Same
    canonical (min,max) convention and observable `overflow` counter as
    `_emit_pairs_segments`; cross-pair caps truncate the (sorted) old
    side deterministically, never the new members."""
    order = np.lexsort((ids, keys))
    ids, keys, is_new = ids[order], keys[order], is_new[order]
    bounds = np.nonzero(np.concatenate(([True], keys[1:] != keys[:-1], [True])))[0]
    lefts: list[np.ndarray] = []
    rights: list[np.ndarray] = []
    overflows: list[np.ndarray] = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        blk, inv = np.unique(ids[s:e], return_inverse=True)
        flag = np.zeros(len(blk), dtype=bool)
        np.logical_or.at(flag, inv, is_new[s:e])
        k = int(flag.sum())
        if k == 0 or len(blk) < 2:
            continue
        new, old = blk[flag], blk[~flag]
        total = k * (k - 1) // 2 + k * len(old)
        if k * (k - 1) // 2 <= max_pairs:
            ii, jj = np.triu_indices(k, k=1)
            l_parts = [new[ii]]
            r_parts = [new[jj]]
            n_nn = len(ii)
        else:
            # oversized all-new block: same core+spokes bound as the
            # batch emitter (every member keeps a path into the component)
            nn = _emit_pairs_segments(new, np.zeros(k, dtype=_U64), max_pairs)
            l_parts = [nn.column("left").to_numpy(zero_copy_only=False)]
            r_parts = [nn.column("right").to_numpy(zero_copy_only=False)]
            n_nn = nn.num_rows
        cross_cap = max(0, max_pairs - n_nn)
        n_old = min(len(old), max(1, cross_cap // k)) if k else 0
        if len(old) and n_old:
            co = old[:n_old]  # old side arrives sorted from np.unique
            l2 = np.repeat(new, n_old)
            r2 = np.tile(co, k)
            l_parts.append(np.minimum(l2, r2))
            r_parts.append(np.maximum(l2, r2))
        l = np.concatenate(l_parts)
        r = np.concatenate(r_parts)
        overflows.append(np.full(len(l), total - len(l), dtype=np.int64))
        lefts.append(l)
        rights.append(r)
    if not lefts:
        return pa.table(
            {
                "left": pa.array([], pa.int64()),
                "right": pa.array([], pa.int64()),
                "overflow": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "left": pa.array(np.concatenate(lefts), pa.int64()),
            "right": pa.array(np.concatenate(rights), pa.int64()),
            "overflow": pa.array(np.concatenate(overflows), pa.int64()),
        }
    )


def generate_incremental_pairs(
    old_features: ray.data.Dataset,
    new_features: ray.data.Dataset,
    cfg: PipelineConfig,
    hot_hosts: list[str] | None = None,
    uid_remap: dict | None = None,
) -> ray.data.Dataset:
    """Candidate pairs for an incremental fold: block keys over old AND
    new features (stateless map over each side; old feature extraction is
    NOT redone — callers pass the features checkpoint), one coarse-key
    shuffle, pair emission restricted to new-touching pairs. Old-only
    blocks emit nothing, so scoring work is O(new x touched-blocks), not
    O(corpus^2)."""
    from record_matching_ray.stages.util import coarse_groupby_partitions

    def keyed(feats: ray.data.Dataset, flag: int) -> ray.data.Dataset:
        def emit(t: pa.Table) -> pa.Table:
            keys = emit_block_keys(t, cfg, set(hot_hosts or []), uid_remap)
            return keys.append_column(
                "is_new",
                pa.array(np.full(keys.num_rows, flag, dtype=np.int8), pa.int8()),
            )

        return feats.map_batches(
            emit, batch_format="pyarrow", batch_size=cfg.extract_batch_size
        )

    blocks = keyed(old_features, 0).union(keyed(new_features, 1))
    n_parts = coarse_groupby_partitions()

    def add_pk(t: pa.Table) -> pa.Table:
        bk = t.column("block_key").to_numpy(zero_copy_only=False)
        return t.append_column(
            "pk", pa.array((bk % _U64(n_parts)).astype(np.int64), pa.int64())
        )

    def pairs_for_partition(g: pa.Table) -> pa.Table:
        uids = g.column("uid").to_numpy(zero_copy_only=False)
        keys = g.column("block_key").to_numpy(zero_copy_only=False)
        flags = g.column("is_new").to_numpy(zero_copy_only=False).astype(bool)
        return _emit_new_touching_segments(
            uids, keys, flags, cfg.max_pairs_per_block
        )

    pairs = (
        blocks.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(pairs_for_partition, batch_format="pyarrow")
    )
    return dedup_pairs(pairs, n_parts)


def generate_candidate_pairs(
    features: ray.data.Dataset,
    cfg: PipelineConfig,
    hot_hosts: list[str] | None = None,
    uid_remap: dict | None = None,
) -> ray.data.Dataset:
    """features -> deduped candidate pairs (left, right).

    Shuffle #1: groupby(block_key) — key = host | LSH band (salted).
    Shuffle #2: groupby(left, right) — pair canonicalization/dedup
    (reference: tuple(sorted([a,b])) sets, poc1:345-349).
    """
    blocks = features.map_batches(
        emit_block_keys,
        fn_kwargs={
            "cfg": cfg,
            "hot_hosts": set(hot_hosts or []),
            "uid_remap": uid_remap,
        },
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )

    # Shuffle on a COARSE partition key (block_key mod P) rather than the
    # raw block key: the grouping still co-locates each block (equal keys
    # share a partition), but Ray dispatches Python once per partition,
    # not once per tiny block; inside, _emit_pairs_segments lexsorts and
    # emits every block's pairs in one numpy pass.
    from record_matching_ray.stages.util import coarse_groupby_partitions

    n_parts = coarse_groupby_partitions()

    def add_pk(t: pa.Table) -> pa.Table:
        bk = t.column("block_key").to_numpy(zero_copy_only=False)
        return t.append_column(
            "pk", pa.array((bk % _U64(n_parts)).astype(np.int64), pa.int64())
        )

    def pairs_for_partition(g: pa.Table) -> pa.Table:
        uids = g.column("uid").to_numpy(zero_copy_only=False)
        keys = g.column("block_key").to_numpy(zero_copy_only=False)
        return _emit_pairs_segments(uids, keys, cfg.max_pairs_per_block)

    pairs = (
        blocks.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(pairs_for_partition, batch_format="pyarrow")
    )
    return dedup_pairs(pairs, n_parts)


def _local_pair_dedup(l: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if len(l) == 0:
        return l, r
    order = np.lexsort((r, l))
    l, r = l[order], r[order]
    keep = np.concatenate(([True], (l[1:] != l[:-1]) | (r[1:] != r[:-1])))
    return l[keep], r[keep]


def dedup_pairs(pairs: ray.data.Dataset, n_parts: int) -> ray.data.Dataset:
    """Distinct (left, right) uid pairs — partial dedup per block, then ONE
    int-keyed hash shuffle (pair-hash mod n_parts) + vectorized
    per-partition dedup.

    Replaces groupby([left, right]).count(): Ray's native aggregate on a
    two-string composite key was measured ~100x slower (79s vs <5s for
    3.6M rows); with uid pairs the shuffle payload is 16B/row and the
    dedup is an integer lexsort.
    """

    def _uid_pair_arrays(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        l = t.column("left").to_numpy(zero_copy_only=False)
        r = t.column("right").to_numpy(zero_copy_only=False)
        return l, r

    def local(t: pa.Table) -> pa.Table:
        l, r = _local_pair_dedup(*_uid_pair_arrays(t))
        lu, ru = l.astype(_U64), r.astype(_U64)
        ph = (mix64(lu * _U64(0x9E3779B97F4A7C15) ^ mix64(ru)) % _U64(n_parts)).astype(
            np.int64
        )
        return pa.table(
            {
                "left": pa.array(l, pa.int64()),
                "right": pa.array(r, pa.int64()),
                "ph": pa.array(ph, pa.int64()),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        l, r = _local_pair_dedup(*_uid_pair_arrays(g))
        return pa.table(
            {"left": pa.array(l, pa.int64()), "right": pa.array(r, pa.int64())}
        )

    from record_matching_ray.stages.util import conformed

    out = (
        pairs.select_columns(["left", "right"])
        .map_batches(local, batch_format="pyarrow")
        .groupby("ph")
        .map_groups(final, batch_format="pyarrow")
    )
    return conformed(out, pa.schema([("left", pa.int64()), ("right", pa.int64())]))


def compute_hot_hosts(features: ray.data.Dataset, cfg: PipelineConfig) -> list[str]:
    """Cheap count pass: hosts with > hot_block_limit pages (the 'head
    domains' of the north rule). Partial counts per batch then a small
    groupby — the shuffled data is (host, partial_count), not pages."""
    def partial_counts(batch: pa.Table) -> pa.Table:
        counts = pa.TableGroupBy(batch.select(["host"]), "host").aggregate(
            [([], "count_all")]
        )
        return counts.rename_columns(["host", "cnt"])

    # select_columns BEFORE map_batches: lets Ray push the projection into
    # the parquet read when features comes off a checkpoint — the feature
    # table carries text/token payloads that this count never needs
    partials = features.select_columns(["host"]).map_batches(
        partial_counts, batch_format="pyarrow"
    )
    totals = partials.groupby("host").sum("cnt")  # column: "sum(cnt)"
    hot = totals.map_batches(
        lambda t: t.filter(pc.greater(t["sum(cnt)"], cfg.hot_block_limit)),
        batch_format="pyarrow",
    )
    return [r["host"] for r in hot.take_all()]


def attach_pair_payload(
    pairs: ray.data.Dataset,
    features: ray.data.Dataset,
    cfg: PipelineConfig,
    num_partitions: int | None = None,
    broadcast_max_rows: int = 1_000_000,
    restore_urls: bool = True,
    uid_remap: dict | None = None,
    extra_payload: list[str] | None = None,
) -> ray.data.Dataset:
    """Attach both sides' feature payloads to each candidate pair.

    Two plans, chosen by the COUNTED size of the build side:

    - broadcast hash join (features <= broadcast_max_rows): payload
      arrays are ray.put ONCE and every pair batch resolves both sides by
      dict lookup — zero shuffle. Pairs outnumber pages ~30-200x in this
      workload, so shuffling 2x payload per pair through Ray's hash join
      cost ~45% of total pipeline wall time (measured 65s of 148s at 24k
      pages / 4.5M pairs); the broadcast plan removes it entirely.
    - shuffle hash join (larger): the reference-analog double join
      (record_matching/main.py:366-392), hash-partitioned on url. This is
      the 100TB path — the build side never materializes on one node.

    Pairs may be keyed by uid (uint64, the hot path from
    generate_candidate_pairs) or by url string (labeled training pairs);
    either way the output's left/right columns are URL STRINGS, restored
    from the feature table — downstream stages (edges, clustering) never
    see uids.

    The embedding column is packed to a binary blob either way: Acero's
    hash join (Ray's per-partition join kernel) rejects fixed_size_list
    payload columns; float32-bytes round-trip losslessly via np.frombuffer
    in the scorer."""
    if num_partitions is None:
        from record_matching_ray.stages.util import shuffle_partitions

        num_partitions = shuffle_partitions()
    n_features = features.count()
    if n_features <= broadcast_max_rows:
        return _attach_payload_broadcast(
            pairs, features, cfg, restore_urls, uid_remap, extra_payload
        )
    # Join plan: scale the partition count with the PAIR VOLUME, not the
    # CPU count. A wide pair row is ~500B (2x SQ8 embedding + packed
    # minhash + name + url); Ray's hash-join aggregator actors hold a
    # full partition in heap, so CPU/2 partitions of a 285M-pair table
    # were ~7GB each and OOM'd (round-4 1.5M-page leg). Target ~256MB of
    # wide rows per partition; the count is counted, never guessed.
    WIDE_ROW_BYTES = 512
    TARGET_PARTITION_BYTES = 256 << 20
    # Materialize before counting: count() executes the candidate-pair
    # plan, and the join below consumes pairs AGAIN — without pinning the
    # blocks the whole blocking stage would run twice. Pair rows are
    # ~16B (uid,uid), so even 285M pairs pin ~5GB in the object store
    # (spillable), far cheaper than recomputing blocking.
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    data_parts = max(1, -(-n_pairs * WIDE_ROW_BYTES // TARGET_PARTITION_BYTES))
    num_partitions = max(num_partitions, min(int(data_parts), 4096))
    return _attach_payload_join(
        pairs, features, cfg, num_partitions, restore_urls, uid_remap,
        extra_payload,
    )


def _pairs_to_uids(
    pairs: ray.data.Dataset, uid_remap: dict | None = None
) -> ray.data.Dataset:
    """Normalize (left, right) to uid keys if they are url strings."""
    sch = pairs.schema()
    left_type = sch.types[sch.names.index("left")]
    if not pa.types.is_string(left_type):
        return pairs

    def conv(t: pa.Table) -> pa.Table:
        cols = {n: t.column(n) for n in t.schema.names}
        cols["left"] = pa.array(
            page_uids(t.column("left").to_pylist(), uid_remap), pa.int64()
        )
        cols["right"] = pa.array(
            page_uids(t.column("right").to_pylist(), uid_remap), pa.int64()
        )
        return pa.table(cols)

    return pairs.map_batches(conv, batch_format="pyarrow")


def _pack_payload_batch(
    t: pa.Table, uid_remap: dict | None = None
) -> pa.Table:
    """Distributed prep for the broadcast build side: pack fixed-size-list
    columns to binary blobs and add uids — runs in map_batches tasks so
    the driver only concatenates Arrow tables."""
    cols = {
        "url": t.column("url"),
        "name": t.column("name"),
        "year": t.column("year").cast(pa.float64()),
        "uid": pa.array(
            page_uids(t.column("url").to_pylist(), uid_remap), pa.int64()
        ),
    }
    for name in ("embedding", "minhash"):
        col = t.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = col.type.list_size
        mat = col.flatten().to_numpy(zero_copy_only=False)
        if name == "embedding":
            # SQ8: unit-normalize rows then round(x*127) to int8 — cosine
            # is scale-invariant after the scorer's re-normalization, and
            # the per-component rounding error (<=0.5/127) moves cosine by
            # ~4e-3, far inside the edge-threshold margins. 256B -> 64B per
            # side cuts the scorer's DRAM gather traffic 4x (the measured
            # 32-CPU bottleneck).
            m2 = mat.astype(np.float32).reshape(t.num_rows, dim)
            nrm = np.linalg.norm(m2, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            mat = np.clip(np.rint(m2 / nrm * 127.0), -127, 127).astype(
                np.int8
            ).ravel()
        else:
            # byte-pack: the scorer only tests per-perm AGREEMENT, so the
            # low byte of each minhash value suffices (spurious agreement
            # adds (1-j)/256 bias — negligible). 512B -> 64B per side of
            # every pair, the largest single payload saving.
            mat = (mat & np.uint64(0xFF)).astype(np.uint8)
        cols[name] = pa.array(
            [mat[i * dim : (i + 1) * dim].tobytes() for i in range(t.num_rows)],
            pa.binary(),
        )
    # registered custom payload columns (registry.py) pass through as-is
    for name in t.schema.names:
        if name not in cols and name not in ("embedding", "minhash"):
            cols[name] = t.column(name)
    return pa.table(cols)


def _attach_payload_broadcast(
    pairs: ray.data.Dataset,
    features: ray.data.Dataset,
    cfg: PipelineConfig,
    restore_urls: bool = True,
    uid_remap: dict | None = None,
    extra_payload: list[str] | None = None,
) -> ray.data.Dataset:
    import ray as _ray

    extra = list(extra_payload or [])
    packed = features.select_columns(
        ["url"] + PAIR_PAYLOAD + extra
    ).map_batches(
        _pack_payload_batch,
        fn_kwargs={"uid_remap": uid_remap},
        batch_format="pyarrow",
    )
    tables = [
        t
        for t in packed.iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    if tables:
        side = pa.concat_tables(tables)
        uids = side.column("uid").to_numpy(zero_copy_only=False)
        index = dict(zip((int(u) for u in uids), range(len(uids))))
        payload = {
            "url": np.asarray(side.column("url").to_pylist(), dtype=object),
            "name": np.asarray(side.column("name").to_pylist(), dtype=object),
            "minhash": np.asarray(side.column("minhash").to_pylist(), dtype=object),
            "year": side.column("year").to_numpy(zero_copy_only=False),
            "embedding": np.asarray(
                side.column("embedding").to_pylist(), dtype=object
            ),
        }
        extra_types = {c: side.schema.field(c).type for c in extra}
        for c in extra:
            payload[c] = np.asarray(side.column(c).to_pylist(), dtype=object)
    else:
        index = {}
        payload = {
            "url": np.empty(0, dtype=object),
            "name": np.empty(0, dtype=object),
            "minhash": np.empty(0, dtype=object),
            "year": np.empty(0, dtype=np.float64),
            "embedding": np.empty(0, dtype=object),
        }
        extra_types = {c: pa.string() for c in extra}
        for c in extra:
            payload[c] = np.empty(0, dtype=object)
    ref = _ray.put((index, payload))

    def attach(t: pa.Table) -> pa.Table:
        idx, pl = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        lefts = t.column("left").to_numpy(zero_copy_only=False)
        rights = t.column("right").to_numpy(zero_copy_only=False)
        li = np.fromiter((idx[int(u)] for u in lefts), dtype=np.int64, count=len(lefts))
        ri = np.fromiter(
            (idx[int(u)] for u in rights), dtype=np.int64, count=len(rights)
        )
        # every extra input pair column passes through (e.g. the labeled
        # `match` column used by train_weights_from_labeled); left/right
        # restored to url strings on request, else kept as uids
        cols = {
            name: t.column(name)
            for name in t.schema.names
            if name not in ("left", "right")
        }
        if restore_urls:
            cols["left"] = pa.array(pl["url"][li], pa.string())
            cols["right"] = pa.array(pl["url"][ri], pa.string())
        else:
            cols["left"] = t.column("left")
            cols["right"] = t.column("right")
        for name, arr in pl.items():
            if name == "url":
                continue
            if name in extra_types:
                typ = extra_types[name]
            else:
                typ = pa.float64() if name == "year" else (
                    pa.binary() if name in ("embedding", "minhash") else pa.string()
                )
            cols[f"{name}_l"] = pa.array(list(arr[li]), typ)
            cols[f"{name}_r"] = pa.array(list(arr[ri]), typ)
        return pa.table(cols)

    return _pairs_to_uids(pairs, uid_remap).map_batches(
        attach, batch_format="pyarrow"
    )


def _attach_payload_join(
    pairs: ray.data.Dataset,
    features: ray.data.Dataset,
    cfg: PipelineConfig,
    num_partitions: int | None = None,
    restore_urls: bool = True,
    uid_remap: dict | None = None,
    extra_payload: list[str] | None = None,
) -> ray.data.Dataset:
    """Shuffle-join plan (build side too large to broadcast)."""
    extra = list(extra_payload or [])
    if num_partitions is None:
        from record_matching_ray.stages.util import shuffle_partitions

        num_partitions = shuffle_partitions()

    def pack_fixed_lists(t: pa.Table) -> pa.Table:
        for name in ("embedding", "minhash"):
            col = t.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mat = col.flatten().to_numpy(zero_copy_only=False)
            dim = col.type.list_size
            if name == "embedding":
                m2 = mat.astype(np.float32).reshape(t.num_rows, dim)
                nrm = np.linalg.norm(m2, axis=1, keepdims=True)
                nrm[nrm == 0] = 1.0
                mat = np.clip(np.rint(m2 / nrm * 127.0), -127, 127).astype(
                    np.int8
                ).ravel()  # SQ8, see broadcast pack
            else:
                mat = (mat & np.uint64(0xFF)).astype(np.uint8)  # see broadcast pack
            blobs = pa.array(
                [mat[i * dim : (i + 1) * dim].tobytes() for i in range(t.num_rows)],
                pa.binary(),
            )
            t = t.drop_columns([name]).append_column(name, blobs)
        return t

    def add_uid(t: pa.Table) -> pa.Table:
        return t.append_column(
            "uid",
            pa.array(
                page_uids(t.column("url").to_pylist(), uid_remap), pa.int64()
            ),
        )

    side = features.select_columns(
        ["url"] + PAIR_PAYLOAD + extra
    ).map_batches(
        pack_fixed_lists, batch_format="pyarrow"
    ).map_batches(add_uid, batch_format="pyarrow")
    # pairs come from a groupby; merge away its zero-column empty blocks
    # before they hit the Acero join (see stages/util.conform_schema)
    pairs = _pairs_to_uids(pairs, uid_remap).repartition(num_partitions)
    # Ray's join merges the key columns away; payload columns come through
    # unsuffixed (suffixes only apply on collision), so rename explicitly.
    left = pairs.join(
        side,
        join_type="inner",
        num_partitions=num_partitions,
        on=("left",),
        right_on=("uid",),
    ).rename_columns({c: f"{c}_l" for c in PAIR_PAYLOAD + extra + ["url"]})
    both = left.join(
        side,
        join_type="inner",
        num_partitions=num_partitions,
        on=("right",),
        right_on=("uid",),
    ).rename_columns({c: f"{c}_r" for c in PAIR_PAYLOAD + extra + ["url"]})

    def finalize(t: pa.Table) -> pa.Table:
        cols = {
            n: t.column(n)
            for n in t.schema.names
            if n not in ("left", "right", "url_l", "url_r")
        }
        if restore_urls:
            cols["left"] = t.column("url_l")
            cols["right"] = t.column("url_r")
        else:
            cols["left"] = t.column("left")
            cols["right"] = t.column("right")
        return pa.table(cols)

    return both.map_batches(finalize, batch_format="pyarrow")


def _percentile_from_size_counts(
    sizes: np.ndarray, n_blocks: np.ndarray, q: float
) -> float:
    """np.percentile(counts, q) (linear interpolation) computed from the
    (size -> n_blocks) count map — bit-identical to expanding the map to
    one entry per block, without ever holding O(blocks) values."""
    n = int(n_blocks.sum())
    if n == 0:
        return float("nan")
    pos = (n - 1) * (q / 100.0)
    lo_i, hi_i = int(np.floor(pos)), int(np.ceil(pos))
    cum = np.cumsum(n_blocks)  # cum[j] = # blocks with size <= sizes[j]
    lo_v = float(sizes[np.searchsorted(cum, lo_i + 1)])
    hi_v = float(sizes[np.searchsorted(cum, hi_i + 1)])
    return lo_v + (pos - lo_i) * (hi_v - lo_v)


def block_size_stats(
    features: ray.data.Dataset,
    cfg: PipelineConfig,
    top_k: int = 20,
    hot_hosts: set[str] | None = None,
) -> dict:
    """Observable skew diagnostics (the reference silently caps neighbor
    lists and merely LOGS lost matches, poc1:1556-1559 — here the skew is
    measured): block-size distribution over all emitted block keys, the
    top-k largest blocks, and how many blocks exceed the pair cap
    (i.e. would emit core+spokes with a nonzero overflow counter).

    Fully distributed: per-batch partial (block_key, count) -> one
    int-keyed groupby -> per-partition (size, n_blocks) COUNT-MAP
    partials. The driver merges count maps — O(distinct sizes), never one
    row per block key (at 10^12-page scale block keys are O(corpus); the
    distinct-size domain stays tiny). Percentiles/top-k are computed from
    the merged map, bit-identical to the per-block-row version."""
    blocks = features.map_batches(
        emit_block_keys,
        fn_kwargs={"cfg": cfg, "hot_hosts": hot_hosts or set()},
        batch_format="pyarrow",
    )

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["block_key"]), "block_key").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["block_key", "cnt"])

    totals = (
        blocks.map_batches(partial, batch_format="pyarrow")
        .groupby("block_key")
        .sum("cnt")
    )

    def size_count_map(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(cnt)" not in t.column_names:
            return pa.table(
                {"size": pa.array([], pa.int64()),
                 "n_blocks": pa.array([], pa.int64())}
            )
        c = t.column("sum(cnt)").to_numpy(zero_copy_only=False)
        sizes, nb = np.unique(c, return_counts=True)
        return pa.table(
            {"size": pa.array(sizes.astype(np.int64), pa.int64()),
             "n_blocks": pa.array(nb.astype(np.int64), pa.int64())}
        )

    parts = [
        t
        for t in totals.map_batches(
            size_count_map, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    if not parts:
        return {"blocks": 0}
    merged = pa.concat_tables(parts)
    all_sizes = merged.column("size").to_numpy(zero_copy_only=False)
    all_nb = merged.column("n_blocks").to_numpy(zero_copy_only=False)
    sizes, inv = np.unique(all_sizes, return_inverse=True)
    n_blocks = np.zeros(len(sizes), dtype=np.int64)
    np.add.at(n_blocks, inv, all_nb)

    m_cap = int((2 * cfg.max_pairs_per_block) ** 0.5) + 1
    over = sizes > m_cap
    top: list[int] = []
    for s, k in zip(sizes[::-1], n_blocks[::-1]):
        if len(top) >= top_k:
            break
        top.extend([int(s)] * min(int(k), top_k - len(top)))
    return {
        "blocks": int(n_blocks.sum()),
        "members_p50": int(_percentile_from_size_counts(sizes, n_blocks, 50)),
        "members_p99": int(_percentile_from_size_counts(sizes, n_blocks, 99)),
        "members_max": int(sizes[-1]),
        "top_blocks": top,
        "blocks_over_pair_cap": int(n_blocks[over].sum()),
        "capped_pairs_lost_upper_bound": int(
            (
                n_blocks[over]
                * (sizes[over] * (sizes[over] - 1) // 2 - cfg.max_pairs_per_block)
            ).sum()
        ),
    }


def blocking_cost_stats(
    ds: ray.data.Dataset, key_col: str
) -> ray.data.Dataset:
    """Blocking-key cost/skew diagnostics — the numbers that predict
    whether a candidate key is usable BEFORE generating any pairs:
    per-block sizes s_b via the partial-count pattern, then one row
    (n_blocks, max_block, expected_pairs = sum s_b(s_b-1)/2 — the exact
    O(|B|^2) candidate volume the key implies — and the Shannon entropy
    (nats, round-6) of the block-size distribution: low entropy = a few
    head blocks dominate = salt or cap before pairing; SURVEY §7.5
    "skew" hard part, reference cautionary tale poc1:1556-1559).

    Shuffle: one groupby over per-batch count partials; the per-block
    relation reduces to four scalars by a second partial pass — block
    rows never reach the driver."""
    from record_matching_ray.stages.util import conformed, round6_sql

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select([key_col]), [key_col]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([key_col, "c"])

    sizes = (
        ds.select_columns([key_col])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby(key_col)
        .sum("c")
    )

    def fold_partial(t: pa.Table) -> pa.Table:
        s = t.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_blocks": pa.array([len(s)], pa.int64()),
                "max_block": pa.array(
                    [int(s.max()) if len(s) else 0], pa.int64()
                ),
                "pairs": pa.array(
                    [int((s.astype(object) * (s - 1) // 2).sum())], pa.int64()
                ),
                "n_rows": pa.array([int(s.sum())], pa.int64()),
                # entropy partial: sum s*ln(s) folds exactly across
                # batches; H = ln(N) - sum(s ln s)/N derives at the end
                "slns": pa.array(
                    [float((s * np.log(np.maximum(s, 1))).sum())],
                    pa.float64(),
                ),
            }
        )

    parts = sizes.map_batches(fold_partial, batch_format="pyarrow")
    n_blocks = parts.sum("n_blocks")
    max_block = parts.max("max_block")
    pairs = parts.sum("pairs")
    n_rows = parts.sum("n_rows")
    slns = parts.sum("slns")
    ent = 0.0
    if n_rows:
        ent = float(np.log(n_rows) - slns / n_rows)
    schema = pa.schema(
        [
            ("n_blocks", pa.int64()),
            ("max_block", pa.int64()),
            ("expected_pairs", pa.int64()),
            ("entropy", pa.float64()),
        ]
    )
    return conformed(
        ray.data.from_arrow(
            pa.table(
                {
                    "n_blocks": pa.array([int(n_blocks or 0)], pa.int64()),
                    "max_block": pa.array([int(max_block or 0)], pa.int64()),
                    "expected_pairs": pa.array([int(pairs or 0)], pa.int64()),
                    "entropy": pa.array(
                        round6_sql(np.array([ent])), pa.float64()
                    ),
                }
            )
        ),
        schema,
    )
