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

# Columns carried to the scorer for each pair side.
PAIR_PAYLOAD = ["name", "token_sig", "year", "embedding"]


_HASHER_CACHE: dict[tuple[int, int], MinHasher] = {}


def _hasher(num_perm: int, seed: int = 7) -> MinHasher:
    key = (num_perm, seed)
    h = _HASHER_CACHE.get(key)
    if h is None:
        h = _HASHER_CACHE[key] = MinHasher(num_perm, seed)
    return h


def emit_block_keys(
    batch: pa.Table, cfg: PipelineConfig, hot_hosts: set[str] | None = None
) -> pa.Table:
    """map_batches fn: features -> long (block_key: uint64, url) rows.

    Emits the host block key plus `lsh_bands` band keys per page. Hot-host
    salting: hosts in the (small, task-broadcast) hot_hosts set — estimated
    frequency above cfg.hot_block_limit — are pre-salted into cfg.n_salts
    sub-blocks by a secondary url hash. Stateless task: the permutation bank
    is a process-level cached constant.
    """
    hot_hosts = hot_hosts or set()
    n = batch.num_rows
    urls = batch.column("url").to_pylist()
    out_keys: list[np.ndarray] = []
    out_idx: list[np.ndarray] = []

    if cfg.use_host_blocks:
        hosts = batch.column("host").to_pylist()
        url_salt = (
            mix64(hash_strings(urls)) % _U64(cfg.n_salts)
            if hot_hosts
            else np.zeros(n, dtype=_U64)
        )
        host_hash = mix64(hash_strings(hosts))
        is_hot = np.fromiter((h in hot_hosts for h in hosts), dtype=bool, count=n)
        salted = np.where(is_hot, host_hash * _U64(31) + url_salt + _U64(1), host_hash)
        keep = np.fromiter((h != "" for h in hosts), dtype=bool, count=n)
        out_keys.append(salted[keep])
        out_idx.append(np.nonzero(keep)[0])

    if cfg.use_lsh_blocks:
        sigs = minhash_matrix(batch.column("minhash"), cfg.num_perm)
        bands = _hasher(cfg.num_perm).band_keys(sigs, cfg.lsh_bands)  # (n, bands)
        out_keys.append(bands.ravel())
        out_idx.append(np.repeat(np.arange(n, dtype=np.int64), cfg.lsh_bands))

    keys = np.concatenate(out_keys) if out_keys else np.empty(0, dtype=_U64)
    idx = np.concatenate(out_idx) if out_idx else np.empty(0, dtype=np.int64)
    url_arr = pa.array(urls, pa.string()).take(pa.array(idx, pa.int64()))
    return pa.table({"block_key": pa.array(keys, pa.uint64()), "url": url_arr})


def _emit_pairs_in_block(
    group: pa.Table, max_pairs: int
) -> pa.Table:
    """All (min,max) url pairs within one block, capped at max_pairs.

    The cap is deterministic (urls sorted first) and the number of pairs
    dropped is reported in the `overflow` column (counter, same value on
    every emitted row of the block)."""
    urls = np.array(sorted(set(group.column("url").to_pylist())), dtype=object)
    m = len(urls)
    total = m * (m - 1) // 2
    if m < 2:
        return pa.table(
            {
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
                "overflow": pa.array([], pa.int64()),
            }
        )
    ii, jj = np.triu_indices(m, k=1)
    if total > max_pairs:
        ii, jj = ii[:max_pairs], jj[:max_pairs]
    overflow = total - len(ii)
    return pa.table(
        {
            "left": pa.array(urls[ii], pa.string()),
            "right": pa.array(urls[jj], pa.string()),
            "overflow": pa.array(
                np.full(len(ii), overflow, dtype=np.int64), pa.int64()
            ),
        }
    )


def generate_candidate_pairs(
    features: ray.data.Dataset, cfg: PipelineConfig, hot_hosts: list[str] | None = None
) -> ray.data.Dataset:
    """features -> deduped candidate pairs (left, right).

    Shuffle #1: groupby(block_key) — key = host | LSH band (salted).
    Shuffle #2: groupby(left, right) — pair canonicalization/dedup
    (reference: tuple(sorted([a,b])) sets, poc1:345-349).
    """
    blocks = features.map_batches(
        emit_block_keys,
        fn_kwargs={"cfg": cfg, "hot_hosts": set(hot_hosts or [])},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )
    pairs = blocks.groupby("block_key").map_groups(
        lambda g: _emit_pairs_in_block(g, cfg.max_pairs_per_block),
        batch_format="pyarrow",
    )
    # distinct via the native (vectorized) count aggregate — NOT
    # map_groups(head 1), which would pay a Python call per pair
    from record_matching_ray.stages.util import conformed

    deduped = (
        pairs.select_columns(["left", "right"])
        .groupby(["left", "right"])
        .count()
    )
    schema = pa.schema([("left", pa.string()), ("right", pa.string())])
    return conformed(deduped, schema)


def compute_hot_hosts(features: ray.data.Dataset, cfg: PipelineConfig) -> list[str]:
    """Cheap count pass: hosts with > hot_block_limit pages (the 'head
    domains' of the north rule). Partial counts per batch then a small
    groupby — the shuffled data is (host, partial_count), not pages."""
    def partial_counts(batch: pa.Table) -> pa.Table:
        counts = pa.TableGroupBy(batch.select(["host"]), "host").aggregate(
            [([], "count_all")]
        )
        return counts.rename_columns(["host", "cnt"])

    partials = features.map_batches(partial_counts, batch_format="pyarrow")
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
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Hash-shuffle join pairs with both sides' feature payloads.

    Reference analog: the double join of candidates x templated x vectors
    (record_matching/main.py:366-392). Features are kept in exactly one
    copy until after pair dedup, then joined — cheaper than carrying wide
    payloads through the block-key explosion.

    The embedding column is packed to a binary blob first: Acero's hash
    join (Ray's per-partition join kernel) rejects fixed_size_list payload
    columns; float32-bytes round-trip losslessly via np.frombuffer in the
    scorer."""

    def pack_embedding(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
        dim = col.type.list_size
        blobs = pa.array(
            [mat[i * dim : (i + 1) * dim].tobytes() for i in range(t.num_rows)],
            pa.binary(),
        )
        return t.drop_columns(["embedding"]).append_column("embedding", blobs)

    side = features.select_columns(["url"] + PAIR_PAYLOAD).map_batches(
        pack_embedding, batch_format="pyarrow"
    )
    # pairs come from a groupby; merge away its zero-column empty blocks
    # before they hit the Acero join (see stages/util.conform_schema)
    pairs = pairs.repartition(num_partitions)
    # Ray's join merges the key columns away; payload columns come through
    # unsuffixed (suffixes only apply on collision), so rename explicitly.
    left = pairs.join(
        side,
        join_type="inner",
        num_partitions=num_partitions,
        on=("left",),
        right_on=("url",),
    ).rename_columns({c: f"{c}_l" for c in PAIR_PAYLOAD})
    both = left.join(
        side,
        join_type="inner",
        num_partitions=num_partitions,
        on=("right",),
        right_on=("url",),
    ).rename_columns({c: f"{c}_r" for c in PAIR_PAYLOAD})
    return both
