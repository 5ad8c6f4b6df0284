"""Workaround for a Ray 2.49 hash-shuffle join schema-broadcast bug.

``ray.data``'s hash-shuffle join disseminates each input's schema to every
aggregator exactly once, piggybacked on the FIRST block shuffled per input
(``send_empty_blocks=True``). But ``_shuffle_block``
(ray/data/_internal/execution/operators/hash_shuffle.py:223) early-returns
for zero-row blocks BEFORE that fan-out — contradicting its own docstring
("If set to true, empty blocks will NOT be filtered and still be fanned out
... to distribute schemas") — while the driver still marks the schema as
broadcast. Any join whose first-shuffled block happens to be empty (common
for inputs produced by a groupby at high parallelism: a 25-row candidate
set over 16+ reduce partitions has mostly-empty blocks) then finalizes
row-less partitions as ZERO-COLUMN tables, and Acero fails with
``ArrowInvalid: No match ... for key field FieldRef.Name(<key>)``.

This was the one red CORRECTNESS row in round 1 (``ngram_jaccard_docs`` at
``num_cpus=32`` / sf0.01) and latently threatens every ``Dataset.join``
downstream of a groupby. The shim below restores the documented behavior:
when the schema-broadcast block is empty, fan an empty-but-schema'd shard
out to every aggregator, then return. Non-empty blocks delegate to the
original function untouched. Version-gated: installs only if the private
surface it patches looks exactly as expected, otherwise no-ops (callers
must then rely on the compact-before-join guards, e.g.
``stages/util.compact_nonempty``).
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

_INSTALLED = False


def install() -> bool:
    """Install the shim (idempotent). Returns True if active.
    RMRAY_NO_RAYFIX=1 skips installation (debugging escape hatch)."""
    global _INSTALLED
    import os

    if os.environ.get("RMRAY_NO_RAYFIX"):
        return False
    if _INSTALLED:
        return True
    try:
        import ray
        from ray.data._internal.execution.operators import hash_shuffle as _hs
        from ray.data._internal.arrow_block import ArrowBlockAccessor  # noqa: F401

        orig_remote = _hs._shuffle_block
        orig_fn = getattr(orig_remote, "_function", None)
        if orig_fn is None or not callable(orig_fn):
            return False
        if getattr(orig_fn, "_rmray_shim", False):  # already ours
            _INSTALLED = True
            return True
        # sanity-check the private surface we rely on
        import inspect

        params = list(inspect.signature(orig_fn).parameters)
        expected = [
            "block",
            "input_index",
            "key_columns",
            "pool",
            "block_transformer",
            "send_empty_blocks",
            "override_partition_id",
        ]
        if params != expected:
            logger.warning("rayfix: _shuffle_block signature changed; shim not installed")
            return False

        from ray.data._internal.execution.operators.hash_shuffle import (
            _create_empty_table,
        )
        from ray.data.block import BlockAccessor, BlockExecStats, BlockType
        from ray.data._internal.table_block import TableBlockAccessor

        def _shuffle_block_fixed(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=None,
            send_empty_blocks=False,
            override_partition_id=None,
        ):
            stats = BlockExecStats.builder()
            if send_empty_blocks and getattr(block, "num_rows", -1) == 0:
                # The schema-broadcast block is empty: upstream would drop the
                # broadcast entirely. Fan an empty shard (with schema) out to
                # every aggregator so row-less join partitions still finalize
                # with the correct columns.
                b = block_transformer(block) if block_transformer is not None else block
                b = TableBlockAccessor.try_convert_block_type(
                    b, block_type=BlockType.ARROW
                )
                empty_shard = _create_empty_table(b.schema)
                pending = []
                for pid in range(pool.num_partitions):
                    agg = pool.get_aggregator_for_partition(pid)
                    ref = ray.put(empty_shard)
                    pending.append(agg.submit.remote(input_index, pid, ref))
                while pending:
                    _, pending = ray.wait(
                        pending, num_returns=len(pending), timeout=1
                    )
                meta = BlockAccessor.for_block(block).get_metadata(
                    exec_stats=stats.build()
                )
                return (meta, {})
            return orig_fn(
                block,
                input_index,
                key_columns,
                pool,
                block_transformer=block_transformer,
                send_empty_blocks=send_empty_blocks,
                override_partition_id=override_partition_id,
            )

        _shuffle_block_fixed._rmray_shim = True
        _hs._shuffle_block = ray.remote(_shuffle_block_fixed)
        _INSTALLED = True
        return True
    except Exception as exc:  # pragma: no cover - defensive
        logger.warning("rayfix: shim not installed: %s", exc)
        return False
