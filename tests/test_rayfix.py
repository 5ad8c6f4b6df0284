"""Regression tests for the hash-shuffle join schema-broadcast shim.

Round-1 red row: ngram_jaccard_docs crashed at num_cpus=32/sf0.01 because
Ray 2.49 drops the join's schema broadcast when the first-shuffled block is
empty (rayfix.py). These tests reproduce the raw trigger — a join input
whose blocks are overwhelmingly empty, fanned over more partitions than
rows — which fails with ArrowInvalid without the shim."""

import pyarrow as pa
import pytest

import ray
import ray.data

import record_matching_ray  # noqa: F401  (installs the shim on import)
from record_matching_ray import rayfix


def test_shim_installed():
    assert rayfix.install() is True
    from ray.data._internal.execution.operators import hash_shuffle as hs

    assert getattr(hs._shuffle_block._function, "_rmray_shim", False)


def _empty_heavy_join(num_partitions: int):
    t_empty = pa.table(
        {"left": pa.array([], pa.int64()), "right": pa.array([], pa.int64())}
    )
    t_data = pa.table(
        {
            "left": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "right": pa.array([10, 20, 30, 40, 50], pa.int64()),
        }
    )
    # empty blocks FIRST so the schema-broadcast block is empty
    cand = ray.data.from_arrow([t_empty] * 15 + [t_data])
    sides = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(100), pa.int64()),
                "payload": pa.array([f"p{i}" for i in range(100)], pa.string()),
            }
        )
    )
    out = cand.join(
        sides,
        join_type="inner",
        num_partitions=num_partitions,
        on=("left",),
        right_on=("doc_id",),
    )
    return out.to_pandas()


@pytest.mark.parametrize("num_partitions", [4, 16])
def test_join_with_empty_first_blocks(num_partitions):
    df = _empty_heavy_join(num_partitions)
    assert len(df) == 5
    assert sorted(df["left"]) == [1, 2, 3, 4, 5]


def test_join_both_sides_empty_blocks():
    t_empty = pa.table({"k": pa.array([], pa.int64())})
    t_data = pa.table({"k": pa.array([7, 8], pa.int64())})
    a = ray.data.from_arrow([t_empty] * 7 + [t_data])
    b = ray.data.from_arrow([t_empty] * 7 + [t_data])
    out = a.join(b, join_type="inner", num_partitions=8, on=("k",))
    assert out.count() == 2


def test_compact_nonempty_roundtrip():
    from record_matching_ray.stages.util import compact_nonempty

    t_empty = pa.table({"x": pa.array([], pa.int64())})
    t_data = pa.table({"x": pa.array(list(range(10)), pa.int64())})
    ds = ray.data.from_arrow([t_empty] * 5 + [t_data])
    out, n = compact_nonempty(ds, max_blocks=4)
    assert n == 10
    m = out.materialize()
    sizes = [b.num_rows for b in ray.get(m.get_internal_block_refs())]
    assert all(s > 0 for s in sizes)
    assert sum(sizes) == 10

    empty, n0 = compact_nonempty(ray.data.from_arrow([t_empty]), max_blocks=4)
    assert n0 == 0 and empty.count() == 0
