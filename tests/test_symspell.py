"""Deletion-neighborhood (FastSS/SymSpell) edit-distance join tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from record_matching_ray.functions.strsim import levenshtein, levenshtein_vec
from record_matching_ray.stages.symspell import _deletion_variants, deletion_join


def test_deletion_variants_enumerate_all_positions():
    rows, variants = _deletion_variants(["abc", "x", ""])
    got = sorted(zip(rows.tolist(), variants.tolist()))
    assert got == [(0, "ab"), (0, "ac"), (0, "bc"), (1, "")]


def test_levenshtein_vec_matches_scalar():
    left = ["kitten", "flaw", "abc", "", "same"]
    right = ["sitting", "lawn", "abc", "xy", "same"]
    d = levenshtein_vec(left, right)
    assert d.tolist() == [levenshtein(a, b) for a, b in zip(left, right)]


def _join_pairs(rows):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "name": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    out = deletion_join(ds, id_col="id", name_col="name").to_pandas()
    return sorted(zip(out["left"], out["right"], out["dist"]))


def test_deletion_join_finds_all_edit1_pair_kinds():
    rows = [
        (1, "martha"),
        (2, "marhta"),   # transposition = 2 substitutions -> dist 2, NOT matched
        (3, "marta"),    # deletion of 'h' -> dist 1 vs martha
        (4, "martha"),   # identical -> dist 0
        (5, "xmartha"),  # insertion at front -> dist 1 vs martha
        (6, "zzz"),      # unrelated
    ]
    got = _join_pairs(rows)
    # brute-force reference
    want = sorted(
        (a, b, levenshtein(na, nb))
        for (a, na) in rows
        for (b, nb) in rows
        if a < b and levenshtein(na, nb) <= 1
    )
    assert got == want
    assert (1, 3, 1) in got and (1, 4, 0) in got and (1, 5, 1) in got
    assert (1, 2, 1) not in got  # transposition is distance 2


def test_deletion_join_overflow_raises_by_default():
    """ADVICE r3 item 1: a capped bucket breaks the exact-join contract,
    so the default policy fails loudly (like the broadcast gates)."""
    rows = [(i, "samekey") for i in range(40)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "name": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    with pytest.raises(Exception, match="max_bucket"):
        deletion_join(ds, id_col="id", name_col="name", max_bucket=10).materialize()


def test_deletion_join_observable_cap_count_mode():
    """on_overflow='count': capped pairs survive, and ONE left=-1 sentinel
    row totals every dropped candidate pair — the count survives the
    int-keyed pair fold instead of being select_columns'd away."""
    rows = [(i, "samekey") for i in range(40)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "name": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    out = deletion_join(
        ds, id_col="id", name_col="name", max_bucket=10, on_overflow="count"
    ).to_pandas()
    sent = out[out["left"] < 0]
    real = out[out["left"] >= 0]
    # every bucket keeps its 10 smallest ids -> C(10,2) distinct pairs
    assert len(real) == 45
    assert (real["dist"] == 0).all()
    assert (real["overflow"] == 0).all()
    # 8 buckets ('samekey' + its 7 deletion variants), each 40 members
    # capped to 10: 8 * (C(40,2) - C(10,2)) dropped candidates
    assert len(sent) == 1
    assert sent.iloc[0]["overflow"] == 8 * (780 - 45)
