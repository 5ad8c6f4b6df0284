"""Deequ-style validation metrics (stages/validate.py)."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from record_matching_ray.stages.validate import Rule, check_rules


def _table():
    return rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4, 4], pa.int64()),
                "name": pa.array(["a", "b", None, "b", "abc"], pa.string()),
                "score": pa.array([0.5, -1.0, 2.0, 0.0, None], pa.float64()),
            }
        )
    )


def test_rule_metrics():
    out = (
        check_rules(
            _table(),
            [
                Rule("completeness", "name"),
                Rule("uniqueness", "id"),
                Rule("uniqueness", "name", name="name_uniqueness"),
                Rule(
                    "compliance",
                    "score",
                    name="nonneg",
                    predicate=lambda c: pc.greater_equal(c, 0.0),
                ),
                Rule("accepted_values", "name", values=("a", "b")),
                Rule("pattern", "name", regex="^a"),
            ],
        )
        .to_pandas()
        .set_index("rule")["value"]
    )
    assert out["completeness"] == 0.8  # 4/5 non-null
    assert out["uniqueness"] == 0.8  # distinct {1,2,3,4} / 5
    assert out["name_uniqueness"] == 0.6  # {a,b,abc} / 5, null excluded
    assert out["nonneg"] == 0.6  # 0.5, 2.0, 0.0 pass; -1 and null fail
    assert out["accepted_values"] == 0.6  # a, b, b
    assert out["pattern"] == 0.4  # "a", "abc"


def test_empty_table_rates_zero():
    empty = rd.from_arrow(
        pa.table({"id": pa.array([], pa.int64()), "name": pa.array([], pa.string())})
    )
    out = (
        check_rules(empty, [Rule("completeness", "name"), Rule("uniqueness", "id")])
        .to_pandas()
        .set_index("rule")["value"]
    )
    assert out["completeness"] == 0.0
    assert out["uniqueness"] == 0.0
