"""Canonical-form field rules — poc2:2038-2206 parity on fixture clusters."""

import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.canonicalize import canonicalize


def _run(urls, cids, names, years, langs):
    clusters = rd.from_arrow(pa.table({"url": urls, "cluster_id": cids}))
    feats = rd.from_arrow(
        pa.table(
            {
                "url": urls,
                "name": names,
                "year": pa.array(years, pa.float64()),
                "lang": langs,
            }
        )
    )
    return {r["cluster_id"]: r for r in canonicalize(clusters, feats).take_all()}


def test_canonical_name_prefers_year_bearing_record():
    # poc2:2106-2135: a record WITH dates beats a more frequent name
    # without them; the chosen record donates the canonical year
    out = _run(
        urls=["u0", "u1", "u2"],
        cids=["c"] * 3,
        names=["plain", "plain", "dated"],
        years=[None, None, 1900.0],
        langs=["en", "en", "en"],
    )["c"]
    assert out["canonical_name"] == "dated"
    assert out["year"] == 1900.0


def test_canonical_name_completeness_then_min_url_tiebreak():
    # no years anywhere -> most complete member; u0/u1 tie on
    # completeness -> url order keeps the first (u0)
    out = _run(
        urls=["u0", "u1", "u2"],
        cids=["c"] * 3,
        names=["a-name", "b-name", ""],
        years=[None, None, None],
        langs=["en", "en", ""],
    )["c"]
    assert out["canonical_name"] == "a-name"
    assert out["year"] is None
    assert out["completeness"] == round((2 + 2 + 0) / 3, 2)


def test_frequency_fields_min_count_rule_large_cluster():
    # poc2:2163-2171: cluster of 6 (> 5) keeps only values seen >= 2
    out = _run(
        urls=[f"u{i}" for i in range(6)],
        cids=["c"] * 6,
        names=["maj", "maj", "maj", "min", "min", "once"],
        years=[1900.0] * 6,
        langs=["en", "en", "en", "en", "de", "de"],
    )["c"]
    assert out["names"] == "maj; min"  # 'once' filtered (count 1)
    assert out["langs"] == "en; de"
    assert out["size"] == 6


def test_frequency_fields_small_cluster_keeps_singletons():
    # cluster of <= 5 records: min_count 1, singletons survive
    out = _run(
        urls=["u0", "u1"],
        cids=["c"] * 2,
        names=["x", "y"],
        years=[None, None],
        langs=["en", "de"],
    )["c"]
    assert out["names"] == "x; y"
    assert out["langs"] == "en; de"


def test_sample_urls_first_three_in_url_order():
    out = _run(
        urls=["u3", "u1", "u0", "u2"],
        cids=["c"] * 4,
        names=["n"] * 4,
        years=[None] * 4,
        langs=["en"] * 4,
    )["c"]
    assert out["sample_urls"] == "u0; u1; u2"
    assert out["canonical_url"] == "u0"
