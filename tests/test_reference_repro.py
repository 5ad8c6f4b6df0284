"""Reference-workload reproduction gate (VERDICT r4 missing #1).

The bibliographic adapter (sources/bibliographic.py) reconstructs the
reference's own corpus from its shipped resolved_entities.csv (2,354
entity mentions, 9 source fields, final cluster per mention) and runs
the standard ER chain over it. The gate: pairwise F1 >= 0.96 on the
same-blocking-key labeled pairs vs the reference's resolved clusters —
the north rule's "matching the reference's entity clusters at the same
blocking key" criterion, on the reference's own data.

Context for the secondary numbers: the reference's FINAL pass contains
documented artifacts — per-record singleton over-splits
(disambiguation_details.txt: identical books in separate clusters) and
first-name mega-blobs (cluster 1: 398 mentions spanning "bassett
leslie", "buchan john", "butler samuel", ...), so exact-ARI agreement
with it is bounded by its own noise; the pre-disambiguation name-pass
(temp_cluster) is the cleaner target and is asserted >= 0.8.
"""

import os

import pytest

CSV = "/root/reference/claude_poc_v2/vector_results/resolved_entities.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CSV), reason="reference snapshot not present"
)


@pytest.fixture(scope="module")
def repro(ray_session):
    from record_matching_ray.sources.bibliographic import run_biblio_er

    return run_biblio_er()


def test_reference_repro_f1_gate(repro):
    m = repro["metrics"]
    assert m.f1 >= 0.96, (m.f1, m.precision, m.recall)
    assert m.recall >= 0.99, m.recall
    assert m.precision >= 0.92, m.precision


def test_reference_repro_name_pass_agreement(repro):
    assert repro["ari_name_pass"] >= 0.8, repro["ari_name_pass"]
    # cluster count lands in the plausible band between the name-pass
    # (104 names) and the final pass (316, incl. singleton over-splits)
    assert 80 <= repro["n_clusters"] <= 400, repro["n_clusters"]


def test_reference_repro_is_deterministic(repro):
    from record_matching_ray.sources.bibliographic import run_biblio_er

    again = run_biblio_er()
    assert again["metrics"].f1 == repro["metrics"].f1
    assert again["n_clusters"] == repro["n_clusters"]
    assert again["tau"] == repro["tau"]


def test_adapter_renders_reference_template_shape(ray_session):
    """The record->fields adapter reproduces the reference's labeled
    composite rendering (main.py:40-53): 'Label: value' lines, person
    first, absent fields omitted."""
    import pyarrow as pa

    from record_matching_ray.sources.bibliographic import (
        load_resolved_entities,
        render_biblio_pages,
    )

    tbl = load_resolved_entities(CSV)
    pages = render_biblio_pages(tbl.slice(0, 50))
    assert pages.num_rows == 50
    html = pages.column("html")[0].as_py().decode()
    assert html.startswith("<title>")
    assert "Contributor: " in html
    urls = pages.column("url").to_pylist()
    assert len(set(urls)) == 50  # unique per mention
    assert all(u.startswith("https://") for u in urls)
