"""S4 clustering: distributed label propagation must equal the driver
union-find oracle (reference semantics: scipy DisjointSet,
record_matching/main.py:629-651)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.clustering import (
    connected_components,
    connected_components_driver,
    contract_edges,
)


def _edges_ds(pairs):
    return rd.from_arrow(
        pa.table(
            {"left": [p[0] for p in pairs], "right": [p[1] for p in pairs]}
        )
    )


def test_cc_matches_driver_on_random_graph():
    rng = np.random.RandomState(1)
    nodes = [f"n{i:04d}" for i in range(300)]
    pairs = []
    for _ in range(250):
        a, b = rng.randint(0, 300, 2)
        if a != b:
            pairs.append((min(nodes[a], nodes[b]), max(nodes[a], nodes[b])))
    want = connected_components_driver(pairs, nodes)
    # hybrid fast path (contracted set under the driver threshold)
    got = {
        r["url"]: r["cluster_id"]
        for r in connected_components(
            _edges_ds(pairs), rd.from_arrow(pa.table({"url": nodes}))
        ).take_all()
    }
    assert got == want
    # distributed label-propagation path (threshold forced to 0) must
    # produce byte-identical clusters — the scale path stays tested
    got_dist = {
        r["url"]: r["cluster_id"]
        for r in connected_components(
            _edges_ds(pairs),
            rd.from_arrow(pa.table({"url": nodes})),
            driver_max_edges=0,
        ).take_all()
    }
    assert got_dist == want


def test_cc_chain_converges():
    # long chain through the DISTRIBUTED path (worst case for label
    # propagation round count; pre-contraction + label links bound it)
    chain = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(120)]
    rng = np.random.RandomState(2)
    rng.shuffle(chain)
    out = connected_components(
        _edges_ds(chain).repartition(6), driver_max_edges=0
    ).take_all()
    assert set(r["cluster_id"] for r in out) == {"c000"}
    assert len(out) == 121


def test_cc_isolated_nodes_are_singletons():
    out = connected_components(
        _edges_ds([("a", "b")]),
        rd.from_arrow(pa.table({"url": ["a", "b", "z1", "z2"]})),
    ).take_all()
    m = {r["url"]: r["cluster_id"] for r in out}
    assert m == {"a": "a", "b": "a", "z1": "z1", "z2": "z2"}


def test_contract_edges_preserves_connectivity():
    # clique of 20 -> star
    clique = [
        (f"k{i:02d}", f"k{j:02d}") for i in range(20) for j in range(i + 1, 20)
    ]
    contracted = contract_edges(_edges_ds(clique)).take_all()
    assert len(contracted) < len(clique)
    comp = connected_components_driver(
        [(r["left"], r["right"]) for r in contracted]
    )
    assert len(set(comp.values())) == 1
    assert len(comp) == 20
