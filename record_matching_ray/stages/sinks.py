"""Small-artifact sinks: weights Parquet, metrics JSON, GraphML export.

Reference analogs:
- weights table — 1 row, ``(intercept, <float32 col per feature>)``
  (record_matching/context.py:62-78, written at main.py:485-486). Round-
  trips through Parquet so a scorer run can start from a prior model.
- metrics/model JSON (claude_poc_v2/run-vector-enhanced-resolution.py:
  237-303, poc2:2597-2650) — plain ``json.dump`` driver artifacts.
- GraphML match-graph export with component stats
  (claude_poc/entity-resolution_v4.py:1674-1752) — a diagnostic sink for
  SMALL graphs only: the edge Dataset is size-gated before collection
  (at 100 TB the match graph is itself big data; export a filtered
  neighborhood, not the world).
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape as _xml_escape


def escape(s: str) -> str:
    # saxutils.escape does NOT escape double quotes, but every value here
    # sits inside a double-quoted XML attribute (ADVICE r1)
    return _xml_escape(s, {'"': "&quot;"})

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from record_matching_ray.config import PipelineConfig


def write_weights(
    path: str, intercept: float, weights: np.ndarray, cfg: PipelineConfig
) -> None:
    """1-row Parquet ``(intercept, f_*…)`` in pinned feature order
    (context.py:62-78; order contract main.py:452)."""
    cols: dict[str, pa.Array] = {
        "intercept": pa.array([float(intercept)], pa.float32())
    }
    for name, w in zip(cfg.feature_names(), weights):
        cols[name] = pa.array([float(w)], pa.float32())
    pq.write_table(pa.table(cols), path)


def read_weights(path: str, cfg: PipelineConfig) -> tuple[float, np.ndarray]:
    t = pq.read_table(path)
    intercept = t.column("intercept")[0].as_py()
    w = np.array(
        [t.column(name)[0].as_py() for name in cfg.feature_names()],
        dtype=np.float64,
    )
    return float(intercept), w


def write_metrics_json(path: str, metrics: dict) -> None:
    with open(path, "w") as f:
        json.dump(metrics, f, indent=2, sort_keys=True, default=float)


def write_graphml(
    edges: ray.data.Dataset,
    path: str,
    max_edges: int = 1_000_000,
    left_col: str = "left",
    right_col: str = "right",
    weight_col: str | None = "score",
) -> dict:
    """Edge Dataset -> GraphML file (poc1:1674-1752 semantics: node per
    id, weighted edge per pair, component stats returned). Size-gated:
    raises if the edge count exceeds ``max_edges`` — filter upstream
    instead of silently exporting a partial graph."""
    n_edges = edges.count()
    if n_edges > max_edges:
        raise ValueError(
            f"graph too large to export ({n_edges} edges > {max_edges}); "
            "filter the edge Dataset first"
        )
    cols = [left_col, right_col] + ([weight_col] if weight_col else [])
    rows = edges.select_columns(cols).take_all()
    nodes: dict[object, int] = {}
    for r in rows:
        for key in (r[left_col], r[right_col]):
            if key not in nodes:
                nodes[key] = len(nodes)
    # component stats via driver union-find (small by the gate)
    parent = list(range(len(nodes)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        a, b = find(nodes[r[left_col]]), find(nodes[r[right_col]])
        if a != b:
            parent[max(a, b)] = min(a, b)
    comp_sizes: dict[int, int] = {}
    for i in range(len(parent)):
        comp_sizes[find(i)] = comp_sizes.get(find(i), 0) + 1

    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
        if weight_col:
            f.write(
                '  <key id="w" for="edge" attr.name="weight" attr.type="double"/>\n'
            )
        f.write('  <graph edgedefault="undirected">\n')
        for key in nodes:
            f.write(f'    <node id="{escape(str(key))}"/>\n')
        for r in rows:
            f.write(
                f'    <edge source="{escape(str(r[left_col]))}" '
                f'target="{escape(str(r[right_col]))}"'
            )
            if weight_col:
                f.write(f'><data key="w">{float(r[weight_col])}</data></edge>\n')
            else:
                f.write("/>\n")
        f.write("  </graph>\n</graphml>\n")
    sizes = sorted(comp_sizes.values(), reverse=True)
    return {
        "nodes": len(nodes),
        "edges": n_edges,
        "components": len(sizes),
        "max_component": sizes[0] if sizes else 0,
    }
