"""record_matching_ray — a Ray-Data-native record-linkage / web-dedup engine.

Built from scratch with the capabilities of yale-datachemist/record_matching
(reference snapshot at /root/reference, read-only), re-expressed as
ray.data.Dataset pipelines: blocking via map_batches over zero-copy Arrow
batches (canonical host + MinHash-LSH band keys), pairwise scoring in actor
pools, transitive clustering via distributed label propagation, with
per-stage partitioned-Parquet checkpoints + manifests.

Reference capability map: see SURVEY.md §2 (operator inventory) and §7
(build plan). Nothing in here is ported code — the reference engine is
DataFusion SQL + single-GPU torch (record_matching/main.py), replaced here
by Ray Data streaming execution.
"""

from record_matching_ray.config import PipelineConfig
from record_matching_ray import rayfix as _rayfix

_rayfix.install()

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
