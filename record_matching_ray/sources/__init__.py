from record_matching_ray.sources.tables import (  # noqa: F401
    PAGES_SCHEMA,
    read_labeled_pairs,
    read_pages,
    read_table,
    write_stage_parquet,
)
