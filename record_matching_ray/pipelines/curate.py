"""End-to-end corpus curation: the composite every LLM training-data
pipeline runs before export — quality filter, then exact dedup, then
benchmark decontamination — expressed as one streaming Ray Data chain so
the operators demonstrably COMPOSE (each stage is also available and
oracle-checked standalone).

Order is part of the contract (and of the SQL oracle): quality first
(drop junk before paying for dedup hashing), exact dedup among the
survivors (keep = min doc_id of each identical-text group), then
decontamination against the eval set. Output: (doc_id, n_tokens) of the
documents that survive all three.

Scale shape: quality is stateless; dedup adds one vocabulary-bounded
hash shuffle plus one distributed join of survivors against keep ids
(both sides corpus-scale — no broadcast); decontamination is the
broadcast n-gram membership pass (eval sets are small by definition).
Nothing materializes the corpus driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from record_matching_ray.stages.decontaminate import (
    _strict_ngram_hashes,
    benchmark_ngram_hashes,
)
from record_matching_ray.stages.dedup import exact_dedup
from record_matching_ray.stages.textstats import quality_stats
from record_matching_ray.stages.util import compact_nonempty, shuffle_partitions


def curate_corpus(
    docs: ray.data.Dataset,
    bench: ray.data.Dataset,
    n: int = 8,
    stop_ratio_min: float = 0.03,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, n_tokens) of documents passing quality, exact-dedup-keep
    and decontamination, in that order."""

    def qfilter(t: pa.Table) -> pa.Table:
        q = quality_stats(t)  # row-aligned with t
        keep = pc.greater_equal(q.column("stop_ratio"), stop_ratio_min)
        return t.filter(keep)

    clean = docs.map_batches(qfilter, batch_format="pyarrow")

    # exact-dedup keeps among quality survivors; compact so the join
    # never sees zero-column empty blocks (the documented groupby
    # artifact) and the fan-out matches the keep count.
    keeps = exact_dedup(clean, text_col=text_col, id_col=id_col).select_columns(
        ["keep_id"]
    )
    keeps, n_keeps = compact_nonempty(keeps, shuffle_partitions())
    if n_keeps == 0:
        return ray.data.from_arrow(
            pa.table(
                {id_col: pa.array([], pa.int64()), "n_tokens": pa.array([], pa.int64())}
            )
        )
    kept = clean.join(
        keeps,
        join_type="inner",
        num_partitions=max(1, min(shuffle_partitions(), -(-n_keeps // 4096))),
        on=(id_col,),
        right_on=("keep_id",),
    )

    bench_ref = ray.put(benchmark_ngram_hashes(bench, n, text_col))

    def finalize(t: pa.Table) -> pa.Table:
        """Decontaminate + token count + filter, one stateless pass."""
        from record_matching_ray.stages.textstats import _WS_SPLIT

        texts = t.column(text_col).to_pylist()
        bench_h = ray.get(bench_ref)
        flat, offsets = _strict_ngram_hashes(texts, n)
        if len(bench_h) and len(flat):
            pos = np.clip(np.searchsorted(bench_h, flat), 0, len(bench_h) - 1)
            hit = bench_h[pos] == flat
        else:
            hit = np.zeros(len(flat), dtype=bool)
        csum = np.concatenate(([0], np.cumsum(hit.astype(np.int64))))
        n_hits = csum[offsets[1:]] - csum[offsets[:-1]]
        n_tokens = np.fromiter(
            (len(_WS_SPLIT.split(x.strip())) for x in texts),
            dtype=np.int64,
            count=len(texts),
        )
        keep = n_hits == 0
        return pa.table(
            {
                id_col: t.column(id_col).filter(pa.array(keep)),
                "n_tokens": pa.array(n_tokens[keep], pa.int64()),
            }
        )

    return kept.map_batches(finalize, batch_format="pyarrow")


def quality_buckets(
    docs: "ray.data.Dataset",
    n_tiles: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """CCNet-style perplexity bucketing (head/middle/tail quality bands,
    Wenzek et al. 2020): score every doc with the corpus' own bigram LM
    (textstats.bigram_logprob), split the corpus into n_tiles exact
    NTILE bands over (avg_logprob, doc_id), and profile each band —
    (tile, n_docs, mean_lp). Composite evidence that the scoring,
    windowing and aggregation stages chain.

    Scale note: exact NTILE over one global group funnels rank
    assignment through one partition (the op's documented contract); at
    100 TB swap the banding stage for approx_quantiles thresholds
    broadcast into a stateless assign — the profile aggregate is
    unchanged."""
    import pyarrow as pa

    from record_matching_ray.stages.temporal import ntile_per_group
    from record_matching_ray.stages.textstats import bigram_logprob
    from record_matching_ray.stages.util import conformed

    lp = bigram_logprob(docs, text_col=text_col, id_col=id_col)

    def add_g(t: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table(
            {
                "g": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                id_col: t.column(id_col),
                "lp": t.column("avg_logprob"),
            }
        )

    tiles = ntile_per_group(
        lp.map_batches(add_g, batch_format="pyarrow"),
        key_col="g",
        order_col="lp",
        tie_col=id_col,
        n_tiles=n_tiles,
    )

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        tile = t.column("tile").to_numpy(zero_copy_only=False)
        lpv = t.column("lp").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(tile, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(uniq), np.float64)
        np.add.at(s, inv, lpv)
        return pa.table(
            {
                "tile": pa.array(uniq, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(s, pa.float64()),
            }
        )

    import ray.data

    agg = (
        tiles.map_batches(partial, batch_format="pyarrow")
        .groupby("tile")
        .aggregate(ray.data.aggregate.Sum("n"), ray.data.aggregate.Sum("s"))
    )

    OUT = pa.schema(
        [("tile", pa.int64()), ("n_docs", pa.int64()), ("mean_lp", pa.float64())]
    )

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0 or "sum(n)" not in t.column_names:
            return OUT.empty_table()
        n = t.column("sum(n)").to_numpy(zero_copy_only=False)
        s = t.column("sum(s)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tile": t.column("tile"),
                "n_docs": pa.array(n, pa.int64()),
                "mean_lp": pa.array(np.round(s / n, 6), pa.float64()),
            }
        )

    return conformed(agg.map_batches(finish, batch_format="pyarrow"), OUT)
