"""S-eval — pair-level metrics + adjusted Rand index.

Reference semantics: recall() expands predicted clusters to pairs and
joins them against the truth pairs (inner = TP, anti = FP/FN) printing
TP/FP/FN, precision, FDR, recall, F1 (record_matching/main.py:731-795);
adjusted_rand_score vs the CID column (main.py:715-728). This is the
harness for the pairwise-F1 >= 0.99 gate (BASELINE.md).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.functions.logistic import adjusted_rand_index


@dataclass
class PairMetrics:
    tp: int
    fp: int
    fn: int
    tn: int

    @property
    def precision(self) -> float:
        d = self.tp + self.fp
        return self.tp / d if d else 0.0

    @property
    def recall(self) -> float:
        d = self.tp + self.fn
        return self.tp / d if d else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0

    @property
    def fdr(self) -> float:
        d = self.tp + self.fp
        return self.fp / d if d else 0.0


def attach_cluster_ids(
    labeled_pairs: ray.data.Dataset,
    clusters: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """labeled (left, right, match) ⋈ clusters(url, cluster_id) twice ->
    (left, right, match, cid_l, cid_r). Distributed hash joins — the
    cluster map is NOT collected to the driver (poc2 does the equivalent
    lookup per pair in pandas, poc2:2253-2299; that can't scale)."""
    if num_partitions is None:
        from record_matching_ray.stages.util import shuffle_partitions

        num_partitions = shuffle_partitions()
    side = clusters.select_columns(["url", "cluster_id"])
    out = labeled_pairs.join(
        side,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("left",),
        right_on=("url",),
    ).rename_columns({"cluster_id": "cid_l"})
    out = out.join(
        side,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("right",),
        right_on=("url",),
    ).rename_columns({"cluster_id": "cid_r"})
    return out


def pairwise_metrics_on_labeled(
    labeled_pairs: ray.data.Dataset,
    clusters: ray.data.Dataset,
    num_partitions: int | None = None,
) -> PairMetrics:
    """Confusion counts over the labeled pairs: predicted-match iff both
    urls landed in the same cluster (same-cluster ⇔ match evaluation,
    poc2:2208-2321 / main.py:771-795 semantics). Counts are aggregated
    per batch then summed — only 4 ints reach the driver."""
    joined = attach_cluster_ids(labeled_pairs, clusters, num_partitions)

    def partial_counts(t: pa.Table) -> pa.Table:
        match = t.column("match").to_numpy(zero_copy_only=False).astype(bool)
        cid_l = t.column("cid_l").to_pylist()
        cid_r = t.column("cid_r").to_pylist()
        pred = np.array(
            [a is not None and a == b for a, b in zip(cid_l, cid_r)], dtype=bool
        )
        return pa.table(
            {
                "tp": pa.array([int((match & pred).sum())], pa.int64()),
                "fp": pa.array([int((~match & pred).sum())], pa.int64()),
                "fn": pa.array([int((match & ~pred).sum())], pa.int64()),
                "tn": pa.array([int((~match & ~pred).sum())], pa.int64()),
            }
        )

    parts = joined.map_batches(partial_counts, batch_format="pyarrow").take_all()
    return PairMetrics(
        tp=sum(r["tp"] for r in parts),
        fp=sum(r["fp"] for r in parts),
        fn=sum(r["fn"] for r in parts),
        tn=sum(r["tn"] for r in parts),
    )


def error_pairs_on_labeled(
    labeled_pairs: ray.data.Dataset,
    clusters: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """FP/FN PAIR EXPORT for error review — the reference's recall()
    materializes the actual false-positive / false-negative pair tables
    via anti-joins (record_matching/main.py:771-782); this is that
    surface: every labeled pair where the prediction (same-cluster)
    disagrees with the label, as a streaming Dataset
    (left, right, match, predicted, error in {'fp','fn'}).

    Same two hash joins as pairwise_metrics_on_labeled; the error filter
    runs inside map_batches, so only disagreeing rows ever materialize —
    on a healthy pipeline that's a tiny table regardless of corpus size."""
    from record_matching_ray.stages.util import compact_nonempty, conformed

    if num_partitions is None:
        from record_matching_ray.stages.util import shuffle_partitions

        num_partitions = shuffle_partitions()
    left_t = labeled_pairs.schema().types[
        labeled_pairs.schema().names.index("left")
    ]
    cid_t = clusters.schema().types[
        clusters.schema().names.index("cluster_id")
    ]
    # labeled pairs are a bounded relation (a labeled SAMPLE, not the
    # corpus): compact so no empty block poisons the hash join (Ray 2.49
    # loses the join schema broadcast on an empty first block — see
    # stages/util.compact_nonempty / rayfix.py), and size the join to the
    # actual row count
    labeled_pairs, n_lab = compact_nonempty(labeled_pairs, num_partitions)
    if n_lab == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("left", left_t), ("right", left_t), ("match", pa.bool_()),
                 ("predicted", pa.bool_()), ("error", pa.string())]
            ).empty_table()
        )
    num_partitions = max(1, min(num_partitions, -(-n_lab // 4096)))
    # the per-side cluster column is renamed BEFORE the join (a
    # rename-after-join Project is applied per block and Ray 2.49 leaves
    # some post-join blocks un-renamed on tiny inputs, poisoning the
    # second join with a duplicate `cluster_id` field), and each join
    # output is conformed so empty partitions keep the stage schema
    def side_as(alias: str) -> ray.data.Dataset:
        def ren(t: pa.Table) -> pa.Table:
            return pa.table(
                {"url": t.column("url"), alias: t.column("cluster_id")}
            )

        return conformed(
            clusters.select_columns(["url", "cluster_id"]).map_batches(
                ren, batch_format="pyarrow"
            ),
            pa.schema([("url", left_t), (alias, cid_t)]),
        )

    j1 = labeled_pairs.join(
        side_as("cid_l"), join_type="left_outer",
        num_partitions=num_partitions, on=("left",), right_on=("url",),
    )
    j1 = conformed(
        j1,
        pa.schema(
            [("left", left_t), ("right", left_t), ("match", pa.bool_()),
             ("cid_l", cid_t)]
        ),
    )
    joined = j1.join(
        side_as("cid_r"), join_type="left_outer",
        num_partitions=num_partitions, on=("right",), right_on=("url",),
    )
    joined = conformed(
        joined,
        pa.schema(
            [("left", left_t), ("right", left_t), ("match", pa.bool_()),
             ("cid_l", cid_t), ("cid_r", cid_t)]
        ),
    )

    def errs(t: pa.Table) -> pa.Table:
        match = t.column("match").to_numpy(zero_copy_only=False).astype(bool)
        cid_l = t.column("cid_l").to_pylist()
        cid_r = t.column("cid_r").to_pylist()
        pred = np.array(
            [a is not None and a == b for a, b in zip(cid_l, cid_r)], dtype=bool
        )
        bad = match != pred
        err = np.where(pred, "fp", "fn")
        return pa.table(
            {
                "left": t.column("left").filter(pa.array(bad)),
                "right": t.column("right").filter(pa.array(bad)),
                "match": pa.array(match[bad], pa.bool_()),
                "predicted": pa.array(pred[bad], pa.bool_()),
                "error": pa.array(list(err[bad]), pa.string()),
            }
        )

    return conformed(
        joined.map_batches(errs, batch_format="pyarrow"),
        pa.schema(
            [
                ("left", left_t),
                ("right", left_t),
                ("match", pa.bool_()),
                ("predicted", pa.bool_()),
                ("error", pa.string()),
            ]
        ),
    )


def adjusted_rand_vs_truth(
    clusters: ray.data.Dataset,
    truth: ray.data.Dataset,
    num_partitions: int | None = None,
    sample_n: int | None = None,
    max_exact_rows: int = 5_000_000,
) -> float:
    """ARI of predicted cluster_id vs truth entity_id, joined on url.

    The contingency table needs aligned label vectors collected to the
    driver, so the full path is COUNT-GATED at max_exact_rows (one small
    row per url is one row per page at web scale — the r4 verdict's
    "collects the whole relation" failure mode fails loudly instead).
    Past the gate pass sample_n: rows are kept when a stable 64-bit url
    hash falls under sample_n/n of the hash space — a uniform,
    block-order-INVARIANT sample (the previous limit(sample_n) kept the
    first blocks in arrival order, which is not a sample at all), and
    sample_n >= n degenerates to the exact ARI."""
    if num_partitions is None:
        from record_matching_ray.stages.util import shuffle_partitions

        num_partitions = shuffle_partitions()
    joined = clusters.join(
        truth.select_columns(["url", "entity_id"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("url",),
        right_on=("url",),
    ).select_columns(["url", "cluster_id", "entity_id"])
    joined = joined.materialize()  # counted, then collected: execute once
    n = joined.count()
    if sample_n is not None and sample_n < n:
        from record_matching_ray.functions.hashing import hash_strings, mix64

        # keep P(row) = sample_n/n via threshold on a salted stable hash;
        # deterministic, independent of block order and partitioning
        threshold = np.uint64(int(sample_n / n * float(2**64)))

        def samp(t: pa.Table) -> pa.Table:
            h = mix64(
                hash_strings(t.column("url").to_pylist()).astype(np.uint64)
                ^ np.uint64(0x9E3779B97F4A7C15)
            )
            return t.filter(pa.array(h < threshold))

        joined = joined.map_batches(samp, batch_format="pyarrow")
    elif sample_n is None and n > max_exact_rows:
        raise RuntimeError(
            f"adjusted_rand_vs_truth: exact ARI over {n} rows exceeds the "
            f"{max_exact_rows}-row driver gate; pass sample_n for a "
            "uniform hash-sampled ARI"
        )
    rows = joined.select_columns(["cluster_id", "entity_id"]).take_all()
    pred = np.array([r["cluster_id"] for r in rows], dtype=object)
    true = np.array([r["entity_id"] for r in rows])
    return adjusted_rand_index(true, pred)


def cluster_error_taxonomy(
    clusters: ray.data.Dataset,
    truth: ray.data.Dataset,
    num_partitions: int | None = None,
) -> dict:
    """Split/merge error taxonomy of a predicted clustering vs truth
    entities (poc2:2322-2374's error breakdown, distributed).

    Joins (url -> cluster_id) with (url -> entity_id), then aggregates
    distinct-count relations both ways:
      - split_entities:  truth entities spanning >1 predicted cluster
      - merged_clusters: predicted clusters containing >1 truth entity
      - entities_merged_away: sum(max(entities_per_cluster - 1, 0))
      - pure_clusters:   clusters containing exactly one truth entity
    Only per-group distinct counts reach the driver."""
    if num_partitions is None:
        from record_matching_ray.stages.util import shuffle_partitions

        num_partitions = shuffle_partitions()
    joined = clusters.join(
        truth,
        join_type="inner",
        num_partitions=num_partitions,
        on=("url",),
        right_on=("url",),
    )

    def _distinct_counts(ds, key, other):
        def partial(t: pa.Table) -> pa.Table:
            g = pa.TableGroupBy(
                t.select([key, other]), [key, other]
            ).aggregate([([], "count_all")])
            return g.rename_columns([key, other, "c"]).select([key, other])

        pairs = ds.map_batches(partial, batch_format="pyarrow")

        def per_key(g: pa.Table) -> pa.Table:
            vals = set(g.column(other).to_pylist())
            return pa.table(
                {
                    key: g.column(key).slice(0, 1),
                    "n_distinct": pa.array([len(vals)], pa.int64()),
                }
            )

        return pairs.groupby(key).map_groups(per_key, batch_format="pyarrow")

    per_entity = _distinct_counts(joined, "entity_id", "cluster_id").to_pandas()
    per_cluster = _distinct_counts(joined, "cluster_id", "entity_id").to_pandas()
    return {
        "entities": int(len(per_entity)),
        "clusters": int(len(per_cluster)),
        "split_entities": int((per_entity["n_distinct"] > 1).sum()),
        "merged_clusters": int((per_cluster["n_distinct"] > 1).sum()),
        "entities_merged_away": int(
            (per_cluster["n_distinct"] - 1).clip(lower=0).sum()
        ),
        "pure_clusters": int((per_cluster["n_distinct"] == 1).sum()),
    }


@dataclass
class BlockingMetrics:
    """Standard blocking-quality numbers (Christen 2012, ch. 7)."""

    n_records: int
    n_candidates: int
    n_true_pairs: int
    n_covered: int  # |candidates ∩ true pairs|

    @property
    def reduction_ratio(self) -> float:
        total = self.n_records * (self.n_records - 1) // 2
        return 1.0 - self.n_candidates / total if total else 0.0

    @property
    def pairs_completeness(self) -> float:
        return self.n_covered / self.n_true_pairs if self.n_true_pairs else 1.0

    @property
    def pairs_quality(self) -> float:
        return self.n_covered / self.n_candidates if self.n_candidates else 1.0


def blocking_metrics(
    pairs: ray.data.Dataset,
    truth: ray.data.Dataset,
    n_records: int,
    uid_remap: dict | None = None,
) -> BlockingMetrics:
    """Blocking quality of a candidate pair set (uid space, like
    generate_candidate_pairs' output) against truth clusters (url,
    entity_id): reduction ratio, pairs completeness, pairs quality.

    The truth table collects to a driver map (bounded like
    adjusted_rand_vs_truth — truth is a labeled sample, not the corpus);
    the candidate set streams through one partial-count pass, so the
    blocking's own output size never materializes."""
    from record_matching_ray.stages.blocking import page_uids

    ent: dict[int, int] = {}
    sizes: dict[int, int] = {}
    eid_codes: dict[str, int] = {}
    for t in truth.iter_batches(batch_format="pyarrow", batch_size=None):
        urls = t.column("url").to_pylist()
        eids = t.column("entity_id").to_pylist()
        for u, e in zip(page_uids(urls, uid_remap), eids):
            code = eid_codes.setdefault(str(e), len(eid_codes))
            ent[int(u)] = code
            sizes[code] = sizes.get(code, 0) + 1
    n_true = sum(s * (s - 1) // 2 for s in sizes.values())

    import ray as _ray

    ent_ref = _ray.put(ent)

    def partial(t: pa.Table) -> pa.Table:
        m = _ray.get(ent_ref) if isinstance(ent_ref, _ray.ObjectRef) else ent_ref
        l = t.column("left").to_numpy(zero_copy_only=False)
        r = t.column("right").to_numpy(zero_copy_only=False)
        cov = sum(
            1
            for a, b in zip(l, r)
            if (ea := m.get(int(a))) is not None and ea == m.get(int(b))
        )
        return pa.table(
            {
                "cand": pa.array([t.num_rows], pa.int64()),
                "cov": pa.array([cov], pa.int64()),
            }
        )

    parts = (
        pairs.select_columns(["left", "right"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    return BlockingMetrics(
        n_records=n_records,
        n_candidates=sum(r["cand"] for r in parts),
        n_true_pairs=n_true,
        n_covered=sum(r["cov"] for r in parts),
    )


# ---------------------------------------------------------------------------
# B-cubed clustering metrics (Bagga & Baldwin 1998) — the per-item
# precision/recall companion to ARI, standard in ER evaluation (Amigó
# et al. 2009 showed it's the only common metric satisfying all four
# clustering-evaluation constraints).


def bcubed_metrics(
    assign: ray.data.Dataset,
    truth: ray.data.Dataset,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    truth_col: str = "truth_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """One-row (n, bcubed_p, bcubed_r, bcubed_f1) from item-level
    predicted and truth assignments, via the closed form

        P = (1/N) sum_{c,t} n_ct^2 / n_c,  R = (1/N) sum_{c,t} n_ct^2 / n_t

    Scale shape: one hash join on the item id, per-batch (c, t) partial
    counts collapse each batch to its contingency vocabulary before ONE
    groupby shuffle; each closed-form sum is a groupby over the (already
    tiny) contingency relation whose groups emit one float each, reduced
    through batch partials — the driver only ever sees per-block partial
    scalars, never items. Rounded to 6 decimals for oracle parity."""
    if num_partitions is None:
        from record_matching_ray.stages.util import shuffle_partitions

        num_partitions = shuffle_partitions()

    joined = assign.select_columns([id_col, cluster_col]).join(
        truth.select_columns([id_col, truth_col]),
        join_type="inner",
        num_partitions=num_partitions,
        on=(id_col,),
    )

    def ct_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        c = np.asarray([str(v) for v in t.column(cluster_col).to_pylist()], object)
        g = np.asarray([str(v) for v in t.column(truth_col).to_pylist()], object)
        keys = np.char.add(np.char.add(c.astype(str), "\x1f"), g.astype(str))
        codes, uniq = pd.factorize(keys, sort=False)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {"ct": pa.array(list(uniq), pa.string()), "n": pa.array(n, pa.int64())}
        )

    j = (
        joined.map_batches(ct_partial, batch_format="pyarrow")
        .groupby("ct")
        .sum("n")
        .map_batches(
            lambda t: pa.table(
                {
                    "cid": pa.array(
                        [s.split("\x1f")[0] for s in t.column("ct").to_pylist()],
                        pa.string(),
                    ),
                    "tid": pa.array(
                        [s.split("\x1f")[1] for s in t.column("ct").to_pylist()],
                        pa.string(),
                    ),
                    "n_ct": t.column("sum(n)"),
                }
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    def _side_sum(key: str) -> tuple[float, int]:
        def per_group(g: pa.Table) -> pa.Table:
            n = g.column("n_ct").to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table(
                {
                    "s": pa.array([float(np.sum(n * n) / np.sum(n))], pa.float64()),
                    "cnt": pa.array([int(np.sum(n))], pa.int64()),
                }
            )

        parts = (
            j.groupby(key)
            .map_groups(per_group, batch_format="pyarrow")
            .map_batches(
                lambda t: pa.table(
                    {
                        "s": pa.array(
                            [float(np.sum(t.column("s").to_numpy(zero_copy_only=False)))],
                            pa.float64(),
                        ),
                        "cnt": pa.array(
                            [int(np.sum(t.column("cnt").to_numpy(zero_copy_only=False)))],
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .take_all()
        )
        return sum(r["s"] for r in parts), sum(r["cnt"] for r in parts)

    sp, n_total = _side_sum("cid")
    sr, _ = _side_sum("tid")
    p = sp / n_total
    r = sr / n_total
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    out = pa.table(
        {
            "n": pa.array([n_total], pa.int64()),
            "bcubed_p": pa.array([round(p, 6)], pa.float64()),
            "bcubed_r": pa.array([round(r, 6)], pa.float64()),
            "bcubed_f1": pa.array([round(f1, 6)], pa.float64()),
        }
    )
    return ray.data.from_arrow(out)


def blocking_quality(
    docs: ray.data.Dataset,
    truth_pairs: ray.data.Dataset,
    prefix_len: int = 8,
):
    """Blocking-scheme quality metrics (Christen 2012): reduction ratio,
    pairs completeness and pairs quality of a prefix-blocking scheme
    (block key = first ``prefix_len`` chars of lower(text)) against a
    labeled truth pair set.

    Reference analog: the reference *logs* its implicit blocking quality
    (the Qdrant neighbor-limit warnings, claude_poc/entity-resolution_
    v4.py:1556-1559, and the committed blocking_analysis report); this
    makes it a first-class measured operator.

    Scale: candidate-pair mass is computed from block-SIZE partials
    (hash the key to int64, partial count per batch, one int-keyed
    shuffle — the driver never sees one row per block, mirroring the
    block_size_stats histogram fix); coverage joins the (small) truth
    pair relation to the doc→block map twice via hash joins. Returns a
    one-row pandas DataFrame of exact counts + derived ratios
    (round-6, identical expression to the SQL oracle).
    """
    import pandas as pd
    import pyarrow.compute as pc

    from record_matching_ray.functions.hashing import hash_strings
    from record_matching_ray.stages.util import conformed, round6_sql, shuffle_partitions

    def to_block(t: pa.Table) -> pa.Table:
        txt = pc.utf8_slice_codeunits(
            pc.utf8_lower(t.column("text")), 0, prefix_len
        ).to_pylist()
        bk = hash_strings(txt).view(np.int64)
        return pa.table(
            {"doc_id": t.column("doc_id"), "bk": pa.array(bk, pa.int64())}
        )

    doc_bk = docs.map_batches(to_block, batch_format="pyarrow")
    n_docs = docs.count()

    def size_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["bk"]), "bk").aggregate([([], "count_all")])
        return g.rename_columns(["bk", "s"])

    sizes = (
        doc_bk.map_batches(size_partial, batch_format="pyarrow")
        .groupby("bk")
        .sum("s")
    )

    def pair_mass(t: pa.Table) -> pa.Table:
        s = t.column("sum(s)").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "cand": pa.array([int((s * (s - 1) // 2).sum())], pa.int64()),
                "nb": pa.array([len(s)], pa.int64()),
            }
        )

    mass = sizes.map_batches(pair_mass, batch_format="pyarrow").to_pandas()
    cand_pairs = int(mass["cand"].sum())
    n_blocks = int(mass["nb"].sum())

    tp = conformed(
        truth_pairs.select_columns(["left", "right"]),
        pa.schema([("left", pa.int64()), ("right", pa.int64())]),
    )
    nj = max(1, min(8, shuffle_partitions()))
    j = tp.join(
        doc_bk, join_type="inner", num_partitions=nj,
        on=("left",), right_on=("doc_id",),
    ).rename_columns({"bk": "bk_l"})
    j = j.join(
        doc_bk, join_type="inner", num_partitions=nj,
        on=("right",), right_on=("doc_id",),
    ).rename_columns({"bk": "bk_r"})

    def cover_partial(t: pa.Table) -> pa.Table:
        eq = pc.equal(t.column("bk_l"), t.column("bk_r"))
        return pa.table(
            {
                "cov": pa.array([int(pc.sum(eq).as_py() or 0)], pa.int64()),
                "tot": pa.array([t.num_rows], pa.int64()),
            }
        )

    cov_df = j.map_batches(cover_partial, batch_format="pyarrow").to_pandas()
    covered = int(cov_df["cov"].sum())
    truth_n = int(cov_df["tot"].sum())

    return pd.DataFrame(
        {
            "n_docs": [n_docs],
            "n_blocks": [n_blocks],
            "cand_pairs": [cand_pairs],
            "truth_pairs": [truth_n],
            "covered_pairs": [covered],
            "reduction_ratio": [
                float(round6_sql(1.0 - cand_pairs / max(n_docs * (n_docs - 1) // 2, 1)))
            ],
            "pairs_completeness": [float(round6_sql(covered / max(truth_n, 1)))],
            "pairs_quality": [float(round6_sql(covered / max(cand_pairs, 1)))],
        }
    )


# ---------------------------------------------------------------------------
# Distributed prediction-quality metrics: rank AUC and calibration


def distributed_auc(
    preds: ray.data.Dataset, score_col: str, label_col: str
) -> ray.data.Dataset:
    """ROC AUC of an INTEGER score column against a 0/1 label, computed
    as the Mann-Whitney rank statistic with tie-average ranks — the
    distributed counterpart of functions/logistic.auc (which is a
    driver-side numpy kernel for training folds).

    Scale contract (same as quantiles.group_quantiles): the stream
    collapses to its SCORE HISTOGRAM — per-batch (score, n_pos, n)
    partials, one int-keyed shuffle whose row count is the distinct
    score domain, never the row count. The rank sweep runs over the
    sorted histogram on the driver: a tie block of k rows starting after
    cumulative c contributes average rank c + (k+1)/2.

    Output (one row): n_pos, n_neg, auc (round-6).
    """
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import round6_sql

    def partial(t: pa.Table) -> pa.Table:
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(s, return_inverse=True)
        npos = np.zeros(len(uniq), np.int64)
        ntot = np.zeros(len(uniq), np.int64)
        np.add.at(npos, inv, y)
        np.add.at(ntot, inv, 1)
        return pa.table(
            {
                "s": pa.array(uniq, pa.int64()),
                "np": pa.array(npos, pa.int64()),
                "n": pa.array(ntot, pa.int64()),
            }
        )

    hist = (
        preds.select_columns([score_col, label_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("s")
        .aggregate(Sum(on="np", alias_name="np"), Sum(on="n", alias_name="n"))
    )
    rows = hist.take_all()
    s = np.array([r["s"] for r in rows], dtype=np.int64)
    npos = np.array([r.get("sum(np)", r.get("np")) for r in rows], dtype=np.int64)
    ntot = np.array([r.get("sum(n)", r.get("n")) for r in rows], dtype=np.int64)
    order = np.argsort(s)
    npos, ntot = npos[order], ntot[order]
    cum = np.concatenate([[0], np.cumsum(ntot)[:-1]]).astype(np.float64)
    avg_rank = cum + (ntot + 1) / 2.0
    n_pos = int(npos.sum())
    n_neg = int(ntot.sum()) - n_pos
    sum_pos_ranks = float(np.sum(npos * avg_rank))
    auc = (sum_pos_ranks - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_pos": pa.array([n_pos], pa.int64()),
                "n_neg": pa.array([n_neg], pa.int64()),
                "auc": pa.array([float(round6_sql(auc))], pa.float64()),
            }
        )
    )


def calibration_buckets(
    preds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    bucket_width: int,
) -> ray.data.Dataset:
    """Reliability-diagram buckets over FIXED-WIDTH integer score bins
    (floor(score/width) — deterministic on both engine and SQL sides,
    unlike ntile(), whose tie placement is engine-defined). Output per
    bucket: n, avg_label, avg_score (round-6)."""
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import conformed, round6_sql

    def partial(t: pa.Table) -> pa.Table:
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.floor_divide(s, bucket_width)
        uniq, inv = np.unique(b, return_inverse=True)
        out = {
            "bucket": uniq,
            "n": np.zeros(len(uniq), np.int64),
            "sy": np.zeros(len(uniq), np.int64),
            "ss": np.zeros(len(uniq), np.int64),
        }
        np.add.at(out["n"], inv, 1)
        np.add.at(out["sy"], inv, y)
        np.add.at(out["ss"], inv, s)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    agg = (
        preds.select_columns([score_col, label_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum(on="n", alias_name="n"),
            Sum(on="sy", alias_name="sy"),
            Sum(on="ss", alias_name="ss"),
        )
    )

    OUT = pa.schema(
        [
            ("bucket", pa.int64()),
            ("n", pa.int64()),
            ("avg_label", pa.float64()),
            ("avg_score", pa.float64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        def col(base: str):
            name = base if base in t.column_names else f"sum({base})"
            return t.column(name).to_numpy(zero_copy_only=False).astype(np.float64)

        if t.num_rows == 0 or (
            "n" not in t.column_names and "sum(n)" not in t.column_names
        ):
            return OUT.empty_table()
        n = col("n")
        sy = col("sy")
        ss = col("ss")
        return pa.table(
            {
                "bucket": t.column("bucket"),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "avg_label": pa.array(round6_sql(sy / n), pa.float64()),
                "avg_score": pa.array(round6_sql(ss / n), pa.float64()),
            }
        )

    return conformed(agg.map_batches(finalize, batch_format="pyarrow"), OUT)
