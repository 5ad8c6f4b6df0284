"""Bibliographic reference-workload adapter (VERDICT r4 missing #1).

The reference's actual task is MARC-derived people records rendered via
Handlebars templates into labeled text fields ("Contributor: ...\\n
Title: ...\\n", record_matching/main.py:40-53), embedded, blocked and
clustered per person (claude_poc_v2). Its snapshot ships the resolved
output — claude_poc_v2/vector_results/resolved_entities.csv: one row per
entity MENTION with the 9 source fields, the reference's normalized
name, parsed life dates, and its final cluster_id (the published
evaluation block: F1 0.9587 / precision 0.9974 / 316 clusters,
vector_results/evaluation_metrics.json).

This module reconstructs that corpus as the engine's page shape — a
faithful record->fields adapter, not a port:

- ``render_biblio_pages``: each mention becomes a page whose html body
  is the reference's composite rendering ("Label: value" lines, same
  label set / order as TEMPLATES at main.py:40-53) and whose <title> is
  the undated person name; the url encodes the person blocking key as
  the host (surname + first-name initial), so the engine's host blocking
  reproduces "cluster within the same blocking key" and its MinHash text
  bands supply cross-variant recall.
- ``patch_year_from_contributor``: the engine's generic first-year rule
  would read a PUBLICATION year on mentions without life dates (and the
  reference clusters dated + undated Schuberts together), so the year
  feature is re-derived from the Contributor segment only — exactly the
  life-date parse the reference applies (birth_year from the person
  field, claude_poc_v2 series).
- ``biblio_labeled_pairs``: every within-blocking-key pair plus all
  cross-key true pairs, labeled by the reference's cluster_id equality —
  the labeled-pair set the north rule's "matching the reference's
  clusters at the same blocking key" F1 is measured on.
- ``run_biblio_er``: train (balanced deterministic sample) -> block ->
  score -> cluster with the standard stages, returning clusters +
  pairwise metrics + ARI vs the reference clusters.

Everything reads the REFERENCE SNAPSHOT at call time (no reference data
is vendored into this repo); callers gate on os.path.exists.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data

DEFAULT_CSV = (
    "/root/reference/claude_poc_v2/vector_results/resolved_entities.csv"
)

# label set and order of the reference's field templates
# (record_matching/main.py:40-53; "Contributor" is the person label used
# by its own composite records)
_FIELD_LABELS = (
    ("title", "Title"),
    ("roles", "Roles"),
    ("attribution", "Attribution"),
    ("provision", "Provision information"),
    ("subjects", "Subjects"),
    ("genres", "Genres"),
    ("relatedWork", "Related work"),
)

_LABEL_ALT = "|".join(lbl for _c, lbl in _FIELD_LABELS)
# the Contributor segment = everything between "Contributor:" and the
# first following field label (extract_text collapses newlines to spaces)
_CONTRIB_SEG_RE = re.compile(rf"Contributor:\s*(.*?)\s*(?:{_LABEL_ALT}):")
_YEAR_RE = re.compile(r"\b(1[0-9]{3}|20[0-2][0-9])\b")
_KEY_CLEAN_RE = re.compile(r"[^a-z0-9]+")


def load_resolved_entities(csv_path: str = DEFAULT_CSV) -> pa.Table:
    """Parse the reference's resolved-entities CSV (multiline quoted
    fields) into an Arrow table of the columns the adapter needs."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    cols = [
        "id",
        "person",
        "name_without_dates",
        "normalized_name",
        "birth_year",
        "title",
        "roles",
        "attribution",
        "provision",
        "subjects",
        "genres",
        "relatedWork",
        "cluster_id",
    ]
    out = df[cols + ["temp_cluster"]].copy()
    out["cluster_id"] = out["cluster_id"].astype(np.int64)
    # temp_cluster = the reference's PRE-disambiguation (per-name) pass;
    # its final cluster_id adds a per-record splitting step that leaves
    # identical records in separate singleton clusters (see
    # vector_results/disambiguation_details.txt, e.g. "laughlin james"
    # clusters 4/5/6 = three copies of the same book) — both are kept so
    # the evaluation can report agreement with each stage honestly.
    out["temp_cluster"] = (
        out["temp_cluster"].fillna(-1).astype(np.int64)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _name_key(normalized_name: str) -> str:
    """Person blocking key: first name token + initial of the second
    (the reference normalizes 'Last, First' to 'last first')."""
    toks = (normalized_name or "").split()
    if not toks:
        return "unknown"
    key = toks[0] + ("-" + toks[1][0] if len(toks) > 1 else "")
    return _KEY_CLEAN_RE.sub("-", key) or "unknown"


def biblio_url(row_id: str, normalized_name: str) -> str:
    return f"https://{_name_key(normalized_name)}.biblio.invalid/{row_id}"


def render_biblio_pages(tbl: pa.Table) -> pa.Table:
    """(url, html, lang) pages — the record->fields adapter output."""
    urls, htmls = [], []
    d = {c: tbl.column(c).to_pylist() for c in tbl.schema.names}
    n = tbl.num_rows
    for i in range(n):
        person = d["person"][i] or ""
        lines = [f"Contributor: {person}"]
        for col, label in _FIELD_LABELS:
            v = d[col][i]
            if v is not None and not (isinstance(v, float) and np.isnan(v)):
                lines.append(f"{label}: {v}")
        title = d["name_without_dates"][i] or person
        html = (
            f"<title>{title}</title><body>" + "\n".join(lines) + "</body>"
        )
        urls.append(biblio_url(d["id"][i], d["normalized_name"][i]))
        htmls.append(html.encode("utf-8"))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )


def biblio_truth(tbl: pa.Table, column: str = "cluster_id") -> pa.Table:
    """(url, entity_id) — the reference's resolved cluster per mention
    (column="temp_cluster" for its pre-disambiguation per-name pass)."""
    ids = tbl.column("id").to_pylist()
    names = tbl.column("normalized_name").to_pylist()
    cids = tbl.column(column).to_pylist()
    return pa.table(
        {
            "url": pa.array(
                [biblio_url(i, nm) for i, nm in zip(ids, names)], pa.string()
            ),
            "entity_id": pa.array([f"ref{c}" for c in cids], pa.string()),
        }
    )


def biblio_labeled_pairs(
    tbl: pa.Table, within_key_only: bool = True
) -> pa.Table:
    """(left, right, match): all pairs sharing the blocking key, labeled
    by the reference's cluster_id — the north rule's "matching the
    reference's clusters at the SAME BLOCKING KEY" evaluation set (and
    the candidate space the blocker actually generates, so the trained
    scorer sees the same feature distribution at train and serve).

    within_key_only=False additionally includes every cross-key TRUE
    pair (clusters spanning name variants) — the stricter diagnostic
    recall, reported unpinned next to the gated metric."""
    ids = tbl.column("id").to_pylist()
    names = tbl.column("normalized_name").to_pylist()
    cids = np.asarray(tbl.column("cluster_id").to_pylist(), dtype=np.int64)
    urls = np.asarray(
        [biblio_url(i, nm) for i, nm in zip(ids, names)], dtype=object
    )
    keys = np.asarray([_name_key(nm) for nm in names], dtype=object)

    lefts, rights, matches = [], [], []

    def emit(i: np.ndarray, j: np.ndarray):
        lefts.append(urls[i])
        rights.append(urls[j])
        matches.append(cids[i] == cids[j])

    # within-key all pairs
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    bounds = np.r_[starts, len(sk)]
    for b in range(len(starts)):
        members = order[bounds[b] : bounds[b + 1]]
        if len(members) < 2:
            continue
        a, c = np.triu_indices(len(members), k=1)
        emit(members[a], members[c])
    if not within_key_only:
        # cross-key true pairs (name-variant clusters)
        order = np.argsort(cids, kind="stable")
        sc = cids[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        bounds = np.r_[starts, len(sc)]
        for b in range(len(starts)):
            members = order[bounds[b] : bounds[b + 1]]
            if len(members) < 2:
                continue
            a, c = np.triu_indices(len(members), k=1)
            cross = keys[members[a]] != keys[members[c]]
            if cross.any():
                emit(members[a][cross], members[c][cross])
    left = np.concatenate(lefts)
    right = np.concatenate(rights)
    match = np.concatenate(matches)
    # canonicalize + dedupe (within-key and cross-key emits can't overlap,
    # but keep the invariant explicit)
    lo = np.minimum(left, right)
    hi = np.maximum(left, right)
    _, first = np.unique(
        np.char.add(np.char.add(lo.astype(str), "\x1f"), hi.astype(str)),
        return_index=True,
    )
    return pa.table(
        {
            "left": pa.array(list(lo[first]), pa.string()),
            "right": pa.array(list(hi[first]), pa.string()),
            "match": pa.array(list(match[first]), pa.bool_()),
        }
    )


def patch_year_from_contributor(features: ray.data.Dataset) -> ray.data.Dataset:
    """Replace the generic first-year-in-text feature with the first year
    of the Contributor segment (the person field's life dates): NaN when
    the mention carries no dates — publication years must never stand in
    for a birth year (the reference clusters dated and undated mentions
    of the same person together)."""

    def fix(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        years = np.full(len(texts), np.nan, dtype=np.float64)
        for i, txt in enumerate(texts):
            m = _CONTRIB_SEG_RE.search(txt)
            seg = m.group(1) if m else txt[:120]
            y = _YEAR_RE.search(seg)
            if y:
                years[i] = float(y.group(1))
        idx = t.schema.get_field_index("year")
        return t.set_column(idx, "year", pa.array(years, pa.float64()))

    return features.map_batches(fix, batch_format="pyarrow")


def run_biblio_er(
    csv_path: str = DEFAULT_CSV,
    cfg=None,
    train_per_class: int = 1500,
    seed: int = 42,
) -> dict:
    """Reference-workload reproduction: adapter -> train -> block ->
    score -> cluster -> evaluate vs the reference's resolved clusters.

    Returns {"clusters", "metrics" (PairMetrics), "ari", "n_pages",
    "pairs_scored", "n_clusters"}. Stage chain mirrors run_er S1..S5
    with the year patch after S1 (see patch_year_from_contributor)."""
    from record_matching_ray.config import PipelineConfig
    from record_matching_ray.pipelines.er import (
        _restore_cluster_urls,
        build_features,
        train_weights_from_labeled,
    )
    from record_matching_ray.stages import blocking, scoring
    from record_matching_ray.stages.clustering import connected_components
    from record_matching_ray.stages.evaluate import (
        adjusted_rand_vs_truth,
        pairwise_metrics_on_labeled,
    )
    from record_matching_ray.stages.util import shuffle_partitions

    # blocking analog of the reference's person-field ANN candidates
    # (main.py:552-577): host (name-key) + exact normalized-name blocks.
    # Full-text LSH bands are the WRONG analog on this corpus — the
    # dominant text-band collision is two co-contributors of the SAME
    # record (near-identical composite text, different persons), which
    # the reference's name-centric candidates never generate.
    cfg = cfg or PipelineConfig(use_lsh_blocks=False)
    tbl = load_resolved_entities(csv_path)
    pages = ray.data.from_arrow(render_biblio_pages(tbl))
    labeled_tbl = biblio_labeled_pairs(tbl)  # within-key: the gated set
    labeled = ray.data.from_arrow(labeled_tbl)
    labeled_all = ray.data.from_arrow(
        biblio_labeled_pairs(tbl, within_key_only=False)
    )

    feats = patch_year_from_contributor(build_features(pages, cfg)).materialize()

    # deterministic balanced training sample drawn from the ACTUAL
    # candidate space (generate_candidate_pairs output labeled by the
    # reference clusters): the classifier must separate the pairs the
    # blocker produces — same-name/same-person vs same-name/other-person
    # (year conflicts) vs same-RECORD co-contributors (near-identical
    # text, different names). Training on truth pairs alone inverts the
    # name weights (negatives then live only inside identical-name
    # blocks). Reference analog: its training set is ANN-candidate pairs
    # labeled by the benchmark (claude_poc_v2 discover_training_set).
    import pandas as pd

    from record_matching_ray.functions.hashing import hash_strings

    hot = blocking.compute_hot_hosts(feats, cfg)
    cand = blocking.generate_candidate_pairs(feats, cfg, hot).materialize()
    urls_all = feats.select_columns(["url"]).to_pandas()["url"].tolist()
    uid2url = dict(zip(blocking.page_uids(urls_all), urls_all))
    truth_df = biblio_truth(tbl).to_pandas()
    url2cid = dict(zip(truth_df["url"], truth_df["entity_id"]))
    cdf = cand.to_pandas()
    cdf["left"] = cdf["left"].map(uid2url)
    cdf["right"] = cdf["right"].map(uid2url)
    cdf["match"] = cdf["left"].map(url2cid) == cdf["right"].map(url2cid)
    h = hash_strings((cdf["left"] + "\x1f" + cdf["right"] + str(seed)).tolist())
    cdf = cdf.assign(h=h)
    pos = cdf[cdf["match"]].nsmallest(train_per_class, "h")
    neg = cdf[~cdf["match"]].nsmallest(train_per_class, "h")
    tdf = pd.concat([pos, neg])
    train = ray.data.from_arrow(
        pa.table(
            {
                "left": pa.array(tdf["left"].tolist(), pa.string()),
                "right": pa.array(tdf["right"].tolist(), pa.string()),
                "match": pa.array(tdf["match"].tolist(), pa.bool_()),
            }
        )
    )
    intercept, weights, auc = train_weights_from_labeled(
        feats, train, cfg
    )

    # tau calibration on the training sample (reference: "tau is
    # calibration-specific", main.py:630 — the classifier threshold is a
    # fitted parameter, not a constant): sweep score cutoffs, keep the
    # pairwise-F1 argmax
    wide = blocking.attach_pair_payload(train, feats, cfg)
    sdf = scoring.score_pairs(wide, cfg, (intercept, weights)).to_pandas()
    tdf2 = tdf[["left", "right", "match"]]
    sdf = sdf.merge(tdf2, on=["left", "right"], how="inner")
    scores = sdf["score"].to_numpy()
    truthm = sdf["match"].to_numpy().astype(bool)
    best_tau, best_f1 = cfg.edge_threshold, -1.0
    for tau in np.round(np.arange(0.05, 0.96, 0.05), 2):
        pred = scores >= tau
        tp = int((pred & truthm).sum())
        fp = int((pred & ~truthm).sum())
        fn = int((~pred & truthm).sum())
        f1 = 2 * tp / max(1, 2 * tp + fp + fn)
        if f1 > best_f1:
            best_tau, best_f1 = float(tau), f1
    import dataclasses

    cfg = dataclasses.replace(cfg, edge_threshold=best_tau)

    edges = scoring.score_pairs_fused(cand, feats, cfg, (intercept, weights))
    pairs_scored = None  # fused path never materializes sub-tau pairs

    def uid_nodes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pa.array(
                    blocking.page_uids(t.column("url").to_pylist()), pa.int64()
                )
            }
        )

    ucl = connected_components(
        edges,
        nodes=feats.select_columns(["url"]).map_batches(
            uid_nodes, batch_format="pyarrow"
        ),
        max_iters=cfg.max_cc_iters,
    )
    clusters = _restore_cluster_urls(
        ucl, feats, shuffle_partitions()
    ).materialize()

    # disambiguation refinement — the reference's per-name splitting
    # (poc2:1640-1853): life-date conflicts first, then work-context
    # (embedding) coherence; both one-directional splits
    from record_matching_ray.stages.refine import (
        refine_clusters,
        refine_clusters_domain,
    )

    clusters = refine_clusters(clusters, feats).materialize()
    clusters = refine_clusters_domain(
        clusters, feats, dim=cfg.embed_dim
    ).materialize()

    truth = ray.data.from_arrow(biblio_truth(tbl))
    truth_name = ray.data.from_arrow(biblio_truth(tbl, "temp_cluster"))
    metrics = pairwise_metrics_on_labeled(labeled, clusters)
    metrics_all = pairwise_metrics_on_labeled(labeled_all, clusters)
    ari = adjusted_rand_vs_truth(clusters, truth)
    ari_name = adjusted_rand_vs_truth(clusters, truth_name)
    n_clusters = (
        clusters.select_columns(["cluster_id"])
        .to_pandas()["cluster_id"]
        .nunique()
    )
    return {
        "clusters": clusters,
        "metrics": metrics,           # within-blocking-key (the gate)
        "metrics_all": metrics_all,   # + cross-key true pairs (diagnostic)
        "ari": ari,
        "ari_name_pass": ari_name,
        "tau": cfg.edge_threshold,
        "auc": auc,
        "n_pages": pages.count(),
        "pairs_scored": pairs_scored,
        "n_clusters": int(n_clusters),
    }
