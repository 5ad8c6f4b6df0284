"""Fourth-epoch round-2 operators: LEAD/FIRST_VALUE/LAST_VALUE windows,
FULL OUTER join via tagged union, Count-Min sketch, splink-style
term-frequency-adjusted Fellegi-Sunter weights."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.fellegi import tf_adjusted_weights
from record_matching_ray.stages.temporal import lead_first_last
from record_matching_ray.stages.textstats import (
    count_min_estimate,
    count_min_sketch,
    count_min_topk_check,
)


def _events(n=200, keys=7, seed=5):
    rng = np.random.default_rng(seed)
    ts = np.datetime64("2024-01-01", "us") + rng.integers(
        0, 10**9, n
    ) * np.timedelta64(1, "us")
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, keys, n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


# ------------------------------------------------------- lead / first / last


def test_lead_first_last_vs_pandas():
    t = _events()
    got = (
        lead_first_last(rd.from_arrow(t).repartition(5))
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    )
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    g = df.groupby("user_id")
    exp_next = g["ts"].shift(-1)
    exp_first = g["event_id"].transform("first")
    exp_last = g["event_id"].transform("last")
    assert got["next_ts"].equals(exp_next.rename("next_ts"))
    assert (got["first_id"].to_numpy() == exp_first.to_numpy()).all()
    assert (got["last_id"].to_numpy() == exp_last.to_numpy()).all()
    # each key's last row has NULL next_ts, everything else non-null
    assert got.groupby("user_id")["next_ts"].apply(lambda s: s.iloc[:-1].notna().all() and pd.isna(s.iloc[-1])).all()


def test_lead_first_last_partition_invariant():
    t = _events(n=97, keys=3, seed=11)
    a = lead_first_last(rd.from_arrow(t).repartition(1)).to_pandas()
    b = lead_first_last(rd.from_arrow(t).repartition(9)).to_pandas()
    key = ["user_id", "ts", "event_id"]
    a = a.sort_values(key, ignore_index=True)
    b = b.sort_values(key, ignore_index=True)
    assert a.equals(b)


# ------------------------------------------------------------ FULL OUTER join


def test_daily_activity_full_outer_vs_pandas(tmp_path):
    rng = np.random.default_rng(3)
    od = np.datetime64("2020-01-01", "us") + rng.integers(0, 40, 50) * np.timedelta64(
        1, "D"
    ).astype("timedelta64[us]")
    ed = np.datetime64("2020-01-20", "us") + rng.integers(0, 40, 80) * np.timedelta64(
        1, "D"
    ).astype("timedelta64[us]")
    pa.parquet.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(50), pa.int64()),
                "o_orderdate": pa.array(od, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pa.parquet.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(80), pa.int64()),
                "ts": pa.array(ed, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from record_matching_ray.pipelines.analytics import daily_activity_full_outer

    got = (
        daily_activity_full_outer(str(tmp_path))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    oc = pd.Series(od.astype("datetime64[D]")).value_counts().sort_index()
    ec = pd.Series(ed.astype("datetime64[D]")).value_counts().sort_index()
    exp = pd.concat([oc.rename("n_orders"), ec.rename("n_events")], axis=1)
    days = pd.to_datetime(got["day"]).to_numpy().astype("datetime64[D]")
    assert (days == exp.index.to_numpy().astype("datetime64[D]")).all()
    assert got["n_orders"].astype("Int64").equals(exp["n_orders"].astype("Int64").reset_index(drop=True))
    assert got["n_events"].astype("Int64").equals(exp["n_events"].astype("Int64").reset_index(drop=True))
    # genuinely full-outer: both one-sided day kinds occur
    assert got["n_orders"].isna().any() and got["n_events"].isna().any()


# -------------------------------------------------------------- Count-Min


def _cms_docs(seed=7, n=60):
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 25), p=None))
        for _ in range(n)
    ]
    return texts


def test_count_min_never_undercounts_and_bounds():
    texts = _cms_docs()
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(4)
    sk, total = count_min_sketch(docs, width=512)
    from collections import Counter

    exact = Counter(w for t in texts for w in t.lower().split())
    assert total == sum(exact.values())
    toks = list(exact)
    est = count_min_estimate(sk, toks, width=512)
    truth = np.array([exact[t] for t in toks])
    assert (est >= truth).all()
    assert (est - truth <= np.ceil(np.e / 512 * total)).all()


def test_count_min_sketch_merge_is_partition_invariant():
    texts = _cms_docs(seed=9)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    sk1, n1 = count_min_sketch(rd.from_arrow(t).repartition(1), width=256)
    sk8, n8 = count_min_sketch(rd.from_arrow(t).repartition(8), width=256)
    assert n1 == n8
    assert (sk1 == sk8).all()


def test_count_min_topk_check_all_ok():
    texts = _cms_docs(seed=13, n=80)
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    rows = count_min_topk_check(docs, k=10).take_all()
    assert len(rows) == 10
    assert all(r["ok"] for r in rows)
    assert [r["rank"] for r in rows] == sorted(r["rank"] for r in rows)


# ------------------------------------------------- TF-adjusted match weights


def test_tf_adjusted_weights_vs_bruteforce():
    rng = np.random.default_rng(21)
    n = 40
    names = [f"name{chr(97 + i % 7)}{i:03d}" for i in range(n)]
    brands = [f"B{int(v)}" for v in rng.integers(0, 4, n)]
    t = pa.table(
        {
            "pk": pa.array(np.arange(n), pa.int64()),
            "nm": pa.array(names, pa.string()),
            "brand": pa.array(brands, pa.string()),
        }
    )
    m = 0.9
    window = 4
    got = {
        (r["l_pk"], r["r_pk"]): (r["agree"], r["weight"])
        for r in tf_adjusted_weights(
            rd.from_arrow(t).repartition(5),
            sort_col="nm",
            tie_col="pk",
            tf_col="brand",
            m=m,
            window=window,
        ).take_all()
    }
    # brute force: rank by (nm, pk); pairs with rank diff 1..window-1
    order = sorted(range(n), key=lambda i: (names[i], i))
    from collections import Counter

    cnt = Counter(brands)
    u_field = sum((c / n) ** 2 for c in cnt.values())
    exp = {}
    for a in range(n):
        for b in range(a + 1, min(a + window, n)):
            i, j = order[a], order[b]
            agree = brands[i] == brands[j]
            w = (
                np.log2(m / (cnt[brands[i]] / n))
                if agree
                else np.log2((1 - m) / (1 - u_field))
            )
            exp[(i, j)] = (agree, round(float(w), 6))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert abs(got[k][1] - exp[k][1]) < 1e-9
    # rare-brand agreement outweighs common-brand agreement
    ws = {br: np.log2(m / (cnt[br] / n)) for br in cnt}
    assert ws[min(cnt, key=cnt.get)] > ws[max(cnt, key=cnt.get)]


# ------------------------------------------------------------------ B-cubed


def test_bcubed_metrics_known_values():
    from record_matching_ray.stages.evaluate import bcubed_metrics

    # pred: {0,1,2}{3,4}; truth: {0,1}{2,3}{4}
    assign = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "cluster_id": pa.array([10, 10, 10, 20, 20], pa.int64()),
            }
        )
    ).repartition(2)
    truth = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "truth_id": pa.array([100, 100, 200, 200, 300], pa.int64()),
            }
        )
    ).repartition(3)
    row = bcubed_metrics(assign, truth).take_all()[0]
    # closed form: P = (1/5)(4/3 + 1/3 + 1/2 + 1/2) = 8/15
    # R = (1/5)(4/2 + 1/2 + 1/2 + 1/1) = 4/5
    assert row["n"] == 5
    assert abs(row["bcubed_p"] - 8 / 15) < 1e-6
    assert abs(row["bcubed_r"] - 4 / 5) < 1e-6
    p, r = 8 / 15, 4 / 5
    assert abs(row["bcubed_f1"] - 2 * p * r / (p + r)) < 1e-6


def test_bcubed_perfect_clustering_is_one():
    from record_matching_ray.stages.evaluate import bcubed_metrics

    assign = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(10), pa.int64()),
                "cluster_id": pa.array([i % 3 for i in range(10)], pa.int64()),
            }
        )
    )
    truth = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(10), pa.int64()),
                "truth_id": pa.array([(i % 3) + 50 for i in range(10)], pa.int64()),
            }
        )
    )
    row = bcubed_metrics(assign, truth).take_all()[0]
    assert row["bcubed_p"] == 1.0 and row["bcubed_r"] == 1.0 and row["bcubed_f1"] == 1.0


# ----------------------------------------------------------- phrase blocklist


def test_phrase_blocklist_counts_and_kept():
    from record_matching_ray.stages.scrub import phrase_blocklist

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "the bad word here and bad word again",
                        "all clean text",
                        "bad word",
                        "word bad",  # reversed: no phrase hit
                    ],
                    pa.string(),
                ),
            }
        )
    ).repartition(2)
    out = {
        r["doc_id"]: r
        for r in phrase_blocklist(docs, ["bad word", "forbidden"]).take_all()
    }
    assert out[0]["n_hits"] == 2 and not out[0]["kept"]
    assert out[1]["n_hits"] == 0 and out[1]["kept"]
    assert out[2]["n_hits"] == 1 and not out[2]["kept"]
    assert out[3]["n_hits"] == 0 and out[3]["kept"]


def test_phrase_blocklist_multi_length_and_case():
    from record_matching_ray.stages.scrub import phrase_blocklist

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["Alpha BETA gamma delta beta"], pa.string()),
            }
        )
    )
    out = phrase_blocklist(docs, ["beta", "gamma delta"]).take_all()[0]
    # 'beta' twice (case-folded) + 'gamma delta' once
    assert out["n_hits"] == 3


# --------------------------------------------------------- mutual best match


def test_mutual_best_pairs_reciprocal_only():
    from record_matching_ray.stages.editjoin import mutual_best_pairs

    # 1's best is 2 (0.9) and 2's best is 1 -> kept.
    # 3's best is 1 (0.8) but 1's best is 2 -> dropped.
    pairs = rd.from_arrow(
        pa.table(
            {
                "left": pa.array([1, 1, 2], pa.int64()),
                "right": pa.array([2, 3, 3], pa.int64()),
                "jw": pa.array([0.9, 0.8, 0.5], pa.float64()),
            }
        )
    ).repartition(2)
    out = mutual_best_pairs(pairs).take_all()
    assert [(r["left"], r["right"], r["jw"]) for r in out] == [(1, 2, 0.9)]


def test_mutual_best_pairs_tie_breaks_to_smaller_id():
    from record_matching_ray.stages.editjoin import mutual_best_pairs

    # 5 ties between 6 and 7 at 0.9 -> picks 6; 6's best is 5 -> mutual.
    pairs = rd.from_arrow(
        pa.table(
            {
                "left": pa.array([5, 5, 6], pa.int64()),
                "right": pa.array([6, 7, 7], pa.int64()),
                "jw": pa.array([0.9, 0.9, 0.1], pa.float64()),
            }
        )
    )
    out = mutual_best_pairs(pairs).take_all()
    assert [(r["left"], r["right"]) for r in out] == [(5, 6)]


# --------------------------------------------------------------- Monge-Elkan


def test_monge_elkan_vs_bruteforce():
    from record_matching_ray.functions.strsim import jaro_winkler
    from record_matching_ray.stages.tfidf import monge_elkan_pairs

    names = ["red apple", "red aple", "blue pear", "red apple pie", "green kiwi"]
    t = pa.table(
        {
            "pk": pa.array(range(len(names)), pa.int64()),
            "nm": pa.array(names, pa.string()),
        }
    )
    got = {
        (r["left"], r["right"]): r["me"]
        for r in monge_elkan_pairs(
            rd.from_arrow(t).repartition(2), "pk", "nm", window=6, threshold=0.0
        ).take_all()
    }
    order = sorted(range(len(names)), key=lambda i: (names[i], i))
    for a in range(len(names)):
        for b in range(a + 1, min(a + 6, len(names))):
            i, j = order[a], order[b]
            lo, hi = min(i, j), max(i, j)
            s_toks = sorted(set(names[lo].lower().split()))
            t_toks = sorted(set(names[hi].lower().split()))
            exp = np.mean([max(jaro_winkler(x, y) for y in t_toks) for x in s_toks])
            assert abs(got[(lo, hi)] - round(float(exp), 6)) < 1e-9


# ------------------------------------------------------------ quality buckets


def test_quality_buckets_sizes_and_order(tmp_path):
    from record_matching_ray.pipelines.curate import quality_buckets

    rng = np.random.default_rng(4)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 15))) for _ in range(23)
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    rows = sorted(quality_buckets(docs, n_tiles=4).take_all(), key=lambda r: r["tile"])
    assert [r["tile"] for r in rows] == [1, 2, 3, 4]
    # SQL NTILE sizing: 23 = 6+6+6+5
    assert [r["n_docs"] for r in rows] == [6, 6, 6, 5]
    assert sum(r["n_docs"] for r in rows) == 23
    # tiles are ordered by score: band means must be non-decreasing
    means = [r["mean_lp"] for r in rows]
    assert means == sorted(means)


# -------------------------------------------------------------- snapshot diff


def test_snapshot_diff_statuses():
    from record_matching_ray.stages.snapshot import (
        snapshot_diff,
        snapshot_diff_counts,
    )

    old = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["a", "b", "c", "d"], pa.string()),
            }
        )
    ).repartition(2)
    new = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([2, 3, 4, 5], pa.int64()),
                "text": pa.array(["b", "c2", "d", "e"], pa.string()),
            }
        )
    ).repartition(3)
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id", ["text"]).take_all()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "unchanged", 5: "added"}
    counts = {
        r["status"]: r["n"]
        for r in snapshot_diff_counts(old, new, "id", ["text"]).take_all()
    }
    assert counts == {"removed": 1, "unchanged": 2, "changed": 1, "added": 1}


def test_snapshot_diff_multi_column_content():
    from record_matching_ray.stages.snapshot import snapshot_diff

    old = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "a": pa.array(["x", "y"], pa.string()),
                "b": pa.array(["1", "2"], pa.string()),
            }
        )
    )
    new = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "a": pa.array(["x", "y"], pa.string()),
                "b": pa.array(["1", "9"], pa.string()),
            }
        )
    )
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id", ["a", "b"]).take_all()}
    assert got == {1: "unchanged", 2: "changed"}


# ------------------------------------------------------------ forward as-of


def test_asof_join_forward_vs_pandas():
    from record_matching_ray.stages.temporal import asof_join

    rng = np.random.default_rng(8)
    lt = _events(n=120, keys=5, seed=8)
    rt = pa.table(
        {
            "o_custkey": pa.array(rng.integers(0, 5, 40), pa.int64()),
            "o_orderdate": pa.array(
                np.datetime64("2024-01-01", "us")
                + rng.integers(0, 10**9, 40) * np.timedelta64(1, "us"),
                pa.timestamp("us"),
            ),
            "o_orderkey": pa.array(np.arange(40), pa.int64()),
        }
    )
    # dedup (key, ts) on the right as the operator contract requires
    rdf = rt.to_pandas().groupby(["o_custkey", "o_orderdate"], as_index=False).max()
    rt = pa.Table.from_pandas(rdf, preserve_index=False).cast(
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderkey", pa.int64()),
            ]
        )
    )
    got = asof_join(
        rd.from_arrow(lt).repartition(4),
        rd.from_arrow(rt).repartition(3),
        on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["o_orderkey", "o_orderdate"],
        direction="forward",
    ).to_pandas()
    got = got.sort_values("event_id", ignore_index=True)
    ldf = lt.to_pandas()
    exp_keys = []
    for _, row in ldf.iterrows():
        cand = rdf[
            (rdf["o_custkey"] == row["user_id"])
            & (rdf["o_orderdate"] >= row["ts"])
        ]
        exp_keys.append(
            int(cand.sort_values("o_orderdate").iloc[0]["o_orderkey"])
            if len(cand)
            else None
        )
    exp = pd.Series(exp_keys, dtype="Int64")
    assert got.sort_values("event_id", ignore_index=True)["o_orderkey"].astype(
        "Int64"
    ).equals(exp.loc[ldf.sort_values("event_id").index].reset_index(drop=True))


# --------------------------------------------------------------------- PCA


def test_pca_fit_project_matches_numpy():
    from record_matching_ray.stages.vectorstats import pca_fit, pca_project

    rng = np.random.default_rng(10)
    # anisotropic data: a few dominant directions
    base = rng.normal(size=(200, 6)) @ np.diag([5.0, 3.0, 1.0, 0.5, 0.1, 0.05])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(200), pa.int64()),
            "embedding": pa.array(
                base.astype(np.float32).tolist(), pa.list_(pa.float32())
            ),
        }
    )
    embs = rd.from_arrow(t).repartition(4)
    comps, vals = pca_fit(embs, k=3)
    # reference: eigh of numpy covariance of the same (float32-cast) data
    x = base.astype(np.float32).astype(np.float64)
    c_ref = np.cov(x, rowvar=False)
    w_ref = np.sort(np.linalg.eigvalsh(c_ref))[::-1][:3]
    assert np.allclose(vals, w_ref, atol=1e-3)
    # orthonormal, deterministic sign
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-8)
    for r in range(3):
        assert comps[r, np.argmax(np.abs(comps[r]))] > 0
    proj = pca_project(embs, comps).take_all()
    got = {r["vec_id"]: np.asarray(r["proj"]) for r in proj}
    assert np.allclose(
        np.stack([got[i] for i in range(200)]), x @ comps.T, atol=1e-6
    )


def test_pca_check_all_ok():
    from record_matching_ray.stages.vectorstats import pca_check

    rng = np.random.default_rng(11)
    base = rng.normal(size=(150, 5)) @ np.diag([4.0, 2.0, 1.0, 0.3, 0.1])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(150), pa.int64()),
            "embedding": pa.array(
                base.astype(np.float32).tolist(), pa.list_(pa.float32())
            ),
        }
    )
    rows = pca_check(rd.from_arrow(t).repartition(3), k=4).take_all()
    assert len(rows) == 4
    assert all(r["ok"] for r in rows)
    assert len({r["total_var"] for r in rows}) == 1


# ----------------------------------------------------------- table profiler


def test_profile_table_counts():
    from record_matching_ray.stages.validate import profile_table

    t = pa.table(
        {
            "a": pa.array([1, 2, 2, None, 3], pa.int64()),
            "b": pa.array(["x", "x", None, None, "y"], pa.string()),
            "c": pa.array([1.5, 1.5, 1.5, 1.5, 1.5], pa.float64()),
        }
    )
    rows = {
        r["column"]: r
        for r in profile_table(rd.from_arrow(t).repartition(3), ["a", "b", "c"]).take_all()
    }
    assert rows["a"]["n_rows"] == 5 and rows["a"]["n_null"] == 1 and rows["a"]["n_distinct"] == 3
    assert rows["b"]["n_null"] == 2 and rows["b"]["n_distinct"] == 2
    assert rows["c"]["n_null"] == 0 and rows["c"]["n_distinct"] == 1
