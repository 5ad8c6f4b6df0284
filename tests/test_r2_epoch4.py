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
