"""Local DuckDB-oracle parity for the round-2 converted queries.

The driver's correctness gate runs at sf0.01; these tests pin the same
query-vs-SQL comparisons at sf0.001 so a regression is caught by pytest
before the driver sees it. Skipped if the testdata directory is absent.
"""

import os

import numpy as np
import pytest

duckdb = pytest.importorskip("duckdb")

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings", "events", "part", "orders", "customer", "lineitem", "nation", "region", "supplier"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _compare(res, odf):
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    cols = sorted(df.columns)
    assert cols == sorted(odf.columns)
    assert len(df) == len(odf)
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating):
            assert np.array_equal(
                av.astype(float), bv.astype(float), equal_nan=True
            ), c
        else:
            assert (av == bv).all(), c


@pytest.mark.parametrize(
    "name",
    [
        "ngram_jaccard_docs",
        "minhash_neardup_docs",
        "embedding_neardup",
        "knn_lsh",
        "knn_ivf",
        "langid_docs",
        "doc_distinct_estimate",
        "filtered_vector_search",
        "canonical_documents",
        "events_range_window",
        "user_latest_event",
        "embedding_covariance",
        "source_token_kl",
        "part_soft_tfidf",
        "kmeans_embeddings",
        "semdedup_embeddings",
        "doc_chunks",
        "doc_bigram_logprob",
        "doc_set_jaccard",
        "doc_dsir_weights",
        "part_soundex",
        "hybrid_search_docs",
        "orders_price_dist",
        "copurchase_lift_parts",
        "event_transitions",
        "customer_symspell",
        "user_type_entropy",
        "lineitem_unpivot",
        "blocking_quality_docs",
        "hll_users_by_type",
        "orders_benford",
        "orders_daily_ewma",
        "supplier_full_coverage",
        "nation_priority_mode",
        "zipf_slope_docs",
        "events_value_auc",
        "events_value_calibration",
        "weighted_jaccard_docs",
        "user_survival_km",
        "event_trigram_counts",
        "events_chi2",
        "adamic_adar_names",
        "media_video_stats",
        "triple_support_parts",
        "orders_acf",
        "part_price_moments",
        "events_mutual_info",
        "user_activity_gini",
        "lineitem_winsorized_mean",
        "event_type_cosine",
        "part_initials_block",
        "q6_forecast_revenue",
        "q4_order_priority",
        "q12_returnflag_priority",
        "q14_promo_revenue",
        "q19_discounted_revenue",
        "q7_nation_volume",
        "nation_price_slope",
        "neardup_canonical_docs",
        "doc_token_entropy",
        "source_hapax_ratio",
        "leakage_safe_split_docs",
        "name_clustering_coeff",
        "cross_source_dup_matrix",
        "user_interarrival_cv",
    ],
)
def test_query_matches_duckdb_oracle(con, name):
    import __ray_entry__ as entry

    res = entry.queries()[name](SF_DIR)
    odf = con.execute(entry.oracle_sql()[name]).df()
    _compare(res, odf)


def test_er_clusters_matches_components_oracle(con):
    import __ray_entry__ as entry

    res = entry.queries()["er_clusters_documents"](SF_DIR)
    odf = con.execute(entry.oracle_sql()["er_clusters_documents"]).df()
    _compare(res, odf)
