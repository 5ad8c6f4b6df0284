"""URL canonicalization + URL-level dedup (stages/urls.py)."""

import pyarrow as pa
import ray.data as rd

from record_matching_ray.stages.urls import (
    canonicalize_url,
    canonicalize_urls,
    url_dedup,
)


def test_canonicalize_url_rules():
    # scheme dropped, host lowercased, www./default-port stripped
    assert canonicalize_url("HTTPS://WWW.Example.COM:443/a") == (
        "example.com",
        "example.com/a",
    )
    assert canonicalize_url("http://example.com:80/a") == (
        "example.com",
        "example.com/a",
    )
    # non-default port kept
    assert canonicalize_url("http://example.com:8080/a")[1] == "example.com:8080/a"
    # trailing slashes stripped, path case kept
    assert canonicalize_url("http://example.com/A/B///")[1] == "example.com/A/B"
    # fragment dropped
    assert canonicalize_url("http://example.com/a#frag")[1] == "example.com/a"
    # tracking params dropped, rest sorted; empty params dropped
    assert (
        canonicalize_url("http://e.com/p?utm_source=x&b=2&&a=1&fbclid=z&ref=h")[1]
        == "e.com/p?a=1&b=2"
    )
    # all params tracked -> no '?'
    assert canonicalize_url("http://e.com/p?utm_campaign=x")[1] == "e.com/p"
    # no scheme -> lowercased fragment-stripped self, empty host
    assert canonicalize_url("Example.com/A#x") == ("", "example.com/a")


def test_url_dedup_collapses_families():
    urls = [
        "https://www.example.com/a?utm_source=x",
        "http://example.com/a/",
        "http://EXAMPLE.com:80/a#top",
        "http://example.com/b",
        "http://other.org/a",
    ]
    pages = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    out = url_dedup(pages).to_pandas().set_index("canon_url")
    assert out.loc["example.com/a", "cnt"] == 3
    # lexicographic min of the three raw spellings
    assert out.loc["example.com/a", "keep_url"] == "http://EXAMPLE.com:80/a#top"
    assert out.loc["example.com/b", "cnt"] == 1
    assert out.loc["other.org/a", "cnt"] == 1
    assert len(out) == 3


def test_canonicalize_urls_batch_columns():
    pages = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    ["https://www.a.com/x?b=2&a=1", "http://b.net:8080/"],
                    pa.string(),
                ),
                "k": pa.array([1, 2], pa.int64()),
            }
        )
    )
    df = canonicalize_urls(pages).to_pandas().sort_values("k")
    assert list(df.columns) == ["url", "k", "host", "canon_url"]
    assert df["host"].tolist() == ["a.com", "b.net:8080"]
    assert df["canon_url"].tolist() == ["a.com/x?a=1&b=2", "b.net:8080"]
