"""S1 extraction: purity of html->text, url canonicalization, name
normalization, feature schema (per-row invariant from BASELINE.json
input_hint: byte-identical extracted text per url)."""

import numpy as np
import pyarrow as pa

from record_matching_ray.config import PipelineConfig
from record_matching_ray.stages.extract import (
    ExtractFeatures,
    canonical_host,
    extract_text,
    extract_title,
    first_year,
    minhash_matrix,
    normalize_name,
    sha1_hex,
)
from record_matching_ray.testgen import make_pages


def test_extract_text_pure_and_deterministic():
    html = b"<html><head><title>T</title></head><body><p>Hello   <b>world</b></p></body></html>"
    t1 = extract_text(html)
    t2 = extract_text(bytes(html))
    assert t1 == t2 == "T Hello world"


def test_extract_text_byte_identical_in_generator():
    pages, _, _ = make_pages(200, 50, 7)
    for html, text in zip(
        pages.column("html").to_pylist(), pages.column("text").to_pylist()
    ):
        assert extract_text(html) == text


def test_extract_title():
    assert extract_title(b"<html><title>A  B</title></html>") == "A B"
    assert extract_title(b"<html><body>x</body></html>") == ""


def test_canonical_host():
    assert canonical_host("https://WWW.Example.COM/path?q=1") == "example.com"
    assert canonical_host("http://sub.host.org/x") == "sub.host.org"
    assert canonical_host("not a url") == ""


def test_normalize_name():
    assert normalize_name("Schubert, Franz") == "franz schubert"
    assert normalize_name("Wm. Shakespeare") == "william shakespeare"
    assert normalize_name("  O'Neill,   J.  ") == "j o neill"


def test_first_year():
    assert first_year("born 1797 died 1828") == 1797.0
    assert np.isnan(first_year("no year here"))
    assert first_year("year 2023 ok") == 2023.0


def test_extract_features_schema_and_hash():
    pages, _, _ = make_pages(50, 10, 3)
    out = ExtractFeatures(PipelineConfig())(pages)
    names = set(out.schema.names)
    assert {
        "url",
        "host",
        "text",
        "text_hash",
        "name",
        "year",
        "n_tokens",
        "token_sig",
        "minhash",
        "simhash",
        "embedding",
    } <= names
    # content hash matches a direct sha1 of the text
    assert out.column("text_hash")[0].as_py() == sha1_hex(
        out.column("text")[0].as_py()
    )
    sigs = minhash_matrix(out.column("minhash"), 64)
    assert sigs.shape == (50, 64)
    assert sigs.dtype == np.uint64


def test_extract_features_without_html():
    t = pa.table(
        {
            "url": ["https://a.com/1"],
            "text": ["Some Person b. 1900 " + " ".join(f"w{i}" for i in range(30))],
            "lang": ["en"],
        }
    )
    out = ExtractFeatures(PipelineConfig(), with_html=False)(t)
    assert out.num_rows == 1
    assert out.column("year")[0].as_py() == 1900.0
