"""WARC source: stdlib writer fixture -> read_warc/pages_from_warc, plain
and gzip-member archives, truncated tails, HTTP body extraction."""

import gzip
import os

from record_matching_ray.sources.warc import (
    http_body,
    pages_from_warc,
    parse_warc_bytes,
    read_warc,
)


def _record(warc_type: str, url: str, ts: str, payload: bytes) -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def _http(body: bytes) -> bytes:
    return b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body


def _archive() -> bytes:
    return (
        _record("warcinfo", "", "2024-01-01T00:00:00Z", b"software: test")
        + _record(
            "response",
            "http://a.example/x",
            "2024-01-01T00:00:01Z",
            _http(b"<html><title>Alpha</title></html>"),
        )
        + _record(
            "response",
            "http://b.example/y",
            "2024-01-01T00:00:02Z",
            _http(b"<html><title>Beta</title></html>"),
        )
    )


def test_parse_warc_bytes_plain_and_truncated():
    recs = parse_warc_bytes(_archive())
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "response"]
    assert recs[1]["url"] == "http://a.example/x"
    assert http_body(recs[1]["payload"]) == b"<html><title>Alpha</title></html>"
    # truncated tail: records before the cut survive
    cut = _archive()[:-40]
    recs2 = parse_warc_bytes(cut)
    assert len(recs2) == 2


def test_read_warc_gz_members_and_pages(tmp_path):
    plain = tmp_path / "a.warc"
    plain.write_bytes(_archive())
    # .gz layout: one gzip member per record
    gz = tmp_path / "b.warc.gz"
    members = b"".join(
        gzip.compress(r)
        for r in (
            _record("warcinfo", "", "2024-01-01T00:00:00Z", b"software: test"),
            _record(
                "response",
                "http://c.example/z",
                "2024-01-01T00:00:03Z",
                _http(b"<html><title>Gamma</title></html>"),
            ),
        )
    )
    gz.write_bytes(members)

    ds = read_warc([str(plain), str(gz)])
    rows = ds.take_all()
    assert len(rows) == 5
    assert sum(1 for r in rows if r["warc_type"] == "response") == 3

    pages = pages_from_warc([str(plain), str(gz)]).take_all()
    assert {p["url"] for p in pages} == {
        "http://a.example/x",
        "http://b.example/y",
        "http://c.example/z",
    }
    got = {p["url"]: bytes(p["html"]) for p in pages}
    assert got["http://c.example/z"] == b"<html><title>Gamma</title></html>"


def test_pages_from_warc_feed_er_features(tmp_path):
    """The adapter output is a valid flagship input: build_features runs
    on it directly."""
    from record_matching_ray.config import PipelineConfig
    from record_matching_ray.pipelines.er import build_features

    p = tmp_path / "c.warc"
    p.write_bytes(_archive())
    pages = pages_from_warc(str(p))
    feats = build_features(pages, PipelineConfig())
    rows = feats.take_all()
    assert len(rows) == 2
    assert all("name" in r and "host" in r for r in rows)
