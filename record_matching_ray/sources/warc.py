"""WARC (Web ARChive, ISO 28500) source — the native format of web
crawls (Common Crawl, Heritrix, wget --warc). The reference ingests
already-extracted page tables; a web-scale ER engine must also read the
crawl archives themselves, so `read_warc` turns a directory of
.warc / .warc.gz files into a Dataset of records and `pages_from_warc`
adapts response records to the flagship pipeline's input shape
(url, warc_ts, html) — `run_er` works directly on crawl output.

Scale shape: one Ray read task per WARC file (`read_binary_files` fans
paths out to tasks; files are the natural parallelism unit of a crawl —
Common Crawl ships ~1 GB segments); parsing is a stateless flat
emission, no shuffle. Gzipped WARCs use per-record gzip MEMBERS, so a
whole file streams through one zlib decompressobj loop without loading
the decompressed archive at once.

Parsing is stdlib-only (bytes scanning + zlib): headers until the blank
line, exactly Content-Length payload bytes, the \\r\\n\\r\\n record
separator. Truncated/malformed tails are tolerated (normal in crawls):
a bad record stops that file's parse and the records before it are
kept.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

import ray.data

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the WARC .gz layout)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
        if not d.eof and not d.unused_data:
            break
    return b"".join(out)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """All WARC records in one archive's bytes: list of dicts with
    warc_type, url, warc_ts, content_type, payload (bytes)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n or not data[pos : pos + 5] == b"WARC/":
            break
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + len(_CRLF2)
        if body_start + length > n:
            break  # truncated tail
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": headers.get("warc-date", ""),
                "content_type": headers.get("content-type", ""),
                "payload": data[body_start : body_start + length],
            }
        )
        pos = body_start + length
    return records


def http_body(payload: bytes) -> bytes:
    """Body of an HTTP response payload (drop the status line+headers);
    payloads without an HTTP header block pass through unchanged."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(_CRLF2)
        if sep >= 0:
            return payload[sep + len(_CRLF2) :]
    return payload


def read_warc(paths: str | list[str]) -> ray.data.Dataset:
    """Dataset of WARC records (warc_type, url, warc_ts, content_type,
    payload: binary) — one read task per archive file."""
    files = ray.data.read_binary_files(paths, include_paths=False)

    def emit(batch: dict) -> pa.Table:
        rows = []
        for data in batch["bytes"]:
            rows.extend(parse_warc_bytes(bytes(data)))
        return pa.table(
            {
                "warc_type": pa.array([r["warc_type"] for r in rows], pa.string()),
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.string()),
                "content_type": pa.array(
                    [r["content_type"] for r in rows], pa.string()
                ),
                "payload": pa.array([r["payload"] for r in rows], pa.binary()),
            }
        )

    return files.map_batches(emit, batch_format="numpy")


def pages_from_warc(paths: str | list[str]) -> ray.data.Dataset:
    """Response records adapted to the flagship page shape
    (url: string, warc_ts: timestamp[us], html: binary) —
    `pipelines.er.run_er` runs directly on this."""
    import numpy as np

    def adapt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.equal(t.column("warc_type"), "response"))
        html = [
            http_body(p.as_py() if p is not None else b"")
            for p in t.column("payload")
        ]
        # WARC-Date is ISO 8601 UTC ("2024-01-01T00:00:01Z")
        ts = np.array(
            [
                np.datetime64(s.rstrip("Z"), "us") if s else np.datetime64("NaT")
                for s in t.column("warc_ts").to_pylist()
            ],
            dtype="datetime64[us]",
        )
        return pa.table(
            {
                "url": t.column("url"),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(html, pa.binary()),
            }
        )

    return read_warc(paths).map_batches(adapt, batch_format="pyarrow")
