"""S1 — normalize + feature extraction over zero-copy Arrow batches.

Replaces the reference's Handlebars field templating + hashing + embedding
front-end (record_matching/main.py:75-102, templates at main.py:40-53)
with the web-page analog per BASELINE.json input_hint: extract canonical
host from url, byte-identical text from html, content hash, normalized
name/title, token hashes, MinHash signature, LSH band keys and a
deterministic hashing embedding — all in ONE map_batches pass, wide layout
(one column per feature) to avoid the reference's 9x row blow-up from
hive-partitioned long tables (context.py:7-13).

Stateless: pure functions of the batch; seeds/permutations are constants
compiled once per actor/worker in the callable's __init__.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from record_matching_ray.config import PipelineConfig
from record_matching_ray.functions.hashing import _U64, hash_strings, shingle_hashes
from record_matching_ray.functions.minhash import MinHasher
from record_matching_ray.functions.simhash import simhash

_TAG_RE = re.compile(rb"<[^>]*>")
_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title>", re.S | re.I)
_WS_RE = re.compile(r"\s+")
_HOST_RE = re.compile(r"^[a-z][a-z0-9+.-]*://([^/:?#]+)")
_TOKEN_RE = re.compile(r"[^\W_]+", re.U)
_YEAR_RE = re.compile(r"\b(1[0-9]{3}|20[0-2][0-9])\b")
_NAME_SUBS = [  # abbreviation expansion, after poc2:917-962's 13-rule table
    (re.compile(r"\bwm\.?\b"), "william"),
    (re.compile(r"\bjno\.?\b"), "john"),
    (re.compile(r"\bthos\.?\b"), "thomas"),
    (re.compile(r"\bchas\.?\b"), "charles"),
    (re.compile(r"\bgeo\.?\b"), "george"),
    (re.compile(r"\brobt\.?\b"), "robert"),
    (re.compile(r"\bjas\.?\b"), "james"),
]
_PUNCT_RE = re.compile(r"[^\w\s]", re.U)


def extract_text(html: bytes) -> str:
    """Pure deterministic html -> text (the per-row invariant: byte-identical
    extracted text per url). Strip tags, decode utf-8, collapse whitespace."""
    no_tags = _TAG_RE.sub(b" ", html)
    txt = no_tags.decode("utf-8", "replace")
    return _WS_RE.sub(" ", txt).strip()


def extract_title(html: bytes) -> str:
    m = _TITLE_RE.search(html)
    if not m:
        return ""
    return _WS_RE.sub(" ", m.group(1).decode("utf-8", "replace")).strip()


def canonical_host(url: str) -> str:
    """scheme/host normalization: lowercase host, strip leading www., port."""
    m = _HOST_RE.match(url.lower())
    if not m:
        return ""
    host = m.group(1)
    if host.startswith("www."):
        host = host[4:]
    return host


def normalize_name(name: str) -> str:
    """Lowercase, expand abbreviations, strip punctuation, collapse ws,
    reorder 'Last, First' -> 'First Last' (poc2:917-962, 1033-1051)."""
    s = name.lower()
    if "," in s:
        head, _, tail = s.partition(",")
        s = (tail.strip() + " " + head.strip()).strip()
    for rx, rep in _NAME_SUBS:
        s = rx.sub(rep, s)
    s = _PUNCT_RE.sub(" ", s)
    return _WS_RE.sub(" ", s).strip()


def sha1_hex(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8", "surrogatepass")).hexdigest()


def first_year(text: str) -> float:
    m = _YEAR_RE.search(text)
    return float(m.group(1)) if m else float("nan")


class ExtractFeatures:
    """Callable for ds.map_batches(..., batch_format="pyarrow").

    Emits one wide row per page:
      url, host, warc_ts, lang, text, text_hash, name, year,
      n_tokens, token_sig (space-joined first max_tokens normalized tokens),
      minhash (fixed_size_list<uint64? stored as list<uint64>> via numpy),
      simhash (uint64), embedding (fixed_size_list<float32, embed_dim>).
    """

    def __init__(
        self,
        cfg: PipelineConfig | None = None,
        with_html: bool = True,
        encoder=None,
        registry=None,
    ):
        self.cfg = cfg or PipelineConfig()
        self.hasher = MinHasher(self.cfg.num_perm)
        self.with_html = with_html
        # pluggable embedding encoder (functions/encoder.py protocol):
        # resolved ONCE per actor. `encoder` may be an instance or a
        # zero-arg factory (heavy models should use a factory so the
        # model loads in the actor, not on the driver / in the pickle).
        if encoder is None:
            from record_matching_ray.functions.encoder import HashingEncoder

            self.encoder = HashingEncoder(
                self.cfg.embed_dim, self.cfg.max_tokens
            )
        else:
            self.encoder = encoder() if callable(encoder) and not hasattr(
                encoder, "encode"
            ) else encoder
        # declarative custom fields (registry.py): extracted after the
        # built-in columns so FieldSpec.extract sees the wide batch
        self.registry = registry

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        urls = batch.column("url").to_pylist()
        if self.with_html and "html" in batch.schema.names:
            htmls = batch.column("html").to_pylist()
            texts = [extract_text(h) for h in htmls]
            names = [normalize_name(extract_title(h)) for h in htmls]
        else:
            texts = batch.column("text").to_pylist()
            names = [normalize_name(t[:80]) for t in texts]

        hosts = [canonical_host(u) for u in urls]
        text_hashes = [sha1_hex(t) for t in texts]
        years = np.array([first_year(t) for t in texts], dtype=np.float64)

        # tokenization + per-doc token hash spans (vectorized hashing over
        # the batch vocabulary)
        token_lists = [_TOKEN_RE.findall(t.lower())[: cfg.max_tokens] for t in texts]
        lens = np.array([len(t) for t in token_lists], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        flat_tokens = [tok for toks in token_lists for tok in toks]
        flat_hashes = hash_strings(flat_tokens)

        # shingles per doc -> flat shingle array + offsets
        sh_list = [
            shingle_hashes(flat_hashes[offsets[i] : offsets[i + 1]], cfg.shingle_k)
            for i in range(len(texts))
        ]
        sh_lens = np.array([len(s) for s in sh_list], dtype=np.int64)
        sh_offsets = np.concatenate([[0], np.cumsum(sh_lens)])
        flat_shingles = (
            np.concatenate(sh_list) if sh_list else np.empty(0, dtype=_U64)
        )

        sigs = self.hasher.signatures(flat_shingles, sh_offsets)  # (n, num_perm)
        sh = simhash(flat_hashes, offsets)
        emb = np.ascontiguousarray(
            self.encoder.encode(texts, flat_hashes, offsets), dtype=np.float32
        )

        token_sig = [" ".join(toks[:64]) for toks in token_lists]

        n = len(texts)
        cols = {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "lang": batch.column("lang")
            if "lang" in batch.schema.names
            else pa.array([""] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "text_hash": pa.array(text_hashes, pa.string()),
            "name": pa.array(names, pa.string()),
            "year": pa.array(years, pa.float64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "token_sig": pa.array(token_sig, pa.string()),
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.ravel(), pa.uint64()), cfg.num_perm
            ),
            "simhash": pa.array(sh, pa.uint64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float32()), cfg.embed_dim
            ),
        }
        if "warc_ts" in batch.schema.names:
            cols["warc_ts"] = batch.column("warc_ts")
        if self.registry:
            wide = pa.table(cols)
            for f in self.registry:
                arr = f.extract(wide)
                if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
                    arr = pa.array(arr, f.dtype)
                cols[f.name] = arr
        return pa.table(cols)


def minhash_matrix(col: pa.ChunkedArray | pa.Array, num_perm: int) -> np.ndarray:
    """Zero-copy-ish (n, num_perm) uint64 view of a fixed_size_list column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    return flat.to_numpy(zero_copy_only=False).reshape(-1, num_perm)


def embedding_matrix(col: pa.ChunkedArray | pa.Array, dim: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    return flat.to_numpy(zero_copy_only=False).reshape(-1, dim).astype(np.float32)


def embed_texts(
    ds,
    encoder_factory,
    dim: int,
    text_col: str = "text",
    out_col: str = "embedding",
    batch_size: int = 256,
    concurrency: int | None = None,
):
    """Standalone embedding stage: add a fixed_size_list<float32, dim>
    column computed by a pluggable encoder (functions/encoder.py).

    ``encoder_factory``: ZERO-ARG callable building the encoder — runs in
    each actor's __init__ so the model/client loads once per actor, never
    per batch and never on the driver (reference: the per-stage remote
    embedding client, record_matching/main.py:96-102). Batch size small
    by default: remote APIs rate-limit, and embedding payloads are the
    widest rows in the pipeline."""
    import ray.data  # noqa: F401 — ds is a ray.data.Dataset

    from record_matching_ray.stages.util import cluster_parallelism

    class _EmbedActor:
        def __init__(self):
            self.enc = encoder_factory()

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t.column(text_col).to_pylist()
            mat = np.ascontiguousarray(
                self.enc.encode(texts), dtype=np.float32
            )
            if mat.shape != (len(texts), dim):
                raise ValueError(
                    f"encoder returned {mat.shape}, want {(len(texts), dim)}"
                )
            col = pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), pa.float32()), dim
            )
            if out_col in t.schema.names:
                t = t.drop_columns([out_col])
            return t.append_column(out_col, col)

    return ds.map_batches(
        _EmbedActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency or cluster_parallelism()),
    )
