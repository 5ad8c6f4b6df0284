"""Declarative field/feature registry (registry.py) — SURVEY §2.14 full
parity: a registered custom field flows extract -> payload -> score ->
weights with no other edits (reference analog: the 9-key template dict,
main.py:40-53)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from record_matching_ray.config import FEATURE_NAMES, PipelineConfig
from record_matching_ray.registry import FeatureRegistry, FieldSpec
from record_matching_ray.stages.extract import ExtractFeatures


def _lang_registry():
    def extract_lang(wide: pa.Table) -> pa.Array:
        return wide.column("lang").combine_chunks() if isinstance(
            wide.column("lang"), pa.ChunkedArray
        ) else wide.column("lang")

    def compare_lang(l: np.ndarray, r: np.ndarray) -> np.ndarray:
        return (l == r).astype(np.float64)

    return FeatureRegistry(
        [FieldSpec("page_lang", extract_lang, compare_lang, pa.string())]
    )


def test_registry_validation():
    import pytest

    reg = _lang_registry()
    assert reg.feature_names() == FEATURE_NAMES + ("f_page_lang",)
    assert reg.payload_columns() == ["page_lang"]
    assert reg.fingerprint().startswith(":r")
    assert not FeatureRegistry()
    with pytest.raises(ValueError, match="collide"):
        FeatureRegistry([FieldSpec("name", lambda t: t, lambda a, b: a)])


def test_registered_field_flows_extract_to_score():
    cfg = PipelineConfig(embed_dim=16, emit_features=True)
    reg = _lang_registry()
    batch = pa.table(
        {
            "url": pa.array(
                [f"https://h{i}.com/p" for i in range(4)], pa.string()
            ),
            "text": pa.array(
                ["common text body here"] * 4, pa.string()
            ),
            "lang": pa.array(["en", "en", "de", "en"], pa.string()),
        }
    )
    feats = ExtractFeatures(cfg, with_html=False, registry=reg)(batch)
    assert "page_lang" in feats.schema.names
    assert feats.column("page_lang").to_pylist() == ["en", "en", "de", "en"]

    # attach + score: pairs (0,1) same lang, (0,2) different
    from record_matching_ray.stages import blocking, scoring

    urls = feats.column("url").to_pylist()
    pairs = rd.from_arrow(
        pa.table(
            {
                "left": pa.array([urls[0], urls[0]], pa.string()),
                "right": pa.array([urls[1], urls[2]], pa.string()),
            }
        )
    )
    wide = blocking.attach_pair_payload(
        pairs, rd.from_arrow(feats), cfg,
        extra_payload=reg.payload_columns(),
    )
    scored = scoring.score_pairs(wide, cfg, registry=reg).to_pandas()
    assert "f_page_lang" in scored.columns
    by_pair = {
        (r["left"], r["right"]): r["f_page_lang"]
        for _, r in scored.iterrows()
    }
    assert by_pair[(urls[0], urls[1])] == 1.0
    assert by_pair[(urls[0], urls[2])] == 0.0


def test_registered_field_trains_a_weight(tmp_path):
    """End to end with run_er: labels follow the CUSTOM field, training
    learns a positive weight for it, clusters respect it."""
    from record_matching_ray.pipelines.er import (
        run_er,
        train_weights_from_labeled,
        build_features,
    )
    from record_matching_ray.testgen import write_pages_dir

    d = str(tmp_path / "c")
    write_pages_dir(d, n_pages=200, n_entities=40, seed=3)
    pages = rd.read_parquet(f"{d}/pages")
    labeled = rd.read_parquet(f"{d}/labeled_pairs.parquet")
    cfg = PipelineConfig()
    reg = _lang_registry()
    feats = build_features(pages, cfg, registry=reg)
    ic, w, auc = train_weights_from_labeled(feats, labeled, cfg, registry=reg)
    assert len(w) == len(FEATURE_NAMES) + 1
    assert auc > 0.99
    res = run_er(pages, cfg, weights=(ic, w), registry=reg)
    clusters = res["clusters"].to_pandas()
    assert len(clusters) == 200
    # same corpus without the registry must also cluster (sanity anchor)
    base = run_er(pages, cfg)["clusters"].to_pandas()
    assert len(base) == 200
