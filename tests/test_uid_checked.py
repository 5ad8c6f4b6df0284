"""cfg.uid_mode="checked64" — the 10^12-page uid-collision path.

The two-column 128-bit uid alternative would double every pair shuffle;
instead the engine audits 63-bit collisions distributively and remaps the
expected-O(50) colliding urls via a broadcast dict (blocking.build_uid_remap).
Collisions are forced through base_remap pinning (a real blake collision
needs ~2^32 hashes), which exercises the same detect/remap machinery.
"""

import numpy as np
import pyarrow as pa

import ray.data

from record_matching_ray.config import PipelineConfig
from record_matching_ray.stages import blocking


def _flagged(urls, frozen):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "frozen": pa.array([frozen] * len(urls), pa.bool_()),
            }
        )
    )


def test_build_uid_remap_no_collisions_is_empty():
    urls = [f"https://ex{i}.com/p{i}" for i in range(200)]
    assert blocking.build_uid_remap(_flagged(urls, False)) == {}


def test_build_uid_remap_detects_and_fixes_forced_collision():
    urls = [f"https://example.com/page{i}" for i in range(64)]
    # force url[0] onto url[1]'s natural 63-bit id — a synthetic collision
    forced = {urls[0]: int(blocking.page_uids([urls[1]])[0])}
    remap = blocking.build_uid_remap(_flagged(urls, False), base_remap=forced)
    uids = blocking.page_uids(urls, remap)
    assert len(set(int(u) for u in uids)) == len(urls), "ids must be unique"
    # deterministic: rerunning the audit yields the same remap
    remap2 = blocking.build_uid_remap(_flagged(urls, False), base_remap=forced)
    assert remap == remap2


def test_build_uid_remap_frozen_side_never_moves():
    old = [f"https://old.com/{i}" for i in range(10)]
    new = [f"https://new.com/{i}" for i in range(10)]
    # force a cross collision: new[3] lands on old[5]'s id
    forced = {new[3]: int(blocking.page_uids([old[5]])[0])}
    ds = _flagged(old, True).union(_flagged(new, False))
    remap = blocking.build_uid_remap(ds, base_remap=forced)
    # old[5] keeps its natural id; new[3] was remapped off the forced id
    assert remap[new[3]] != forced[new[3]]
    assert old[5] not in remap or remap[old[5]] == int(
        blocking.page_uids([old[5]])[0]
    )
    all_uids = blocking.page_uids(old + new, remap)
    assert len(set(int(u) for u in all_uids)) == 20


def test_run_er_checked64_matches_hash64(tmp_path):
    """Flagship under the flag: with no real collisions the checked64 run
    must produce byte-identical clusters to hash64; the audit just adds
    the (empty-remap) passes."""
    import ray.data as rd

    from record_matching_ray.pipelines.er import run_er
    from record_matching_ray.testgen import write_pages_dir

    d = str(tmp_path / "corpus")
    write_pages_dir(d, n_pages=300, n_entities=60, seed=11)
    pages = rd.read_parquet(f"{d}/pages")
    base = run_er(pages, PipelineConfig()) ["clusters"].to_pandas()
    chk = run_er(pages, PipelineConfig(uid_mode="checked64"))["clusters"].to_pandas()
    a = base.sort_values(["url"]).reset_index(drop=True)
    b = chk.sort_values(["url"]).reset_index(drop=True)
    assert (a["url"] == b["url"]).all()
    assert (a["cluster_id"] == b["cluster_id"]).all()


def test_incremental_fold_checked64(tmp_path):
    """Incremental fold under the flag: base run persists uid_remap.json;
    the fold extends it with old urls frozen and stays green."""
    import os

    import ray.data as rd

    from record_matching_ray.pipelines.er import run_er
    from record_matching_ray.pipelines.incremental import run_er_incremental
    from record_matching_ray.testgen import write_pages_dir

    d = str(tmp_path / "corpus")
    out = str(tmp_path / "ckpt")
    write_pages_dir(d, n_pages=300, n_entities=60, seed=12)
    pages = rd.read_parquet(f"{d}/pages")
    cfg = PipelineConfig(uid_mode="checked64")

    def part(new_side):
        def fn(t):
            import zlib

            import numpy as _np

            ids = _np.array(
                [
                    zlib.crc32(u.encode()) % 3 == 0
                    for u in t.column("url").to_pylist()
                ]
            )
            return t.filter(pa.array(ids if new_side else ~ids))

        return fn

    old_pages = pages.map_batches(part(False), batch_format="pyarrow")
    new_pages = pages.map_batches(part(True), batch_format="pyarrow")
    run_er(old_pages, cfg, out_dir=out, input_key="k")
    assert os.path.exists(os.path.join(out, "uid_remap.json"))
    res = run_er_incremental(new_pages, cfg, out, "k")
    inc = res["clusters"].to_pandas()
    full = run_er(pages, cfg)["clusters"].to_pandas()
    a = inc.sort_values(["url"]).reset_index(drop=True)
    b = full.sort_values(["url"]).reset_index(drop=True)
    assert (a["url"] == b["url"]).all()
    assert (a["cluster_id"] == b["cluster_id"]).all()
    assert res["exact"] is True
