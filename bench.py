"""Benchmark driver — prints ONE JSON line with per-query wall times.

Usage:
  python bench.py                 # headline queries over $GRAFT_SF_DIR
  python bench.py --scaling      # same flagship job at 8 and 32 CPUs in
                                 # fresh processes -> throughput at both +
                                 # scaling efficiency (BASELINE.md target
                                 # >= 0.8 between N and 4N)
  python bench.py --worker N     # internal: one flagship run at N cpus

Environment: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32). This script OWNS its Ray session (the only places allowed
to: bench, CLI, test fixture).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_TMP = "/tmp/rmray_bench"

# flagship synthetic-pages corpus (generated once, read by every run)
PAGES_N = int(os.environ.get("RMRAY_BENCH_PAGES", "6000"))
PAGES_ENTITIES = max(10, PAGES_N // 7)
PAGES_SEED = 42


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _ensure_corpus() -> str:
    """Deterministic pages corpus under /tmp (no Ray needed to build)."""
    out = os.path.join(BENCH_TMP, f"pages_{PAGES_N}_{PAGES_SEED}")
    marker = os.path.join(out, "truth_clusters.parquet")
    if not os.path.exists(marker):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from record_matching_ray.testgen import write_pages_dir

        write_pages_dir(out, PAGES_N, PAGES_ENTITIES, PAGES_SEED, shards=16)
    return out


def run_flagship(num_cpus: int) -> dict:
    """End-to-end ER over the synthetic pages corpus with per-stage
    checkpoints; returns elapsed seconds + pairs-scored counters."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    corpus = _ensure_corpus()
    _init_ray(num_cpus)
    import ray
    import ray.data
    from record_matching_ray.config import PipelineConfig
    from record_matching_ray.pipelines.er import run_er
    from record_matching_ray.state import manifest as mf

    ckpt = os.path.join(BENCH_TMP, f"ckpt_{num_cpus}")
    shutil.rmtree(ckpt, ignore_errors=True)
    cfg = PipelineConfig()
    pages = ray.data.read_parquet(os.path.join(corpus, "pages"))
    t0 = time.time()
    res = run_er(pages, cfg, out_dir=ckpt, input_key=f"bench:{PAGES_N}")
    n_clusters = res["canonical"].count()
    elapsed = time.time() - t0
    pairs_scored = mf.read_manifest(os.path.join(ckpt, "pairs"))["rows"]
    n_edges = mf.read_manifest(os.path.join(ckpt, "edges"))["rows"]
    return {
        "elapsed_s": round(elapsed, 3),
        "pages": PAGES_N,
        "pairs_scored": pairs_scored,
        "edges": n_edges,
        "clusters": n_clusters,
        "pairs_per_sec": round(pairs_scored / elapsed, 1),
        "pages_per_sec": round(PAGES_N / elapsed, 1),
        "num_cpus": num_cpus,
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    """Headline operator timings over the sf tables. Each query is fully
    consumed (count) so lazy pipelines execute end to end."""
    import __ray_entry__ as E

    qs = E.queries()
    names = [
        "q1_lineitem",
        "top_customers",
        "events_by_type",
        "exact_dedup_docs",
        "minhash_neardup_docs",
        "simhash_neardup_docs",
        "ngram_jaccard_docs",
        "embedding_neardup",
        "knn_bruteforce",
        "knn_lsh",
        "doc_quality",
        "er_clusters_documents",
    ]
    times: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        res = qs[name](sf_dir)
        # consume
        import ray.data

        if isinstance(res, ray.data.Dataset):
            res.count()
        times[name] = round(time.time() - t0, 3)
    return times


def main_bench() -> None:
    _init_ray(NUM_CPUS)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    t_start = time.time()
    qtimes = run_queries(SF_DIR)
    flagship = run_flagship(NUM_CPUS)
    qtimes["er_pages_flagship"] = flagship["elapsed_s"]
    total = round(time.time() - t_start, 3)
    out = {
        "metric": "end-to-end seconds (headline queries + flagship pages-ER)",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "flagship": flagship,
    }
    print(json.dumps(out))
    import ray

    ray.shutdown()


def main_worker(num_cpus: int) -> None:
    r = run_flagship(num_cpus)
    print(json.dumps(r))
    import ray

    ray.shutdown()


def main_scaling() -> None:
    """Fresh process per CPU count (sandbox proxy for N vs 4N nodes).

    Uses a 64x corpus (384k pages / ~71M scored pairs) so the scalable
    per-pair work dominates the fixed per-run costs (driver fixpoint
    control, checkpoint IO to the single shared disk, session startup) at
    32 CPUs — the regime a real multi-hour 100TB run is always in."""
    env = dict(os.environ, RMRAY_BENCH_PAGES=os.environ.get("RMRAY_BENCH_PAGES", "384000"))
    results = {}
    for cpus in (8, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8 = results[8]["pairs_per_sec"]
    t32 = results[32]["pairs_per_sec"]
    eff = (t32 / t8) / (32 / 8)
    out = {
        "metric": "scaling efficiency 8->32 cpus (pairs scored/sec)",
        "value": round(eff, 4),
        "unit": "efficiency",
        "queries": {
            "flagship_cpus8_s": results[8]["elapsed_s"],
            "flagship_cpus32_s": results[32]["elapsed_s"],
        },
        "throughput_8": t8,
        "throughput_32": t32,
        "pairs_scored": results[32]["pairs_scored"],
        "sf": f"synthetic pages n={results[32]['pages']}",
        "num_cpus": 32,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--worker" in sys.argv:
        main_worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        main_bench()
