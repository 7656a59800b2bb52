"""sf1.0-class crawl probe — the 128-GiB-ceiling audit (VERDICT r4 item 6).

Builds the deterministic synthetic corpus at RAYZENO_PROBE_SF (default
1.0 ≈ 20M-URL universe / ~21M fetched pages, ~2.5x the sf0.3 leg that
proved flat throughput) UNTIMED in an isolated subprocess + Ray session
(the bench.py writeback-contamination discipline), drains writeback,
then runs ONE headline-config crawl in this fresh Ray session while
sampling node memory. Prints one JSON line:

    {"sf": ..., "corpus_build_sec": ..., "crawl_sec": ..., "pages": ...,
     "pages_per_sec": ..., "epochs": ..., "seen_size": ...,
     "peak_node_used_gb": ..., "driver_peak_rss_gb": ...}

Usage: python scripts/probe_bigcrawl.py   (env: RAYZENO_PROBE_SF,
RAY_GRAFT_CPUS). Results are recorded in BASELINE.md; the probe is not
part of the per-round driver bench (it is a one-off scale audit).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    import zeno_ray

    ncpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = float(os.environ.get("RAYZENO_PROBE_SF", "1.0"))

    from zeno_ray.config import CrawlConfig
    from zeno_ray.corpus import CorpusSpec
    from zeno_ray.crawl import run_crawl, warm_cluster

    spec = CorpusSpec.for_sf(sf)
    t0 = time.perf_counter()
    # isolated subprocess + own Ray session: the timed crawl below must
    # not inherit the build's plasma/writeback pressure (BASELINE.md r5).
    # The parent's Ray session starts only AFTER the build returns, so a
    # second object store never coexists with the build's — the largest
    # memory event of the run must not fight the probe's own plasma
    # reservation on the very host being memory-audited.
    import subprocess

    code = (
        "import ray; import zeno_ray;"
        f"ray.init(address='local', num_cpus={ncpus},"
        " include_dashboard=False, logging_level='ERROR',"
        " runtime_env=zeno_ray.runtime_env());"
        "from zeno_ray.corpus import CorpusSpec,ensure_corpus,corpus_dir_for_sf;"
        f"ensure_corpus(CorpusSpec.for_sf({sf}),corpus_dir_for_sf({sf}));"
        "ray.shutdown()"
    )
    sub = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if sub.returncode != 0:
        raise RuntimeError("corpus build subprocess failed")
    build_sec = time.perf_counter() - t0
    os.sync()
    time.sleep(10)

    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             logging_level="ERROR", runtime_env=zeno_ray.runtime_env())
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    warm_cluster(ncpus)

    peak = {"node_used_gb": 0.0}
    stop = threading.Event()

    def sampler() -> None:
        while not stop.is_set():
            m = {}
            with open("/proc/meminfo") as f:
                for line in f:
                    k, v = line.split(":", 1)
                    m[k.strip()] = int(v.strip().split()[0])
            used = (m["MemTotal"] - m["MemAvailable"]) / 1e6  # kB -> GB
            peak["node_used_gb"] = max(peak["node_used_gb"], used)
            stop.wait(2.0)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()

    cfg = CrawlConfig(
        max_hops=6, max_epochs=32, seen_shards=min(16, max(4, ncpus // 2)),
        fetch_concurrency=max(4, ncpus // 2),
        fetch_batch_size=64 * ncpus, extract_batch_size=32 * ncpus,
        pages_target_part_bytes=128 * 1024 * 1024,
    )
    ckpt = f"/tmp/rayzeno_bench/probe_sf{sf:g}_c{ncpus}"
    t1 = time.perf_counter()
    res = run_crawl(spec, cfg, ckpt)
    crawl_sec = time.perf_counter() - t1
    stop.set()
    th.join(timeout=5)

    out = {
        "metric": "sf1.0-class crawl probe (scale audit, fresh session)",
        "sf": sf, "num_cpus": ncpus,
        "corpus_build_sec": round(build_sec, 1),
        "crawl_sec": round(crawl_sec, 3),
        "pages": res.pages_fetched,
        "pages_per_sec": round(res.pages_fetched / crawl_sec, 1),
        "epochs": res.epochs,
        "seen_size": res.seen_size,
        "peak_node_used_gb": round(peak["node_used_gb"], 2),
        "driver_peak_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
    }
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
