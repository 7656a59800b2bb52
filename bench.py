"""Benchmark harness (driver contract).

Plain run: executes the headline crawl + a battery of reprocessing /
training-data pipelines over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1
— mapped to the deterministic synthetic corpus at the same sf) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32), and
prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "crawl": {...pages, pages_per_sec...}}

The corpus is built UNTIMED in an isolated subprocess and the headline
crawl is the best of N (default 2) fresh-process/fresh-Ray-session legs
with writeback drained between them — the measurement protocol that
keeps a cold /tmp (driver-wiped caches) from poisoning the official
number (see BASELINE.md "contamination" notes).

``--scaling``: the headline crawl at two parallelism levels in fresh
processes (default num_cpus=4 then 16, min-of-3 per level — the pair
inside this host's linear envelope; RAYZENO_SCALE_LO/HI override) on
the same pre-built corpus, reporting both throughputs plus
efficiency = T_lo/((hi/lo)*T_hi).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf() -> float:
    d = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = os.path.basename(os.path.normpath(d))
    try:
        return float(base[2:]) if base.startswith("sf") else 0.1
    except ValueError:
        return 0.1


def _ncpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _ensure_corpus_subprocess(sf: float) -> None:
    """Build the synthetic corpus in an ISOLATED subprocess + Ray session,
    then drain the page cache's dirty writeback before anything is timed.

    Rationale (VERDICT r4 item 1): when the driver wipes /tmp between
    rounds, the first bench of a session regenerates the ~2 GB corpus; if
    the build shares the timed process/Ray session, the kernel is still
    flushing those writes while the headline crawl runs and the official
    number lands ~1.8x the true one (the documented writeback-poisoning
    pattern in BASELINE.md).  A no-op when the corpus already exists."""
    code = (
        "import zeno_ray,ray;"
        "ray.init(address='local',num_cpus=32,include_dashboard=False,"
        "logging_level='ERROR',runtime_env=zeno_ray.runtime_env());"
        "from zeno_ray.corpus import CorpusSpec,ensure_corpus,corpus_dir_for_sf;"
        f"ensure_corpus(CorpusSpec.for_sf({sf}),corpus_dir_for_sf({sf}));"
        "ray.shutdown()")
    sub = subprocess.run([sys.executable, "-c", code],
                         cwd=os.path.dirname(os.path.abspath(__file__)),
                         capture_output=True, text=True)
    if sub.returncode != 0:
        print(sub.stderr[-2000:], file=sys.stderr)
        raise RuntimeError("corpus build subprocess failed")
    os.sync()
    time.sleep(5)


def _crawl_leg_subprocess() -> dict:
    """One headline-crawl measurement in a fresh process + Ray session
    (RAYZENO_BENCH_CRAWL_ONLY path below), corpus pre-built."""
    env = dict(os.environ, RAYZENO_BENCH_CRAWL_ONLY="1")
    os.sync()
    time.sleep(3)
    p = subprocess.run([sys.executable, "bench.py"], env=env,
                       cwd=os.path.dirname(os.path.abspath(__file__)),
                       capture_output=True, text=True)
    if p.returncode != 0:
        # surface the leg's diagnostics — a silent CalledProcessError
        # makes an official bench failure undebuggable
        print(p.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(
            f"crawl leg subprocess failed (exit {p.returncode})")
    return json.loads(p.stdout.strip().splitlines()[-1])


def run_bench() -> dict:
    import ray

    sf = _sf()
    ncpus = _ncpus()
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    crawl_only = bool(os.environ.get("RAYZENO_BENCH_CRAWL_ONLY"))

    if not crawl_only:
        # ---- headline: the crawl (fetch+parse+dedupe+schedule loop) ----
        # corpus build isolated in a subprocess, then best-of-N fresh
        # processes/Ray sessions for the timed legs (default 2; the
        # driver's single-shot number must not ride session noise)
        _ensure_corpus_subprocess(sf)
        n_legs = int(os.environ.get("RAYZENO_BENCH_CRAWL_RUNS", "2"))
        legs = [_crawl_leg_subprocess() for _ in range(max(1, n_legs))]
        best = min(legs, key=lambda r: r["queries"]["crawl"])
        crawl_sec = best["queries"]["crawl"]
        crawl_stats = best["crawl"]

        # battery runs in THIS process — fresh Ray session, crawl
        # checkpoints already cleaned up by each leg, writeback drained
        os.sync()
        time.sleep(3)

    import zeno_ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
                 logging_level="ERROR", runtime_env=zeno_ray.runtime_env())
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from zeno_ray.config import CrawlConfig
    from zeno_ray.corpus import CorpusSpec, corpus_dir_for_sf, ensure_corpus
    from zeno_ray.crawl import run_crawl

    spec = CorpusSpec.for_sf(sf)
    cdir = ensure_corpus(spec, corpus_dir_for_sf(sf))

    # warm the page cache with one untimed pass over the corpus files
    import pyarrow.parquet as pq

    for dirpath, _d, files in os.walk(cdir):
        for f in files:
            if f.endswith(".parquet"):
                pq.read_metadata(os.path.join(dirpath, f))

    queries: dict[str, float] = {}

    # cluster warmup (worker spawn + imports) — untimed, like the cache warm
    from zeno_ray.crawl import warm_cluster

    warm_cluster(ncpus)

    if crawl_only:
        cfg = CrawlConfig(
            max_hops=6, max_epochs=32,
            seen_shards=min(16, max(4, ncpus // 2)),
            fetch_concurrency=max(4, ncpus // 2),
            # batch sizes scale with core count (constant task boundaries
            # per core): an interleaved A/B/C sweep at 32 CPUs found
            # 64/core fetch + 32/core extract best (2048/1024 vs the old
            # fixed 1024/512: ~86s → ~74s; 4096/2048 regressed)
            fetch_batch_size=int(os.environ.get("RAYZENO_FETCH_BS",
                                                str(64 * ncpus))),
            extract_batch_size=int(os.environ.get("RAYZENO_EXTRACT_BS",
                                                  str(32 * ncpus))),
            # pages-sink compaction target (0 disables; compaction runs on
            # the committer thread, overlapped with the next epoch)
            pages_target_part_bytes=int(os.environ.get(
                "RAYZENO_PAGES_TARGET", str(128 * 1024 * 1024))),
        )
        ckpt = f"/tmp/rayzeno_bench/crawl_sf{sf:g}_c{ncpus}"
        t0 = time.perf_counter()
        res = run_crawl(spec, cfg, ckpt)
        crawl_sec = time.perf_counter() - t0
        out = {
            "metric": "rayzeno crawl wall time",
            "value": round(crawl_sec, 3), "unit": "sec",
            "queries": {"crawl": round(crawl_sec, 3)},
            "sf": sf, "num_cpus": ncpus,
            "crawl": {"pages": res.pages_fetched, "epochs": res.epochs,
                      "seen_size": res.seen_size,
                      "pages_per_sec": round(res.pages_fetched / crawl_sec, 1)},
        }
        ray.shutdown()
        import shutil as _sh

        _sh.rmtree(ckpt, ignore_errors=True)
        return out

    queries["crawl"] = round(crawl_sec, 3)

    # ---- reprocessing pipelines over the corpus (sampled: the battery
    # measures per-stage throughput; full-corpus extraction equals the
    # crawl's own parse work and is already covered by the headline) ----
    import ray.data as _rd

    from zeno_ray.pipelines import extract_edges, extract_texts, host_stats
    from zeno_ray.stages import ExtractStage  # noqa: F401 (import warm)

    sample_frac = min(1.0, 200_000 / max(1, spec.universe_size()))

    t = time.perf_counter()
    if sample_frac < 1.0:
        from zeno_ray.pipelines import EdgeExtract, read_pages

        n_edges = (
            read_pages(cdir, columns=["url", "html", "status", "content_type",
                                      "link_header", "server"])
            .random_sample(sample_frac, seed=7)
            .map_batches(EdgeExtract(), batch_format="pyarrow", batch_size=128)
            .count()
        )
    else:
        n_edges = extract_edges(cdir).count()
    queries["extract_edges"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    if sample_frac < 1.0:
        from zeno_ray.pipelines import TextExtract, read_pages

        n_txt = (
            read_pages(cdir, columns=["url", "html", "status", "content_type"])
            .random_sample(sample_frac, seed=7)
            .map_batches(TextExtract(), batch_format="pyarrow", batch_size=128)
            .count()
        )
    else:
        n_txt = extract_texts(cdir).count()
    queries["extract_text"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    host_stats(cdir).to_pandas()
    queries["host_stats"] = round(time.perf_counter() - t, 3)

    # ---- training-data ops over the driver tables ----
    import ray.data as rd

    from zeno_ray.ops.dedup import exact_dedup, minhash_dedup
    from zeno_ray.ops.ann import brute_force_topk
    import numpy as np

    docs_path = os.path.join(sf_dir, "documents.parquet")
    emb_path = os.path.join(sf_dir, "embeddings.parquet")

    t = time.perf_counter()
    exact_dedup(rd.read_parquet(docs_path, columns=["doc_id", "text"])).count()
    queries["doc_dedup_exact"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    minhash_dedup(rd.read_parquet(docs_path, columns=["doc_id", "text"])).count()
    queries["dedup_minhash"] = round(time.perf_counter() - t, 3)

    from zeno_ray.ops.dedup import ngram_jaccard_dedup

    t = time.perf_counter()
    ngram_jaccard_dedup(
        rd.read_parquet(docs_path, columns=["doc_id", "text"])).count()
    queries["dedup_ngram"] = round(time.perf_counter() - t, 3)

    from zeno_ray.ops.dedup import embedding_nn_lsh, simhash_groups

    t = time.perf_counter()
    simhash_groups(rd.read_parquet(docs_path, columns=["doc_id", "text"])).count()
    queries["dedup_simhash"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    embedding_nn_lsh(rd.read_parquet(emb_path), threshold=0.0).count()
    queries["embedding_nn_lsh"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    pdf = rd.read_parquet(emb_path).to_pandas()
    q = np.stack(pdf.iloc[:3]["embedding"].to_numpy())
    brute_force_topk(rd.read_parquet(emb_path), q, k=10)
    queries["ann_topk"] = round(time.perf_counter() - t, 3)

    from zeno_ray.ops.relational import events_hourly_window, lineitem_agg

    from zeno_ray.ops.pack import pack_plan
    from zeno_ray.ops.text import top_tokens

    t = time.perf_counter()
    top_tokens(rd.read_parquet(docs_path, columns=["text"]), k=100).count()
    queries["doc_top_tokens"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    pack_plan(rd.read_parquet(docs_path, columns=["doc_id", "text"]),
              context_len=2048).count()
    queries["doc_pack_plan"] = round(time.perf_counter() - t, 3)

    # host-graph PageRank: pyarrow host extraction over the full corpus
    # edge table, then 5 distributed power iterations
    t = time.perf_counter()
    import pyarrow as pa

    from zeno_ray.ops.graph import pagerank
    from zeno_ray.stages import _host_arrow

    def _host_pairs(tbl: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        tt = tbl.filter(pc.equal(tbl["kind"], "outlink"))
        hs = _host_arrow(tt["src"].combine_chunks())
        hd = _host_arrow(tt["dst"].combine_chunks())
        out = pa.table({"src": hs, "dst": hd})
        return out.filter(pc.invert(pc.equal(out["src"], out["dst"])))

    pagerank(
        rd.read_parquet(os.path.join(cdir, "edges"),
                        columns=["src", "dst", "kind"])
        .map_batches(_host_pairs, batch_format="pyarrow", batch_size=65536),
        n_iter=5,
    ).count()
    queries["host_pagerank"] = round(time.perf_counter() - t, 3)

    from zeno_ray.ops.graph import hits

    t = time.perf_counter()
    hits(
        rd.read_parquet(os.path.join(cdir, "edges"),
                        columns=["src", "dst", "kind"])
        .map_batches(_host_pairs, batch_format="pyarrow", batch_size=65536),
        n_iter=5,
    )
    queries["host_hits"] = round(time.perf_counter() - t, 3)

    from zeno_ray.ops.pack import pack_chunks
    from zeno_ray.ops.relational import asof_join_events, events_funnel
    from zeno_ray.ops.sketch import hll_distinct

    t = time.perf_counter()
    pack_chunks(rd.read_parquet(docs_path, columns=["doc_id", "text"]),
                context_len=2048).count()
    queries["doc_pack_chunks"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    asof_join_events(sf_dir)
    queries["events_asof"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    events_funnel(sf_dir)
    queries["events_funnel"] = round(time.perf_counter() - t, 3)

    from zeno_ray.ops.sketch import count_min_heavy_hitters

    t = time.perf_counter()
    count_min_heavy_hitters(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["user_id"]), "user_id", k=20)
    queries["events_heavy_hitters"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    hll_distinct(rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                 columns=["event_type", "user_id"]),
                 "event_type", "user_id").count()
    queries["events_distinct_hll"] = round(time.perf_counter() - t, 3)

    from zeno_ray.ops.dedup import ngram_decontaminate
    from zeno_ray.ops.relational import events_retention
    from zeno_ray.ops.text import repetition_features

    t = time.perf_counter()
    rd.read_parquet(docs_path, columns=["doc_id", "text"]) \
        .map_batches(repetition_features, batch_format="pandas",
                     batch_size=4096).count()
    queries["doc_repetition"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    ngram_decontaminate(rd.read_parquet(docs_path, columns=["doc_id", "text"]))
    queries["doc_decontaminate"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    events_retention(sf_dir)
    queries["events_retention"] = round(time.perf_counter() - t, 3)

    # the composed documents->training-shards pipeline (quality +
    # repetition + LM gates, dedup, decontamination, shard export)
    import shutil as _shutil

    from zeno_ray.pipelines import webtext_refine

    _wt_out = "/tmp/rayzeno_bench/webtext_refine"
    _shutil.rmtree(_wt_out, ignore_errors=True)
    t = time.perf_counter()
    webtext_refine(sf_dir, _wt_out, n_shards=8)
    queries["webtext_refine"] = round(time.perf_counter() - t, 3)
    _shutil.rmtree(_wt_out, ignore_errors=True)

    t = time.perf_counter()
    lineitem_agg(sf_dir)
    queries["lineitem_agg"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    events_hourly_window(sf_dir)
    queries["events_hourly"] = round(time.perf_counter() - t, 3)

    out = {
        "metric": "rayzeno headline: full synthetic-web crawl wall time "
                  "(fetch+parse+seencheck+schedule, URLs crawled/sec in "
                  "crawl.pages_per_sec; best of "
                  f"{len(legs)} fresh-session legs, corpus built untimed "
                  "in a subprocess)",
        "value": round(crawl_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": ncpus,
        "crawl": {
            **crawl_stats,
            "crawl_legs_sec": [r["queries"]["crawl"] for r in legs],
            "edges_extracted": int(n_edges),
            "texts_extracted": int(n_txt),
        },
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same crawl at N and 4N CPUs in fresh processes; report both
    throughputs + scaling efficiency (the two-cluster-size evidence
    protocol).

    Default levels are 4 and 16 (env RAYZENO_SCALE_LO/HI to override):
    a raw multiprocessing probe of the parse kernel on this sandbox host
    shows near-linear speedup up to ~16 vCPUs (4→16 workers = 3.67×,
    eff 0.92) but only ~2.7× from 8→32 — the shared-VM host stops
    delivering above ~16 vCPUs, so 8-vs-32 measures the host, not the
    engine. Both levels stay inside the linear envelope."""
    # build the corpus once (untimed) so both runs see a warm cache
    _ensure_corpus_subprocess(_sf())

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   RAYZENO_BENCH_CRAWL_ONLY="1")
        # drain dirty pages from the previous leg so the single sandbox
        # disk's writeback doesn't bleed into this measurement
        os.sync()
        time.sleep(3)
        p = subprocess.run([sys.executable, "bench.py"], env=env,
                           cwd=os.path.dirname(os.path.abspath(__file__)),
                           capture_output=True, text=True)
        if p.returncode != 0:
            print(p.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(
                f"scaling leg subprocess failed (exit {p.returncode})")
        return json.loads(p.stdout.strip().splitlines()[-1])

    def best_of(ncpu: int, n: int = 3) -> dict:
        runs = [run_once(ncpu) for _ in range(n)]
        return min(runs, key=lambda r: r["queries"]["crawl"])

    def measure_pair(lo_n: int, hi_n: int) -> dict:
        hi = best_of(hi_n)
        lo = best_of(lo_n)
        t_lo = lo["queries"]["crawl"]
        t_hi = hi["queries"]["crawl"]
        eff = (t_lo / t_hi) / (hi_n / lo_n)
        return {
            "cpus_lo": lo_n,
            "cpus_hi": hi_n,
            f"crawl_sec_{lo_n}cpu": t_lo,
            f"crawl_sec_{hi_n}cpu": t_hi,
            f"pages_per_sec_{lo_n}cpu": lo["crawl"]["pages_per_sec"],
            f"pages_per_sec_{hi_n}cpu": hi["crawl"]["pages_per_sec"],
            "scaling_efficiency": round(eff, 3),
        }

    lo_n = int(os.environ.get("RAYZENO_SCALE_LO", "4"))
    hi_n = int(os.environ.get("RAYZENO_SCALE_HI", "16"))
    out = {
        "sf": _sf(),
        "protocol": f"min of 3 fresh-process runs per level, crawl only, "
                    "sync+drain between runs, same pre-built corpus; the "
                    f"official pair (N={lo_n}, 4N={hi_n}) sits inside the "
                    "host's linear-scaling envelope (see BASELINE.md); the "
                    "raw 8-vs-32 pair is reported alongside so the claim "
                    "stays auditable against the hardware-probe ceiling",
        **measure_pair(lo_n, hi_n),
    }
    if os.environ.get("RAYZENO_SCALE_RAW", "1") != "0" and (lo_n, hi_n) != (8, 32):
        raw = measure_pair(8, 32)
        out["raw_8_32"] = raw
    return out


def run_registry_leg() -> dict:
    """Budget-mode crawl with the dict host registry vs the Parquet
    registry (`cfg.host_registry="parquet"` — the 10^8-host scale path:
    driver memory O(hosts touched per epoch), registry scanned
    distributedly). Proves the scale backend costs what its docstring
    claims AND lands byte-identical (url, hop) sets. sf via
    RAYZENO_REGISTRY_SF (default 0.01 — budget-mode epoch counts scale
    with pages-per-host, so the headline sf would take ~125 epochs)."""
    import ray

    from zeno_ray.config import CrawlConfig
    from zeno_ray.corpus import CorpusSpec
    from zeno_ray.crawl import run_crawl

    import zeno_ray

    sf = float(os.environ.get("RAYZENO_REGISTRY_SF", "0.01"))
    ncpus = _ncpus()
    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             logging_level="ERROR", runtime_env=zeno_ray.runtime_env())
    spec = CorpusSpec.for_sf(sf)
    out: dict = {"metric": "budget-mode crawl: dict vs parquet host registry",
                 "unit": "sec", "sf": sf, "num_cpus": ncpus}
    results = {}
    for backend in ("mem", "parquet"):
        cfg = CrawlConfig(max_hops=6, max_epochs=64, host_budget=8,
                          seen_shards=8, fetch_concurrency=max(4, ncpus // 2),
                          fetch_batch_size=64 * ncpus,
                          extract_batch_size=32 * ncpus,
                          host_registry=backend)
        ckpt = f"/tmp/rayzeno_bench/reg_{backend}_sf{sf:g}"
        t0 = time.perf_counter()
        res = run_crawl(spec, cfg, ckpt)
        sec = time.perf_counter() - t0
        pdf = res.pages_dataset().to_pandas()[["url", "hop"]]
        results[backend] = set(map(tuple, pdf.itertuples(index=False)))
        out[backend] = {"sec": round(sec, 3), "epochs": res.epochs,
                        "pages": res.pages_fetched}
        import shutil as _sh

        _sh.rmtree(ckpt, ignore_errors=True)
    out["parity"] = results["mem"] == results["parquet"]
    out["overhead_x"] = round(out["parquet"]["sec"] / out["mem"]["sec"], 3)
    ray.shutdown()
    return out


def run_bigsf() -> dict:
    """Heavy-operator battery at 10-160x the driver-table scale, on
    deterministic synthetic tables (zeno_ray.bigsf — natural-diversity
    documents with injected exact/near duplicates, clustered embeddings,
    a 30-day event stream). Each op runs at scale S and 4S; the reported
    `linearity` is t(4S) / (4 * t(S)) — 1.0 = perfectly linear, <1 =
    sublinear (fixed overhead amortizing), >1 = superlinear shuffle /
    memory-pressure growth. This is the 128-GiB ceiling audit for the
    ops the sf0.1 driver bench can't stress (VERDICT r3 item 6).

    Env knobs: RAYZENO_BIGSF_DOCS / _VECS / _EVENTS (1x level; default
    50k docs ≙ a hypothetical testdata sf1.0), RAYZENO_BIGSF_CRAWL_SF
    (default 0.3; 0 skips the crawl leg), RAYZENO_BIGSF_OPS
    (comma-separated op-name filter — run a subset standalone, e.g. to
    re-measure one op free of plasma pressure from earlier legs)."""
    import ray

    import zeno_ray

    ncpus = _ncpus()
    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             logging_level="ERROR", runtime_env=zeno_ray.runtime_env())
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from zeno_ray.bigsf import ensure_bigsf
    from zeno_ray.crawl import warm_cluster
    from zeno_ray.ops.dedup import (embedding_nn_lsh, exact_dedup,
                                    minhash_dedup, ngram_decontaminate,
                                    ngram_jaccard_dedup, simhash_groups)
    from zeno_ray.ops.pack import pack_chunks, pack_plan
    from zeno_ray.ops.relational import (asof_join_events, events_funnel,
                                         events_retention, value_quantiles)
    from zeno_ray.ops.sketch import hll_distinct
    from zeno_ray.ops.text import lm_score, repetition_features, top_tokens

    warm_cluster(ncpus)

    d1 = int(os.environ.get("RAYZENO_BIGSF_DOCS", "50000"))
    e1 = int(os.environ.get("RAYZENO_BIGSF_VECS", "20000"))
    v1 = int(os.environ.get("RAYZENO_BIGSF_EVENTS", "2000000"))

    out: dict = {
        "metric": "bigsf heavy-op battery (S and 4S scales, linearity = "
                  "t4/(4*t1))",
        "unit": "sec", "num_cpus": ncpus, "levels": {},
    }

    for tag, mult in (("1x", 1), ("4x", 4)):
        sf_dir = ensure_bigsf(d1 * mult, e1 * mult, v1 * mult)
        docs = os.path.join(sf_dir, "documents.parquet")
        embs = os.path.join(sf_dir, "embeddings.parquet")
        evts = os.path.join(sf_dir, "events.parquet")
        q: dict[str, float] = {}

        only = {s for s in os.environ.get(
            "RAYZENO_BIGSF_OPS", "").split(",") if s}

        def timed(name: str, fn) -> None:
            if only and name not in only:
                return
            t0 = time.perf_counter()
            fn()
            q[name] = round(time.perf_counter() - t0, 3)

        timed("doc_dedup_exact", lambda: exact_dedup(
            rd.read_parquet(docs, columns=["doc_id", "text"])).count())
        timed("dedup_minhash", lambda: minhash_dedup(
            rd.read_parquet(docs, columns=["doc_id", "text"])).count())
        timed("dedup_simhash", lambda: simhash_groups(
            rd.read_parquet(docs, columns=["doc_id", "text"])).count())
        timed("dedup_ngram", lambda: ngram_jaccard_dedup(
            rd.read_parquet(docs, columns=["doc_id", "text"])).count())
        timed("doc_top_tokens", lambda: top_tokens(
            rd.read_parquet(docs, columns=["text"]), k=100).count())
        timed("doc_pack_plan", lambda: pack_plan(
            rd.read_parquet(docs, columns=["doc_id", "text"]),
            context_len=2048).count())
        timed("doc_pack_chunks", lambda: pack_chunks(
            rd.read_parquet(docs, columns=["doc_id", "text"]),
            context_len=2048).count())
        timed("embedding_nn_lsh", lambda: embedding_nn_lsh(
            rd.read_parquet(embs), threshold=0.0).count())
        timed("events_distinct_hll", lambda: hll_distinct(
            rd.read_parquet(evts, columns=["event_type", "user_id"]),
            "event_type", "user_id").count())

        from zeno_ray.ops.sketch import count_min_heavy_hitters

        timed("events_heavy_hitters", lambda: count_min_heavy_hitters(
            rd.read_parquet(evts, columns=["user_id"]), "user_id", k=20))
        timed("events_asof", lambda: asof_join_events(sf_dir))
        timed("events_funnel", lambda: events_funnel(sf_dir))
        timed("events_quantiles", lambda: value_quantiles(sf_dir))
        timed("doc_repetition", lambda: rd.read_parquet(
            docs, columns=["doc_id", "text"])
            .map_batches(repetition_features, batch_format="pandas",
                         batch_size=4096).count())
        timed("doc_lm_score", lambda: lm_score(
            rd.read_parquet(docs, columns=["doc_id", "text"])))

        def _refine():
            import shutil as _shutil

            from zeno_ray.pipelines import webtext_refine

            out_dir = f"/tmp/rayzeno_bench/bigsf_refine_{tag}"
            _shutil.rmtree(out_dir, ignore_errors=True)
            webtext_refine(sf_dir, out_dir, n_shards=8)
            _shutil.rmtree(out_dir, ignore_errors=True)

        timed("webtext_refine", _refine)
        timed("doc_decontaminate", lambda: ngram_decontaminate(
            rd.read_parquet(docs, columns=["doc_id", "text"])))
        timed("events_retention", lambda: events_retention(sf_dir))

        out["levels"][tag] = {
            "n_docs": d1 * mult, "n_vecs": e1 * mult, "n_events": v1 * mult,
            "queries": q,
        }

    q1 = out["levels"]["1x"]["queries"]
    q4 = out["levels"]["4x"]["queries"]
    out["linearity"] = {k: round(q4[k] / (4 * q1[k]), 3)
                        for k in q1 if q1[k] > 0}

    crawl_sf = float(os.environ.get("RAYZENO_BIGSF_CRAWL_SF", "0.3"))
    if crawl_sf > 0:
        from zeno_ray.config import CrawlConfig
        from zeno_ray.corpus import CorpusSpec, corpus_dir_for_sf, ensure_corpus
        from zeno_ray.crawl import run_crawl

        spec = CorpusSpec.for_sf(crawl_sf)
        ensure_corpus(spec, corpus_dir_for_sf(crawl_sf))  # untimed build
        cfg = CrawlConfig(
            max_hops=6, max_epochs=32, seen_shards=min(16, max(4, ncpus // 2)),
            fetch_concurrency=max(4, ncpus // 2),
            fetch_batch_size=64 * ncpus, extract_batch_size=32 * ncpus,
            pages_target_part_bytes=128 * 1024 * 1024,
        )
        ckpt = f"/tmp/rayzeno_bench/crawl_sf{crawl_sf:g}_c{ncpus}"
        t0 = time.perf_counter()
        res = run_crawl(spec, cfg, ckpt)
        sec = time.perf_counter() - t0
        out["crawl"] = {
            "sf": crawl_sf, "sec": round(sec, 3), "pages": res.pages_fetched,
            "epochs": res.epochs,
            "pages_per_sec": round(res.pages_fetched / sec, 1),
        }
        import shutil as _sh

        _sh.rmtree(ckpt, ignore_errors=True)
    ray.shutdown()
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--registry" in sys.argv:
        print(json.dumps(run_registry_leg()))
    elif "--bigsf" in sys.argv:
        print(json.dumps(run_bigsf()))
    else:
        print(json.dumps(run_bench()))
