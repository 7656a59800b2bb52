"""The crawl loop: epoch-based BSP supersteps over the Parquet frontier.

One epoch is ONE streaming Ray Data execution (SURVEY.md §7.1):

    frontier_k ──rank/budget──► fetch slice (+ carryover)
      → map_batches(Fetcher)        retries / 429 / redirect chains
      → map_batches(ExtractStage)   one Arrow parse per page; writes its
                                    pages Parquet part as a side effect
                                    (idempotent deterministic filenames) and
                                    passes ONLY the slim candidate columns on
                                    — the html bytes never re-enter the
                                    object store after the parse
      → explode/gate → [robots] → dedupe → SeenFilter actors
      → materialize (the epoch's new URLs: outlinks AND assets)
    new ∪ carryover ──► frontier_{k+1} (in-memory + Parquet)
    commit (async): seen snapshot, host registry, metrics + per-host
    lineage, then the epoch's _SUCCESS marker

Assets travel through the frontier as budget-EXEMPT rows (politeness
budgets throttle page fetches only — the reference fetches assets outside
the queue, assets.go:72-137); they are fetched one epoch after discovery,
which preserves the crawled SET and all seen semantics. Redirects are
followed inside the Fetcher with mid-chain seen-checks (capture.go:120-178).

Durability: the seen snapshot is captured synchronously at the epoch
boundary (so it cannot absorb the next epoch's discoveries), but all
checkpoint WRITES overlap the next epoch's compute; the ``_SUCCESS`` marker
is written last, so resume = rerun from the last marked epoch, exactly
(the WAL+snapshot recovery contract of ``queue/index/recovery.go:9-60``
re-expressed as idempotent Parquet commits).

Backpressure: the reference's crawlSpeedLimiter and WARC-queue pause
(``crawl/utils.go:15-40``) throttle fetch workers when the writer falls
behind; here the in-flight side is Ray Data's streaming backpressure
(fetch/extract tasks are admitted against object-store budget, SURVEY §4),
and the durable side is bounded by the BSP barrier itself: each epoch's
pages parts are written inline by the extract stage (disk-rate-coupled to
fetch, never queued in memory), while the ASYNC committer thread only
handles the slim frontier/seen/metrics commit — at most ONE epoch of
commit lag exists by construction (``pending.result()`` before the next
submit), so checkpoint disk growth cannot run away from fetch progress.
Disk exhaustion itself is the watchdog's job (``min_space_required``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import pyarrow as pa
import ray
import ray.data as rd

from zeno_ray.config import CrawlConfig
from zeno_ray.corpus import CorpusSpec
from zeno_ray.fetch import Fetcher
from zeno_ray.frontier import (
    FRONTIER_SCHEMA,
    ParquetHostRegistry,
    assign_host_seq,
    candidates_to_frontier_rows,
    load_hosts,
    rank_frontier,
    save_hosts,
    seed_frontier,
)
from zeno_ray.seen import (
    SeenFilterStage,
    create_seen_actors,
    restore_seen,
    seen_sizes,
)
from zeno_ray.stages import (
    CandidateStage,
    ExtractStage,
    dedupe_candidates_within_epoch,
)


@dataclass
class CrawlResult:
    ckpt_dir: str
    epochs: int
    pages_fetched: int
    seen_size: int
    metrics: list[dict] = field(default_factory=list)

    @property
    def pages_glob(self) -> list[str]:
        """All pages parquet FILES across epochs (read_parquet accepts a
        single directory, but a list must be files)."""
        out = []
        for name in sorted(os.listdir(self.ckpt_dir)):
            if name.startswith("pages_epoch_"):
                root = os.path.join(self.ckpt_dir, name)
                for dirpath, _dirnames, files in os.walk(root):
                    out.extend(
                        os.path.join(dirpath, f)
                        for f in sorted(files)
                        if f.endswith(".parquet")
                    )
        return out

    def pages_dataset(self, columns: list[str] | None = None):
        """Crawled pages as a Dataset. Pass ``columns=`` whenever the
        consumer doesn't need the fat ``html`` payload — the read then
        prunes at the Parquet footer and the html bytes never leave disk."""
        return rd.read_parquet(self.pages_glob, columns=columns)

    def metadata_records(self):
        """Plugin-emitted WARC-metadata-style side records as a pandas
        DataFrame (url, metadata) — empty if no plugin wrote any."""
        import pandas as pd
        import pyarrow.parquet as pq

        frames = []
        for name in sorted(os.listdir(self.ckpt_dir)):
            if name.startswith("meta_epoch_"):
                root = os.path.join(self.ckpt_dir, name)
                for dirpath, _d, files in os.walk(root):
                    frames.extend(
                        pq.read_table(os.path.join(dirpath, f)).to_pandas()
                        for f in sorted(files) if f.endswith(".parquet"))
        if not frames:
            return pd.DataFrame({"url": [], "metadata": []})
        return pd.concat(frames, ignore_index=True)


def _epoch_dir(ckpt: str, kind: str, k: int) -> str:
    return os.path.join(ckpt, f"{kind}_epoch_{k}")


def _marker(ckpt: str, k: int) -> str:
    return os.path.join(ckpt, f"_SUCCESS_epoch_{k}")


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers — no Ray execution, driver-side only."""
    import pyarrow.parquet as pq

    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(dirpath, f)).num_rows
    return total


def _last_complete_epoch(ckpt: str) -> int:
    k = -1
    while os.path.exists(_marker(ckpt, k + 1)):
        k += 1
    return k


def _clean_stale_epochs(ckpt: str, last: int) -> None:
    """Delete partial artifacts from epochs past the last ``_SUCCESS``
    marker so a resumed run starts from exactly the committed state.

    Epoch k's durable commit writes ``frontier_epoch_{k+1}`` then the
    ``_SUCCESS_epoch_k`` marker, so ``frontier_epoch_{last+1}`` is complete
    and everything beyond it (and every pages/seen/metrics dir beyond
    ``last``) may be a torn write from a crashed attempt. Relying on
    deterministic part filenames to overwrite stale parts is NOT enough:
    batch boundaries (and hence part keys) depend on cluster shape, and
    ``write_parquet`` appends rather than replaces — a re-committed
    frontier next to a crashed attempt's files would double every row
    (the WAL-truncate step of ``queue/index/recovery.go:9-60``)."""
    import re

    pat = re.compile(
        r"^(pages|seen|metrics|frontier|meta|counts|hostreg)_epoch_(\d+)$")
    for name in os.listdir(ckpt):
        m = pat.match(name)
        if m:
            kind, k = m.group(1), int(m.group(2))
            limit = last + 1 if kind == "frontier" else last
            if k > limit:
                shutil.rmtree(os.path.join(ckpt, name), ignore_errors=True)
        elif name.startswith("_SUCCESS_epoch_"):
            try:
                k = int(name.rsplit("_", 1)[1])
            except ValueError:
                continue
            if k > last:  # orphan marker past a gap — stale by definition
                os.remove(os.path.join(ckpt, name))


def run_crawl(
    spec: CorpusSpec,
    cfg: CrawlConfig,
    ckpt_dir: str,
    seeds: list[str] | None = None,
    resume: bool = False,
    strict_dedupe: bool = False,
    plugins=None,
) -> CrawlResult:
    """Run (or resume) a full crawl; all state under *ckpt_dir*."""
    if not resume and os.path.exists(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)

    seen = create_seen_actors(cfg.seen_shards)
    metrics: list[dict] = []
    start_epoch = 0
    # registry backend: the parquet registry only matters in budget mode
    # (fast mode never observes host_seq)
    use_preg = cfg.host_budget > 0 and cfg.host_registry == "parquet"
    registry = None
    if resume:
        last = _last_complete_epoch(ckpt_dir)
        _clean_stale_epochs(ckpt_dir, last)
        if last >= 0:
            restore_seen(seen, _epoch_dir(ckpt_dir, "seen", last))
            if use_preg:
                registry = ParquetHostRegistry.open(ckpt_dir)
                hosts = {}
            else:
                hosts = load_hosts(
                    os.path.join(_epoch_dir(ckpt_dir, "seen", last),
                                 "hosts.parquet"))
            start_epoch = last + 1
            for k in range(last + 1):
                mpath = os.path.join(_epoch_dir(ckpt_dir, "metrics", k), "metrics.json")
                if os.path.exists(mpath):
                    metrics.append(json.load(open(mpath)))
    robots = None
    if cfg.robots_enforce:
        from zeno_ray.politeness import RobotsFilterStage, create_robots_actors

        robots = RobotsFilterStage(
            create_robots_actors(spec, max(2, cfg.seen_shards // 2)))

    if start_epoch == 0:
        seed_urls = seeds if seeds is not None else spec.seeds()
        table, hosts = seed_frontier(seed_urls)
        # seeds pass the robots gate BEFORE the seen-mark, like every other
        # enqueue (the simulator robots-checks all enqueues incl. seeds;
        # redirect targets intentionally bypass robots in both engines)
        if robots is not None and table.num_rows:
            table = robots(table)
        # seed-load seencheck (crawl.go:218-235)
        import numpy as np

        from zeno_ray.seen import check_and_add_batched

        if table.num_rows:
            mask = check_and_add_batched(
                seen, table["hash"].to_numpy().astype(np.uint64)
            )
            table = table.filter(pa.array(mask))
        # rebuild the host registry from the rows that SURVIVED the
        # robots + seen gates: a host whose every seed was rejected never
        # enters the rotation (matches the reference, where blocked seeds
        # never reach the queue and so never register their host).
        # Renumber host_seq densely so assign_host_seq's len(hosts)
        # continuation can't collide with a surviving seq.
        hosts = {}
        hseqs = np.empty(table.num_rows, dtype=np.int64)
        for i, h in enumerate(table["host"].to_pylist()):
            if h not in hosts:
                hosts[h] = len(hosts)
            hseqs[i] = hosts[h]
        table = table.set_column(
            table.schema.get_field_index("host_seq"), "host_seq",
            pa.array(hseqs, pa.int64()))
        if use_preg:
            registry = ParquetHostRegistry(ckpt_dir)
            registry.bootstrap(hosts)
            hosts = {}
        fdir = _epoch_dir(ckpt_dir, "frontier", 0)
        os.makedirs(fdir, exist_ok=True)
        import pyarrow.parquet as pq

        pq.write_table(table, os.path.join(fdir, "part-seed.parquet"))

    # Task-based fetch: the sandbox Fetcher's only state (corpus spec +
    # actor handles) is tiny, so serialized-instance tasks reuse warm Ray
    # workers across epochs — no per-epoch actor-pool cold start. A real
    # HTTP fetcher (connection pools, cookie jars) would flip back to the
    # actor-pool form: map_batches(Fetcher, fn_constructor_kwargs=...,
    # concurrency=N).
    if plugins is not None:
        # post-fetch hooks that need side lookups (the ina player-version
        # probe, ina.go:110-170) fetch through the engine's fetch function
        plugins.bind_fetch(spec.lookup)
    fetcher = Fetcher(spec=spec, seen_shards=seen,
                      max_retry=cfg.max_retry, max_redirect=cfg.max_redirect,
                      plugins=plugins, cookie_file=cfg.cookie_file or None)

    api_server = None
    # every counter key the committer thread will ever touch is created
    # HERE, before the StatsServer handler thread can copy the dict —
    # value updates on existing keys are atomic under the GIL, but a
    # size-changing insert racing dict(api_state) raises RuntimeError.
    api_state: dict = {"workers": [
        {"worker_id": "fetch-pool", "status": "idle",
         "concurrency": cfg.fetch_concurrency},
        {"worker_id": "seen-shards", "status": "idle",
         "concurrency": cfg.seen_shards},
    ], "crawled_seeds": 0, "crawled_assets": 0, "queued": 0,
       "hosts": 0, "epoch": -1, "seen_size": 0}
    if cfg.api:
        from zeno_ray.statsapi import StatsServer

        api_server = StatsServer(lambda: dict(api_state), port=cfg.api_port)

    committer = ThreadPoolExecutor(max_workers=1)
    pending = None
    total_holder = {"pages": 0}
    frontier_mem = None  # materialized next-frontier carried across epochs
    # HQ consumer bookkeeping: batches consumed by COMMITTED epochs (from
    # their metrics) are never re-ingested; a crashed epoch's consumption
    # re-runs and the restored seen filter dedupes it (idempotent)
    hq_consumed: set = set()
    for mm in metrics:
        hq_consumed.update(mm.get("hq_consumed", []))
    t_start = time.monotonic()
    k = start_epoch
    try:
        while k < cfg.max_epochs:
            if _epoch_boundary_guard(cfg, t_start, ckpt_dir) == "finish":
                break
            t0 = time.perf_counter()
            fdir = _epoch_dir(ckpt_dir, "frontier", k)
            if frontier_mem is not None:
                frontier = frontier_mem
                n_frontier = frontier.count()  # cheap: materialized
            else:
                n_frontier = _parquet_rows(fdir)
                frontier = None
            # HQ consumer: pull unconsumed feed batches BEFORE the empty
            # check — the local frontier is empty every epoch in producer
            # mode; the feed directory is the queue (hq.go:149-228)
            hq_names: list = []
            hq_ds = None
            if cfg.hq_feed_dir:
                from zeno_ray.hq import ingest_feed

                hq_ds, hq_names = ingest_feed(
                    cfg.hq_feed_dir, hq_consumed, k, seen, robots,
                    hosts, registry, cfg)
                hq_consumed.update(hq_names)
            if n_frontier == 0 and hq_ds is None:
                break
            if frontier is not None:
                # the carried frontier inherits few fat blocks from the
                # candidate pipeline — split fine-grained (≈8 tasks per
                # core) so the fetch stage runs wide with a smooth tail
                ncpu = int(ray.cluster_resources().get("CPU", 8))
                want_blocks = max(
                    2, min(ncpu * 4,
                           n_frontier // max(1, cfg.fetch_batch_size) + 1))
                try:
                    have = frontier.num_blocks()
                except Exception:
                    have = 0
                # exec2's output usually already has plenty of blocks —
                # only pay a repartition when the carried frontier is
                # genuinely too coarse for the fetch stage
                if n_frontier > cfg.fetch_batch_size * 2 and (
                        have is None or have < max(2, want_blocks // 2)):
                    frontier = frontier.repartition(want_blocks)
            elif n_frontier > 0:
                ncpu = int(ray.cluster_resources().get("CPU", 8))
                n_blocks = max(
                    2, min(ncpu * 8,
                           n_frontier // max(1, cfg.fetch_batch_size) + 1))
                frontier = rd.read_parquet(fdir, override_num_blocks=n_blocks)
            if hq_ds is not None:
                hq_ds = _cast_frontier(hq_ds).materialize()
                n_hq = hq_ds.count()
                if n_hq:
                    frontier = (hq_ds if frontier is None
                                else frontier.union(hq_ds))
                    n_frontier += n_hq
                elif frontier is None:
                    # feed batches existed but every row gated out; record
                    # them consumed via this (otherwise empty) epoch
                    frontier = rd.from_arrow(FRONTIER_SCHEMA.empty_table())

            # ---- rank/budget (budget throttles page fetches; assets exempt) ----
            t_phase = time.perf_counter()
            fetch_slice, carry = rank_frontier(frontier, cfg.host_budget,
                                               n_rows=n_frontier)

            # ---- the epoch pipeline: ONE streaming execution ----
            pdir = _epoch_dir(ckpt_dir, "pages", k)
            os.makedirs(pdir, exist_ok=True)
            cdir = _epoch_dir(ckpt_dir, "counts", k)
            os.makedirs(cdir, exist_ok=True)
            mdir_side = None
            if plugins is not None and plugins.post_fetch:
                mdir_side = _epoch_dir(ckpt_dir, "meta", k)
                os.makedirs(mdir_side, exist_ok=True)
            # execution 1: fetch → parse(+pages sink) → explode. The html
            # leaves the pipeline at the parse stage (side-effect Parquet
            # part per batch); only slim candidate rows materialize.
            cand = (
                fetch_slice.map_batches(
                    fetcher, batch_format="pyarrow",
                    batch_size=cfg.fetch_batch_size)
                .map_batches(
                    ExtractStage(cfg, pages_dir=pdir, plugins=plugins,
                                 meta_dir=mdir_side, counts_dir=cdir),
                    batch_format="pyarrow", batch_size=cfg.extract_batch_size)
                .map_batches(
                    CandidateStage(cfg),
                    batch_format="pyarrow", batch_size=cfg.extract_batch_size)
            ).materialize()
            if os.environ.get("RAYZENO_STATS"):
                import re as _re

                st = cand.stats()
                for line in st.splitlines():
                    if "tasks executed" in line or "Remote wall" in line or "Remote cpu" in line:
                        print(f"[stats e{k}]", line.strip(), flush=True)
            # execution 2: dedupe + robots + seen-filter over the slim rows
            # in fat batches, so actor RPC rounds stay off the parse path.
            cand2 = cand
            if robots is not None:
                cand2 = cand2.map_batches(robots, batch_format="pyarrow",
                                          batch_size=32768)
            cand2 = dedupe_candidates_within_epoch(cand2, strict=strict_dedupe)
            new = cand2.map_batches(
                SeenFilterStage(seen),
                batch_format="pyarrow", batch_size=32768,
            )
            t_pipeline = time.perf_counter() - t_phase
            t_phase = time.perf_counter()

            # ---- next frontier: outlinks AND assets enqueue ----
            if cfg.host_budget <= 0:
                # pure-BFS throughput mode: rotation order is unobservable,
                # so skip the host-registry aggregate entirely and build the
                # frontier INSIDE the seen-filter execution (host_seq=0;
                # budget-mode resume expects budget-mode checkpoints)
                next_rows = candidates_to_frontier_rows(
                    new.map_batches(_attach_zero_host_seq,
                                    batch_format="pandas"),
                    epoch=k,
                )
                next_rows = _cast_frontier(next_rows).materialize()
                if os.environ.get("RAYZENO_STATS"):
                    for line in next_rows.stats().splitlines():
                        if ("tasks executed" in line or "Remote wall" in line
                                or "Remote cpu" in line or "Operator" in line):
                            print(f"[fstats e{k}]", line.strip(), flush=True)
            else:
                new = new.materialize()
                nxt = (registry.assign(new, k) if registry is not None
                       else assign_host_seq(new, hosts))
                next_rows = candidates_to_frontier_rows(nxt, epoch=k)
                if carry is not None:
                    next_rows = next_rows.union(carry)
                # union ADDS block counts and groupby/filter PRESERVE them,
                # so the carry→rank→carry loop would otherwise double the
                # frontier's block count every epoch — each downstream
                # stage pays a task per block, and budget-mode epoch walls
                # measured 2.8 s → 112 s while rows SHRANK 4244 → 308.
                # Bound blocks before materializing (the same
                # union-doubles-blocks lesson ops/graph.py records).
                ncpu = int(ray.cluster_resources().get("CPU", 8))
                nb = max(2, min(ncpu * 2,
                                n_frontier // max(1, cfg.fetch_batch_size)
                                + 1))
                next_rows = (_cast_frontier(next_rows).repartition(nb)
                             .materialize())
            n_next = next_rows.count()
            n_hq_produced = 0
            if cfg.hq_produce and cfg.hq_feed_dir:
                # HQ producer: discovered rows leave for the remote
                # frontier directory; the LOCAL queue commits empty
                from zeno_ray.hq import produce_batch

                if n_next:
                    produce_batch(cfg.hq_feed_dir, next_rows, k)
                    n_hq_produced = n_next
                next_rows = rd.from_arrow(
                    FRONTIER_SCHEMA.empty_table()).materialize()
                n_next = 0
            # rebase BEFORE carrying across the epoch boundary — the
            # commit thread still reads next_rows' blocks (same refs)
            frontier_mem = _rebase(next_rows)
            t_frontier = time.perf_counter() - t_phase

            # ---- synchronous state snapshot (cheap), async durable commit ----
            seen_dumps = ray.get([s.dump.remote() for s in seen])
            seen_total = int(sum(len(d) for d in seen_dumps))
            fast_mode = cfg.host_budget <= 0
            # parquet-registry mode: the registry is already durable
            # (written synchronously in assign); the commit thread gets a
            # None snapshot and skips the dict save entirely
            hosts_snapshot = (None if registry is not None
                              else (hosts if fast_mode else dict(hosts)))
            m = {
                "epoch": k,
                "frontier_rows": int(n_frontier),
                "next_frontier_rows": int(n_next),
                "seen_size": seen_total,
                "hosts": (registry.size if registry is not None
                          else len(hosts_snapshot)),
                "wall_sec": round(time.perf_counter() - t0, 3),
                "t_pipeline": round(t_pipeline, 3),
                "t_frontier": round(t_frontier, 3),
            }
            if cfg.hq_feed_dir:
                m["hq_consumed"] = hq_names
                m["hq_produced"] = n_hq_produced
            if pending is not None:
                pending.result()  # commits are ordered: k-1 before k
            pending = committer.submit(
                _commit_epoch, ckpt_dir, k, next_rows, seen_dumps,
                hosts_snapshot, m, metrics, total_holder, fast_mode,
                api_state,
            )
            if os.environ.get("RAYZENO_SYNC_COMMIT"):
                pending.result()
                pending = None
            k += 1
        if pending is not None:
            pending.result()
            pending = None
    finally:
        if pending is not None:
            pending.result()
        committer.shutdown(wait=True)
        if api_server is not None:
            api_server.close()

    # every epoch committed; the cluster is idle — compact the sink's
    # per-batch parts (small-files control; see _compact_checkpoint)
    _compact_checkpoint(ckpt_dir, cfg.pages_target_part_bytes)

    return CrawlResult(
        ckpt_dir=ckpt_dir,
        epochs=k - start_epoch,
        pages_fetched=total_holder["pages"],
        seen_size=seen_sizes(seen),
        metrics=metrics,
    )


def _free_disk_gb(path: str) -> float:
    """Free space (GB) on the filesystem holding *path*
    (crawl/utils.go GetFreeDiskSpace)."""
    return shutil.disk_usage(path).free / 1e9


def _epoch_boundary_guard(cfg, t_start: float, ckpt_dir: str,
                          sleep=time.sleep) -> str:
    """The reference's two background watchdogs — the crawl-time-limit
    clock (crawl/crawl.go:60-68) and the min-free-disk pause loop
    (crawl/utils.go:42-57 handleCrawlPause) — re-expressed at the only
    place a BSP crawl can stop: the epoch boundary. Returns "run" to
    start the next epoch or "finish" for a graceful (checkpointed) stop;
    raises TimeoutError past the hard limit (the reference Fatal-exits —
    here the abort is safe because every prior epoch is committed and
    the crawl resumes exactly)."""
    if cfg.crawl_time_limit:
        elapsed = time.monotonic() - t_start
        hard = cfg.crawl_max_time_limit or (
            cfg.crawl_time_limit + cfg.crawl_time_limit // 10)
        if elapsed >= hard:
            raise TimeoutError(
                f"crawl-max-time-limit reached ({elapsed:.0f}s >= {hard}s)")
        if elapsed >= cfg.crawl_time_limit:
            print(f"[rayzeno] crawl time limit reached "
                  f"({elapsed:.0f}s >= {cfg.crawl_time_limit}s): "
                  "finishing the crawl.", flush=True)
            return "finish"
    if cfg.min_space_required:
        while _free_disk_gb(ckpt_dir) <= cfg.min_space_required:
            print(f"[rayzeno] not enough disk space: "
                  f"{cfg.min_space_required} GB required, "
                  f"{_free_disk_gb(ckpt_dir):.1f} GB available — paused.",
                  flush=True)
            sleep(1.0)
    return "run"


_COMPACT_MANIFEST = ".compact_manifest.json"


def _plan_compaction(dirpath: str, target_bytes: int) -> list[dict]:
    """Greedy size bins over the dir's parts; only multi-file bins are
    work. Output names are content-addressed (digest of the source name
    list) so a re-plan after a partial earlier pass can never collide
    with — or re-consume — its own output."""
    import hashlib

    files = sorted(f for f in os.listdir(dirpath) if f.endswith(".parquet"))
    bins: list[list[str]] = []
    cur: list[str] = []
    cur_sz = 0
    for f in files:
        cur.append(f)
        cur_sz += os.path.getsize(os.path.join(dirpath, f))
        if cur_sz >= target_bytes:
            bins.append(cur)
            cur, cur_sz = [], 0
    if cur:
        bins.append(cur)
    out = []
    for b in bins:
        if len(b) <= 1:
            continue
        digest = hashlib.blake2b("|".join(b).encode(),
                                 digest_size=12).hexdigest()
        out.append({"sources": b, "output": f"part-c{digest}.parquet"})
    return out


def _execute_compaction_bin(dirpath: str, spec: dict) -> None:
    """Merge one manifest bin (idempotent): if the output part already
    exists (a crashed earlier pass), just delete the remaining sources;
    else stream the sources through a ParquetWriter (peak memory = one
    source part), atomically replace, then delete the sources."""
    import pyarrow.parquet as pq

    final = os.path.join(dirpath, spec["output"])
    if not os.path.exists(final):
        tmp = final + ".tmp"
        writer = None
        for f in spec["sources"]:
            t = pq.read_table(os.path.join(dirpath, f))
            if writer is None:
                writer = pq.ParquetWriter(tmp, t.schema)
            writer.write_table(t)
        if writer is not None:
            writer.close()
        os.replace(tmp, final)
    for f in spec["sources"]:
        if f != spec["output"]:
            try:
                os.remove(os.path.join(dirpath, f))
            except FileNotFoundError:
                pass  # already deleted by the crashed pass


def _compact_checkpoint(ckpt_dir: str, target_bytes: int) -> None:
    """Post-crawl small-files compaction: merge each epoch dir's
    per-batch Parquet parts into ~target_bytes files.

    The sink is forced to one part per batch by at-least-once task
    semantics (a part must be durable before its map task reports
    success), which a 100× crawl would turn into millions of tiny files.
    Compaction runs ONCE, after every epoch has committed, when the
    cluster is idle — measured overlap attempts at sf0.1 (committer
    thread: 50.5 s → 62-64 s; ray tasks alongside the next epoch:
    → 79 s) showed any in-crawl placement contends with the pipeline for
    disk, while the idle-cluster pass costs ~2-4 s wall.

    Crash-safe + resumable: per-dir manifests are written atomically
    BEFORE any merge; each bin is idempotent (output exists ⇒ only
    delete leftover sources); the manifest is removed last, so a crash
    anywhere re-runs to the identical end state on the next resume."""
    import json as _json

    if target_bytes <= 0:
        return
    work: list[tuple[str, dict]] = []
    for name in sorted(os.listdir(ckpt_dir)):
        if not (name.startswith("pages_epoch_")
                or name.startswith("counts_epoch_")
                or name.startswith("meta_epoch_")):
            continue
        d = os.path.join(ckpt_dir, name)
        if not os.path.isdir(d):
            continue
        mpath = os.path.join(d, _COMPACT_MANIFEST)
        if os.path.exists(mpath):
            plan = _json.load(open(mpath))  # crashed pass: finish it
        else:
            tgt = 1 << 40 if name.startswith("counts_") else target_bytes
            plan = _plan_compaction(d, tgt)
            if not plan:
                continue
            tmp = mpath + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(plan, f)
            os.replace(tmp, mpath)
        work.extend((d, spec) for spec in plan)
    if work and ray.is_initialized():
        execute = ray.remote(num_cpus=1)(_execute_compaction_bin)
        ray.get([execute.remote(d, spec) for d, spec in work])
    else:
        for d, spec in work:
            _execute_compaction_bin(d, spec)
    for name in os.listdir(ckpt_dir):
        mpath = os.path.join(ckpt_dir, name, _COMPACT_MANIFEST)
        if os.path.exists(mpath):
            os.remove(mpath)


def _rebase(ds):
    """Cut a materialized Dataset's logical plan. ``materialize()``
    executes but KEEPS the full upstream plan, so a loop-carried Dataset
    (the frontier: epoch k+1 builds on epoch k's output) accumulates one
    ever-longer plan that Ray re-optimizes on every downstream execution
    — measured on budget-mode crawls as ~2× epoch-wall growth per epoch
    (2.8 s → 112 s while frontier rows SHRANK 4244 → 308; per-dataset
    operator counts in ds.stats() grew ~3/epoch). Rebuilding from the
    materialized block refs is zero-copy and resets the plan to a leaf."""
    return rd.from_arrow_refs(ds.to_arrow_refs())


def _commit_epoch(ckpt_dir, k, next_rows, seen_dumps, hosts_snapshot, m,
                  metrics, total_holder, fast_mode=False, api_state=None):
    """Durable epoch commit (runs on the committer thread, overlapped with
    epoch k+1's compute): frontier parquet, seen shards, host registry,
    metrics + per-host lineage, then the _SUCCESS marker."""
    import pandas as pd
    import pyarrow.parquet as pq

    # REPLACE semantics: write_parquet appends (per-run uuid filenames), so
    # a re-commit after crash→resume must not land next to a crashed
    # attempt's files — stage into a tmp dir and rename over the target.
    nfdir = _epoch_dir(ckpt_dir, "frontier", k + 1)
    tmp = nfdir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    next_rows.write_parquet(tmp)
    os.makedirs(tmp, exist_ok=True)
    if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
        pq.write_table(FRONTIER_SCHEMA.empty_table(),
                       os.path.join(tmp, "empty.parquet"))
    shutil.rmtree(nfdir, ignore_errors=True)
    os.rename(tmp, nfdir)

    sdir = _epoch_dir(ckpt_dir, "seen", k)
    os.makedirs(sdir, exist_ok=True)
    for i, arr in enumerate(seen_dumps):
        import numpy as np

        pq.write_table(pa.table({"hash": pa.array(np.sort(arr), pa.uint64())}),
                       os.path.join(sdir, f"shard={i}.parquet"))

    # pages/asset counts + per-host lineage from the slim per-batch
    # (host, type, n) count parts the ExtractStage sink emitted — a few
    # tiny files per epoch, NOT a re-read of every pages part (which is
    # an O(pages/epoch) driver scan at scale)
    cdir = _epoch_dir(ckpt_dir, "counts", k)
    frames = []
    if os.path.isdir(cdir):
        for f in os.listdir(cdir):
            if f.endswith(".parquet"):
                frames.append(pq.read_table(os.path.join(cdir, f)).to_pandas())
    if frames:
        pages_meta = pd.concat(frames, ignore_index=True)
        pages_meta = pages_meta.groupby(["host", "type"], as_index=False)["n"].sum()
    else:
        pages_meta = pd.DataFrame({"host": [], "type": [],
                                   "n": pd.Series([], dtype="int64")})
    if fast_mode and hosts_snapshot is not None and len(pages_meta):
        # fast mode skips the per-epoch host-registry aggregate; derive the
        # registry (metrics/checkpoint only) from the fetched hosts here —
        # commits are sequential, so this is the dict's only writer
        for h in sorted(set(pages_meta["host"])):
            if h not in hosts_snapshot:
                hosts_snapshot[h] = len(hosts_snapshot)
    n_pages = int(pages_meta.loc[pages_meta["type"] == "seed", "n"].sum())
    n_assets = int(pages_meta.loc[pages_meta["type"] == "asset", "n"].sum())
    m["pages_fetched"] = n_pages
    m["assets_fetched"] = n_assets
    if hosts_snapshot is not None:
        m["hosts"] = len(hosts_snapshot)
        save_hosts(dict(hosts_snapshot), os.path.join(sdir, "hosts.parquet"))
    # else: parquet registry backend — durable already, m["hosts"] preset

    mdir = _epoch_dir(ckpt_dir, "metrics", k)
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, "metrics.json"), "w") as f:
        json.dump(m, f)
    lineage = pages_meta.rename(columns={"n": "n_fetched"})
    pq.write_table(pa.Table.from_pandas(lineage, preserve_index=False),
                   os.path.join(mdir, "lineage.parquet"))

    metrics.append(m)
    total_holder["pages"] += n_pages + n_assets
    if api_state is not None:
        # live-stats surface (api.go:35-61's counters, epoch granularity)
        api_state["crawled_seeds"] = (
            api_state.get("crawled_seeds", 0) + n_pages)
        api_state["crawled_assets"] = (
            api_state.get("crawled_assets", 0) + n_assets)
        api_state["queued"] = m["next_frontier_rows"]
        api_state["hosts"] = m["hosts"]
        api_state["epoch"] = k
        api_state["seen_size"] = m["seen_size"]
    with open(_marker(ckpt_dir, k), "w") as f:
        f.write("ok")


def warm_cluster(n_tasks: int | None = None) -> None:
    """Force the Ray worker pool to spawn and import this package so the
    first timed execution doesn't pay worker cold-start (cluster warmup —
    excluded from benchmarks like any page-cache warm)."""
    import ray as _ray

    n = n_tasks or int(_ray.cluster_resources().get("CPU", 8))

    def _touch(batch):
        import zeno_ray.extract  # noqa: F401 — pull the heavy imports
        import zeno_ray.stages  # noqa: F401

        return batch

    rd.range(n * 2, override_num_blocks=n * 2).map_batches(
        _touch, batch_format="pyarrow").materialize()


def _attach_zero_host_seq(df):
    df = df.copy()
    df["host_seq"] = 0
    return df


def _cast_frontier(ds):
    def cast(t: pa.Table) -> pa.Table:
        return t.select(FRONTIER_SCHEMA.names).cast(FRONTIER_SCHEMA)

    return ds.map_batches(cast, batch_format="pyarrow")
