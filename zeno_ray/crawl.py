"""The crawl loop: epoch-based BSP supersteps over the Parquet frontier.

One epoch (SURVEY.md §7.1):

    frontier_k ──rank/budget (groupby host)──► fetch slice + carryover
    fetch slice ──Fetcher actor pool──► fetched records (+redirect hops)
    fetched ──ExtractStage──► pages rows (+candidate lists)   [1 parse/page]
    pages ──write──► ckpt/pages/epoch=k/…
    candidates ──explode/gate ► dedupe ► SeenFilter actors──► new URLs
    new assets ──Fetcher ► Extract (m3u8 recursion) ► write──► asset pages
    new outlinks ∪ carryover ──► frontier_{k+1}  (Parquet)
    seen shards + host registry + metrics ──► ckpt, then _SUCCESS marker

State advances only at epoch boundaries; every epoch directory is written
before its ``_SUCCESS`` marker, so resume = "restart from the last epoch
whose marker exists" and is exact (the WAL+snapshot recovery contract of
``queue/index/recovery.go:9-60`` re-expressed as idempotent Parquet
commits). Assets are fetched within the epoch and never enter the frontier
(assets.go:72-137); redirects are followed inside the Fetcher with
mid-chain seen-checks (capture.go:120-178).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import pyarrow as pa
import ray
import ray.data as rd

from zeno_ray.config import CrawlConfig
from zeno_ray.corpus import CorpusSpec
from zeno_ray.fetch import Fetcher
from zeno_ray.frontier import (
    FRONTIER_SCHEMA,
    assign_host_seq,
    candidates_to_frontier_rows,
    load_hosts,
    rank_frontier,
    save_hosts,
    seed_frontier,
)
from zeno_ray.seen import (
    SeenFilterStage,
    checkpoint_seen,
    create_seen_actors,
    restore_seen,
    seen_sizes,
)
from zeno_ray.stages import (
    CandidateStage,
    ExtractStage,
    PAGES_COLUMNS,
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

    def pages_dataset(self):
        return rd.read_parquet(self.pages_glob)


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


def run_crawl(
    spec: CorpusSpec,
    cfg: CrawlConfig,
    ckpt_dir: str,
    seeds: list[str] | None = None,
    resume: bool = False,
    strict_dedupe: bool = False,
) -> CrawlResult:
    """Run (or resume) a full crawl; all state under *ckpt_dir*."""
    if not resume and os.path.exists(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)

    seen = create_seen_actors(cfg.seen_shards)
    metrics: list[dict] = []
    start_epoch = 0
    if resume:
        last = _last_complete_epoch(ckpt_dir)
        if last >= 0:
            restore_seen(seen, _epoch_dir(ckpt_dir, "seen", last))
            hosts = load_hosts(os.path.join(_epoch_dir(ckpt_dir, "seen", last), "hosts.parquet"))
            start_epoch = last + 1
            for k in range(last + 1):
                mpath = os.path.join(_epoch_dir(ckpt_dir, "metrics", k), "metrics.json")
                if os.path.exists(mpath):
                    metrics.append(json.load(open(mpath)))
    if start_epoch == 0:
        seed_urls = seeds if seeds is not None else spec.seeds()
        table, hosts = seed_frontier(seed_urls)
        # seed-load seencheck (crawl.go:218-235)
        import numpy as np

        from zeno_ray.seen import check_and_add_batched

        if table.num_rows:
            mask = check_and_add_batched(
                seen, table["hash"].to_numpy().astype(np.uint64)
            )
            table = table.filter(pa.array(mask))
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
    fetcher = Fetcher(spec=spec, seen_shards=seen,
                      max_retry=cfg.max_retry, max_redirect=cfg.max_redirect)

    robots = None
    if cfg.robots_enforce:
        from zeno_ray.politeness import RobotsFilterStage, create_robots_actors

        robots = RobotsFilterStage(create_robots_actors(spec, max(2, cfg.seen_shards // 2)))

    total_pages = 0
    frontier_mem = None  # materialized next-frontier carried across epochs
    k = start_epoch
    while k < cfg.max_epochs:
        t0 = time.perf_counter()
        fdir = _epoch_dir(ckpt_dir, "frontier", k)
        if frontier_mem is not None:
            frontier = frontier_mem
            n_frontier = frontier.count()  # cheap: materialized
            # the carried frontier inherits few fat blocks from the
            # candidate pipeline — split so the fetch stage can run wide
            want_blocks = max(2, min(cfg.fetch_concurrency * 4,
                                     n_frontier // max(1, cfg.fetch_batch_size) + 1))
            if n_frontier > cfg.fetch_batch_size * 2:
                frontier = frontier.repartition(want_blocks)
        else:
            n_frontier = _parquet_rows(fdir)
            if n_frontier == 0:
                break
            # split the read so the fetch stage has enough input blocks
            n_blocks = max(2, min(cfg.fetch_concurrency * 4,
                                  n_frontier // max(1, cfg.fetch_batch_size) + 1))
            frontier = rd.read_parquet(fdir, override_num_blocks=n_blocks)
        if n_frontier == 0:
            break

        # ---- rank/budget (the host-keyed scheduling shuffle) ----
        t_phase = time.perf_counter()
        fetch_slice, carry = rank_frontier(frontier, cfg.host_budget)

        # ---- fetch + extract (seed items) ----
        # Fetcher is the one actor pool (holds corpus spec + seen handles);
        # extract/candidate/seen-filter stages are serialized instances ⇒
        # elastic stateless tasks, so stages never deadlock on CPU
        # reservations (guide: size concurrency × num_cpus to the node).
        fetched = fetch_slice.map_batches(
            fetcher,
            batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
        )
        pages = fetched.map_batches(
            ExtractStage(cfg),
            batch_format="pyarrow", batch_size=cfg.extract_batch_size,
        ).materialize()
        pdir = _epoch_dir(ckpt_dir, "pages", k)
        n_pages = pages.count()
        t_fetch = time.perf_counter() - t_phase
        t_phase = time.perf_counter()

        # ---- pages sink ∥ candidate pipeline (independent consumers of the
        # materialized pages — run their executions concurrently) ----
        from concurrent.futures import ThreadPoolExecutor

        def _write_pages():
            pages.drop_columns(["candidates"]).write_parquet(
                os.path.join(pdir, "seeds"))

        def _candidates():
            cand = pages.select_columns(
                ["url", "host", "hop", "order", "candidates"]
            ).map_batches(
                CandidateStage(cfg),
                batch_format="pyarrow", batch_size=cfg.extract_batch_size,
            )
            if robots is not None:
                cand = cand.map_batches(robots, batch_format="pyarrow",
                                        batch_size=32768)
            cand = dedupe_candidates_within_epoch(cand, strict=strict_dedupe)
            return cand.map_batches(
                SeenFilterStage(seen),
                batch_format="pyarrow", batch_size=32768,
            ).materialize()

        with ThreadPoolExecutor(max_workers=2) as pool:
            fut_write = pool.submit(_write_pages)
            fut_new = pool.submit(_candidates)
            new = fut_new.result()
            fut_write.result()
        t_cand = time.perf_counter() - t_phase
        t_phase = time.perf_counter()

        # ---- assets: inline fetch sub-stages, m3u8 recursion ----
        n_assets = 0
        assets = new.filter(expr="type == 'asset'")
        sub = 0
        while assets.count() > 0 and sub < 4:
            aslice = assets.map_batches(_to_fetch_slice, batch_format="pandas")
            afetched = aslice.map_batches(
                fetcher,
                batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
            )
            apages = afetched.map_batches(
                ExtractStage(cfg),
                batch_format="pyarrow", batch_size=cfg.extract_batch_size,
            ).materialize()
            apages.drop_columns(["candidates"]).write_parquet(
                os.path.join(pdir, f"assets_{sub}")
            )
            n_assets += apages.count()
            acand = apages.select_columns(["url", "host", "hop", "order", "candidates"]
                                          ).map_batches(
                CandidateStage(cfg),
                batch_format="pyarrow", batch_size=cfg.extract_batch_size,
            )
            if robots is not None:
                acand = acand.map_batches(robots, batch_format="pyarrow",
                                          batch_size=32768)
            acand = dedupe_candidates_within_epoch(acand, strict=strict_dedupe)
            assets = acand.map_batches(
                SeenFilterStage(seen),
                batch_format="pyarrow", batch_size=8192,
            ).materialize()
            sub += 1

        t_assets = time.perf_counter() - t_phase
        t_phase = time.perf_counter()

        # ---- next frontier: new outlinks ∪ carryover ----
        outlinks = new.filter(expr="type == 'seed'")
        outlinks = assign_host_seq(outlinks, hosts)
        next_rows = candidates_to_frontier_rows(outlinks, epoch=k)
        if carry is not None:
            next_rows = next_rows.union(carry)
        nfdir = _epoch_dir(ckpt_dir, "frontier", k + 1)
        next_rows = _cast_frontier(next_rows).materialize()
        next_rows.write_parquet(nfdir)
        frontier_mem = next_rows
        os.makedirs(nfdir, exist_ok=True)
        if not any(f.endswith(".parquet") for f in os.listdir(nfdir)):
            import pyarrow.parquet as pq

            pq.write_table(FRONTIER_SCHEMA.empty_table(),
                           os.path.join(nfdir, "empty.parquet"))
        n_next = _parquet_rows(nfdir)
        t_frontier = time.perf_counter() - t_phase

        # ---- checkpoint state + metrics, commit epoch (seen dump is
        # actor-side; overlap it with the lineage write below) ----
        sdir = _epoch_dir(ckpt_dir, "seen", k)
        os.makedirs(sdir, exist_ok=True)
        from concurrent.futures import ThreadPoolExecutor as _TPE

        with _TPE(max_workers=2) as pool:
            fut_seen = pool.submit(checkpoint_seen, seen, sdir)
            save_hosts(hosts, os.path.join(sdir, "hosts.parquet"))
            fut_seen.result()
        m = {
            "epoch": k,
            "frontier_rows": int(n_frontier),
            "pages_fetched": int(n_pages),
            "assets_fetched": int(n_assets),
            "next_frontier_rows": int(n_next),
            "seen_size": seen_sizes(seen),
            "hosts": len(hosts),
            "wall_sec": round(time.perf_counter() - t0, 3),
            "t_fetch_extract": round(t_fetch, 3),
            "t_candidates": round(t_cand, 3),
            "t_assets": round(t_assets, 3),
            "t_frontier": round(t_frontier, 3),
        }
        mdir = _epoch_dir(ckpt_dir, "metrics", k)
        os.makedirs(mdir, exist_ok=True)
        with open(os.path.join(mdir, "metrics.json"), "w") as f:
            json.dump(m, f)
        # per-partition lineage: pages per host this epoch (from the
        # already-materialized pages, no re-read)
        pages.groupby("host").count().write_parquet(os.path.join(mdir, "lineage"))
        metrics.append(m)
        total_pages += int(n_pages) + int(n_assets)
        with open(_marker(ckpt_dir, k), "w") as f:
            f.write("ok")
        k += 1

    return CrawlResult(
        ckpt_dir=ckpt_dir,
        epochs=k - start_epoch,
        pages_fetched=total_pages,
        seen_size=seen_sizes(seen),
        metrics=metrics,
    )


def _to_fetch_slice(df):
    """Asset candidates → Fetcher input schema (order = seq_order with the
    in-page position as tiebreak folded in; see stages.py docstring)."""
    import numpy as np

    out = df[["url", "host", "hash", "hop", "type", "parent_url"]].copy()
    out["order"] = df["seq_order"].to_numpy(np.int64)
    return out


def _cast_frontier(ds):
    def cast(t: pa.Table) -> pa.Table:
        return t.select(FRONTIER_SCHEMA.names).cast(FRONTIER_SCHEMA)

    return ds.map_batches(cast, batch_format="pyarrow")
