"""HQ stand-in: a network-free "remote frontier directory".

The reference's HQ trio (``internal/pkg/crawl/hq.go``) couples the crawl
to the gocrawlhq service: HQConsumer (hq.go:149-228) pulls batches of
URLs from HQ into the local queue, HQProducer (hq.go:52-147) pushes
discovered outlinks to HQ instead of enqueuing them locally, and
HQFinisher (hq.go:230-279) reports fetched URLs back. SURVEY §2.1/§2.2
scope the remote service out of the rebuild; this module closes the
*conceptual* gap — a continuously fed remote frontier — with a watched
directory of Parquet batches, no network:

- **consumer**: at each epoch boundary, unconsumed batch files in
  ``cfg.hq_feed_dir`` are ingested into the frontier. Rows carrying the
  full frontier schema pass straight through (they were seen-checked
  and host_seq-assigned when produced, exactly like the local path's
  next_rows); bare ``url`` rows are gated like seeds (canonicalize →
  validate → robots → seen check-and-set → host registration).
- **producer**: with ``cfg.hq_produce`` the epoch's discovered frontier
  rows are exported as an atomic batch dir (tmp+rename) into the feed
  directory INSTEAD of the local next-frontier, and the local frontier
  commits empty — the directory is the remote queue. Pointing produce
  at the own feed dir closes the loop and reproduces the local crawl
  exactly (the equivalence test).
- **finisher**: the pages + lineage epoch commits already are the
  durable finished-record stream; no separate channel is needed.

Crash/resume contract: consumed batch names ride in each epoch's
committed metrics (``hq_consumed``), so a resumed crawl never
double-ingests a batch consumed by a committed epoch; a batch consumed
(or produced) by a CRASHED epoch re-enters on re-run and is deduped by
the restored seen filter — ingestion is idempotent.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa

FRONTIER_COLS = ("url", "host", "hash", "hop", "type", "parent_url",
                 "seq_epoch", "seq_order", "seq_pos", "host_seq")


def list_feed_batches(feed_dir: str) -> list[str]:
    """Sorted batch units under *feed_dir*: top-level ``*.parquet`` files
    and ``batch-*/`` dirs (one produced export each). The batch NAME is
    the consumed-tracking key."""
    if not os.path.isdir(feed_dir):
        return []
    out = []
    for name in os.listdir(feed_dir):
        p = os.path.join(feed_dir, name)
        if name.endswith(".parquet") and os.path.isfile(p):
            out.append(name)
        elif os.path.isdir(p) and not name.endswith(".tmp"):
            if any(f.endswith(".parquet") for f in os.listdir(p)):
                out.append(name)
    return sorted(out)


def batch_files(feed_dir: str, name: str) -> list[str]:
    p = os.path.join(feed_dir, name)
    if os.path.isfile(p):
        return [p]
    return sorted(
        os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet"))


def produce_batch(feed_dir: str, ds, epoch: int) -> str:
    """Export a frontier Dataset as one atomic batch dir (the producer's
    Add call, hq.go:75-84: all-or-nothing delivery).

    The name is DETERMINISTIC per epoch: a crawl that crashes after
    producing epoch *k*'s batch but before committing epoch *k*
    re-produces the identical rows on re-run, and the rename REPLACES the
    stale batch instead of leaving two copies under different names for
    the consumer to double-ingest (crash-resume idempotence for
    full-frontier-schema rows, which bypass the seen re-check)."""
    os.makedirs(feed_dir, exist_ok=True)
    name = f"batch-{epoch:06d}"
    final = os.path.join(feed_dir, name)
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    os.makedirs(tmp, exist_ok=True)  # empty ds writes nothing
    shutil.rmtree(final, ignore_errors=True)  # stale copy from a crash
    os.rename(tmp, final)
    return name


def ingest_feed(feed_dir: str, consumed: set, epoch: int, seen, robots,
                hosts: dict | None, registry, cfg):
    """Consume every unconsumed batch. Returns ``(dataset_or_None,
    consumed_names)`` — the dataset rows are full frontier-schema rows
    ready to union into epoch *epoch*'s frontier."""
    import pyarrow.parquet as pq
    import ray.data as rd

    names = [n for n in list_feed_batches(feed_dir) if n not in consumed]
    if not names:
        return None, []
    full_files: list[str] = []
    bare_tables: list[pa.Table] = []
    for n in names:
        for f in batch_files(feed_dir, n):
            schema = pq.read_schema(f)
            if set(FRONTIER_COLS) <= set(schema.names):
                full_files.append(f)
            else:
                bare_tables.append(pq.read_table(f, columns=["url"]))
    parts = []
    if full_files:
        # pre-checked frontier rows (the producer ran the robots + seen +
        # host_seq gates before export, like the local next_rows path)
        parts.append(rd.read_parquet(full_files))
    if bare_tables:
        sideload = _gate_bare_urls(
            pa.concat_tables(bare_tables), epoch, seen, robots, hosts,
            registry)
        if sideload is not None:
            parts.append(sideload)
    if not parts:
        return None, names
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds, names


def _gate_bare_urls(t: pa.Table, epoch: int, seen, robots,
                    hosts: dict | None, registry):
    """Seed-style gates for externally fed bare URLs (the HQConsumer's
    local seencheck before enqueue, hq.go:189-208)."""
    from zeno_ray.frontier import candidates_to_frontier_rows, seed_frontier
    from zeno_ray.seen import check_and_add_batched

    table, _ = seed_frontier(t["url"].to_pylist())
    if robots is not None and table.num_rows:
        table = robots(table)
    if not table.num_rows:
        return None
    mask = check_and_add_batched(
        seen, table["hash"].to_numpy().astype(np.uint64))
    table = table.filter(pa.array(mask))
    if not table.num_rows:
        return None
    import ray.data as rd

    if registry is not None:
        cand = rd.from_arrow(table.drop_columns(["host_seq", "seq_epoch"]))
        return candidates_to_frontier_rows(
            registry.assign(cand, epoch), epoch=epoch)
    # dict backend: continue the driver registry in arrival order
    hseqs = np.empty(table.num_rows, dtype=np.int64)
    for i, h in enumerate(table["host"].to_pylist()):
        if h not in hosts:
            hosts[h] = len(hosts)
        hseqs[i] = hosts[h]
    table = table.set_column(
        table.schema.get_field_index("host_seq"), "host_seq",
        pa.array(hseqs, pa.int64()))
    table = table.set_column(
        table.schema.get_field_index("seq_epoch"), "seq_epoch",
        pa.array(np.full(table.num_rows, epoch, dtype=np.int32)))
    return rd.from_arrow(table)
