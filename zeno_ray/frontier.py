"""Frontier: host-keyed FIFO ordering, per-epoch politeness budget, host
first-appearance registry.

Reproduces the reference's crawl-ordering contract (SURVEY.md §2.7,
``queue/dequeue.go:135-158``, ``queue/index/index.go:48-90``):
- per-host FIFO: the frontier's (seq_epoch, seq_order, seq_pos) triple is
  the enqueue order, assigned distributedly with NO shuffle — seq_order is
  the parent's global fetch order, seq_pos the in-page position;
- round-robin across hosts in first-appearance order: ``host_seq`` is the
  host's discovery rank; the per-epoch fetch slice is ordered by
  (rank_within_host, host_seq), which with budget=1 replays Zeno's strict
  host rotation exactly (dequeue_test.go:84-140);
- per-epoch budget: at most ``budget`` rows per host per epoch (politeness);
  the rest carry over — Zeno's one-item-per-host-per-turn generalized.

The groupby(host) rank step is the ONE wide shuffle of the loop and moves
only frontier rows (url + a few ints). Host registry: a per-epoch
aggregate of new hosts (tiny — rows = newly discovered hosts) merged into a
driver-side dict, checkpointed to Parquet; at 10^8-host scale the same
registry becomes a Parquet-backed join keyed by host, same columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from zeno_ray.urlnorm import canonicalize, hash64, host_of

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("hash", pa.uint64()),
        ("hop", pa.int32()),
        ("type", pa.string()),
        ("parent_url", pa.string()),
        ("seq_epoch", pa.int32()),
        ("seq_order", pa.int64()),
        ("seq_pos", pa.int32()),
        ("host_seq", pa.int64()),
    ]
)

# fetch-slice "order" = rank * 2^31 + host_seq; both factors bounded well
# below 2^31 (rank < rows-per-host-per-epoch, host_seq < #hosts)
ORDER_RANK_SHIFT = np.int64(1) << np.int64(31)


def _rank_n_parts(n_rows: int | None = None) -> int:
    """Coarse shuffle-partition count for the budget-mode rank shuffle —
    a few parts per core, independent of host cardinality, DOWNSHIFTED
    when the frontier is small: every part is a task in every downstream
    stage (the shuffle output's block count feeds fetch/extract), so a
    775-row late-budget epoch on 256 fixed parts pays ~500 task launches
    per epoch for microseconds of compute (measured: budget-mode epochs
    grew 6 s → 51 s; the same fixed-overhead trap ops/graph.py documents
    for PageRank)."""
    import ray as _ray

    coarse = max(64, int(_ray.cluster_resources().get("CPU", 8)) * 8) \
        if _ray.is_initialized() else 64
    if n_rows is None:
        return coarse
    return int(np.clip(n_rows // 20000 + 4, 4, coarse))


def seed_frontier(seed_urls: list[str]) -> tuple[pa.Table, dict[str, int]]:
    """Epoch-0 frontier from a seed list (order = file order, invalid URLs
    skipped, duplicates dropped first-wins — queue/item.go:53-102 +
    crawl.go:218-235). Returns (frontier table, host registry)."""
    rows = []
    seen: set[str] = set()
    hosts: dict[str, int] = {}
    for i, raw in enumerate(seed_urls):
        c = canonicalize(raw)
        if not c:
            continue
        from zeno_ray.urlnorm import is_valid_url

        if not is_valid_url(c) or c in seen:
            continue
        seen.add(c)
        host = host_of(c)
        if host not in hosts:
            hosts[host] = len(hosts)
        rows.append(
            {
                "url": c, "host": host, "hash": hash64(c), "hop": 0,
                "type": "seed", "parent_url": "", "seq_epoch": -1,
                "seq_order": i, "seq_pos": 0, "host_seq": hosts[host],
            }
        )
    table = pa.Table.from_pylist(rows, schema=FRONTIER_SCHEMA)
    return table, hosts


def rank_frontier(frontier_ds, budget: int, n_rows: int | None = None):
    """Assign per-host FIFO rank; split into (fetch_slice, carryover).

    fetch_slice rows gain ``order`` (the global deterministic fetch order
    key) and drop the seq columns; carryover keeps the frontier schema.

    budget == 0 (pure-BFS throughput mode): everything is fetched, so the
    per-host rank is unobservable — the groupby(host) shuffle is skipped
    entirely and the order key degrades to a deterministic per-URL value
    (hash-derived). Rotation semantics only exist under a budget; the BFS
    level structure, URL set and hops are identical either way.
    """
    if budget <= 0:

        def to_fetch_fast(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["url", "host", "hash", "hop", "type", "parent_url"]].copy()
            # the frontier row already carries hash64(url) — reuse it
            out["order"] = (
                df["hash"].to_numpy(np.uint64) & np.uint64((1 << 62) - 1)
            ).astype(np.int64)
            return out

        return frontier_ds.map_batches(to_fetch_fast, batch_format="pandas"), None

    # Coarse-partition shuffle, NOT a raw groupby(host): at 10^8 hosts a
    # per-host map_groups pays Python dispatch per tiny group. Instead all
    # rows of a host land in one of ~8×CPU parts (part = f(host) % n,
    # data-adaptively downshifted for small frontiers) and ONE vectorized
    # kernel ranks every host in the part at once.
    n_parts = _rank_n_parts(n_rows)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = (
            pd.util.hash_array(df["host"].to_numpy(object))
            % np.uint64(n_parts)
        ).astype(np.int64)
        return df

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["host", "seq_epoch", "seq_order", "seq_pos"], kind="stable"
        ).drop(columns=["part"])
        # assets are budget-EXEMPT (rank -1): the reference fetches assets
        # outside the queue (assets.go:72-137), so politeness budgets
        # throttle page fetches only
        is_page = (g["type"] == "seed").to_numpy()
        rank = np.full(len(g), -1, dtype=np.int64)
        n_pages = int(is_page.sum())
        if n_pages:
            # run-length cumcount: hosts are contiguous after the sort
            hosts = g["host"].to_numpy(object)[is_page]
            idx = np.arange(n_pages, dtype=np.int64)
            change = np.empty(n_pages, dtype=bool)
            change[0] = True
            np.not_equal(hosts[1:], hosts[:-1], out=change[1:])
            starts = idx[change]
            counts = np.diff(np.append(starts, n_pages))
            rank[is_page] = idx - np.repeat(starts, counts)
        return g.assign(rank=rank)

    ranked = (
        frontier_ds.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(rank_part, batch_format="pandas")
        .materialize()
    )
    fetch = ranked.filter(expr=f"rank < {budget}")
    carry = ranked.filter(expr=f"rank >= {budget}")

    def to_fetch_slice(df: pd.DataFrame) -> pd.DataFrame:
        order = np.maximum(df["rank"].to_numpy(np.int64), 0) * np.int64(
            ORDER_RANK_SHIFT
        ) + df["host_seq"].to_numpy(np.int64)
        out = df[["url", "host", "hash", "hop", "type", "parent_url"]].copy()
        out["order"] = order
        return out

    fetch = fetch.map_batches(to_fetch_slice, batch_format="pandas")
    carry = carry.drop_columns(["rank"])
    return fetch, carry


def assign_host_seq(cand_ds, hosts: dict[str, int]):
    """Register newly-discovered hosts in first-appearance order and attach
    ``host_seq`` to every candidate row.

    New hosts are ordered by (min seq_order, min seq_pos, host) — a tiny
    groupby aggregate (rows = distinct new hosts), deterministic. Mutates
    *hosts* (the driver-side registry) and returns the dataset with the
    ``host_seq`` column attached via a broadcast lookup."""
    from ray.data.aggregate import Min

    known = set(hosts)
    agg = (
        cand_ds.groupby("host")
        .aggregate(Min("seq_order", alias_name="mo"), Min("seq_pos", alias_name="mp"))
        .to_pandas()
    )
    if len(agg) and "host" in agg.columns:
        new = agg[~agg["host"].isin(known)].sort_values(
            ["mo", "mp", "host"], kind="stable"
        )
        for h in new["host"]:
            hosts[h] = len(hosts)
    mapping = dict(hosts)  # snapshot for serialization into the task

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["host_seq"] = df["host"].map(mapping).astype(np.int64)
        return df

    return cand_ds.map_batches(attach, batch_format="pandas")


def candidates_to_frontier_rows(cand_ds, epoch: int):
    """Outlink candidates (already host_seq-attached) → frontier schema."""

    def shape(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["url", "host", "hash", "hop", "type", "parent_url",
                  "seq_order", "seq_pos", "host_seq"]].copy()
        out.insert(6, "seq_epoch", np.int32(epoch))
        return out

    return cand_ds.map_batches(shape, batch_format="pandas")


class ParquetHostRegistry:
    """Parquet-backed host→host_seq registry — the scale path this
    module's docstring promises for host counts past driver memory
    (``cfg.host_registry="parquet"``, budget mode only).

    The dict backend holds every host ever seen on the driver; this
    backend keeps the full registry ONLY on disk, as epoch-stamped
    parquet dirs (``hostreg_epoch_<k>/``) under the checkpoint, so the
    crash-resume cleanup that governs pages/seen/frontier dirs governs
    the registry too (a torn epoch's appends are swept and re-derived
    deterministically on re-run).

    Per-epoch flow (``assign``):
      1. distinct candidate hosts via a slim groupby aggregate;
      2. ONE distributed semi-join against the on-disk registry —
         both sides tagged and unioned, then a coarse-partition
         groupby(part) with a vectorized pandas merge inside each part
         (never a raw groupby(host): 10^8 tiny groups is the known
         map_groups trap) — returning only THIS epoch's distinct hosts
         to the driver;
      3. unseen hosts numbered ``size + rank`` ordered by
         (min seq_order, min seq_pos, host) — byte-identical to the
         dict backend — and appended durably (tmp+rename);
      4. the epoch-local host→seq mapping is ``ray.put`` once and
         attached to candidates in map_batches.

    Driver + broadcast memory is O(hosts touched this epoch), never
    O(all hosts ever); the registry itself is scanned distributedly.
    """

    N_PARTS = 64

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = ckpt_dir
        self.size = 0
        self._n_appends = 0

    @classmethod
    def open(cls, ckpt_dir: str) -> "ParquetHostRegistry":
        """Attach to a checkpoint's registry (size from parquet footers —
        no row reads)."""
        import pyarrow.parquet as pq

        reg = cls(ckpt_dir)
        reg.size = sum(
            pq.ParquetFile(f).metadata.num_rows for f in reg._files())
        return reg

    def _files(self) -> list[str]:
        import glob
        import os

        return sorted(
            glob.glob(os.path.join(self.ckpt_dir, "hostreg_epoch_*",
                                   "*.parquet")))

    def _append(self, hosts: list[str], seqs, epoch: int, name: str):
        import os

        import pyarrow.parquet as pq

        d = os.path.join(self.ckpt_dir, f"hostreg_epoch_{epoch}")
        os.makedirs(d, exist_ok=True)
        # per-call counter in the name: assign() can run more than once in
        # one epoch (HQ bare-url sideload + main candidate path) and a
        # fixed name would silently clobber the first append's rows,
        # losing their seq assignments from the durable registry
        path = os.path.join(d, f"{name}-{self._n_appends:04d}.parquet")
        self._n_appends += 1
        t = pa.table({"host": pa.array(hosts, pa.string()),
                      "host_seq": pa.array(seqs, pa.int64())})
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.rename(tmp, path)
        self.size += len(hosts)

    def bootstrap(self, hosts: dict[str, int]) -> None:
        """Seed-load registration (epoch-0 state; re-derived on resume if
        epoch 0 never committed)."""
        self._append(list(hosts.keys()), list(hosts.values()), 0, "seed")

    @staticmethod
    def _part_of(host_series: pd.Series, n_parts: int) -> np.ndarray:
        # deterministic coarse partition key; only within-run consistency
        # between the two join sides is needed
        return (pd.util.hash_array(host_series.to_numpy(object))
                % np.uint64(n_parts)).astype(np.int64)

    def assign(self, cand_ds, epoch: int):
        """Register new hosts and attach ``host_seq`` to every candidate
        row. Same semantics as ``assign_host_seq`` (see class doc)."""
        import ray
        import ray.data as rd
        from ray.data.aggregate import Min

        # data-adaptive semi-join width: the join pays ~2 shuffles of
        # fixed per-part scheduling cost each epoch, so a small epoch on
        # the full 64 parts is pure overhead (same downshift discipline
        # as rank_frontier / ops/graph.py); the candidate row count is a
        # cheap metadata read (the caller materialized it) and an upper
        # bound on hosts touched
        try:
            n_cand = cand_ds.count()
        except Exception:
            n_cand = None
        n_parts = (self.N_PARTS if n_cand is None else
                   int(np.clip(n_cand // 20000 + 4, 4, self.N_PARTS)))

        agg = (
            cand_ds.groupby("host")
            .aggregate(Min("seq_order", alias_name="mo"),
                       Min("seq_pos", alias_name="mp"))
        )

        def tag_cand(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["host", "mo", "mp"]].copy()
            out["host_seq"] = np.int64(-1)
            out["part"] = self._part_of(out["host"], n_parts)
            return out

        sides = agg.map_batches(tag_cand, batch_format="pandas")
        files = self._files()
        if files:

            def tag_reg(t: pa.Table) -> pd.DataFrame:
                df = t.to_pandas()
                df["mo"] = np.int64(-1)
                df["mp"] = np.int64(-1)
                df["part"] = self._part_of(df["host"], n_parts)
                return df[["host", "mo", "mp", "host_seq", "part"]]

            reg = rd.read_parquet(files).map_batches(
                tag_reg, batch_format="pyarrow")
            sides = sides.union(reg)

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            cand = g[g["host_seq"] < 0]
            reg = g[g["host_seq"] >= 0]
            out = cand[["host", "mo", "mp"]].merge(
                reg[["host", "host_seq"]], on="host", how="left")
            out["host_seq"] = out["host_seq"].fillna(-1).astype(np.int64)
            return out

        touched = (
            sides.groupby("part").map_groups(merge, batch_format="pandas")
            .to_pandas()
        )  # O(hosts touched this epoch) rows — the bounded driver surface
        if "host" not in touched.columns:  # empty candidate epoch
            touched = pd.DataFrame({
                "host": pd.Series([], dtype=object),
                "mo": pd.Series([], dtype=np.int64),
                "mp": pd.Series([], dtype=np.int64),
                "host_seq": pd.Series([], dtype=np.int64)})
        new = touched[touched["host_seq"] < 0].sort_values(
            ["mo", "mp", "host"], kind="stable")
        if len(new):
            seqs = np.arange(self.size, self.size + len(new), dtype=np.int64)
            self._append(list(new["host"]), seqs, epoch, "new")
            touched = pd.concat(
                [touched[touched["host_seq"] >= 0],
                 new.assign(host_seq=seqs)], ignore_index=True)
        mapping = dict(zip(touched["host"], touched["host_seq"]))
        ref = ray.put(mapping)

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            import ray as _ray

            df = df.copy()
            df["host_seq"] = df["host"].map(_ray.get(ref)).astype(np.int64)
            return df

        return cand_ds.map_batches(attach, batch_format="pandas")


def save_hosts(hosts: dict[str, int], path: str) -> None:
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "host": pa.array(list(hosts.keys()), pa.string()),
            "host_seq": pa.array(list(hosts.values()), pa.int64()),
        }
    )
    pq.write_table(t, path)


def load_hosts(path: str) -> dict[str, int]:
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    return dict(zip(t["host"].to_pylist(), t["host_seq"].to_pylist()))
