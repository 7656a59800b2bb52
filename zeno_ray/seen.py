"""Sharded URL-seen filter — the crawl's global dedup gate.

Role of the reference's LevelDB "seencheck" (``internal/pkg/seencheck/
seencheck.go:18-62``): check-and-set membership on the hash of the canonical
URL, first-wins. Here it is N shard actors, each owning the hash space slice
``hash % n_shards == shard_id``; callers batch their membership queries per
shard, so one ``map_batches`` batch costs at most N actor RPCs.

Scale design: membership state is an in-memory hash set per shard (~40 B/URL
⇒ 10^8 URLs across 32 shards ≈ 12 GB cluster-wide, one shard per node at
256 nodes); a bloom fast-path in front of the exact set (``bloom_bits``)
short-circuits the common miss case. Shards checkpoint to one sorted-uint64
Parquet per shard per epoch and restore exactly.

Retry semantics (SINGLE-ATTEMPT ASSUMPTION): ``check_and_add`` mutates
shard state, so a Ray task retried AFTER its shard RPC committed would see
its own hashes as already-seen and silently drop those rows. The crawl
accepts this single-attempt model — the same admission-then-crash window
the reference has between its seencheck insert and the WARC write
(``seencheck.go:50-62``) — because the epoch checkpoint/resume path
(rerun-from-last-marker with a restored seen snapshot) is the recovery
mechanism for worker loss, not Ray task retries: a retry-visible loss is
bounded by one epoch and repaired by resuming that epoch. Deployments that
want mid-epoch task retries must key admission by (epoch, batch id) so a
retried batch replays its original admission mask.
"""

from __future__ import annotations

import os

import numpy as np
import ray


@ray.remote(num_cpus=0)
class SeenShard:
    """One hash-space shard of the URL-seen set (exact set + bloom fast path)."""

    # grow the bloom when the exact set exceeds bits/16 — a 1-hash bloom's
    # false-positive rate ≈ fill fraction, so this caps the slow-path (exact
    # set probe) share of lookups at ~6%. Growth is 4× per rebuild: O(log)
    # rebuilds over a crawl, each a single vectorized re-add of the set.
    # At 10^8 URLs/shard the bloom tops out near 200 MB — small next to the
    # ~4 GB the exact set itself costs at that load.
    _GROW_AT_FILL = 16

    def __init__(self, shard_id: int, bloom_bits: int = 1 << 24):
        self.shard_id = shard_id
        self._set: set[int] = set()
        self._bloom_bits = bloom_bits
        self._bloom = np.zeros(bloom_bits // 64, dtype=np.uint64)
        self._bloom_mask = np.uint64(bloom_bits - 1)

    def _maybe_grow_bloom(self) -> None:
        if len(self._set) * self._GROW_AT_FILL <= self._bloom_bits:
            return
        while len(self._set) * self._GROW_AT_FILL > self._bloom_bits:
            self._bloom_bits *= 4
        self._bloom = np.zeros(self._bloom_bits // 64, dtype=np.uint64)
        self._bloom_mask = np.uint64(self._bloom_bits - 1)
        self._bloom_add(np.fromiter(self._set, dtype=np.uint64,
                                    count=len(self._set)))

    def _bloom_maybe(self, h: np.ndarray) -> np.ndarray:
        idx = h & self._bloom_mask
        word, bit = idx >> np.uint64(6), idx & np.uint64(63)
        return (self._bloom[word] >> bit) & np.uint64(1) != 0

    def _bloom_add(self, h: np.ndarray) -> None:
        idx = h & self._bloom_mask
        word, bit = idx >> np.uint64(6), idx & np.uint64(63)
        np.bitwise_or.at(self._bloom, word, np.uint64(1) << bit)

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean mask: True where the hash was NEW (and is now inserted).
        First occurrence within the batch wins (seencheck.go:50-62).

        Vectorized: ``np.unique(return_index=True)`` collapses within-batch
        duplicates to their FIRST occurrence (so the bloom can safely
        fast-path the cross-batch check on the unique values — the old
        bug class of bloom-gating within-batch dups cannot occur here),
        then the exact set is consulted only for bloom maybe-hits."""
        h = hashes.astype(np.uint64, copy=False)
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        uniq, first_idx = np.unique(h, return_index=True)
        maybe = self._bloom_maybe(uniq)
        new_mask = ~maybe  # bloom definite-miss ⇒ definitely new
        s = self._set
        idx_maybe = np.nonzero(maybe)[0]
        if len(idx_maybe):
            vals = uniq[idx_maybe].tolist()
            old = np.fromiter((v in s for v in vals), dtype=bool,
                              count=len(vals))
            new_mask[idx_maybe[~old]] = True
        new_vals = uniq[new_mask]
        s.update(new_vals.tolist())
        self._bloom_add(new_vals)
        self._maybe_grow_bloom()
        out = np.zeros(len(h), dtype=bool)
        out[first_idx[new_mask]] = True
        return out

    def add(self, hashes: np.ndarray) -> int:
        h = hashes.astype(np.uint64, copy=False)
        self._set.update(h.tolist())
        self._bloom_add(h)
        self._maybe_grow_bloom()
        return len(self._set)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        s = self._set
        maybe = self._bloom_maybe(h)
        return np.fromiter(
            ((bool(m) and hv in s) for hv, m in zip(h.tolist(), maybe)),
            dtype=bool,
            count=len(h),
        )

    def size(self) -> int:
        return len(self._set)

    def bloom_bits(self) -> int:
        return self._bloom_bits

    def dump(self) -> np.ndarray:
        return np.sort(np.fromiter(self._set, dtype=np.uint64, count=len(self._set)))

    def restore(self, hashes: np.ndarray) -> int:
        self._set = set(hashes.astype(np.uint64).tolist())
        self._bloom[:] = 0
        self._bloom_add(hashes.astype(np.uint64))
        self._maybe_grow_bloom()
        return len(self._set)


def create_seen_actors(n_shards: int) -> list:
    return [SeenShard.remote(i) for i in range(n_shards)]


def check_and_add_batched(shards: list, hashes: np.ndarray) -> np.ndarray:
    """Route a batch of hashes to their shards, one RPC per shard, and
    reassemble the new-mask in input order."""
    h = hashes.astype(np.uint64, copy=False)
    n = len(shards)
    shard_ids = (h % np.uint64(n)).astype(np.int64)
    mask = np.zeros(len(h), dtype=bool)
    futures, indices = [], []
    for s in range(n):
        idx = np.nonzero(shard_ids == s)[0]
        if len(idx):
            futures.append(shards[s].check_and_add.remote(h[idx]))
            indices.append(idx)
    for idx, res in zip(indices, ray.get(futures)):
        mask[idx] = res
    return mask


def seen_sizes(shards: list) -> int:
    return int(sum(ray.get([s.size.remote() for s in shards])))


def checkpoint_seen(shards: list, out_dir: str) -> None:
    """One sorted-hash parquet per shard (epoch checkpoint)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    dumps = ray.get([s.dump.remote() for s in shards])
    for i, arr in enumerate(dumps):
        pq.write_table(
            pa.table({"hash": pa.array(arr, pa.uint64())}),
            os.path.join(out_dir, f"shard={i}.parquet"),
        )


def restore_seen(shards: list, in_dir: str) -> int:
    import pyarrow.parquet as pq

    futures = []
    for i, s in enumerate(shards):
        t = pq.read_table(os.path.join(in_dir, f"shard={i}.parquet"))
        futures.append(s.restore.remote(t["hash"].to_numpy()))
    return int(sum(ray.get(futures)))


class SeenFilterStage:
    """``map_batches`` stage: keep only rows whose ``hash`` is new, inserting
    them. Within-epoch duplicates must be pre-deduped (groupby(hash)) so the
    first-wins choice is deterministic, not racey."""

    def __init__(self, shards: list):
        self.shards = shards

    def __call__(self, batch):
        if batch.num_rows == 0:
            return batch
        import pyarrow as pa

        mask = check_and_add_batched(self.shards, batch["hash"].to_numpy())
        return batch.filter(pa.array(mask))
