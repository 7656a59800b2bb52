"""Seen-filter shard semantics: check-and-set first-wins (the reference's
seencheck contract, seencheck/seencheck.go:50-62), duplicate-proofness under
arbitrary batching (regression: a stale-bloom fast path once double-admitted
within-batch duplicates), checkpoint/restore round-trip."""

import numpy as np
import pytest
import ray

from zeno_ray.seen import (
    SeenFilterStage,
    check_and_add_batched,
    checkpoint_seen,
    create_seen_actors,
    restore_seen,
    seen_sizes,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_first_wins_and_no_duplicates_any_batching():
    shards = create_seen_actors(3)
    h = np.arange(2000, dtype=np.uint64)
    hh = np.concatenate([h, h, h])
    np.random.RandomState(1).shuffle(hh)
    admitted = []
    for step in (7, 64, 513, 1024):  # uneven batch boundaries
        pass
    i = 0
    sizes = [7, 513, 64, 999, 1024]
    si = 0
    while i < len(hh):
        n = sizes[si % len(sizes)]
        si += 1
        mask = check_and_add_batched(shards, hh[i: i + n])
        admitted.extend(hh[i: i + n][mask].tolist())
        i += n
    assert len(admitted) == 2000
    assert len(set(admitted)) == 2000
    assert seen_sizes(shards) == 2000


def test_within_single_batch_duplicates():
    shards = create_seen_actors(2)
    hh = np.array([5, 5, 5, 9, 9, 5], dtype=np.uint64)
    mask = check_and_add_batched(shards, hh)
    # first occurrence of each value wins
    assert mask.tolist() == [True, False, False, True, False, False]


def test_checkpoint_restore_roundtrip(tmp_path):
    shards = create_seen_actors(4)
    hh = np.random.RandomState(2).randint(0, 2**63, size=5000).astype(np.uint64)
    check_and_add_batched(shards, hh)
    n = seen_sizes(shards)
    checkpoint_seen(shards, str(tmp_path))
    fresh = create_seen_actors(4)
    restored = restore_seen(fresh, str(tmp_path))
    assert restored == n
    # everything is already seen in the restored shards
    mask = check_and_add_batched(fresh, hh)
    assert not mask.any()


def test_seen_filter_stage_dataset_level():
    import pyarrow as pa
    import ray.data as rd

    shards = create_seen_actors(4)
    h = np.arange(5000, dtype=np.uint64)
    hh = np.concatenate([h, h, h, h])
    np.random.RandomState(0).shuffle(hh)
    ds = rd.from_arrow(pa.table({"hash": pa.array(hh, pa.uint64())})).repartition(8)
    out = ds.map_batches(SeenFilterStage(shards), batch_format="pyarrow",
                         batch_size=512).materialize()
    vals = out.to_pandas()["hash"]
    assert len(vals) == 5000
    assert vals.nunique() == 5000


def test_bloom_grows_and_stays_correct():
    """Adaptive bloom growth: a shard whose bloom starts tiny must (a) keep
    the exact first-wins contract across many rebuilds and (b) actually
    grow, so the fast path never degrades to an exact-set scan at scale."""
    from zeno_ray.seen import SeenShard

    shard = SeenShard.remote(0, bloom_bits=256)  # grows past 16 inserts
    rng = np.random.RandomState(3)
    h = rng.randint(0, 1 << 63, size=20000, dtype=np.int64).astype(np.uint64)
    h = np.unique(h)
    hh = np.concatenate([h, h])
    rng.shuffle(hh)
    admitted = []
    for i in range(0, len(hh), 777):
        mask = ray.get(shard.check_and_add.remote(hh[i: i + 777]))
        admitted.extend(hh[i: i + 777][mask].tolist())
    assert len(admitted) == len(h)
    assert set(admitted) == set(h.tolist())
    bits = ray.get(shard.bloom_bits.remote())
    assert bits >= len(h) * 16 / 4  # grew from 256 to load-proportional
    # everything already seen afterwards
    assert not ray.get(shard.check_and_add.remote(h[:500])).any()
