"""Sequence-packing plan over the ``documents`` table.

Training pipelines concatenate tokenized documents (in a deterministic
order) into one token stream and chop it into fixed-length context
windows ("packs", GPT-style packing with document splitting allowed).
The *plan* for that — where each doc starts in the stream and which
packs it spans — is a global prefix sum over per-doc token counts in
doc_id order.

The scalable shape (no driver-side O(N) scan, no global sort):

1. slim projection: one ``map_batches`` pass computes ``n_tokens`` per
   doc and assigns a contiguous range partition ``part = doc_id // W``
   (doc order must be preserved across partitions, so the partition key
   is a RANGE of the order key, not a hash);
2. per-range partial sums: one small ``groupby(part)`` over ~n_parts
   pre-aggregated rows (combiner inside the batch pass);
3. driver-side exclusive scan over the n_parts partial sums — O(parts),
   not O(docs) — broadcast back as a dict;
4. per-range cumulative sum + pack arithmetic inside
   ``groupby(part).map_groups`` (vectorized numpy per range).

Two passes over a 2-column projection; everything wide stays in the
cluster. At 10^9 docs the driver sees n_parts integers.

Token semantics match the SQL oracle exactly:
``n_tokens = len(string_split(text, ' '))`` (single-space split, empty
pieces count) — see ``__ray_entry__.oracle_sql()['doc_pack_plan']``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pack_plan(docs_ds, context_len: int = 2048, n_parts: int | None = None):
    """Return a Dataset with one row per doc:

    ``doc_id, n_tokens, start_token, pack_first, pack_last, n_packs``

    where ``start_token`` is the doc's offset in the concatenated
    token stream (docs ordered by doc_id) and ``pack_*`` locate it in
    ``context_len``-token windows.
    """
    from ray.data.aggregate import Sum

    if n_parts is None:
        from zeno_ray.ops.dedup import _coarse_n_parts

        n_parts = _coarse_n_parts()

    max_id = docs_ds.max("doc_id")
    if max_id is None:  # empty input
        return docs_ds.map_batches(
            lambda df: pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "start_token": pd.Series([], dtype="int64"),
                "pack_first": pd.Series([], dtype="int64"),
                "pack_last": pd.Series([], dtype="int64"),
                "n_packs": pd.Series([], dtype="int64"),
            }),
            batch_format="pandas",
        )
    width = max(1, (int(max_id) + n_parts) // n_parts)

    def count_tokens(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "n_tokens": (df["text"].str.count(" ") + 1).to_numpy(np.int64),
            "part": ids // width,
        })

    counts = docs_ds.map_batches(
        count_tokens, batch_format="pandas", batch_size=8192
    ).materialize()  # slim (3 int columns); feeds the scan AND the final pass

    part_sums = (
        counts.groupby("part").aggregate(Sum("n_tokens", alias_name="s"))
        .to_pandas()  # ≤ n_parts rows — the only driver-side traffic
        .sort_values("part")
    )
    excl = np.concatenate([[0], np.cumsum(part_sums["s"].to_numpy(np.int64))[:-1]])
    offsets = dict(zip(part_sums["part"].astype(int), excl.tolist()))

    def plan_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        n = g["n_tokens"].to_numpy(np.int64)
        start = offsets[int(g["part"].iloc[0])] + np.concatenate(
            [[0], np.cumsum(n)[:-1]])
        first = start // context_len
        last = (start + np.maximum(n, 1) - 1) // context_len
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_tokens": n,
            "start_token": start,
            "pack_first": first,
            "pack_last": last,
            "n_packs": last - first + 1,
        })

    return counts.groupby("part").map_groups(plan_in_part, batch_format="pandas")


def pack_chunks(docs_ds, context_len: int = 2048, n_parts: int | None = None):
    """Materialized packing: the actual ``context_len``-token windows,
    one row per pack: ``(pack_id, n_tokens, pack_text)`` with
    ``pack_text`` the space-joined token slice of the concatenated
    stream (docs in doc_id order, split across pack boundaries).

    Two shuffles, both unavoidable and both bounded:

    1. range shuffle on ``part = doc_id // W`` with the TEXT carried —
       packing is an ordered concatenation, so the corpus must move
       once into doc_id-ordered ranges (per-range token offsets come
       from the same O(parts) driver scan as :func:`pack_plan`);
       inside a range each doc slices itself into per-pack SEGMENTS
       (≤ 1 + n_tokens/context_len rows per doc);
    2. segment shuffle on ``hash(pack_id)`` — segments are
       pack-boundary-crossing fragments, ≈ corpus-token volume total;
       each part stitches its packs' segments in (pack_id, position)
       order, vectorized per part.

    The export variant (:func:`pack_export`) writes the result through
    the resumable partitioned sink (one sealed dir per pack range).
    """
    from ray.data.aggregate import Sum

    if n_parts is None:
        from zeno_ray.ops.dedup import _coarse_n_parts

        n_parts = _coarse_n_parts()

    max_id = docs_ds.max("doc_id")
    if max_id is None:
        return docs_ds.map_batches(
            lambda df: pd.DataFrame({
                "pack_id": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "pack_text": pd.Series([], dtype=object)}),
            batch_format="pandas")
    width = max(1, (int(max_id) + n_parts) // n_parts)

    def with_part(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "doc_id": ids, "text": df["text"],
            "n_tokens": (df["text"].str.count(" ") + 1).to_numpy(np.int64),
            "part": ids // width})

    fat = docs_ds.map_batches(
        with_part, batch_format="pandas", batch_size=4096).materialize()

    part_sums = (
        fat.map_batches(lambda df: df[["part", "n_tokens"]],
                        batch_format="pandas")
        .groupby("part").aggregate(Sum("n_tokens", alias_name="s"))
        .to_pandas().sort_values("part")
    )
    excl = np.concatenate(
        [[0], np.cumsum(part_sums["s"].to_numpy(np.int64))[:-1]])
    offsets = dict(zip(part_sums["part"].astype(int), excl.tolist()))

    def segments_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        n = g["n_tokens"].to_numpy(np.int64)
        start = offsets[int(g["part"].iloc[0])] + np.concatenate(
            [[0], np.cumsum(n)[:-1]])
        pid, pos, seg, seg_n = [], [], [], []
        for text, s, nn in zip(g["text"], start, n):
            toks = text.split(" ")
            a = 0
            while a < nn:
                p = (s + a) // context_len
                b = min(nn, (p + 1) * context_len - s)
                pid.append(p)
                pos.append(s + a)
                seg.append(" ".join(toks[a:b]))
                seg_n.append(b - a)
                a = b
        out = pd.DataFrame({"pack_id": np.asarray(pid, np.int64),
                            "pos": np.asarray(pos, np.int64),
                            "seg": seg,
                            "seg_n": np.asarray(seg_n, np.int64)})
        out["part2"] = (out["pack_id"].to_numpy() % n_parts).astype("int64")
        return out

    def stitch_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pack_id", "pos"], kind="stable")
        rows = []
        for p, gg in g.groupby("pack_id", sort=False):
            txt = " ".join(gg["seg"])
            # token count from the carried segment counts — a pack whose
            # only token is "" would miscount via string inspection
            rows.append((int(p), int(gg["seg_n"].sum()), txt))
        return pd.DataFrame(rows,
                            columns=["pack_id", "n_tokens", "pack_text"])

    return (
        fat.groupby("part")
        .map_groups(segments_in_part, batch_format="pandas")
        .groupby("part2")
        .map_groups(stitch_in_part, batch_format="pandas")
    )


def pack_export(docs_ds, out_dir: str, context_len: int = 2048,
                packs_per_partition: int = 64, resume: bool = True) -> dict:
    """Write the packed windows through the resumable partitioned sink:
    one sealed ``part=<k>`` directory per ``packs_per_partition`` pack
    range, atomic tmp+rename commits, reruns skip sealed ranges."""
    from zeno_ray.sinks import write_partitioned

    chunks = pack_chunks(docs_ds, context_len=context_len).materialize()
    max_pack = chunks.max("pack_id")
    if max_pack is None:
        return {"written": [], "skipped": []}
    n_ranges = int(max_pack) // packs_per_partition + 1

    def make(key: str):
        k = int(key)
        lo, hi = k * packs_per_partition, (k + 1) * packs_per_partition
        # expression filter: vectorized Arrow predicate per partition
        return chunks.filter(expr=f"pack_id >= {lo} and pack_id < {hi}")

    return write_partitioned(make, out_dir,
                             [str(k) for k in range(n_ranges)],
                             resume=resume)


# ------------------------------------------------- shuffled shard export


_SHUF_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _shuffle_key(ids: np.ndarray) -> np.ndarray:
    """splitmix64 of doc_id — a deterministic pseudo-random permutation
    key (same finalizer as ops/dedup._mix64, duplicated to keep the
    module dependency-free)."""
    x = ids.astype(np.uint64) * _SHUF_GOLDEN
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def shuffle_shard_export(docs_ds, out_dir: str, n_shards: int = 8,
                         resume: bool = True) -> dict:
    """Globally-shuffled training shards: every doc is assigned to one of
    *n_shards* output shards and ordered pseudo-randomly within it, both
    as pure functions of ``doc_id`` (splitmix64) — so the export is
    deterministic, independent of batching/parallelism, and resumable.
    This is the last stage of a training-data pipeline: the reader that
    streams shard files sequentially sees a fixed random document order
    without any runtime shuffle buffer.

    shard = key >> (64 - log2ceil(n_shards)) — the TOP bits of the
    shuffle key, so shards are contiguous RANGES of the key space: at
    100 TB the same layout falls out of ONE global range-sort on the key
    (Ray's sort shuffle), with each output shard a contiguous run of
    sorted blocks. At sandbox scale we materialize the slim keyed table
    once and cut shards by filter (re-reads cached blocks, recomputes
    nothing), writing each through the atomic resumable sink
    (``part=<shard>`` dirs + _SUCCESS markers, reruns skip sealed
    shards).

    ``n_shards`` should be a power of two (top-bit ranges are then
    equal-width; otherwise the trailing ranges clamp into the last
    shard and skew it).

    Returns the sink's {"written": [...], "skipped": [...]}."""
    from zeno_ray.sinks import write_partitioned

    shift = np.uint64(64 - max(1, (n_shards - 1).bit_length()))
    if n_shards == 1:
        shift = np.uint64(64)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        key = _shuffle_key(df["doc_id"].to_numpy(np.int64))
        out["shuffle_key"] = key.view(np.int64)
        shard = (key >> shift) if shift < 64 else np.zeros(len(df), np.uint64)
        out["shard"] = np.minimum(shard, n_shards - 1).astype("int64")
        return out

    ds = docs_ds.map_batches(keyed, batch_format="pandas").materialize()

    def make(skey: str):
        # expression filter: vectorized Arrow predicate, not a
        # per-row Python lambda; both internal columns are dropped
        # after the sort so exported shards carry only user columns
        # (readers re-derive the key from doc_id when verifying order)
        return (ds.filter(expr=f"shard == {int(skey)}")
                .sort("shuffle_key")
                .drop_columns(["shard", "shuffle_key"]))

    return write_partitioned(make, out_dir,
                             [str(k) for k in range(n_shards)],
                             resume=resume)
