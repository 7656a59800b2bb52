"""Deduplication over the ``documents`` table — exact and near-dup.

Scale shapes (ray_guide + MinHash/LSH literature, Broder 1997):
- exact: vectorized content-hash column → within-batch pre-dedupe →
  coarse-partition keep-first — ONE all-to-all over (hash, doc_id)
  pairs only, never the text;
- MinHash+LSH: per-batch shingle→minhash signatures (numpy), band explode,
  coarse-partition keyed shuffles for candidate pairs and the signature
  repartition join, vectorized signature-Jaccard verify, driver union-find
  over verified edges only;
- SimHash: 64-bit simhash over token hashes, 4×16-bit band buckets
  (pigeonhole covers hamming ≤ 3), in-bucket vectorized popcount verify,
  spanning-forest edge emission per bucket;
- embedding near-dup: multi-probe LSH nearest-neighbor join (keyed
  shuffle; the broadcast-matrix variant remains as the small-N verifier);
- n-gram Jaccard verifier.

Shuffle discipline shared by every pipeline here: groupby keys are COARSE
hash partitions (a few per core; each bucket/doc key maps to exactly one
part), never raw keys — map_groups over millions of tiny groups pays
Python overhead per key. Inside a part all work is vectorized
pandas/numpy.

Determinism: all hashing via fixed-seed numpy kernels (splitmix64-mixed
polynomial hashes) or blake2b; no Python ``hash``. The hashes only need
INTERNAL consistency (SURVEY §2.9) — the oracles are semantic (true
Jaccard / exact-dup recall), not tied to any specific hash function.
"""

from __future__ import annotations

import functools
import hashlib
import os

import numpy as np
import pandas as pd

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

# minhash_dedup verifies candidate pairs against the full signature matrix
# via a single ray.put broadcast while it fits this many bytes (~4 M docs
# at the default n_perm=64); past it, the keyed-shuffle repartition join
# takes over. Tests shrink this to force the shuffle path on small data.
MINHASH_BROADCAST_SIG_BYTES = 2 << 30


def _mix64(x) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 avalanche (wraparound
    arithmetic is the defined uint64 behavior in numpy)."""
    x = np.asarray(x, dtype=np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _pos_mults(n: int) -> np.ndarray:
    """Per-position odd multipliers for polynomial string hashing."""
    return _mix64(np.arange(1, n + 1, dtype=np.uint64) * _GOLDEN) | np.uint64(1)


def _h64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def add_text_hash(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    out = df.copy()
    out["text_hash"] = np.fromiter(
        (_h64(t.encode("utf-8", "ignore")) for t in out[col]),
        dtype=np.uint64,
        count=len(out),
    )
    return out


def _coarse_n_parts() -> int:
    """Coarse shuffle-partition count (a few per core) — the module's
    standard alternative to raw-key groupbys."""
    import ray as _ray

    return max(64, int(_ray.cluster_resources().get("CPU", 8)) * 8) \
        if _ray.is_initialized() else 64


def exact_dedup(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                prehashed: bool = False):
    """Keep the lowest-id row per exact text. Returns a Dataset of the
    surviving rows' ids + hash.

    Shuffle shape: within-batch pre-dedupe (combiner) → coarse-partition
    keyed shuffle (part = hash % n_parts, so every copy of a text lands
    in one part) → ONE vectorized sort + drop_duplicates per part. Never
    a raw ``groupby(hash)``: at 10^9 docs that is ~10^9 tiny pandas
    groups, each paying Python dispatch.

    With ``prehashed=True`` the input already carries a ``text_hash``
    column (e.g. a pipeline that hashed while gating, saving a corpus
    re-read) and the hashing pass is skipped."""
    n_parts = _coarse_n_parts()
    hashed = docs_ds if prehashed else docs_ds.map_batches(
        add_text_hash, batch_format="pandas")

    def to_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, "text_hash"]].sort_values(
            ["text_hash", id_col], kind="stable"
        ).drop_duplicates("text_hash", keep="first")
        out = out.assign(part=(out["text_hash"].to_numpy(np.uint64)
                               % np.uint64(n_parts)).astype("int64"))
        return out

    def first_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["text_hash", id_col], kind="stable")
        return g.drop_duplicates("text_hash", keep="first")[
            [id_col, "text_hash"]]

    return (
        hashed.map_batches(to_part, batch_format="pandas")
        .groupby("part")
        .map_groups(first_in_part, batch_format="pandas")
    )


# ------------------------------------------------------------------ MinHash


_SHINGLE_MULTS = _pos_mults(64)  # plenty for any sane shingle width


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Char-k-gram hashes of the whitespace-normalized lowered text — one
    numpy polynomial pass over the UTF-32 codepoint view (k vectorized
    multiply-adds + splitmix64 finalizer), NOT a per-shingle Python hash
    loop. Duplicate shingles are kept: min over a multiset equals min over
    its set, so MinHash needs no np.unique here."""
    t = " ".join(text.lower().split())
    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(codes) - k + 1
    if n <= 0:
        # whole (short) string as the single shingle
        acc = ((codes + np.uint64(1)) * _SHINGLE_MULTS[: len(codes)]).sum() \
            if len(codes) else np.uint64(0)
        return _mix64(np.array([acc], dtype=np.uint64))
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc += (codes[j: j + n] + np.uint64(1)) * _SHINGLE_MULTS[j]
    return _mix64(acc)


class MinHashStage:
    """Per-batch MinHash signatures, fully vectorized: one polynomial-hash
    pass per doc for the shingles, then segment-min (`np.minimum.reduceat`)
    over the concatenated shingle array under n_perm affine permutations
    ``(a|1)*x + b mod 2^64`` (odd ``a`` ⇒ a true bijection on uint64).
    Permutation coefficients are built once per actor from a fixed seed."""

    # cap on the (n_perm, n_shingles) expansion per reduceat chunk —
    # small enough that the uint64 temp (64×4096×8B = 2 MB) stays
    # cache-resident: measured 3-6× faster than 100 MB-class temps,
    # which pay first-touch page faults in every fresh worker
    _CHUNK_SHINGLES = 1 << 12

    def __init__(self, n_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=n_perm).astype(np.uint64) \
            | np.uint64(1)
        self.b = rng.randint(0, (1 << 61) - 1, size=n_perm).astype(np.uint64)
        self.k = shingle_k
        self.n_perm = n_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        v = self.a[:, None] * sh[None, :] + self.b[:, None]  # uint64 wrap
        return v.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh_list = [_shingles(t, self.k) for t in batch["text"]]
        lens = np.fromiter((len(s) for s in sh_list), dtype=np.int64,
                           count=len(sh_list))
        sig = np.empty((len(sh_list), self.n_perm), dtype=np.uint64)
        i = 0
        while i < len(sh_list):
            j, tot = i, 0
            while j < len(sh_list) and (j == i or tot + lens[j] <= self._CHUNK_SHINGLES):
                tot += lens[j]
                j += 1
            sh = np.concatenate(sh_list[i:j])
            starts = np.zeros(j - i, dtype=np.int64)
            np.cumsum(lens[i:j - 1], out=starts[1:])
            hv = self.a[:, None] * sh[None, :] + self.b[:, None]
            sig[i:j] = np.minimum.reduceat(hv, starts, axis=1).T
            i = j
        out = batch[["doc_id"]].copy()
        out["minhash"] = list(sig)
        return out


@functools.lru_cache(maxsize=8)
def _minhash_stage(n_perm: int, shingle_k: int, seed: int) -> "MinHashStage":
    return MinHashStage(n_perm=n_perm, shingle_k=shingle_k, seed=seed)


def _minhash_fn(batch: pd.DataFrame, n_perm: int = 64, shingle_k: int = 5,
                seed: int = 7) -> pd.DataFrame:
    """Task-form signature stage: setup is trivial (a 64-element RNG
    draw, cached per worker process), so plain tasks beat an actor pool —
    no pool spin-up, elastic scheduling."""
    return _minhash_stage(n_perm, shingle_k, seed)(batch)


_BAND_MULTS = _pos_mults(64)


def minhash_lsh_bands(sig_df: pd.DataFrame, n_bands: int = 16) -> pd.DataFrame:
    """Explode signatures to (doc_id, band, band_hash) rows for the LSH
    bucket groupby — vectorized over the whole batch (mix-and-sum band
    hash per (doc, band), no per-row Python)."""
    if not len(sig_df):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "band": pd.Series([], dtype="int64"),
                             "band_hash": pd.Series([], dtype="uint64")})
    sigs = np.stack([np.asarray(s, dtype=np.uint64) for s in sig_df["minhash"]])
    n, n_perm = sigs.shape
    r = n_perm // n_bands
    sr = sigs.reshape(n, n_bands, r)
    bh = np.zeros((n, n_bands), dtype=np.uint64)
    # wraparound offsets precomputed in python ints (np scalar uint64
    # multiply warns on the intended modular overflow)
    offs = [np.uint64(((j + 1) * int(_GOLDEN)) & 0xFFFFFFFFFFFFFFFF)
            for j in range(r)]
    for j in range(r):
        bh += _mix64(sr[:, :, j] + offs[j]) * _BAND_MULTS[j]
    bh = _mix64(bh)
    return pd.DataFrame({
        "doc_id": np.repeat(sig_df["doc_id"].to_numpy(), n_bands),
        "band": np.tile(np.arange(n_bands, dtype=np.int64), n),
        "band_hash": bh.reshape(-1),
    })


_PAIR_SIZED_EMPTY = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                  "b": pd.Series([], dtype="int64"),
                                  "sa": pd.Series([], dtype="int64"),
                                  "sb": pd.Series([], dtype="int64")})
_PAIR_EMPTY = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                            "b": pd.Series([], dtype="int64")})


def _edges_to_roots(edges: pd.DataFrame) -> dict[int, int]:
    """Min-label union-find over a verified edge list (tiny in the LSH
    regime); returns the FULLY-COMPRESSED {doc_id: root} map, containing
    only ids that appear in an edge — every other doc is its own root."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    if len(edges) == 0 or "a" not in edges.columns:
        # a fully-deduped-free corpus yields a columnless empty frame
        return {}
    for a, b in zip(edges["a"], edges["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {k: find(k) for k in parent}


_ROOTS_CACHE: dict = {}


def _attach_cluster_fn(df: pd.DataFrame, roots_ref=None,
                       id_col: str = "doc_id") -> pd.DataFrame:
    """Labeling stage: the (small) compressed root map is broadcast ONCE
    via ``ray.put`` and fetched/deserialized once per worker process
    (process-local cache) — the dedup output stays a streaming Dataset
    instead of funneling O(N) rows through the driver for labeling."""
    import ray as _ray

    key = roots_ref.hex()
    roots = _ROOTS_CACHE.get(key)
    if roots is None:
        roots = _ROOTS_CACHE[key] = _ray.get(roots_ref)
        if len(_ROOTS_CACHE) > 8:  # bound process-local memory
            _ROOTS_CACHE.pop(next(iter(_ROOTS_CACHE)))
    out = df.copy()
    ids = df[id_col]
    out["cluster"] = ids.map(roots).fillna(ids).astype("int64")
    return out


def attach_cluster_labels(ds, edges: pd.DataFrame, id_col: str = "doc_id"):
    """Union-find the verified *edges* (driver-side, O(edges)), broadcast
    the compressed root map, and attach a ``cluster`` column to *ds* in a
    distributed map_batches — no O(N) driver materialization."""
    import ray as _ray

    roots_ref = _ray.put(_edges_to_roots(edges))
    return ds.map_batches(
        _attach_cluster_fn,
        fn_kwargs={"roots_ref": roots_ref, "id_col": id_col},
        batch_format="pandas",
    )


def minhash_dedup(docs_ds, n_perm: int = 64, n_bands: int = 16,
                  jaccard_threshold: float = 0.8):
    """Full MinHash-LSH near-dup pipeline. Returns a **Dataset** of
    (doc_id, cluster) for every input doc; cluster = min doc_id of its
    near-dup group. Candidate pairs are verified with real signature
    Jaccard before clustering.

    Scale shape — every stage is distributed except the union-find:
    signatures are computed ONCE (materialized intermediate, spillable);
    band explode → candidate pairs; verification is vectorized numpy
    signature-Jaccard. Every shuffle keys on a COARSE hash partition
    (``n_parts`` groups ≈ a few per core, each key mapping to exactly one
    part), never on the raw bucket/doc/pair key — ``map_groups`` over
    millions of tiny groups pays Python overhead per key, the thing that
    cannot fly at 10^9 docs; inside a part everything is a vectorized
    pandas groupby/merge.

    Verify-join split (the pagerank/ngram broadcast-vs-shuffle precedent):
    while the signature matrix fits the broadcast bound (n_docs · n_perm·8
    bytes ≤ 2 GiB ≈ 4 M docs), it is collected once, ``ray.put``, and the
    Jaccard check is a ZERO-SHUFFLE ``map_batches`` over the pairs where
    they already live — the two union+groupby repartition joins were 52 s
    of a 73 s run at just 200 k docs (Ray sort shuffles price binary
    payload columns steeply). Past the bound it falls back to attaching
    signatures to pair sides via the two keyed shuffles (signatures as
    fixed-width BYTES, never list<uint64>). Only the VERIFIED edge list
    (tiny in the LSH regime) reaches the driver; the (doc_id, cluster)
    product is labeled distributedly via a broadcast root map and streams
    out as a Dataset.
    """
    import ray as _ray

    n_parts = _coarse_n_parts()
    sigs = docs_ds.map_batches(
        _minhash_fn, fn_kwargs={"n_perm": n_perm},
        batch_format="pandas", batch_size=1024,
    ).materialize()  # consumed by both the band explode and the verify join

    def bands_with_part(df: pd.DataFrame) -> pd.DataFrame:
        out = minhash_lsh_bands(df, n_bands=n_bands)
        # part is a pure function of the bucket key ⇒ a bucket's rows all
        # land in one part
        out["part"] = ((out["band_hash"]
                        ^ (out["band"].to_numpy().astype(np.uint64)
                           * np.uint64(0x9E3779B97F4A7C15)))
                       % np.uint64(n_parts)).astype("int64")
        return out

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized all-pairs within buckets — no per-bucket pandas
        # loop (a part holds thousands of tiny buckets; iterating them in
        # Python is the tiny-groups trap one level down). Bucket identity
        # collapses to one uint64 key (band_hash ⊕ band·φ — same scheme as
        # the part key); a key collision only merges two buckets' candidate
        # sets, and every candidate is signature-verified downstream.
        key = (g["band_hash"].to_numpy().astype(np.uint64)
               ^ (g["band"].to_numpy().astype(np.uint64)
                  * np.uint64(0x9E3779B97F4A7C15)))
        ids = g["doc_id"].to_numpy()
        order = np.argsort(key, kind="stable")
        key_s, ids_s = key[order], ids[order]
        new = np.concatenate([[True], key_s[1:] != key_s[:-1]])
        sizes = np.diff(np.concatenate(
            [np.flatnonzero(new), [len(key_s)]]))
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        out_a, out_b = [], []
        for s in np.unique(sizes):
            if s < 2:
                continue
            sel = starts[sizes == s]
            M = np.sort(ids_s[sel[:, None] + np.arange(s)[None, :]], axis=1)
            iu, ju = np.triu_indices(s, k=1)
            out_a.append(M[:, iu].ravel())
            out_b.append(M[:, ju].ravel())
        if not out_a:
            return _PAIR_EMPTY
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)}).drop_duplicates()

    pairs = (
        sigs.map_batches(bands_with_part, batch_format="pandas")
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pandas")
    )

    # ---- broadcast verify (zero-shuffle) while signatures fit 2 GiB ----
    n_docs_total = sigs.count()
    if n_docs_total * n_perm * 8 <= MINHASH_BROADCAST_SIG_BYTES:
        def sig_blob_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "sig": [np.asarray(s, dtype=np.uint64).tobytes()
                        for s in df["minhash"]],
            })

        sig_pdf = sigs.map_batches(
            sig_blob_rows, batch_format="pandas").to_pandas()
        s_ids = sig_pdf["doc_id"].to_numpy(np.int64)
        o = np.argsort(s_ids, kind="stable")
        s_ids = s_ids[o]
        s_mat = np.frombuffer(
            b"".join(sig_pdf["sig"].to_numpy()[o]), dtype=np.uint64
        ).reshape(len(s_ids), n_perm)
        sig_ref = _ray.put((s_ids, s_mat))
        del sig_pdf, s_mat

        def verify_broadcast(df: pd.DataFrame) -> pd.DataFrame:
            ids_s, mat = _ray.get(sig_ref)  # zero-copy shared memory
            ia = np.searchsorted(ids_s, df["a"].to_numpy(np.int64))
            ib = np.searchsorted(ids_s, df["b"].to_numpy(np.int64))
            ok = (mat[ia] == mat[ib]).mean(axis=1) >= jaccard_threshold
            return df[ok]

        edges = (
            pairs.map_batches(verify_broadcast, batch_format="pandas")
            .to_pandas()  # VERIFIED edges only — tiny in the LSH regime
            .drop_duplicates()
        )
        return attach_cluster_labels(sigs.select_columns(["doc_id"]), edges)

    # ---- repartition join: signatures onto pair SIDES (part = key % n) --
    # signatures travel as fixed-width BYTES (uint64.tobytes) — an Arrow
    # binary column, never list<uint64>: list payloads on fat row counts
    # are poison in Ray sort shuffles (the module-wide lesson)

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "part": (df["doc_id"].to_numpy() % n_parts).astype("int64"),
            "key": df["doc_id"], "a": np.int64(-1), "b": np.int64(-1),
            "sig_a": b"", "sig": [np.asarray(s, dtype=np.uint64).tobytes()
                                  for s in df["minhash"]],
        })

    def key_by_a(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "part": (df["a"].to_numpy() % n_parts).astype("int64"),
            "key": df["a"], "a": df["a"], "b": df["b"],
            "sig_a": b"", "sig": b"",
        })

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        sig = g[g["a"] < 0]
        need = g[g["a"] >= 0]
        if sig.empty or need.empty:
            return g.iloc[:0]
        sig_of = dict(zip(sig["key"], sig["sig"]))  # O(docs/part)
        attached = need["key"].map(sig_of)
        b = need["b"].to_numpy()
        return pd.DataFrame({
            "part": (b % n_parts).astype("int64"),
            "key": b,  # rekey by side b for pass 2
            "a": need["a"].to_numpy(), "b": b,
            "sig_a": attached.to_numpy(dtype=object), "sig": b"",
        })

    def attach_b_and_verify(g: pd.DataFrame) -> pd.DataFrame:
        sig = g[g["a"] < 0]
        need = g[g["a"] >= 0]
        if sig.empty or need.empty:
            return _PAIR_EMPTY
        sig_of = dict(zip(sig["key"], sig["sig"]))
        sb = np.frombuffer(
            b"".join(need["key"].map(sig_of)), dtype=np.uint64
        ).reshape(len(need), -1)
        sa = np.frombuffer(
            b"".join(need["sig_a"]), dtype=np.uint64).reshape(len(need), -1)
        ok = (sa == sb).mean(axis=1) >= jaccard_threshold
        return pd.DataFrame({"a": need["a"].to_numpy()[ok],
                             "b": need["b"].to_numpy()[ok]})

    edges = (
        pairs.map_batches(key_by_a, batch_format="pandas")
        .union(sigs.map_batches(sig_rows, batch_format="pandas"))
        .groupby("part")
        .map_groups(attach_a, batch_format="pandas")
        .union(sigs.map_batches(sig_rows, batch_format="pandas"))
        .groupby("part")
        .map_groups(attach_b_and_verify, batch_format="pandas")
        .to_pandas()  # VERIFIED edges only — tiny in the LSH regime
        .drop_duplicates()
    )
    return attach_cluster_labels(sigs.select_columns(["doc_id"]), edges)


# ------------------------------------------------------------------ SimHash


def _simhash_fn(batch: pd.DataFrame) -> pd.DataFrame:
    """Task-form SimHash stage (the kernel is stateless — module-level
    LUT/multiplier tables — so plain tasks beat an actor pool)."""
    return SimHashStage()(batch)


# Unicode-whitespace lookup matching ``str.split()`` (str.isspace
# codepoints; the highest is U+3000, so a flat LUT covers them all).
_WS_LUT = np.zeros(0x3001, dtype=bool)
_WS_LUT[[c for c in range(0x3001) if chr(c).isspace()]] = True

_TOK_MULTS = _pos_mults(4096)  # per-position multipliers, clipped beyond


class SimHashStage:
    """64-bit SimHash over word-token hashes (Charikar 2002) — fully
    vectorized: the whole batch is one codepoint array, token boundaries
    come from a whitespace LUT, token hashes are a positional polynomial
    via ``np.add.reduceat`` segment sums, and per-doc bit votes are a
    second ``reduceat`` over the token→doc segmentation. No per-token or
    per-doc Python in the hot path."""

    # bound the (tokens, 64) bit-vote expansion — cache-resident temps
    # (2048×64×8B = 1 MB) beat big chunks by 2-8× (first-touch faults)
    _CHUNK_TOKENS = 1 << 11

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        texts = [t.lower() for t in batch["text"]]
        n_docs = len(texts)
        if not n_docs:
            out["simhash"] = np.asarray([], dtype=np.uint64)
            return out
        joined = " ".join(texts)  # ws separator: tokens never span docs
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        ws = np.zeros(len(codes), dtype=bool)
        small = codes <= np.uint32(0x3000)
        ws[small] = _WS_LUT[codes[small]]
        nonws = ~ws
        # token start chars: non-ws preceded by ws (or string start)
        starts_mask = nonws.copy()
        starts_mask[1:] &= ws[:-1]
        s_idx = np.nonzero(starts_mask)[0]
        n_tok = len(s_idx)
        # doc start offsets in codepoint space (+1 for each separator)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                           count=n_docs)
        doc_off = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=doc_off[1:])
        sims = np.zeros(n_docs, dtype=np.uint64)
        if n_tok:
            comp_idx = np.cumsum(nonws) - 1     # char idx → compressed idx
            comp_starts = comp_idx[s_idx]       # token starts, compressed
            # position within token for every non-ws char
            char_i = np.nonzero(nonws)[0]
            tok_of_char = np.searchsorted(s_idx, char_i, side="right") - 1
            pos = char_i - s_idx[tok_of_char]
            np.clip(pos, 0, len(_TOK_MULTS) - 1, out=pos)
            w = ((codes[char_i].astype(np.uint64) + np.uint64(1))
                 * _TOK_MULTS[pos])
            hs = _mix64(np.add.reduceat(w, comp_starts))
            # token → doc assignment and per-doc token segments
            doc_of_tok = np.searchsorted(doc_off, s_idx, side="right") - 1
            tok_counts = np.bincount(doc_of_tok, minlength=n_docs)
            docs_nz = np.nonzero(tok_counts)[0]
            seg_starts = np.zeros(len(docs_nz), dtype=np.int64)
            np.cumsum(tok_counts[docs_nz][:-1], out=seg_starts[1:])
            shifts = np.arange(64, dtype=np.uint64)
            votes = np.empty((len(docs_nz), 64), dtype=np.int64)
            ci = 0
            while ci < len(docs_nz):
                cj, tot = ci, 0
                while cj < len(docs_nz) and (
                        cj == ci
                        or tot + tok_counts[docs_nz[cj]] <= self._CHUNK_TOKENS):
                    tot += tok_counts[docs_nz[cj]]
                    cj += 1
                lo = seg_starts[ci]
                hi = seg_starts[cj - 1] + tok_counts[docs_nz[cj - 1]]
                bits = ((hs[lo:hi, None] >> shifts) & np.uint64(1)) \
                    .astype(np.int64)
                votes[ci:cj] = np.add.reduceat(
                    bits, seg_starts[ci:cj] - lo, axis=0)
                ci = cj
            score = votes * 2 - tok_counts[docs_nz][:, None]
            sims[docs_nz] = ((score > 0).astype(np.uint64)
                             << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        out["simhash"] = sims
        return out


def _min_label_components(k: int, ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
    """Connected components of an undirected edge list over nodes 0..k-1:
    vectorized min-label propagation with pointer jumping — O(E) numpy
    work per round, O(log·diameter) rounds; no scipy, no Python loop
    over edges."""
    labels = np.arange(k)
    while True:
        nxt = labels.copy()
        np.minimum.at(nxt, ii, labels[jj])
        np.minimum.at(nxt, jj, labels[ii])
        nxt = nxt[nxt]  # pointer jumping
        if (nxt == labels).all():
            return labels
        labels = nxt


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over uint64 (numpy 1.x has no bitwise_count)."""
    v = np.ascontiguousarray(x, dtype=np.uint64)
    return np.unpackbits(v.view(np.uint8)).reshape(*v.shape, 64).sum(axis=-1)


def simhash_groups(docs_ds, max_hamming: int = 3, n_bands: int = 4
                   ) -> pd.DataFrame:
    """SimHash near-dup clustering at a REAL radius: 4×16-bit band buckets
    (pigeonhole: any two 64-bit hashes within hamming ≤ 3 agree on at
    least one of 4 bands), exact hamming verification inside each bucket
    group, then min-label union-find over the verified edges.

    Scale shape mirrors :func:`minhash_dedup`: the band explode is a slim
    (doc_id, band, band_val, simhash) keyed shuffle — the 8-byte simhash
    rides along, so verification needs no signature join; only verified
    edges reach the driver, labeling is a broadcast-map ``map_batches``.
    Returns a **Dataset** (doc_id, simhash, cluster), cluster = min
    doc_id of the connected near-dup component."""
    assert 64 % n_bands == 0
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    # stateless kernel ⇒ plain tasks, no actor-pool spin-up
    sims = docs_ds.map_batches(_simhash_fn, batch_format="pandas",
                               batch_size=1024).materialize()

    import ray as _ray

    n_parts = _coarse_n_parts()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        sh = df["simhash"].to_numpy().astype(np.uint64)
        ids = df["doc_id"].to_numpy()
        frames = []
        for b in range(n_bands):
            val = (sh >> np.uint64(b * width)) & mask
            frames.append(pd.DataFrame({
                "doc_id": ids, "band": b, "band_val": val, "simhash": sh,
                # coarse partition — a pure function of the bucket key, so
                # a bucket's rows co-locate without a per-bucket group
                "part": ((val ^ np.uint64((b * 0x9E3779B97F4A7C15) % (1 << 64)))
                         % np.uint64(n_parts)).astype("int64"),
            }))
        return pd.concat(frames, ignore_index=True)

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        # emit a SPANNING FOREST of the verified near-dup graph, not every
        # edge: degenerate corpora (many mutually-similar docs) make the
        # full edge set O(bucket²); connectivity only needs O(bucket)
        # edges, and the cross-part union-find composes forests exactly.
        counts = g.groupby(["band", "band_val"])["doc_id"].transform("size")
        g = g[counts >= 2]
        if g.empty:
            return _PAIR_EMPTY
        out_a, out_b = [], []
        for _, gg in g.groupby(["band", "band_val"], sort=False):
            ids = gg["doc_id"].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            hs = gg["simhash"].to_numpy().astype(np.uint64)[order]
            k = len(ids)
            ii_all, jj_all = [], []
            for i0 in range(0, k, 256):  # chunked: bound the (chunk,k,64)
                chunk = hs[i0:i0 + 256]   # popcount expansion memory
                dist = _popcount64(chunk[:, None] ^ hs[None, :])
                ci, cj = np.nonzero(dist <= max_hamming)
                keep = cj > (ci + i0)  # strict upper triangle, global index
                ii_all.append(ci[keep] + i0)
                jj_all.append(cj[keep])
            ii = np.concatenate(ii_all) if ii_all else np.zeros(0, np.int64)
            jj = np.concatenate(jj_all) if jj_all else np.zeros(0, np.int64)
            if not len(ii):
                continue
            labels = _min_label_components(k, ii, jj)
            member = np.nonzero(labels != np.arange(k))[0]
            if len(member):
                out_a.append(ids[labels[member]])
                out_b.append(ids[member])
        if not out_a:
            return _PAIR_EMPTY
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    edges = (
        sims.map_batches(explode, batch_format="pandas")
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pandas")
        .to_pandas()  # verified edge list — tiny (cross-part dups dropped
        .drop_duplicates()  # driver-side; union-find is idempotent anyway)
    )
    return attach_cluster_labels(sims, edges)


# -------------------------------------------------------------- n-gram Jaccard


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = {a[i: i + k] for i in range(max(1, len(a) - k + 1))}
    sb = {b[i: i + k] for i in range(max(1, len(b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def _gram_sets_fn(batch: pd.DataFrame, k: int = 5) -> pd.DataFrame:
    """Per-doc DISTINCT sorted k-gram hash sets (same normalized-text
    polynomial kernel as MinHash's `_shingles`), plus the set size —
    the unit of both candidate generation and exact verification."""
    grams = [np.unique(_shingles(t, k)) for t in batch["text"]]
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(),
        "grams": grams,
        "size": np.fromiter((len(g) for g in grams), dtype=np.int64,
                            count=len(grams)),
    })


def ngram_jaccard_dedup(docs_ds, k: int = 5, threshold: float = 0.8):
    """EXACT n-gram-Jaccard near-dup — the deterministic counterpart to
    ``minhash_dedup`` (which estimates Jaccard from signatures). Returns a
    streaming Dataset of (doc_id, cluster); two docs share a cluster iff
    they are connected by pairs with TRUE k-gram-set Jaccard ≥ threshold.

    Scale shape (AllPairs/PPJoin prefix filtering, Bayardo et al. 2007):
    a pair with J(A,B) ≥ t must share at least one gram within each side's
    first ``|A| - ceil(t·|A|) + 1`` grams under ANY global total order of
    grams (here: the hash value order, which also spreads prefix postings
    uniformly). So only PREFIX grams explode into the inverted index —
    candidate generation is exact-complete, not probabilistic, while the
    posting lists stay a (1-t) fraction of the full index. Each posting
    row ships its doc's sorted prefix array so candidate generation can
    apply MIN-GRAM RESPONSIBILITY: a pair is emitted only from its
    smallest shared prefix gram's part, i.e. exactly once globally — on
    template-heavy corpora (tens of shared prefix grams per pair) this
    removes a 10-40× candidate-row inflation and the global pair-dedupe
    all-to-all it used to require (measured 57M rows shuffled for 3.7M
    distinct pairs; 87s of a 110s query). Prefix shipping is O(plen²)
    bytes per doc, so the mode is ADAPTIVE on mean prefix length: diverse
    corpora with big gram sets fall back to emit-per-shared-gram + a slim
    global pair dedupe, which is cheap exactly there. Shuffle discipline is the
    module standard: coarse hash partitions, vectorized pandas/numpy
    inside each part, repartition-join of gram sets onto pair sides, and
    a lexsort/bitmask batch set-intersection for the exact verify (no
    per-pair Python). Only verified edges reach the driver.
    """
    n_parts = _coarse_n_parts()
    grams = docs_ds.map_batches(
        _gram_sets_fn, fn_kwargs={"k": k},
        batch_format="pandas", batch_size=1024,
    ).materialize()  # consumed by the prefix explode AND the verify join

    # Mode pick: min-gram responsibility ships each doc's prefix array on
    # every posting row — O(plen²) bytes per doc. That is a bargain in the
    # template-heavy regime (short shared prefixes, massive candidate
    # duplication: the whole point of the mode), but quadratic poison on
    # natural corpora with big distinct gram sets (plen ≈ (1-t)·|set| can
    # be hundreds). mean(plen) is a pure function of mean(size), already
    # materialized — branch on it: small prefixes → responsibility mode
    # (pairs unique globally, no dedupe shuffle); big prefixes → legacy
    # emit-per-shared-gram + slim global pair dedupe (cheap there, because
    # diverse corpora produce few candidates per pair in the first place).
    mean_size = grams.mean("size") or 0.0
    mean_plen = (1.0 - threshold) * mean_size + 1.0

    # Sampled gram-frequency table (one driver-side pass over the first
    # few materialized blocks). Two uses: (a) the mode decision below —
    # mean presence fraction (mean sampled df / sample size) separates
    # the template regime (testdata docs: ~0.10, every gram in 10% of
    # docs) from natural-diversity corpora (~0.01) far more reliably
    # than prefix length alone; (b) in legacy mode, prefixes are taken
    # under ASCENDING-df order (Bayardo et al. 2007's canonical AllPairs
    # ordering, ties by hash) instead of raw hash order — on Zipfian
    # corpora hash order samples hot shingles into ~90% of prefix slots
    # and their df² posting buckets dominate the join (measured: 20k
    # natural-diversity docs went from >340 s to seconds). Any GLOBAL
    # total order preserves candidate completeness, so the sampled
    # (approximate) df is exactness-safe.
    sample_pdf = grams.limit(4096).to_pandas()
    n_sample = max(1, len(sample_pdf))
    if len(sample_pdf):
        _su, _sc = np.unique(np.concatenate(list(sample_pdf["grams"])),
                             return_counts=True)
    else:
        _su = np.zeros(0, dtype=np.uint64)
        _sc = np.zeros(0, dtype=np.int64)
    presence = float(_sc.mean() / n_sample) if len(_su) else 0.0
    responsibility = mean_plen <= 128.0 and presence >= 0.05

    if responsibility:
        order_ref = None
    else:
        import ray as _ray

        order_ref = _ray.put((_su.astype(np.uint64), _sc.astype(np.int64)))

    def prefix_explode(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df["size"].to_numpy()
        plens = sizes - np.ceil(threshold * sizes).astype(np.int64) + 1
        plens = np.minimum(np.maximum(plens, 1), sizes)
        if order_ref is not None and len(df):
            # legacy mode: prefix = the plen grams RAREST under the
            # broadcast sampled-df order (ties by hash), batch-vectorized
            import ray as _ray

            su_, sc_ = _ray.get(order_ref)
            flat = np.concatenate(list(df["grams"]))
            if len(su_):
                pos = np.minimum(np.searchsorted(su_, flat), len(su_) - 1)
                cnt = np.where(su_[pos] == flat, sc_[pos], 0)
            else:
                cnt = np.zeros(len(flat), dtype=np.int64)
            did = np.repeat(np.arange(len(df)), sizes)
            flat = flat[np.lexsort((flat, cnt, did))]
            offs = np.concatenate([[0], np.cumsum(sizes)])[:-1]
            cum = np.concatenate([[0], np.cumsum(plens)])
            pos = (np.arange(int(cum[-1]))
                   - np.repeat(cum[:-1], plens)).astype(np.int32)
            take = np.repeat(offs, plens) + pos
            gr = flat[take]
        else:
            prefixes = [g[:p] for g, p in zip(df["grams"], plens)]
            gr = np.concatenate(prefixes) \
                if len(df) else np.zeros(0, dtype=np.uint64)
            pos = None
        out = {
            "gram": gr,
            "doc_id": np.repeat(df["doc_id"].to_numpy(), plens),
            "size": np.repeat(sizes, plens),
            "part": (gr % np.uint64(n_parts)).astype("int64"),
        }
        if not responsibility:
            # within-doc rank of the gram under the global df order —
            # feeds the PPJoin positional upper bound in the legacy
            # candidate kernel (Xiao et al. 2008)
            out["pos"] = pos if pos is not None else \
                np.zeros(len(gr), dtype=np.int32)
        if responsibility:
            # every posting row carries its doc's FULL (sorted) prefix
            # array — the price of the min-gram responsibility check that
            # makes each candidate pair unique GLOBALLY
            out["prefix"] = [p for p, n in zip(prefixes, plens)
                             for _ in range(n)]
        return pd.DataFrame(out)

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        # Min-gram responsibility: emit (a, b) from gram g ONLY IF g is the
        # pair's smallest shared prefix gram. The smallest shared gram is
        # unique and its posting list reaches exactly one part, so every
        # candidate pair is emitted EXACTLY ONCE across all parts — no
        # global pair-dedupe shuffle (previously a 57M-row all-to-all for
        # 3.7M distinct pairs on template-heavy corpora, the dominant cost).
        # "shares a gram < g" is one bitmask AND over the part-local vocab.
        counts = g.groupby("gram")["doc_id"].transform("size")
        g = g[counts >= 2]
        if g.empty:
            return _PAIR_EMPTY
        docs = g.drop_duplicates("doc_id")
        prefix_of = dict(zip(docs["doc_id"].to_numpy(), docs["prefix"]))
        vocab = np.unique(np.concatenate(list(prefix_of.values())))
        W = (len(vocab) + 63) // 64
        mask_of = {}
        for d, v in prefix_of.items():
            ix = np.searchsorted(vocab, np.asarray(v, dtype=np.uint64))
            mm = np.zeros(W, dtype=np.uint64)
            np.bitwise_or.at(mm, ix >> 6,
                             np.uint64(1) << (ix & 63).astype(np.uint64))
            mask_of[d] = mm
        out_a, out_b = [], []
        for gram_val, gg in g.groupby("gram", sort=False):
            ids = gg["doc_id"].to_numpy()
            sz = gg["size"].to_numpy()
            o = np.argsort(ids, kind="stable")
            ids, sz = ids[o], sz[o]
            # prefix-gram masks truncated to grams STRICTLY below this one
            c = int(np.searchsorted(vocab, np.uint64(gram_val)))
            wfull, bits = divmod(c, 64)
            cut = np.zeros(W, dtype=np.uint64)
            cut[:wfull] = ~np.uint64(0)
            if bits:
                cut[wfull] = (np.uint64(1) << np.uint64(bits)) - np.uint64(1)
            mlow = np.stack([mask_of[d] for d in ids]) & cut
            has_lower = mlow.any(axis=1)
            # row-chunked broadcasting: a hot (template) gram's posting
            # list can reach 10^3-10^4 docs — bound the m×m×W transient
            ch = max(16, min(2048, (64 << 20) // max(1, len(ids) * W * 8)))
            for lo in range(0, len(ids), ch):
                ia = ids[lo:lo + ch][:, None]
                sa_ = sz[lo:lo + ch][:, None]
                # length filter: J ≥ t forces t·|B| ≤ |A| (for |A| ≤ |B|)
                m = (ia < ids[None, :]) & (
                    np.minimum(sa_, sz[None, :])
                    >= threshold * np.maximum(sa_, sz[None, :]))
                # responsibility filter: pairs where BOTH sides have lower
                # prefix grams might share one — check those with the mask
                both_low = has_lower[lo:lo + ch][:, None] & has_lower[None, :]
                need = m & both_low
                if need.any():
                    ri, rj = np.nonzero(need)
                    shared_lower = (mlow[lo + ri] & mlow[rj]).any(axis=1)
                    m[ri[shared_lower], rj[shared_lower]] = False
                out_a.append(np.broadcast_to(ia, m.shape)[m])
                out_b.append(np.broadcast_to(ids[None, :], m.shape)[m])
        if not out_a:
            return _PAIR_EMPTY
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    def pairs_in_part_legacy(g: pd.DataFrame) -> pd.DataFrame:
        # natural-corpus mode: no shipped prefixes — emit per shared gram
        # (duplicates across parts are rare here) and dedupe globally below.
        # Exactness-safe pruning: besides the length filter, the PPJoin
        # positional bound (Xiao et al. 2008) — a pair sharing gram at
        # within-doc df-order ranks (i, j) satisfies |A∩B| ≤ 1 +
        # min(|A|-i-1, |B|-j-1), and J ≥ t needs |A∩B| ≥ ceil(t/(1+t) ·
        # (|A|+|B|)). Any candidate pair's FIRST shared gram under the
        # global order lies in both prefixes (earlier grams sort earlier
        # in both), where this bound is exact — so a pair pruned at every
        # emission is genuinely sub-threshold, while common (late-rank)
        # grams' fat posting lists stop emitting pairs at all.
        # One numpy pass, no per-gram Python dispatch (a natural-corpus
        # part holds 10^5+ tiny posting groups — a pandas groupby loop
        # here cost 150 of 215 s at 20k docs): lexsort postings by
        # (gram, doc_id), derive run boundaries, then enumerate each
        # group's C(c,2) ordered pairs straight from the flat pair-index
        # space via searchsorted — chunked, so a hot gram that slipped
        # past the sampled-df order can't blow the working set.
        gr = g["gram"].to_numpy()
        ids = g["doc_id"].to_numpy()
        sz = g["size"].to_numpy()
        ps = g["pos"].to_numpy()
        o = np.lexsort((ids, gr))
        gr, ids, sz, ps = gr[o], ids[o], sz[o], ps[o]
        rem = sz - ps  # 1 + (size - pos - 1)
        new = np.concatenate([[True], gr[1:] != gr[:-1]])
        starts = np.nonzero(new)[0]
        cnt = np.diff(np.concatenate([starts, [len(gr)]]))
        grp_start = np.repeat(starts, cnt)
        li = np.arange(len(gr)) - grp_start  # local index within group
        cum = np.concatenate([[0], np.cumsum(li)])
        total = int(cum[-1])
        if total == 0:
            return _PAIR_SIZED_EMPTY
        t_ratio = threshold / (1.0 + threshold)
        out_a = []
        for plo in range(0, total, 1 << 24):
            idx = np.arange(plo, min(total, plo + (1 << 24)))
            brow = np.searchsorted(cum, idx, side="right") - 1
            arow = grp_start[brow] + (idx - cum[brow])
            sa_, sb_ = sz[arow], sz[brow]
            m = (ids[arow] != ids[brow]) & (
                np.minimum(sa_, sb_) >= threshold * np.maximum(sa_, sb_))
            m &= (np.minimum(rem[arow], rem[brow])
                  >= np.ceil(t_ratio * (sa_ + sb_)))
            # within a gram group rows are doc_id-ascending and a doc
            # appears at most once, so ids[arow] < ids[brow] holds
            out_a.append(np.stack([ids[arow[m]], ids[brow[m]],
                                   sa_[m], sb_[m]], axis=1))
        stacked = np.concatenate(out_a)
        if not len(stacked):
            return _PAIR_SIZED_EMPTY
        return pd.DataFrame({
            "a": stacked[:, 0], "b": stacked[:, 1],
            "sa": stacked[:, 2], "sb": stacked[:, 3],
        }).drop_duplicates(["a", "b"])

    if responsibility:
        pairs = (
            grams.map_batches(prefix_explode, batch_format="pandas")
            .groupby("part")
            .map_groups(pairs_in_part, batch_format="pandas")
        )
    else:
        def key_pairs(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "part": (df["a"].to_numpy() % n_parts).astype("int64"),
                "a": df["a"], "b": df["b"],
                "sa": df["sa"], "sb": df["sb"],
            })

        pairs = (
            grams.map_batches(prefix_explode, batch_format="pandas")
            .groupby("part")
            .map_groups(pairs_in_part_legacy, batch_format="pandas")
            .map_batches(key_pairs, batch_format="pandas")
            .groupby("part")
            .map_groups(lambda g: g.drop_duplicates(["a", "b"]),
                        batch_format="pandas")
        )

    if os.environ.get("RAYZENO_NGRAM_PHASES"):
        import time as _time

        _t = _time.perf_counter()
        pairs = pairs.materialize()
        print(f"[ngram] mode={'resp' if responsibility else 'legacy'} "
              f"candidate_pairs={pairs.count()} "
              f"pair_phase={_time.perf_counter() - _t:.1f}s", flush=True)

    # ---- block-grid verify join ----
    # A per-pair set attachment ships each doc's gram set once PER PAIR —
    # with p pairs per doc (template corpora: thousands) that is a p×
    # replication. The grid join ships each set once per BLOCK instead:
    # pairs route to block (a%P, b%P); every doc's set is replicated to
    # its P A-role blocks and P B-role blocks (P× replication, P ≈
    # sqrt(parts)), and the block group verifies all its pairs locally.
    # The sets travel as little-endian uint64 BYTES — an Arrow-native
    # binary column — because object/list columns on multi-million-row
    # sort shuffles are the documented Ray perf poison.
    _zero = np.zeros(0, dtype=np.uint64)
    P = max(8, int(np.sqrt(n_parts)))

    def pair_blocks(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        return pd.DataFrame({
            "part": (a % P) * P + (b % P), "a": a, "b": b,
            "role": np.int8(0), "key": np.int64(-1),
            "g": [b""] * len(df),
        })

    def set_blocks(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(np.int64)
        n = len(df)
        if not n:
            return pd.DataFrame({
                "part": pd.Series([], dtype=np.int64),
                "a": pd.Series([], dtype=np.int64),
                "b": pd.Series([], dtype=np.int64),
                "role": pd.Series([], dtype=np.int8),
                "key": pd.Series([], dtype=np.int64), "g": []})
        j = np.arange(P, dtype=np.int64)
        # A-role: blocks (d%P)*P + j ; B-role: blocks j*P + (d%P)
        part_a = ((d % P)[:, None] * P + j[None, :]).ravel()
        part_b = (j[None, :] * P + (d % P)[:, None]).ravel()
        keys = np.repeat(d, P)
        g_bytes = np.array([np.ascontiguousarray(v).tobytes()
                            for v in df["grams"]], dtype=object)
        g_rep = list(np.repeat(g_bytes, P))
        return pd.DataFrame({
            "part": np.concatenate([part_a, part_b]),
            "a": np.int64(-1), "b": np.int64(-1),
            "role": np.repeat(np.array([1, 2], dtype=np.int8), n * P),
            "key": np.concatenate([keys, keys]),
            "g": g_rep + g_rep,
        })

    def _verify_lexsort(pa_, pb_, ga, gb) -> np.ndarray:
        la = np.fromiter((len(x) for x in ga), dtype=np.int64, count=len(ga))
        lb = np.fromiter((len(x) for x in gb), dtype=np.int64, count=len(gb))
        # batch exact |A∩B|: label every gram with its pair index, lexsort,
        # count adjacent duplicates per pair — both sides are DISTINCT
        # within themselves, so a duplicate ⇔ one gram present in both
        idx = np.arange(len(pa_), dtype=np.int64)
        pid = np.concatenate([np.repeat(idx, la), np.repeat(idx, lb)])
        gr = np.concatenate([np.concatenate(ga) if len(ga) else _zero,
                             np.concatenate(gb) if len(gb) else _zero])
        order = np.lexsort((gr, pid))
        p_s, g_s = pid[order], gr[order]
        dup = (p_s[1:] == p_s[:-1]) & (g_s[1:] == g_s[:-1])
        inter = np.bincount(p_s[1:][dup], minlength=len(pa_))
        return inter / np.maximum(la + lb - inter, 1)

    _MASK_VOCAB_MAX = 1 << 16  # local-vocab mask path cutoff (512 KiB masks)

    def verify_block(g: pd.DataFrame) -> pd.DataFrame:
        role = g["role"].to_numpy()
        prs = g[role == 0]
        if prs.empty:
            return _PAIR_EMPTY
        aset = dict(zip(g["key"].to_numpy()[role == 1], g["g"][role == 1]))
        bset = dict(zip(g["key"].to_numpy()[role == 2], g["g"][role == 2]))
        pa_ = prs["a"].to_numpy()
        pb_ = prs["b"].to_numpy()
        docs = {int(d): np.frombuffer(aset[d], dtype=np.uint64)
                for d in np.unique(pa_)}
        docs.update({int(d): np.frombuffer(bset[d], dtype=np.uint64)
                     for d in np.unique(pb_)})
        vocab = np.unique(np.concatenate(list(docs.values()))) \
            if docs else _zero
        tot = sum(len(v) for v in docs.values())
        if len(vocab) <= _MASK_VOCAB_MAX and len(vocab) * 8 < tot * 64:
            # template-heavy block (tiny shared vocabulary): bitmask over
            # the block-local vocab + vectorized popcount per pair — the
            # adaptive fast path; degenerate corpora hit exactly this
            W = (len(vocab) + 63) // 64
            masks = {}
            sizes = {}
            for d, v in docs.items():
                ix = np.searchsorted(vocab, v).astype(np.uint64)
                m = np.zeros(W, dtype=np.uint64)
                np.bitwise_or.at(m, (ix >> np.uint64(6)).astype(np.int64),
                                 np.uint64(1) << (ix & np.uint64(63)))
                masks[d] = m
                sizes[d] = len(v)
            MA = np.stack([masks[int(d)] for d in pa_])
            MB = np.stack([masks[int(d)] for d in pb_])
            inter = _popcount64(MA & MB).sum(axis=1)
            sa = np.fromiter((sizes[int(d)] for d in pa_), dtype=np.int64,
                             count=len(pa_))
            sb = np.fromiter((sizes[int(d)] for d in pb_), dtype=np.int64,
                             count=len(pb_))
            jac = inter / np.maximum(sa + sb - inter, 1)
            ok = jac >= threshold
            return pd.DataFrame({"a": pa_[ok], "b": pb_[ok]})
        # general path: chunked lexsort set-intersection (bounds the
        # working set when pairs × set sizes are large)
        ch = 1 << 14
        outs = []
        for lo in range(0, len(pa_), ch):
            ca, cb = pa_[lo:lo + ch], pb_[lo:lo + ch]
            jac = _verify_lexsort(ca, cb, [docs[int(d)] for d in ca],
                                  [docs[int(d)] for d in cb])
            ok = jac >= threshold
            outs.append(pd.DataFrame({"a": ca[ok], "b": cb[ok]}))
        return pd.concat(outs, ignore_index=True) if outs else _PAIR_EMPTY

    if responsibility:
        edges = (
            pairs.map_batches(pair_blocks, batch_format="pandas")
            .union(grams.map_batches(set_blocks, batch_format="pandas"))
            .groupby("part")
            .map_groups(verify_block, batch_format="pandas")
            .to_pandas()  # VERIFIED edges only
            .drop_duplicates()
        )
        return attach_cluster_labels(grams.select_columns(["doc_id"]), edges)

    # ---- legacy-mode verify: gram-space-split exact intersection ----
    # Natural corpora: few candidate pairs per doc, but each doc's gram
    # set is BIG (~10^3 uint64s) — any verify that co-locates whole sets
    # per pair ships pairs × set_bytes (measured 3.4 GB for 470 k pairs
    # at 20 k docs; 130 of 137 s). Instead, split the GRAM SPACE into Q
    # hash-parts: every gram row travels exactly once (skinny fixed-width
    # columns, never a fat binary payload), each pair is replicated to
    # all Q parts (32-byte rows), partial |A∩B| is computed per part with
    # the run-boundary lexsort kernel, and a final skinny groupby sums
    # partials and applies the threshold. Traffic: O(corpus grams +
    # Q·pairs) — independent of set size per pair. Docs in no candidate
    # pair are dropped before the shuffle via a broadcast id set (pairs
    # are already driver-bounded: the op ends in a driver union-find).
    import ray as _ray

    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return attach_cluster_labels(grams.select_columns(["doc_id"]),
                                     _PAIR_EMPTY)

    # ---- histogram pre-verify (exact upper bound, broadcast) ----
    # Surviving false candidates share a rare gram but only ~20-40 % of
    # their sets overall, while J ≥ t needs ~α = t/(1+t)·(|A|+|B|) shared
    # grams — a big gap. Each doc gets a 1 KiB 1024-bucket uint8 gram
    # histogram; Σ_j min(hA[j], hB[j]) ≥ |A∩B| EXACTLY (every shared
    # gram increments the same bucket on both sides), so pruning pairs
    # with bound < α is exactness-safe, and the bound separates cleanly
    # (false ≈ shared + small collision noise ≪ α). The histogram TABLE
    # is tiny relative to the pair table (1 KiB × n_docs vs 10^7-10^8
    # pair rows), so it is built distributed, collected once, and
    # broadcast (ray.put) — the bound check is then a ZERO-SHUFFLE
    # map_batches over the pairs where they already live. (A P×P grid
    # variant that shuffled pairs+histograms together wedged Ray's
    # backpressure at 48 M pair rows; pagerank's broadcast-vs-shuffle
    # split is the repo precedent.) Past the broadcast bound (~4 GiB of
    # histograms ≈ 4 M candidate-docs) the pre-verify is skipped and the
    # gram-space-split exact verify below carries the full load.
    # Measured at 20 k diverse docs: 472 k candidates → 812 survivors;
    # verify phase 156 s → seconds.
    def _docs_ref(pairs_ds, n: int):
        # broadcast id-set for the doc semi-join prefilters — an
        # optimization only, so it is SKIPPED (returns None) when the
        # candidate table is too big to collect: a driver-side
        # to_pandas over 10^8 candidate rows pins the driver for
        # minutes while the cluster idles (observed at 200 k docs)
        if n > 2_000_000:
            return None
        pdf = pairs_ds.to_pandas()
        return _ray.put(np.unique(
            np.concatenate([pdf["a"].to_numpy(np.int64),
                            pdf["b"].to_numpy(np.int64)])))

    n_docs_total = grams.count()
    if n_pairs > 20_000 and n_docs_total * 1024 <= (4 << 30):
        t_ratio_pv = threshold / (1.0 + threshold)

        def hist_rows(df: pd.DataFrame) -> pd.DataFrame:
            hs = np.empty((len(df), 1024), dtype=np.uint8)
            for i, v in enumerate(df["grams"]):
                h = np.bincount(
                    ((v >> np.uint64(20)) & np.uint64(1023)).astype(
                        np.int64), minlength=1024)
                hs[i] = np.minimum(h, 255)
            return pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "hist": [row.tobytes() for row in hs],
            })

        hist_pdf = grams.map_batches(
            hist_rows, batch_format="pandas").to_pandas()
        h_ids = hist_pdf["doc_id"].to_numpy(np.int64)
        o = np.argsort(h_ids, kind="stable")
        h_ids = h_ids[o]
        h_mat = np.frombuffer(
            b"".join(hist_pdf["hist"].to_numpy()[o]),
            dtype=np.uint8).reshape(len(h_ids), 1024)
        hist_ref = _ray.put((h_ids, h_mat))
        del hist_pdf, h_mat

        def bound_check(df: pd.DataFrame) -> pd.DataFrame:
            ids_s, mat = _ray.get(hist_ref)  # zero-copy shared memory
            pa_ = df["a"].to_numpy(np.int64)
            pb_ = df["b"].to_numpy(np.int64)
            sa_ = df["sa"].to_numpy(np.int64)
            sb_ = df["sb"].to_numpy(np.int64)
            outs = []
            ch = 1 << 14  # bound the m×1024 uint8 gather transient
            for lo in range(0, len(pa_), ch):
                hi = min(len(pa_), lo + ch)
                HA = mat[np.searchsorted(ids_s, pa_[lo:hi])]
                HB = mat[np.searchsorted(ids_s, pb_[lo:hi])]
                bound = np.minimum(HA, HB).sum(axis=1, dtype=np.int64)
                ok = bound >= np.ceil(
                    t_ratio_pv * (sa_[lo:hi] + sb_[lo:hi]))
                outs.append(pd.DataFrame({
                    "a": pa_[lo:hi][ok], "b": pb_[lo:hi][ok],
                    "sa": sa_[lo:hi][ok], "sb": sb_[lo:hi][ok]}))
            return pd.concat(outs, ignore_index=True) \
                if outs else _PAIR_SIZED_EMPTY

        pairs = pairs.map_batches(
            bound_check, batch_format="pandas").materialize()
        n_pairs = pairs.count()
        if os.environ.get("RAYZENO_NGRAM_PHASES"):
            print(f"[ngram] preverify_survivors={n_pairs}", flush=True)
        if n_pairs == 0:
            return attach_cluster_labels(grams.select_columns(["doc_id"]),
                                         _PAIR_EMPTY)

    pair_docs_ref = _docs_ref(pairs, n_pairs)
    # Q trades corpus-shuffle fan-in (gram rows per part ≈ occ/Q) against
    # pair replication (n_pairs × Q): balance the two byte streams.
    occ_est = float(mean_size) * max(1, n_docs_total)
    Q = int(np.clip(np.sqrt(occ_est * 24.0 / (n_pairs * 32.0)), 8, 64))

    def pair_qrows(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        r8 = lambda c: np.repeat(df[c].to_numpy(np.int64), Q)  # noqa: E731
        return pd.DataFrame({
            "qpart": np.tile(np.arange(Q, dtype=np.int64), n),
            "did": np.full(n * Q, -1, dtype=np.int64),
            "gram": np.zeros(n * Q, dtype=np.uint64),
            "a": r8("a"), "b": r8("b"), "sa": r8("sa"), "sb": r8("sb"),
        })

    def gram_qrows(df: pd.DataFrame) -> pd.DataFrame:
        dids = df["doc_id"].to_numpy(np.int64)
        if pair_docs_ref is not None:
            sel = np.isin(dids, _ray.get(pair_docs_ref))
            df = df[sel]
            dids = dids[sel]
        if not len(df):
            return pd.DataFrame({
                "qpart": pd.Series([], dtype=np.int64),
                "did": pd.Series([], dtype=np.int64),
                "gram": pd.Series([], dtype=np.uint64),
                "a": pd.Series([], dtype=np.int64),
                "b": pd.Series([], dtype=np.int64),
                "sa": pd.Series([], dtype=np.int64),
                "sb": pd.Series([], dtype=np.int64),
            })
        sizes = df["size"].to_numpy()
        flat = np.concatenate(list(df["grams"]))
        did = np.repeat(dids, sizes)
        n = len(flat)
        return pd.DataFrame({
            "qpart": (flat % np.uint64(Q)).astype(np.int64),
            "did": did, "gram": flat,
            "a": np.full(n, -1, dtype=np.int64),
            "b": np.full(n, -1, dtype=np.int64),
            "sa": np.zeros(n, dtype=np.int64),
            "sb": np.zeros(n, dtype=np.int64),
        })

    _PARTIAL_EMPTY = pd.DataFrame({
        "part": pd.Series([], dtype=np.int64),
        "a": pd.Series([], dtype=np.int64),
        "b": pd.Series([], dtype=np.int64),
        "sa": pd.Series([], dtype=np.int64),
        "sb": pd.Series([], dtype=np.int64),
        "inter": pd.Series([], dtype=np.int64),
    })

    def intersect_q(g: pd.DataFrame) -> pd.DataFrame:
        is_pair = g["did"].to_numpy() < 0
        prs = g[is_pair]
        gx = g[~is_pair]
        if prs.empty or gx.empty:
            return _PARTIAL_EMPTY
        did = gx["did"].to_numpy(np.int64)
        gr = gx["gram"].to_numpy()
        o = np.lexsort((gr, did))
        did, gr = did[o], gr[o]
        uids = did[np.concatenate([[True], did[1:] != did[:-1]])]
        starts = np.searchsorted(did, uids)
        ends = np.append(starts[1:], len(did))

        def seg_of(d: np.ndarray):
            # vectorized (start, length) lookup; docs with no gram in
            # this qpart resolve to empty segments
            pos = np.minimum(np.searchsorted(uids, d), len(uids) - 1)
            hit = uids[pos] == d
            return (np.where(hit, starts[pos], 0),
                    np.where(hit, ends[pos] - starts[pos], 0))

        pa_ = prs["a"].to_numpy(np.int64)
        pb_ = prs["b"].to_numpy(np.int64)
        sta, la = seg_of(pa_)
        stb, lb = seg_of(pb_)
        inter = np.zeros(len(pa_), dtype=np.int64)
        # chunk so (la+lb).sum() per lexsort stays bounded regardless of
        # the pair count replicated into this qpart
        ch = 1 << 15
        for lo in range(0, len(pa_), ch):
            hi = min(len(pa_), lo + ch)
            cla, clb = la[lo:hi], lb[lo:hi]
            idx = np.arange(hi - lo, dtype=np.int64)
            cumA = np.concatenate([[0], np.cumsum(cla)])
            cumB = np.concatenate([[0], np.cumsum(clb)])
            takeA = (np.repeat(sta[lo:hi], cla)
                     + np.arange(int(cumA[-1])) - np.repeat(cumA[:-1], cla))
            takeB = (np.repeat(stb[lo:hi], clb)
                     + np.arange(int(cumB[-1])) - np.repeat(cumB[:-1], clb))
            pid = np.concatenate([np.repeat(idx, cla), np.repeat(idx, clb)])
            gall = np.concatenate([gr[takeA], gr[takeB]])
            order = np.lexsort((gall, pid))
            p_s, g_s = pid[order], gall[order]
            dup = (p_s[1:] == p_s[:-1]) & (g_s[1:] == g_s[:-1])
            inter[lo:hi] = np.bincount(p_s[1:][dup], minlength=hi - lo)
        keep = inter > 0
        if not keep.any():
            return _PARTIAL_EMPTY
        return pd.DataFrame({
            "part": ((pa_[keep] * 2654435761 + pb_[keep]) % n_parts)
            .astype(np.int64),
            "a": pa_[keep], "b": pb_[keep],
            "sa": prs["sa"].to_numpy(np.int64)[keep],
            "sb": prs["sb"].to_numpy(np.int64)[keep],
            "inter": inter[keep].astype(np.int64),
        })

    def sum_verify(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["a", "b"], sort=False).agg(
            sa=("sa", "first"), sb=("sb", "first"),
            inter=("inter", "sum")).reset_index()
        jac = agg["inter"] / np.maximum(agg["sa"] + agg["sb"]
                                        - agg["inter"], 1)
        ok = (jac >= threshold).to_numpy()
        return pd.DataFrame({"a": agg["a"].to_numpy()[ok],
                             "b": agg["b"].to_numpy()[ok]})

    partials = (
        pairs.map_batches(pair_qrows, batch_format="pandas")
        .union(grams.map_batches(gram_qrows, batch_format="pandas"))
        .groupby("qpart")
        .map_groups(intersect_q, batch_format="pandas")
    )
    if os.environ.get("RAYZENO_NGRAM_PHASES"):
        import time as _time

        _t = _time.perf_counter()
        partials = partials.materialize()
        print(f"[ngram] Q={Q} partial_rows={partials.count()} "
              f"intersect_phase={_time.perf_counter() - _t:.1f}s",
              flush=True)
        _t = _time.perf_counter()
    edges = (
        partials.groupby("part")
        .map_groups(sum_verify, batch_format="pandas")
        .to_pandas()  # VERIFIED edges only
        .drop_duplicates()
    )
    if os.environ.get("RAYZENO_NGRAM_PHASES"):
        print(f"[ngram] edges={len(edges)} "
              f"sum_phase={_time.perf_counter() - _t:.1f}s", flush=True)
    return attach_cluster_labels(grams.select_columns(["doc_id"]), edges)


# ---------------------------------------------------------- embedding cosine


def embedding_near_dup(emb_ds, threshold: float = 0.95,
                       max_broadcast_rows: int = 2_000_000):
    """Embedding-cosine near-dup with the module-standard adaptive split
    (VERDICT r4 item 3):

    - ``n ≤ max_broadcast_rows``: EXACT — normalized matmul per batch
      against the full broadcast matrix (one ``ray.put``, read zero-copy
      by every task). Driver memory is O(n·dims), bounded by the switch.
    - bigger inputs route through :func:`embedding_nn_lsh` — the
      banded/multi-probe scale path that never materializes the dataset
      (count-adaptive plane count, hot-bucket sub-split, binary payloads)
      and reports each vector's best FOUND neighbor (approximate-NN; the
      same python oracle bounds both paths: every reported sim must be
      the true cosine of its pair, ≥85 % true-NN agreement).

    Returns (vec_id, dup_of, sim) for rows whose best neighbor clears
    *threshold*."""
    import ray

    if emb_ds.count() > max_broadcast_rows:
        # max_hamming=2 — the driver query's probing depth: near-dup
        # verification wants recall over probe cost (unstructured inputs
        # at h=1 drop true-NN agreement below the 85 % oracle bound)
        return embedding_nn_lsh(emb_ds, threshold=threshold, max_hamming=2)

    pdf = emb_ds.to_pandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.clip(norms, 1e-12, None)
    ids = pdf["vec_id"].to_numpy()
    mat_ref = ray.put((ids, mat))

    class NearDup:
        def __init__(self, ref, thr):
            self.ids, self.mat = ray.get(ref)
            self.thr = thr

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            q = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            q = q / np.clip(np.linalg.norm(q, axis=1, keepdims=True), 1e-12, None)
            sims = q @ self.mat.T
            out_id, out_dup, out_sim = [], [], []
            for row_i, vid in enumerate(batch["vec_id"]):
                s = sims[row_i]
                order = np.argsort(-s)
                for j in order:
                    if self.ids[j] != vid:
                        if s[j] >= self.thr:
                            out_id.append(vid)
                            out_dup.append(int(self.ids[j]))
                            out_sim.append(float(s[j]))
                        break
            return pd.DataFrame({"vec_id": out_id, "dup_of": out_dup,
                                 "sim": np.round(out_sim, 6)})

    return emb_ds.map_batches(
        NearDup, fn_constructor_kwargs={"ref": mat_ref, "thr": threshold},
        batch_format="pandas", batch_size=512, concurrency=(1, 4),
    )


def embedding_nn_lsh(emb_ds, threshold: float = 0.0, n_planes: int | None = None,
                     max_hamming: int | None = None, seed: int = 11,
                     target_bucket_rows: int = 256, bucket_cap: int = 4096):
    """LSH nearest-neighbor join — the scale path for "every vector reports
    its closest other vector" (the broadcast-matrix :func:`embedding_near_dup`
    is the small-N verifier).

    Index-side multi-probe: each row is replicated into its own bucket plus
    every bucket within *max_hamming* bit flips — the standard multi-probe
    recall/cost trade (two vectors meet iff their signatures are within
    ``2·max_hamming`` flips). Scale shape, in order of what it cost us:

    - **Plane count is COUNT-ADAPTIVE** (``n_planes=None``, the default):
      the smallest P with ``n·replicas/2^P ≤ target_bucket_rows``. A fixed
      P makes mean bucket size — and the per-bucket O(size²) best-neighbor
      kernel — grow linearly with n, i.e. the whole op quadratic (measured:
      20 k vecs 94 s → 80 k vecs 1521 s at fixed P=6). Explicit ``n_planes``
      is honored unchanged (the sf-scale driver query pins P=6/h=2).
    - **Embeddings cross the shuffle as fixed-width binary** (float64
      bytes), never as a ``list<float>`` column — list payloads on fat
      row counts are poison in Ray sort shuffles (the dedup-module lesson).
    - **No raw ``groupby("bucket")``**: buckets are coarse-partitioned
      (``bucket % n_parts``) and each part runs one vectorized kernel over
      its buckets (np.argsort + boundary slices — 2^P buckets would
      otherwise each pay pandas group dispatch).
    - **Hot-bucket cap**: natural embeddings are CLUSTERED — a tight
      cluster concentrates in a few buckets no matter how many planes cut
      it. Buckets above *bucket_cap* rows are deterministically sub-split
      by vec-id hash; each row then reports its best neighbor within its
      sub-bucket (still a true cosine, marginally less likely to be THE
      nearest — the documented approximate-NN trade that keeps worst-case
      work O(n·cap) instead of O(n²)).

    A second slim coarse-keyed shuffle keeps the global max per vec_id. No
    driver materialization, no broadcast of the data matrix. Returns rows
    with sim ≥ *threshold*."""
    import math

    import ray as _ray

    from zeno_ray.ops.ann import _normalize

    if max_hamming is None:
        max_hamming = 1 if n_planes is None else 1
    if n_planes is None:
        n_total = emb_ds.count()
        n_planes = 6
        while n_planes < 24:
            repl = sum(math.comb(n_planes, r)
                       for r in range(0, max_hamming + 1))
            if n_total * repl / (1 << n_planes) <= target_bucket_rows:
                break
            n_planes += 1

    rng = np.random.RandomState(seed)
    first = emb_ds.take(1)[0]["embedding"]
    planes = rng.normal(size=(n_planes, len(first)))
    planes_ref = _ray.put(planes)
    n_parts = _coarse_n_parts()

    # all ≤max_hamming-bit flip masks, precomputed once (vectorized probe
    # expansion: buckets = sig ^ masks — no per-row python loop)
    from itertools import combinations

    masks = [0]
    for r in range(1, max_hamming + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    masks_np = np.asarray(masks, dtype=np.uint64)

    class _MultiProbeBucket:
        def __init__(self, planes_ref):
            self.planes = _ray.get(planes_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            normed = _normalize(mat)
            bits = (normed @ self.planes.T) > 0
            sigs = bits.dot(1 << np.arange(bits.shape[1], dtype=np.uint64))
            R = len(masks_np)
            bkts = (sigs[:, None] ^ masks_np[None, :]).ravel()
            ids = np.repeat(batch["vec_id"].to_numpy(np.int64), R)
            blobs = np.array([row.tobytes() for row in mat], dtype=object)
            return pd.DataFrame({
                "vec_id": ids,
                "bucket": bkts,
                "part": (bkts % np.uint64(n_parts)).astype(np.int64),
                "emb": np.repeat(blobs, R),
            })

    bucketed = emb_ds.map_batches(
        _MultiProbeBucket, fn_constructor_kwargs={"planes_ref": planes_ref},
        batch_format="pandas", batch_size=4096, concurrency=(1, 4),
    )

    empty = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                          "dup_of": pd.Series([], dtype="int64"),
                          "sim": pd.Series([], dtype="float64")})

    def nn_in_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty
        ids_all = g["vec_id"].to_numpy(np.int64)
        bkt = g["bucket"].to_numpy(np.uint64)
        mat_all = _normalize(np.frombuffer(
            b"".join(g["emb"]), dtype=np.float64).reshape(len(ids_all), -1))
        order = np.argsort(bkt, kind="stable")
        bkt_s = bkt[order]
        bounds = np.flatnonzero(np.diff(bkt_s)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(bkt_s)]])
        out_id, out_dup, out_sim = [], [], []

        def bucket_best(sel: np.ndarray) -> None:
            m = len(sel)
            if m < 2:
                return
            ids = ids_all[sel]
            mat = mat_all[sel]
            sims = mat @ mat.T
            np.fill_diagonal(sims, -np.inf)
            best = np.argmax(sims, axis=1)
            out_id.append(ids)
            out_dup.append(ids[best])
            out_sim.append(sims[np.arange(m), best])

        for lo, hi in zip(starts, ends):
            sel = order[lo:hi]
            m = hi - lo
            if m <= bucket_cap:
                bucket_best(sel)
                continue
            # hot bucket (clustered data): deterministic vec-id-hash
            # sub-split bounds the O(size²) kernel at O(size·cap)
            n_sub = -(-m // bucket_cap)
            sub = (ids_all[sel].astype(np.uint64)
                   * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_sub)
            so = np.argsort(sub, kind="stable")
            sub_s = sub[so]
            sb = np.flatnonzero(np.diff(sub_s)) + 1
            for slo, shi in zip(np.concatenate([[0], sb]),
                                np.concatenate([sb, [m]])):
                bucket_best(sel[so[slo:shi]])

        if not out_id:
            return empty
        return best_per_vec(pd.DataFrame({
            "vec_id": np.concatenate(out_id),
            "dup_of": np.concatenate(out_dup),
            "sim": np.concatenate(out_sim)}))

    # global-best reduce: per-part combiner + coarse-partition shuffle
    # (part = vec_id % n_parts), one vectorized sort/drop_duplicates per
    # part — never a raw groupby(vec_id) (tiny-groups trap at 10^9 rows)
    def best_per_vec(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["vec_id", "sim", "dup_of"],
                            ascending=[True, False, True], kind="stable")
        return df.drop_duplicates("vec_id", keep="first")

    def combine_to_part(df: pd.DataFrame) -> pd.DataFrame:
        df = best_per_vec(df)
        return df.assign(part=(df["vec_id"].to_numpy(np.int64)
                               % n_parts).astype("int64"))

    out = (
        bucketed.groupby("part")
        .map_groups(nn_in_part, batch_format="pandas")
        .map_batches(combine_to_part, batch_format="pandas")
        .groupby("part")
        .map_groups(
            lambda g: best_per_vec(g)[["vec_id", "dup_of", "sim"]],
            batch_format="pandas")
    )

    def thresh(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["sim"] >= threshold].copy()
        df["sim"] = df["sim"].round(6)
        return df

    return out.map_batches(thresh, batch_format="pandas")


def embedding_near_dup_lsh(emb_ds, threshold: float = 0.95, n_planes: int = 8,
                           seed: int = 11):
    """Scale path for embedding near-dup: random-hyperplane LSH buckets
    (groupby(bucket) keyed shuffle) → pairwise cosine only WITHIN a bucket.
    No broadcast of the full matrix — per-group work is O(bucket²), and at
    10^9 rows the bucket count grows with n_planes to keep groups small.
    Near-dups (cosine ≥ threshold) land in the same bucket with prob
    ≈ (1 - θ/π)^n_planes; raise recall with multi-probe or a second
    plane-set pass. Returns (vec_id, dup_of, sim) pairs, both directions."""
    import pandas as pd

    from zeno_ray.ops.ann import _LshBucket, _normalize
    import ray as _ray

    rng = np.random.RandomState(seed)
    # peek at dimension from one row
    first = emb_ds.take(1)[0]["embedding"]
    planes = rng.normal(size=(n_planes, len(first)))
    planes_ref = _ray.put(planes)

    bucketed = emb_ds.map_batches(
        _LshBucket, fn_constructor_kwargs={"planes_ref": planes_ref},
        batch_format="pandas", batch_size=4096, concurrency=(1, 4),
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_id": [], "dup_of": [], "sim": []})
        mat = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        sims = mat @ mat.T
        ids = g["vec_id"].to_numpy()
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame({
            "vec_id": np.concatenate([ids[ii], ids[jj]]),
            "dup_of": np.concatenate([ids[jj], ids[ii]]),
            "sim": np.round(np.concatenate([sims[ii, jj], sims[ii, jj]]), 6),
        })

    return (
        bucketed.groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )


# -------------------------------------------------------- decontamination


# Bench-gram broadcast bound: at 8 bytes/gram this is ~130 M distinct
# benchmark n-grams — far beyond any real eval suite. Tests shrink it to
# force the keyed-shuffle fallback.
NGRAM_BENCH_BROADCAST_BYTES = 1 << 30


def _doc_gram_hashes(df: pd.DataFrame, n: int, mults: np.ndarray,
                     id_col: str, text_col: str) -> pd.DataFrame:
    """Distinct (doc_id, gram-hash) rows of a batch: words hash once per
    UNIQUE word (blake2b via :func:`_h64`; vocab ≪ tokens), n-grams
    combine the word hashes with positional multipliers + splitmix64 —
    one vectorized pass, no per-gram Python."""
    empty = pd.DataFrame({"gram": pd.Series([], dtype="int64"),
                          "doc_id": pd.Series([], dtype="int64")})
    if df.empty:
        return empty
    words_per_doc = [t.split(" ") for t in df[text_col]]
    lens = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64,
                       count=len(words_per_doc))
    flat: list = []
    for w in words_per_doc:
        flat.extend(w)
    ids = np.repeat(df[id_col].to_numpy(np.int64), lens)
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
    uh = np.fromiter((_h64(w.encode("utf-8", "ignore")) for w in uniq),
                     dtype=np.uint64, count=len(uniq))
    wh = uh[codes.astype(np.int64)]
    m = len(wh) - (n - 1)
    if m <= 0:
        return empty
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(n):
        acc += wh[j: j + m] * mults[j]
    gram = _mix64(acc)
    valid = ids[:m] == ids[n - 1:]
    if not valid.any():
        return empty
    return pd.DataFrame({
        "gram": gram[valid].view(np.int64),
        "doc_id": ids[:m][valid],
    }).drop_duplicates()


def ngram_decontaminate(docs_ds, n: int = 5, bench_mod: int = 29,
                        id_col: str = "doc_id", text_col: str = "text"
                        ) -> pd.DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word-*n*-gram with a held-out benchmark set (the standard
    eval-contamination sweep a training-data pipeline runs before
    packing — word-13-gram in GPT-3 App. C, 10-gram in Llama 2; *n*
    defaults to 5 to suit the synthetic corpus's short docs). The
    benchmark set here is ``doc_id % bench_mod == 0`` (a deterministic
    stand-in for "the eval suite" that needs no external data).

    Returns (doc_id, n_shared): every NON-benchmark document sharing ≥ 1
    distinct n-gram with any benchmark document, with its count of
    distinct shared n-grams, sorted by doc_id.

    Scale shape — the small side is BROADCAST, the corpus never
    shuffles:

    - Pass 1 computes the benchmark set's distinct gram hashes (bench
      docs only) and collects them to one sorted uint64 array — eval
      suites are tiny relative to the corpus (the whole point of
      decontamination), so this is a few MB where the corpus is TBs.
    - Pass 2 is ONE shuffle-free ``map_batches`` over the corpus:
      per-doc distinct grams → ``np.searchsorted`` against the
      ``ray.put`` bench array → per-doc hit counts, complete within the
      batch (a doc's grams never leave its row). Measured: the earlier
      all-grams keyed-shuffle formulation went superlinear at 4× docs
      (3.1 s → 32.1 s, linearity 2.6); this one ships zero gram rows.
    - Fallback: if the bench set exceeds
      ``NGRAM_BENCH_BROADCAST_BYTES``, the original coarse-partition
      keyed-shuffle semi-join runs instead (``gram % n_parts``, every
      copy of a gram in one part, vectorized isin per part — never a raw
      ``groupby(gram)``).

    Grams are compared as 64-bit hashes: a false share needs a blake2b+
    splitmix collision (~n²/2⁶⁴ — negligible, and absent at oracle
    scale, where the DuckDB oracle joins on the gram STRINGS)."""
    empty_out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "n_shared": pd.Series([], dtype="int64")})
    pdf = ngram_decontaminate_ds(docs_ds, n=n, bench_mod=bench_mod,
                                 id_col=id_col, text_col=text_col).to_pandas()
    if pdf.empty:
        return empty_out
    return pdf.sort_values("doc_id").reset_index(drop=True)


def ngram_decontaminate_ds(docs_ds, n: int = 5, bench_mod: int = 29,
                           id_col: str = "doc_id", text_col: str = "text"):
    """Lazy-Dataset variant of :func:`ngram_decontaminate`: identical
    contamination semantics, but the per-doc (doc_id, n_shared) result
    stays a DISTRIBUTED (unsorted) Dataset — no per-doc row reaches the
    driver, so a caller whose contaminated-id set may outgrow driver
    memory (webtext_refine past its broadcast bound) can anti-join
    against it in the cluster. The bench GRAM array is still collected
    and broadcast below ``NGRAM_BENCH_BROADCAST_BYTES`` (eval suites
    are small — the op's premise), with the keyed-shuffle fallback
    above it; in the fallback the per-doc sum of gram-part partials is
    reduced by a second coarse ``doc_id % n_parts`` groupby instead of
    on the driver."""
    import ray
    import ray.data as rd

    mults = _pos_mults(n)
    empty_out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "n_shared": pd.Series([], dtype="int64")})

    def bench_grams_of_batch(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df[id_col] % bench_mod == 0]
        dg = _doc_gram_hashes(sub, n, mults, id_col, text_col)
        return pd.DataFrame(
            {"gram": pd.Series(pd.unique(dg["gram"]), dtype="int64")})

    bench_pdf = docs_ds.map_batches(
        bench_grams_of_batch, batch_format="pandas").to_pandas()
    # a zero-row Dataset's to_pandas() can drop the column entirely
    # (no bench docs at all) — treat it as an empty gram set
    bench = np.unique(bench_pdf["gram"].to_numpy(np.int64)) \
        if "gram" in bench_pdf.columns else np.array([], dtype=np.int64)
    if len(bench) == 0:
        return rd.from_pandas(empty_out)

    if bench.nbytes <= NGRAM_BENCH_BROADCAST_BYTES:
        bench_ref = ray.put(bench)

        def count_shared(df: pd.DataFrame) -> pd.DataFrame:
            sub = df[df[id_col] % bench_mod != 0]
            dg = _doc_gram_hashes(sub, n, mults, id_col, text_col)
            if dg.empty:
                return empty_out
            b = ray.get(bench_ref)
            g = dg["gram"].to_numpy()
            pos = np.searchsorted(b, g)
            hit = (pos < len(b)) & (b[np.minimum(pos, len(b) - 1)] == g)
            docs, counts = np.unique(dg["doc_id"].to_numpy()[hit],
                                     return_counts=True)
            return pd.DataFrame({"doc_id": docs,
                                 "n_shared": counts.astype("int64")})

        return docs_ds.map_batches(count_shared, batch_format="pandas")

    # ---- fallback: bench set too large to broadcast — keyed shuffle
    n_parts = _coarse_n_parts()

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = _doc_gram_hashes(df, n, mults, id_col, text_col)
        out["bench"] = (out["doc_id"] % bench_mod == 0)
        out["part"] = (out["gram"].to_numpy().view(np.uint64)
                       % np.uint64(n_parts)).astype("int64")
        return out

    def shared_in_part(g: pd.DataFrame) -> pd.DataFrame:
        bench_grams = g.loc[g["bench"], "gram"].unique()
        cand = g[~g["bench"] & g["gram"].isin(bench_grams)]
        if cand.empty:
            return empty_out
        cand = cand.drop_duplicates(["doc_id", "gram"])
        out = cand.groupby("doc_id", as_index=False).size()
        return pd.DataFrame({"doc_id": out["doc_id"].astype("int64"),
                             "n_shared": out["size"].astype("int64")})

    def rekey_by_doc(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(part2=(df["doc_id"].to_numpy(np.int64)
                                % n_parts).astype("int64"))

    def sum_in_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False)["n_shared"].sum()
        return pd.DataFrame({"doc_id": out["doc_id"].astype("int64"),
                             "n_shared": out["n_shared"].astype("int64")})

    return (
        docs_ds.map_batches(gram_rows, batch_format="pandas")
        .groupby("part")
        .map_groups(shared_in_part, batch_format="pandas")
        .map_batches(rekey_by_doc, batch_format="pandas")
        .groupby("part2")
        .map_groups(sum_in_part, batch_format="pandas")
    )


# --------------------------------------------- incremental (cross-snapshot)


def exact_dedup_incremental(new_docs_ds, prior_hashes_ds,
                            id_col: str = "doc_id", text_col: str = "text"):
    """Cross-snapshot exact dedup: keep only the rows of *new_docs_ds*
    whose text hash appears in neither *prior_hashes_ds* (the previous
    snapshot's ``text_hash`` column, e.g. the output of
    :func:`exact_dedup` on last month's corpus) nor earlier (lower-id)
    in the new snapshot itself. The standard recrawl pattern: each
    incremental batch dedupes against the accumulated corpus without
    ever re-reading the old TEXT — only its 8-byte hashes move.

    Shuffle shape: both sides are slim (id, hash) projections tagged
    with a side flag, coarse-partitioned on ``hash % n_parts`` in ONE
    union'd shuffle (every copy of a hash co-locates), then one
    vectorized kernel per part: drop new rows whose hash has a prior-
    side row, then first-wins within the new side. Returns a Dataset of
    surviving (id, text_hash) rows — the new snapshot's contribution to
    the accumulated hash set."""
    n_parts = _coarse_n_parts()

    def new_side(df: pd.DataFrame) -> pd.DataFrame:
        h = add_text_hash(df, text_col)
        out = h[[id_col, "text_hash"]].sort_values(
            ["text_hash", id_col], kind="stable"
        ).drop_duplicates("text_hash", keep="first")
        return pd.DataFrame({
            id_col: out[id_col].astype("int64"),
            "text_hash": out["text_hash"].to_numpy(np.uint64).view(np.int64),
            "side": np.ones(len(out), dtype=np.int8),
            "part": (out["text_hash"].to_numpy(np.uint64)
                     % np.uint64(n_parts)).view(np.int64),
        })

    def prior_side(df: pd.DataFrame) -> pd.DataFrame:
        h = df["text_hash"].to_numpy()
        hu = h.astype(np.uint64) if h.dtype != np.uint64 else h
        return pd.DataFrame({
            id_col: np.full(len(df), -1, dtype=np.int64),
            "text_hash": hu.view(np.int64),
            "side": np.zeros(len(df), dtype=np.int8),
            "part": (hu % np.uint64(n_parts)).view(np.int64),
        })

    def survivors_in_part(g: pd.DataFrame) -> pd.DataFrame:
        new = g[g["side"] == 1]
        seen = g.loc[g["side"] == 0, "text_hash"].unique()
        new = new[~new["text_hash"].isin(seen)]
        new = new.sort_values(["text_hash", id_col], kind="stable") \
                 .drop_duplicates("text_hash", keep="first")
        return new[[id_col, "text_hash"]]

    return (
        new_docs_ds.map_batches(new_side, batch_format="pandas")
        .union(prior_hashes_ds.map_batches(prior_side, batch_format="pandas"))
        .groupby("part")
        .map_groups(survivors_in_part, batch_format="pandas")
    )


# ------------------------------------------- cluster representative pick


def dedup_keep_best(docs_ds, id_col: str = "doc_id",
                    text_col: str = "text",
                    jaccard_threshold: float = 0.8) -> pd.DataFrame:
    """Near-dup removal keeping the BEST document per cluster rather
    than the lowest id — what a production pipeline actually ships
    (e.g. keep the longest / highest-quality copy of a boilerplate
    family). Clusters come from :func:`minhash_dedup`; the
    representative is the cluster member with the highest
    (quality, n_chars, -doc_id) key — deterministic total order.

    Returns (doc_id, cluster, quality, keep): every doc with its
    cluster label and a ``keep`` flag (True for exactly one doc per
    cluster).

    Scale shape: cluster labels (from minhash_dedup) and per-doc
    quality (shuffle-free map_batches over the text) are both SLIM
    (doc_id, …) projections — the text column never crosses a shuffle.
    They meet in one union'd keyed shuffle on ``doc_id % n_parts``
    (vectorized merge per part), then the representative pick is a
    second coarse shuffle on ``cluster % n_parts`` (every member of a
    cluster in one part) with ONE vectorized sort + drop_duplicates per
    part — the exact_dedup discipline, never a raw groupby(cluster)."""
    from zeno_ray.ops.text import quality_features

    n_parts = _coarse_n_parts()
    labels = minhash_dedup(docs_ds, jaccard_threshold=jaccard_threshold)

    def label_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].astype("int64"),
            "cluster": df["cluster"].astype("int64"),
            "quality": np.zeros(len(df)),
            "n_chars": np.zeros(len(df), dtype=np.int64),
            "side": np.zeros(len(df), dtype=np.int8),
            "part": (df[id_col].to_numpy() % n_parts).astype("int64"),
        })

    def quality_side(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_features(df)
        return pd.DataFrame({
            id_col: q[id_col].astype("int64"),
            "cluster": np.zeros(len(q), dtype=np.int64),
            "quality": q["quality"],
            "n_chars": q["n_chars"].astype("int64"),
            "side": np.ones(len(q), dtype=np.int8),
            "part": (q[id_col].to_numpy() % n_parts).astype("int64"),
        })

    def join_in_part(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["side"] == 0][[id_col, "cluster"]]
        qs = g[g["side"] == 1][[id_col, "quality", "n_chars"]]
        m = lab.merge(qs, on=id_col, how="inner")
        m["part"] = (m["cluster"].to_numpy() % n_parts).astype("int64")
        return m

    def best_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cluster", "quality", "n_chars", id_col],
                          ascending=[True, False, False, True],
                          kind="stable")
        winners = g.drop_duplicates("cluster", keep="first")[[id_col]]
        g = g.copy()
        g["keep"] = g[id_col].isin(winners[id_col]).to_numpy()
        return g[[id_col, "cluster", "quality", "keep"]]

    pdf = (
        labels.map_batches(label_side, batch_format="pandas")
        .union(docs_ds.map_batches(quality_side, batch_format="pandas"))
        .groupby("part")
        .map_groups(join_in_part, batch_format="pandas")
        .groupby("part")
        .map_groups(best_in_part, batch_format="pandas")
        .to_pandas()
    )
    return pdf.sort_values(id_col).reset_index(drop=True)
