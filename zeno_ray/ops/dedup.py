"""Deduplication over the ``documents`` table — exact and near-dup.

Scale shapes (ray_guide + MinHash/LSH literature, Broder 1997):
- exact: vectorized content-hash column → groupby(hash) keep-first — ONE
  all-to-all over (hash, doc_id) pairs only, never the text;
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

Determinism: all hashing via blake2b/stable numpy; no Python ``hash``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


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


def exact_dedup(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the lowest-id row per exact text: map_batches hash → groupby
    keep-first. Returns a Dataset of the surviving rows' ids + hash."""
    hashed = docs_ds.map_batches(add_text_hash, batch_format="pandas")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="stable").iloc[:1]

    return (
        hashed.select_columns([id_col, "text_hash"])
        .groupby("text_hash")
        .map_groups(keep_first, batch_format="pandas")
    )


# ------------------------------------------------------------------ MinHash


def _shingles(text: str, k: int = 5) -> np.ndarray:
    t = " ".join(text.lower().split())
    if len(t) < k:
        return np.array([_h64(t.encode())], dtype=np.uint64)
    return np.unique(
        np.fromiter(
            (_h64(t[i: i + k].encode()) for i in range(len(t) - k + 1)),
            dtype=np.uint64,
            count=len(t) - k + 1,
        )
    )


_MERSENNE = np.uint64((1 << 61) - 1)


class MinHashStage:
    """Per-batch MinHash signatures (n_perm universal-hash permutations,
    vectorized). Permutation coefficients are built once per actor from a
    fixed seed."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=n_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=n_perm).astype(np.uint64)
        self.k = shingle_k
        self.n_perm = n_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k) & _MERSENNE
        # (n_perm, n_shingles) universal hashing, min over shingles
        v = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return v.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"]])
        out = batch[["doc_id"]].copy()
        out["minhash"] = list(sigs)
        return out


def minhash_lsh_bands(sig_df: pd.DataFrame, n_bands: int = 16) -> pd.DataFrame:
    """Explode signatures to (doc_id, band, band_hash) rows for the LSH
    bucket groupby."""
    rows_id, rows_band, rows_hash = [], [], []
    for doc_id, sig in zip(sig_df["doc_id"], sig_df["minhash"]):
        sig = np.asarray(sig, dtype=np.uint64)
        r = len(sig) // n_bands
        for b in range(n_bands):
            band = sig[b * r: (b + 1) * r]
            rows_id.append(doc_id)
            rows_band.append(b)
            rows_hash.append(_h64(band.tobytes()))
    return pd.DataFrame(
        {"doc_id": rows_id, "band": rows_band,
         "band_hash": np.asarray(rows_hash, dtype=np.uint64)}
    )


_PAIR_EMPTY = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                            "b": pd.Series([], dtype="int64")})


def minhash_dedup(docs_ds, n_perm: int = 64, n_bands: int = 16,
                  jaccard_threshold: float = 0.8):
    """Full MinHash-LSH near-dup pipeline. Returns a pandas DataFrame
    (doc_id, cluster) for every input doc; cluster = min doc_id of its
    near-dup group. Candidate pairs are verified with real signature
    Jaccard before clustering.

    Scale shape — every stage is distributed except the union-find:
    signatures are computed ONCE (materialized intermediate, spillable);
    band explode → candidate pairs; signatures attach to pair sides via
    two keyed shuffles (Ray Data has no join — union + groupby IS the
    repartition join); signature-Jaccard verification is vectorized numpy.
    Every shuffle keys on a COARSE hash partition (``n_parts`` groups ≈
    a few per core, each key mapping to exactly one part), never on the
    raw bucket/doc/pair key — ``map_groups`` over millions of tiny groups
    pays Python overhead per key, the thing that cannot fly at 10^9 docs;
    inside a part everything is a vectorized pandas groupby/merge. Only
    the VERIFIED edge list (tiny in the LSH regime) and the
    (doc_id, cluster) product reach the driver.
    """
    import ray as _ray

    n_parts = max(64, int(_ray.cluster_resources().get("CPU", 8)) * 8) \
        if _ray.is_initialized() else 64
    sigs = docs_ds.map_batches(
        MinHashStage, fn_constructor_kwargs={"n_perm": n_perm},
        batch_format="pandas", batch_size=1024, concurrency=(1, 4),
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
        # only buckets with ≥2 docs can make pairs — filter vectorized
        counts = g.groupby(["band", "band_hash"])["doc_id"].transform("size")
        g = g[counts >= 2]
        if g.empty:
            return _PAIR_EMPTY
        out_a, out_b = [], []
        for _, gg in g.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(gg["doc_id"].to_numpy())
            a, b = np.meshgrid(ids, ids)
            m = a < b
            out_a.append(a[m])
            out_b.append(b[m])
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)}).drop_duplicates()

    pairs = (
        sigs.map_batches(bands_with_part, batch_format="pandas")
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pandas")
    )

    # ---- repartition join: signatures onto pair SIDES (part = key % n) --
    _zero_sig = np.zeros(0, dtype=np.uint64)

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "part": (df["doc_id"].to_numpy() % n_parts).astype("int64"),
            "key": df["doc_id"], "a": np.int64(-1), "b": np.int64(-1),
            "sig_a": [_zero_sig] * len(df), "sig": list(df["minhash"]),
        })

    def key_by_a(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "part": (df["a"].to_numpy() % n_parts).astype("int64"),
            "key": df["a"], "a": df["a"], "b": df["b"],
            "sig_a": [_zero_sig] * len(df), "sig": [_zero_sig] * len(df),
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
            "sig_a": list(attached), "sig": [_zero_sig] * len(need),
        })

    def attach_b_and_verify(g: pd.DataFrame) -> pd.DataFrame:
        sig = g[g["a"] < 0]
        need = g[g["a"] >= 0]
        if sig.empty or need.empty:
            return _PAIR_EMPTY
        sig_of = dict(zip(sig["key"], sig["sig"]))
        sb = np.stack([np.asarray(sig_of[k], dtype=np.uint64)
                       for k in need["key"]])
        sa = np.stack([np.asarray(s, dtype=np.uint64) for s in need["sig_a"]])
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
    # greedy min-label union-find over the (small) verified pair graph
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(edges["a"], edges["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    all_ids = np.sort(
        sigs.select_columns(["doc_id"]).to_pandas()["doc_id"].to_numpy())
    return pd.DataFrame(
        {"doc_id": all_ids, "cluster": [find(int(i)) for i in all_ids]}
    ).reset_index(drop=True)


# ------------------------------------------------------------------ SimHash


class SimHashStage:
    """64-bit SimHash over word-token hashes (Charikar 2002)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        sims = []
        for text in batch["text"]:
            toks = text.lower().split()
            if not toks:
                sims.append(0)
                continue
            hs = np.fromiter((_h64(t.encode()) for t in toks),
                             dtype=np.uint64, count=len(toks))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            score = bits.sum(axis=0) * 2 - len(hs)  # +1/-1 votes per bit
            v = np.uint64(0)
            for bitpos in np.nonzero(score > 0)[0]:
                v |= np.uint64(1) << np.uint64(bitpos)
            sims.append(int(v))
        out["simhash"] = np.asarray(sims, dtype=np.uint64)
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
    edges and the (doc_id, cluster) product reach the driver. Returns a
    DataFrame (doc_id, simhash, cluster), cluster = min doc_id of the
    connected near-dup component."""
    assert 64 % n_bands == 0
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    sims = docs_ds.map_batches(SimHashStage, batch_format="pandas",
                               batch_size=1024, concurrency=(1, 4)).materialize()

    import ray as _ray

    n_parts = max(64, int(_ray.cluster_resources().get("CPU", 8)) * 8) \
        if _ray.is_initialized() else 64

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
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(edges["a"], edges["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    pdf = sims.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pdf["cluster"] = [find(int(i)) for i in pdf["doc_id"]]
    return pdf


# -------------------------------------------------------------- n-gram Jaccard


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = {a[i: i + k] for i in range(max(1, len(a) - k + 1))}
    sb = {b[i: i + k] for i in range(max(1, len(b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


# ---------------------------------------------------------- embedding cosine


def embedding_near_dup(emb_ds, threshold: float = 0.95):
    """Embedding-cosine near-dup: normalized matmul per batch against the
    full (broadcast) matrix — exact at sandbox scale; the IVF-bucketed
    variant in ops/ann.py is the 10^9-row path. Returns (vec_id, dup_of)
    for rows whose nearest other row exceeds *threshold*."""
    import ray

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


def embedding_nn_lsh(emb_ds, threshold: float = 0.0, n_planes: int = 8,
                     max_hamming: int = 1, seed: int = 11):
    """LSH nearest-neighbor join — the scale path for "every vector reports
    its closest other vector" (the broadcast-matrix :func:`embedding_near_dup`
    is the small-N verifier).

    Index-side multi-probe: each row is replicated into its own bucket plus
    every bucket within *max_hamming* bit flips (``(1+n_planes)``× row
    blowup at hamming≤1 — the standard multi-probe recall/cost trade).
    ``groupby("bucket")`` shuffles ONCE; each group emits per-vector local
    best-neighbor partials (vec_id, dup_of, sim); a second slim groupby
    keeps the global max per vec_id. No driver materialization, no
    broadcast of the data matrix. Returns rows with sim ≥ *threshold*."""
    import ray as _ray

    from zeno_ray.ops.ann import _normalize, probe_signatures

    rng = np.random.RandomState(seed)
    first = emb_ds.take(1)[0]["embedding"]
    planes = rng.normal(size=(n_planes, len(first)))
    planes_ref = _ray.put(planes)

    class _MultiProbeBucket:
        def __init__(self, planes_ref):
            self.planes = _ray.get(planes_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = _normalize(
                np.stack(batch["embedding"].to_numpy()).astype(np.float64))
            bits = (mat @ self.planes.T) > 0
            sigs = bits.dot(1 << np.arange(bits.shape[1], dtype=np.uint64))
            ids, bkts, embs = [], [], []
            emb_np = batch["embedding"].to_numpy()
            for i, sig in enumerate(int(s) for s in sigs):
                for s_ in probe_signatures(sig, n_planes, max_hamming):
                    ids.append(batch["vec_id"].iloc[i])
                    bkts.append(s_)
                    embs.append(emb_np[i])
            return pd.DataFrame({
                "vec_id": ids,
                "bucket": np.asarray(bkts, dtype=np.uint64),
                "embedding": embs,
            })

    bucketed = emb_ds.map_batches(
        _MultiProbeBucket, fn_constructor_kwargs={"planes_ref": planes_ref},
        batch_format="pandas", batch_size=4096, concurrency=(1, 4),
    )

    empty = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                          "dup_of": pd.Series([], dtype="int64"),
                          "sim": pd.Series([], dtype="float64")})

    def local_best(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty
        mat = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        sims = mat @ mat.T
        ids = g["vec_id"].to_numpy()
        same = ids[:, None] == ids[None, :]  # replicas of one vector
        sims[same] = -np.inf
        best = np.argmax(sims, axis=1)
        best_sim = sims[np.arange(len(ids)), best]
        ok = np.isfinite(best_sim)
        return pd.DataFrame({"vec_id": ids[ok], "dup_of": ids[best][ok],
                             "sim": best_sim[ok]})

    def global_best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "dup_of"], ascending=[False, True],
                          kind="stable")
        return g.iloc[:1]

    out = (
        bucketed.groupby("bucket")
        .map_groups(local_best, batch_format="pandas")
        .groupby("vec_id")
        .map_groups(global_best, batch_format="pandas")
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
