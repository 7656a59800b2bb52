"""Similarity search over the ``embeddings`` table (list<float> column).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  normalized once, ``ray.put`` broadcast, and each batch does one numpy
  matmul against it. The baseline and the oracle-checkable path.
- :func:`lsh_topk` — random-hyperplane LSH bucketing: probe only buckets
  matching the query signature (multi-probe by hamming distance), the
  10^9-row scale path; recall/probe tradeoff documented in the docstring.
- :func:`ivf_topk` — IVF (inverted-file) index: k-means coarse quantizer
  trained on a bounded sample, rows partitioned by nearest centroid in a
  single keyed shuffle, queries probe only their ``nprobe`` nearest
  lists. The data-adaptive scale path (LSH's data-oblivious counterpart).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)


class _BruteScore:
    def __init__(self, q_ref):
        self.q = ray.get(q_ref)  # (n_q, d) normalized, float64

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = mat @ self.q.T  # (rows, n_q)
        out = []
        for qi in range(self.q.shape[0]):
            out.append(pd.DataFrame({
                "q": qi,
                "vec_id": batch["vec_id"].to_numpy(),
                "sim": sims[:, qi],
            }))
        return pd.concat(out, ignore_index=True)


def brute_force_topk(emb_ds, queries: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k of each query row against the dataset.

    Per-batch partial scoring streams; only (q, vec_id, sim) triples move,
    and the final top-k is a sort+limit over per-batch prunes (each batch
    keeps its local top-k per query first — the partial-aggregate
    pattern)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["q", "sim"], ascending=[True, False], kind="stable")
            .groupby("q", sort=False)
            .head(k)
        )

    scored = emb_ds.map_batches(
        _BruteScore, fn_constructor_kwargs={"q_ref": q_ref},
        batch_format="pandas", batch_size=4096, concurrency=(1, 4),
    ).map_batches(local_topk, batch_format="pandas")
    pdf = scored.to_pandas()
    out = (
        pdf.sort_values(["q", "sim", "vec_id"], ascending=[True, False, True],
                        kind="stable")
        .groupby("q", sort=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["sim"] = out["sim"].round(6)
    return out


def probe_signatures(sig: int, n_planes: int, max_hamming: int) -> list[int]:
    """All signatures within *max_hamming* bit flips of *sig* — the
    multi-probe expansion set, in deterministic order (radius-major,
    lexicographic bit combinations within each radius)."""
    from itertools import combinations

    out = [sig]
    for r in range(1, max_hamming + 1):
        for bits in combinations(range(n_planes), r):
            flip = 0
            for b in bits:
                flip |= 1 << b
            out.append(sig ^ flip)
    return out


def directed_probes(sig: int, margins: np.ndarray, n_probes: int,
                    max_flips: int = 4, pool: int = 14) -> list[int]:
    """Query-directed multi-probe (the Lv et al. 2007 idea, public
    algorithm): rank candidate buckets by the COST of reaching them —
    the sum of |query·plane| margins over the flipped planes — and take
    the *n_probes* cheapest. A bucket that differs only in planes the
    query sits right on top of is almost as likely to hold neighbors as
    the home bucket, so this finds far more neighbors per probed bucket
    than a blind hamming ball. Deterministic: ties break on the flip
    mask. Candidate flips are capped at *max_flips* bits over the *pool*
    cheapest planes (C(14,4)+C(14,3)+... ≈ 1.5k scored candidates per
    query — driver-side, negligible)."""
    from itertools import combinations

    a = np.abs(np.asarray(margins, dtype=np.float64))
    order = np.argsort(a, kind="stable")[:min(len(a), pool)]
    cand: list[tuple[float, int]] = [(0.0, 0)]
    for r in range(1, max_flips + 1):
        for bits in combinations(order.tolist(), r):
            cand.append((float(a[list(bits)].sum()),
                         int(sum(1 << int(b) for b in bits))))
    cand.sort(key=lambda t: (t[0], t[1]))
    return [sig ^ m for _, m in cand[:n_probes]]


class _LshBucket:
    def __init__(self, planes_ref):
        self.planes = ray.get(planes_ref)  # (n_planes, d)

    def signature(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes.T) > 0  # (rows, n_planes)
        return bits.dot(1 << np.arange(bits.shape[1], dtype=np.uint64))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        out = batch[["vec_id"]].copy()
        out["bucket"] = self.signature(mat).astype(np.uint64)
        out["embedding"] = batch["embedding"].to_numpy()
        return out


def lsh_topk(emb_ds, queries: np.ndarray, k: int = 10, n_planes: int = 8,
             max_hamming: int = 1, seed: int = 11,
             probes: int | None = None, max_flips: int = 4,
             return_stats: bool = False) -> pd.DataFrame:
    """Approximate cosine top-k: random-hyperplane signatures partition the
    rows into 2^n_planes buckets; each query scans only a probe set of
    buckets. Exactness on ties is not guaranteed — that is the point;
    recall rises with probes.

    Probe selection: with ``probes=T`` set, QUERY-DIRECTED multi-probe —
    the T buckets cheapest to reach by flipping the query's
    smallest-margin planes (see :func:`directed_probes`); measured on the
    driver corpus this reaches the same recall as a hamming ball while
    scanning fewer rows, and on clustered embeddings recall ≥0.9 at
    ≤10% of rows probed (test_lsh_topk_directed_clustered). With
    ``probes=None``, the legacy blind ball: all buckets within
    *max_hamming* of the query signature.

    Scale shape: the DATASET is never materialized — rows shuffle once by
    bucket (``groupby("bucket")``), each bucket group scores only the
    queries probing it (the tiny bucket→queries probe map and the
    normalized query matrix are ``ray.put`` broadcast), emitting local
    per-query top-k partials. Only ≤ n_q × probes × k slim rows reach
    the driver for the final top-k reduce.

    ``return_stats=True`` returns ``(result, stats)`` where stats holds
    ``probed_fraction`` — scored rows / dataset rows (mean over queries)
    — the honesty metric for how approximate the run actually was."""
    d = np.asarray(queries).shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, d))
    planes_ref = ray.put(planes)

    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_marg = q @ planes.T
    q_sig = (q_marg > 0).dot(1 << np.arange(n_planes, dtype=np.uint64))
    probe_map: dict[int, list[int]] = {}
    for qi, sig in enumerate(int(s) for s in q_sig):
        if probes is not None:
            sigs = directed_probes(sig, q_marg[qi], probes, max_flips)
        else:
            sigs = probe_signatures(sig, n_planes, max_hamming)
        for s_ in sigs:
            probe_map.setdefault(s_, []).append(qi)
    probe_ref = ray.put((probe_map, q))

    bucketed = emb_ds.map_batches(
        _LshBucket, fn_constructor_kwargs={"planes_ref": planes_ref},
        batch_format="pandas", batch_size=4096, concurrency=(1, 4),
    )

    empty = pd.DataFrame({"q": pd.Series([], dtype="int64"),
                          "vec_id": pd.Series([], dtype="int64"),
                          "sim": pd.Series([], dtype="float64"),
                          "bucket": pd.Series([], dtype="uint64"),
                          "brows": pd.Series([], dtype="int64")})

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pmap, qmat = ray.get(probe_ref)
        bkt = int(g["bucket"].iloc[0])
        qis = pmap.get(bkt, [])
        if not qis:
            return empty
        mat = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        sims = mat @ qmat[qis].T  # (rows, n_probing_queries)
        ids = g["vec_id"].to_numpy()
        frames = []
        for col, qi in enumerate(qis):
            top = np.argsort(-sims[:, col], kind="stable")[:k]
            frames.append(pd.DataFrame({
                "q": qi, "vec_id": ids[top], "sim": sims[top, col],
                "bucket": np.uint64(bkt), "brows": np.int64(len(g))}))
        return pd.concat(frames, ignore_index=True)

    partials = (
        bucketed.groupby("bucket")
        .map_groups(score_bucket, batch_format="pandas")
        .to_pandas()  # ≤ n_q × probes × k rows — the reduced result
    )
    if partials.empty:
        res = empty[["q", "vec_id", "sim"]]
        return (res, {"probed_fraction": 0.0}) if return_stats else res
    out = (
        partials.sort_values(["q", "sim", "vec_id"],
                             ascending=[True, False, True], kind="stable")
        .groupby("q", sort=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["sim"] = out["sim"].round(6)
    res = out[["q", "vec_id", "sim"]]
    if not return_stats:
        return res
    # rows scored per query (each probed non-empty bucket counted once),
    # averaged over queries, over the dataset row count
    total = max(1, emb_ds.count())
    per_q = (partials.drop_duplicates(["q", "bucket"])
             .groupby("q")["brows"].sum())
    n_q = len(q)
    stats = {"probed_fraction": float(per_q.sum() / (n_q * total)),
             "n_planes": n_planes,
             "probes": probes if probes is not None else -1}
    return res, stats


# ------------------------------------------------------------------- IVF


def kmeans_fit(sample: np.ndarray, n_lists: int, n_iter: int = 10,
               seed: int = 13) -> np.ndarray:
    """Spherical k-means on a (normalized) sample — the IVF coarse
    quantizer. Deterministic (seeded init), numpy-only, runs driver-side
    on a BOUNDED sample (the standard IVF training regime: train on
    ~100×n_lists vectors regardless of corpus size)."""
    rng = np.random.RandomState(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    n = len(x)
    cents = x[rng.choice(n, size=min(n_lists, n), replace=False)].copy()
    for _ in range(n_iter):
        assign = (x @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(emb_ds, queries: np.ndarray, k: int = 10, n_lists: int = 16,
             nprobe: int = 4, train_sample: int = 2048,
             seed: int = 13) -> pd.DataFrame:
    """Approximate cosine top-k via an IVF index, Ray-Data-shaped:

    1. train: spherical k-means on a bounded ``train_sample`` (driver,
       numpy) — centroids are tiny and ``ray.put`` broadcast;
    2. assign: one ``map_batches`` pass tags each row with its nearest
       centroid (one matmul per batch);
    3. probe: each query scores only its ``nprobe`` nearest lists —
       ``groupby("list")`` co-locates each list ONCE, each group scores
       the queries probing it (tiny probe map broadcast) and emits local
       top-k partials; the driver reduces ≤ n_q × nprobe × k slim rows.

    The dataset is never materialized; recall rises with nprobe
    (nprobe = n_lists ⇒ exact up to ties)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    sample = emb_ds.limit(train_sample).to_pandas()  # bounded by design
    cents = kmeans_fit(np.stack(sample["embedding"].to_numpy()),
                       n_lists, seed=seed)
    cents_ref = ray.put(cents)

    probe_lists = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    probe_map: dict[int, list[int]] = {}
    for qi, lists in enumerate(probe_lists):
        for li in lists:
            probe_map.setdefault(int(li), []).append(qi)
    probe_ref = ray.put((probe_map, q))

    class _Assign:
        def __init__(self, cents_ref):
            self.cents = ray.get(cents_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = _normalize(
                np.stack(batch["embedding"].to_numpy()).astype(np.float64))
            out = batch[["vec_id", "embedding"]].copy()
            out["list"] = (mat @ self.cents.T).argmax(axis=1).astype("int64")
            return out

    assigned = emb_ds.map_batches(
        _Assign, fn_constructor_kwargs={"cents_ref": cents_ref},
        batch_format="pandas", batch_size=4096, concurrency=(1, 4),
    )

    empty = pd.DataFrame({"q": pd.Series([], dtype="int64"),
                          "vec_id": pd.Series([], dtype="int64"),
                          "sim": pd.Series([], dtype="float64")})

    def score_list(g: pd.DataFrame) -> pd.DataFrame:
        pmap, qmat = ray.get(probe_ref)
        qis = pmap.get(int(g["list"].iloc[0]), [])
        if not qis:
            return empty
        mat = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        sims = mat @ qmat[qis].T
        ids = g["vec_id"].to_numpy()
        frames = []
        for col, qi in enumerate(qis):
            top = np.argsort(-sims[:, col], kind="stable")[:k]
            frames.append(pd.DataFrame({
                "q": qi, "vec_id": ids[top], "sim": sims[top, col]}))
        return pd.concat(frames, ignore_index=True)

    partials = (
        assigned.groupby("list")
        .map_groups(score_list, batch_format="pandas")
        .to_pandas()  # ≤ n_q × nprobe × k rows — the reduced result
    )
    if partials.empty:
        return empty
    out = (
        partials.sort_values(["q", "sim", "vec_id"],
                             ascending=[True, False, True], kind="stable")
        .groupby("q", sort=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["sim"] = out["sim"].round(6)
    return out


def kmeans_assign(emb_ds, n_clusters: int = 16, train_sample: int = 2048,
                  seed: int = 13):
    """Spherical k-means cluster assignment over the embedding column —
    the clustering counterpart of :func:`ivf_topk`'s index build,
    exposed as a first-class op: train on a bounded file-order sample
    (driver numpy, deterministic), ``ray.put`` the tiny centroid
    matrix, assign every row in one broadcast ``map_batches`` pass (one
    matmul per batch, no shuffle). Returns a Dataset (vec_id, cluster).

    Deterministic end-to-end (seeded init, fixed sample order), so the
    python oracle re-runs it sequentially and matches exactly."""
    sample = emb_ds.limit(train_sample).to_pandas()
    cents = kmeans_fit(np.stack(sample["embedding"].to_numpy()),
                       n_clusters, seed=seed)
    cents_ref = ray.put(cents)

    class _Assign:
        def __init__(self, ref):
            self.cents = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = _normalize(
                np.stack(batch["embedding"].to_numpy()).astype(np.float64))
            return pd.DataFrame({
                "vec_id": batch["vec_id"].astype("int64"),
                "cluster": (mat @ self.cents.T).argmax(axis=1)
                .astype("int64")})

    return emb_ds.map_batches(
        _Assign, fn_constructor_kwargs={"ref": cents_ref},
        batch_format="pandas", batch_size=4096, concurrency=(1, 4))


def label_centroids(emb_ds) -> pd.DataFrame:
    """Vector aggregate: per-label embedding sum/count (the centroid
    numerator/denominator), one (label, dim) row per component.

    The per-batch combiner does ONE numpy matmul-free reduction per
    label (stack → groupby-sum over the matrix rows), emitting
    labels×dims slim partial rows per block; the driver merge is tiny
    for bounded label sets (swap for groupby(label, dim).aggregate at
    10^6+ labels — the partial stage is unchanged). SQL-oracle-checked
    via unnest + generate_subscripts per component."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for lab, g in df.groupby("label", sort=False):
            mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
            frames.append(pd.DataFrame({
                "label": int(lab),
                "dim": np.arange(1, mat.shape[1] + 1, dtype=np.int64),
                "sum_val": mat.sum(axis=0),
                "n": np.int64(len(g))}))
        if not frames:
            return pd.DataFrame({"label": pd.Series([], dtype="int64"),
                                 "dim": pd.Series([], dtype="int64"),
                                 "sum_val": pd.Series([], dtype="float64"),
                                 "n": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    pdf = emb_ds.map_batches(partial, batch_format="pandas",
                             batch_size=4096).to_pandas()
    out = pdf.groupby(["label", "dim"], as_index=False).agg(
        sum_val=("sum_val", "sum"), n=("n", "sum"))
    out["sum_val"] = out["sum_val"].round(4)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["label", "dim"]).reset_index(drop=True)
