"""Similarity search over the ``embeddings`` table (list<float> column).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  normalized once, ``ray.put`` broadcast, and each batch does one numpy
  matmul against it. The baseline and the oracle-checkable path.
- :func:`lsh_topk` — random-hyperplane LSH bucketing: probe only buckets
  matching the query signature (multi-probe by hamming distance), the
  10^9-row scale path; recall/probe tradeoff documented in the docstring.
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
        batch_format="pandas", batch_size=4096, concurrency=4,
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
             max_hamming: int = 1, seed: int = 11) -> pd.DataFrame:
    """Approximate cosine top-k: random-hyperplane signatures partition the
    rows into 2^n_planes buckets; each query scans only buckets within
    *max_hamming* of its own signature (n_planes=8, hamming≤1 ⇒ 9/256 of
    the data per query in expectation). Exactness on ties is not
    guaranteed — that is the point; recall rises with probes."""
    d = np.asarray(queries).shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, d))
    planes_ref = ray.put(planes)

    bucketed = emb_ds.map_batches(
        _LshBucket, fn_constructor_kwargs={"planes_ref": planes_ref},
        batch_format="pandas", batch_size=4096, concurrency=4,
    ).to_pandas()

    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_sig = ((q @ planes.T) > 0).dot(1 << np.arange(n_planes, dtype=np.uint64))
    groups = {b: g for b, g in bucketed.groupby("bucket")}

    def probes(sig: int):
        yield sig
        if max_hamming >= 1:
            for b in range(n_planes):
                yield sig ^ (1 << b)

    frames = []
    for qi in range(q.shape[0]):
        cands = [groups[p] for p in probes(int(q_sig[qi])) if p in groups]
        if not cands:
            continue
        cand = pd.concat(cands, ignore_index=True)
        mat = _normalize(np.stack(cand["embedding"].to_numpy()).astype(np.float64))
        sims = mat @ q[qi]
        top = np.argsort(-sims)[:k]
        frames.append(pd.DataFrame({
            "q": qi,
            "vec_id": cand["vec_id"].to_numpy()[top],
            "sim": np.round(sims[top], 6),
        }))
    return pd.concat(frames, ignore_index=True)
