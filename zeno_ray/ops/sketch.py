"""Mergeable sketches for cardinality at scale.

HyperLogLog distinct counting: the canonical 100-TB answer to
``COUNT(DISTINCT x)`` — exact distinct needs a full shuffle of every
value; HLL moves one 2^p-byte register blob per (batch, group) partial
through the shuffle instead, merges by elementwise max (associative,
commutative, idempotent — order-independent, so the distributed result
is bit-identical to a sequential run), and estimates with the standard
bias-corrected formula (Flajolet et al. 2007, public algorithm).

Determinism: the value hash is a fixed function (murmur64 finalizer
for integers — bit-identical to DuckDB's ``hash(BIGINT)``, so the
estimate is reproducible in plain SQL; ``pd.util.hash_array`` for other
dtypes), so the register contents — and therefore the estimate — are a
pure function of the value SET. A sequential re-execution must
reproduce the estimate EXACTLY, and a semantic check bounds the
estimate against the true distinct count (theoretical relative error
~1.04/sqrt(2^p); p=12 → ~1.6%).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def _hash64(values: np.ndarray) -> np.ndarray:
    """64-bit value hash for the register build. Integer inputs use the
    murmur64 finalizer — bit-identical to DuckDB 1.0's ``hash(BIGINT)``
    (duckdb src: common/types/hash.hpp murmurhash64), which makes the
    whole sketch SQL-reproducible (see oracle_sql['events_distinct_users']).
    Other dtypes fall back to pd.util.hash_array (fixed key, still
    deterministic, just not oracle-expressible)."""
    arr = np.asarray(values)
    if np.issubdtype(arr.dtype, np.integer):
        x = arr.astype(np.uint64)
        x = x ^ (x >> np.uint64(32))
        x = x * np.uint64(0xD6E8FEB86659FD93)
        x = x ^ (x >> np.uint64(32))
        x = x * np.uint64(0xD6E8FEB86659FD93)
        x = x ^ (x >> np.uint64(32))
        return x
    return pd.util.hash_array(arr)


def _registers(values: np.ndarray, p: int) -> np.ndarray:
    """Vectorized register build for one group: hash → top-p bits pick
    the register, rank-of-first-one-bit of the rest is the candidate."""
    m = 1 << p
    h = _hash64(values)  # uint64, fixed function → deterministic
    reg_idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # rho = (64-p) - floor(log2(w)) for w>0 else 64-p+1; w < 2^52 so
    # float64 log2 is exact enough at p >= 12. log2 only over the w>0
    # mask — np.where evaluates both arms eagerly and log2(0) would emit
    # divide-by-zero warnings (and cast -inf to int, which is undefined)
    rho = np.full(len(w), 64 - p + 1, dtype=np.uint8)
    nz = w > 0
    rho[nz] = (
        (64 - p)
        - np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64)
    ).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, reg_idx, rho)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)  # linear counting small range
    return float(est)


def hll_distinct(ds, group_col: str, value_col: str, p: int = 12):
    """Per-group approximate distinct count of ``value_col``.

    Returns a Dataset (group_col, distinct_est: float64). Shuffle
    traffic is one 2^p-byte blob per (batch, group) partial — data
    rows never move.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for gval, gg in df.groupby(group_col, sort=False):
            rows.append((gval,
                         _registers(gg[value_col].to_numpy(), p).tobytes()))
        return pd.DataFrame(rows, columns=[group_col, "regs"])

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(1 << p, dtype=np.uint8)
        for blob in g["regs"]:
            np.maximum(acc, np.frombuffer(blob, np.uint8), out=acc)
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "distinct_est": [_estimate(acc)]})

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=32768)
        .groupby(group_col)
        .map_groups(merge_group, batch_format="pandas")
    )


def hll_distinct_sequential(values_by_group: dict, p: int = 12) -> dict:
    """Driver-side reference (the python oracle): same registers, same
    estimate — must match the distributed result exactly."""
    return {g: _estimate(_registers(np.asarray(v), p))
            for g, v in values_by_group.items()}


# ---------------------------------------------------- count-min sketch

_CMS_ROW_SALT = np.array([
    0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
    0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D], dtype=np.uint64)


def _cms_indices(h: np.ndarray, d: int, width: int) -> np.ndarray:
    """Row-d bucket index per value hash — an independent-per-row mix of
    the shared 64-bit value hash (odd-salt multiply + xor-shift), mod
    width. Pure function ⇒ the sketch is batching-order independent."""
    x = h * _CMS_ROW_SALT[d % len(_CMS_ROW_SALT)]
    x = x ^ (x >> np.uint64(29))
    return (x % np.uint64(width)).astype(np.int64)


def _cms_build(values: np.ndarray, width: int, depth: int) -> np.ndarray:
    """depth×width uint64 count matrix for one value array (with
    multiplicity — this sketches COUNTS, not distincts)."""
    sk = np.zeros((depth, width), dtype=np.uint64)
    h = _hash64(values)
    for d in range(depth):
        np.add.at(sk[d], _cms_indices(h, d, width), 1)
    return sk


def _cms_query(sk: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Point estimates (min over rows) for each value — always ≥ the
    true count (one-sided error ≤ e·N/width w.p. 1-e^-depth)."""
    h = _hash64(values)
    est = np.full(len(values), np.iinfo(np.int64).max, dtype=np.uint64)
    for d in range(sk.shape[0]):
        np.minimum(est, sk[d][_cms_indices(h, d, sk.shape[1])], out=est)
    return est.astype(np.int64)


def count_min_heavy_hitters(ds, col: str, k: int = 20, width: int = 2048,
                            depth: int = 4, candidate_factor: int = 4):
    """Approximate top-k most frequent values ("heavy hitters") of *col*
    — the hot-key / frequent-URL / dominant-template detector a webtext
    pipeline runs before salting or down-sampling. The 100-TB shape:

    - each batch emits ONE depth×width uint64 Count-Min blob (Cormode &
      Muthukrishnan 2005) plus its local top-``candidate_factor·k``
      values with exact local counts — data rows never move;
    - blobs merge by elementwise SUM (associative + commutative ⇒ the
      merged sketch is bit-identical to a sequential build, independent
      of batching); the local top lists only NOMINATE candidates;
    - each candidate's reported count is its merged-CMS point query
      (min over depth rows) — always ≥ its true global count, with
      equality unless the value collides in all ``depth`` rows (error
      ≤ e·N/width per row, Cormode & Muthukrishnan 2005). Ranking is
      purely CMS-based: the summed local counts are a LOWER bound on
      the true count and can undercount (a batch where the value missed
      the local list contributes 0), so they are never reported.

    Driver traffic: batches × (1 blob + 4k candidate rows). A true
    top-k value can be missing from the result only if it missed the
    local top-4k list in EVERY batch it appears in — candidates are
    drawn solely from the local lists; the sketch re-scores nominees,
    it cannot resurrect a value no list nominated. With
    ``candidate_factor·k`` local slots, that requires ≥ 4k distinct
    values each locally more frequent than it in every single batch.

    Returns a pandas DataFrame (value, est_count) of the top-k by
    (est_count desc, value asc), deterministic."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[col].to_numpy()
        sk = _cms_build(vals, width, depth)
        vc = pd.Series(vals).value_counts().head(candidate_factor * k)
        return pd.DataFrame({
            "blob": [sk.tobytes()],
            "cand_vals": [vc.index.to_numpy()],
            "cand_counts": [vc.to_numpy().astype(np.int64)],
        })

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    if parts.empty:
        return pd.DataFrame({col: [], "est_count": pd.Series([], dtype="int64")})
    sk = np.zeros((depth, width), dtype=np.uint64)
    for blob in parts["blob"]:
        sk += np.frombuffer(blob, np.uint64).reshape(depth, width)
    cand = pd.DataFrame({
        "value": np.concatenate(parts["cand_vals"].to_list()),
        "n": np.concatenate(parts["cand_counts"].to_list()),
    }).groupby("value", sort=False, as_index=False)["n"].sum()
    # CMS point query ≥ true count ≥ summed local counts, so the CMS
    # estimate alone decides the ranking (the old max() with the local
    # sums was dead code — ADVICE r4)
    cand["est_count"] = _cms_query(sk, cand["value"].to_numpy())
    out = cand.sort_values(["est_count", "value"],
                           ascending=[False, True], kind="stable").head(k)
    return pd.DataFrame({col: out["value"].to_numpy(),
                         "est_count": out["est_count"].astype("int64")}) \
        .reset_index(drop=True)


def count_min_sequential(values: np.ndarray, k: int, width: int = 2048,
                         depth: int = 4) -> pd.DataFrame:
    """Driver-side reference: exact counts ranked, with the same
    tie-break — the semantic oracle for the distributed sketch."""
    vc = pd.Series(values).value_counts()
    df = pd.DataFrame({"value": vc.index.to_numpy(),
                       "n": vc.to_numpy().astype(np.int64)})
    return df.sort_values(["n", "value"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
