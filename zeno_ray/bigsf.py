"""Deterministic large-scale synthetic driver tables.

`/root/testdata/sf*` tops out at sf0.1 (5 k documents / 2 k embeddings /
100 k events) — far below where 128 GiB memory ceilings or shuffle
non-linearities would show. This module synthesizes the SAME table
shapes (TESTDATA.md schemas: `documents`, `embeddings`, `events`) at
arbitrary row counts, fully deterministically (counter-based Philox
streams keyed by (seed, table, part) — independent of scheduling order
and part count parallelism), so `bench.py --bigsf` can measure the heavy
operators at 10-100x the driver benchmark scale. No external data.

Unlike the testdata documents (adversarially template-heavy: a ~40-word
vocabulary, so near-dup candidate filters barely prune), the documents
here are NATURAL-DIVERSITY: a Heaps'-law-sized Zipf vocabulary of
full-alphabet words plus an ~8% per-token hapax identifier tail — the
regime the adaptive `ngram_jaccard_dedup` legacy branch and the BASELINE
"near-linear pruning on diverse corpora" claim are about.
Controlled duplicate structure is injected so dedup ops have real work:

- exact duplicates:   doc i copies doc i-1 verbatim when i % 173 == 5
- near duplicates:    doc i copies doc i-1 with 3 words replaced when
                      i % 29 == 1 (Jaccard well above 0.8 at these
                      lengths)

Part row counts are a multiple of lcm(29, 173) so a duplicate pair never
straddles a part boundary and generation stays embarrassingly parallel.

Tables are cached under /tmp (version-stamped; wiped and regenerated on
any parameter or generator change).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BIGSF_VERSION = 5

_LANGS = ["en", "de", "fr", "es", "it", "pt", "nl", "ru", "zh", "ja"]

_DOC_PART_ROWS = 4 * 29 * 173          # 20,068 — lcm-aligned (see above)
_VEC_PART_ROWS = 50_000
_EVT_PART_ROWS = 250_000


def _vocab(n: int = 30000) -> np.ndarray:
    """Deterministic synthetic word list: random 4-12-letter words plus
    numeric tokens (fixed Philox key — independent of the table seed),
    sized by the caller per Heaps' law so the character-5-gram space
    stays realistically large (long-tailed df) at any corpus scale."""
    rng = np.random.Generator(np.random.Philox(key=[1234567, 7654321]))
    n_words = int(n * 0.94)
    words: list[str] = []
    seen = set()
    # full-alphabet random strings, NOT syllable composites: with a small
    # syllable inventory every word shares its character k-grams with
    # hundreds of other words, so gram-level df is ~100x word-level df
    # and posting lists stay fat no matter how large the word vocabulary
    # grows (measured: Heaps-scaled 89k-word syllable vocab still gave
    # 59M candidate pairs at 200k docs). Random letters make a gram's df
    # track its word's df, which Zipf+Heaps keeps bounded — the property
    # real orthography has and prefix-filtered joins rely on.
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    while len(words) < n_words:
        m = n_words - len(words)
        ls = rng.integers(4, 13, m)
        flat = letters[rng.integers(0, 26, int(ls.sum()))]
        offs = np.concatenate([[0], np.cumsum(ls)])
        for i in range(m):
            w = "".join(flat[offs[i]:offs[i + 1]])
            if w not in seen:
                seen.add(w)
                words.append(w)
    nums = rng.integers(10, 10_000_000, n - n_words)
    words.extend(str(x) for x in nums)
    return np.asarray(words[:n], dtype=object)


def _zipf_weights(n: int) -> np.ndarray:
    # natural-text-like rank-frequency law (Zipf-Mandelbrot, s≈1.07)
    w = 1.0 / np.power(np.arange(1, n + 1) + 2.7, 1.07)
    return w / w.sum()


def _rng(seed: int, table: int, part: int) -> np.random.Generator:
    # Philox array-form key takes exactly 2 uint64 words; pack (table,
    # part) into one word so streams stay independent per (seed, table,
    # part) regardless of scheduling.
    return np.random.Generator(
        np.random.Philox(key=[seed, (table << 40) | part]))


def _gen_docs_part(seed: int, part: int, start: int, n: int,
                   vocab: np.ndarray, weights: np.ndarray) -> pa.Table:
    rng = _rng(seed, 1, part)
    lens = rng.integers(50, 151, n)
    flat = rng.choice(len(vocab), int(lens.sum()), p=weights)
    offs = np.concatenate([[0], np.cumsum(lens)])
    words = vocab[flat]
    # Heaps'-law hapax tail: ~8% of tokens are near-unique identifiers
    # (ids, names, numbers — drawn from a 2^60 space, so corpus-wide df
    # ≈ 1). Real web text is ~40-60% singleton word TYPES; without this
    # tail the character-5-gram universe stays combinatorially tiny
    # (~90k grams at 20k docs, mean df ≈ 200) and EVERY prefix-filtered
    # similarity join — not just ours — degenerates to all-pairs. The
    # injected duplicates below copy whole texts, so near-dup pairs
    # share their hapaxes, exactly like real near-duplicate pages.
    hap = rng.random(len(flat)) < 0.08
    words[hap] = [format(x, "x")
                  for x in rng.integers(1 << 40, 1 << 60, int(hap.sum()))]
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n)]

    ids = np.arange(start, start + n, dtype=np.int64)
    # duplicate injection (pairs never straddle parts: start % lcm == 0)
    perturb = rng.choice(len(vocab), 3 * n, p=weights)
    for li in range(n):
        gid = start + li
        if li == 0:
            continue
        if gid % 29 == 1:
            base = texts[li - 1].split(" ")
            repl = perturb[3 * li:3 * li + 3]
            for j in range(min(3, len(base))):
                base[(gid + 7 * j) % len(base)] = vocab[repl[j]]
            texts[li] = " ".join(base)
        elif gid % 173 == 5:
            texts[li] = texts[li - 1]

    langs = np.asarray(_LANGS, dtype=object)[rng.integers(0, 10, n)]
    srcs = np.char.add("src", rng.integers(0, 20, n).astype(str)).astype(object)
    n_chars = np.asarray([len(t) for t in texts], dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(srcs, type=pa.string()),
        "n_chars": pa.array(n_chars),
    })


def _gen_vecs_part(seed: int, part: int, start: int, n: int,
                   dim: int = 64, n_labels: int = 10) -> pa.Table:
    cent = _rng(seed, 200, 0).normal(0.0, 1.0, (n_labels, dim))
    rng = _rng(seed, 2, part)
    ids = np.arange(start, start + n, dtype=np.int64)
    labels = (ids % n_labels).astype(np.int32)
    vecs = (cent[labels] + 0.35 * rng.normal(0.0, 1.0, (n, dim))).astype(
        np.float32)
    offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    emb = pa.ListArray.from_arrays(offsets, pa.array(vecs.ravel(),
                                                     type=pa.float32()))
    return pa.table({"vec_id": pa.array(ids), "embedding": emb,
                     "label": pa.array(labels)})


def _gen_events_part(seed: int, part: int, start: int, n: int,
                     n_users: int) -> pa.Table:
    rng = _rng(seed, 3, part)
    ids = np.arange(start, start + n, dtype=np.int64)
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span = 30 * 86400 * 1_000_000
    ts = (base + rng.integers(0, span, n)).astype("datetime64[us]")
    users = rng.integers(0, n_users, n).astype(np.int64)
    types = np.asarray(["view", "click", "purchase", "signup", "error"],
                       dtype=object)[rng.integers(0, 5, n)]
    value = np.round(rng.exponential(50.0, n), 6)
    props = np.char.add(
        np.char.add('{"k": ', rng.integers(0, 100, n).astype(str)),
        "}").astype(object)
    return pa.table({
        "event_id": pa.array(ids),
        "ts": pa.array(ts),
        "user_id": pa.array(users),
        "event_type": pa.array(types, type=pa.string()),
        "value": pa.array(value, type=pa.float64()),
        "props": pa.array(props, type=pa.string()),
    })


def bigsf_dir(n_docs: int, n_vecs: int, n_events: int, seed: int = 42,
              root: str = "/tmp/rayzeno_bigsf") -> str:
    return os.path.join(
        root, f"v{BIGSF_VERSION}_d{n_docs}_e{n_vecs}_ev{n_events}_s{seed}")


def ensure_bigsf(n_docs: int, n_vecs: int, n_events: int, seed: int = 42,
                 n_users: int | None = None,
                 root: str = "/tmp/rayzeno_bigsf") -> str:
    """Generate (or reuse cached) tables; returns a dir holding
    documents.parquet/, embeddings.parquet/, events.parquet/ (each a
    directory of parts — `ray.data.read_parquet` and DuckDB both accept
    the directory form; relational ops in this repo read via sf_dir
    join, which resolves either layout)."""
    out = bigsf_dir(n_docs, n_vecs, n_events, seed, root)
    stamp = os.path.join(out, "_SUCCESS")
    if os.path.exists(stamp):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    if n_users is None:
        n_users = max(100, n_events // 66)

    import ray

    # Heaps' law: real-text vocabulary grows ~ k·sqrt(tokens) (k ≈ 20,
    # β ≈ 0.5). A FIXED vocab under a growing corpus inflates every
    # word's df linearly — posting lists fatten and ALL similarity-join
    # candidate counts turn quadratic, which real webtext does not do.
    n_vocab = int(np.clip(20.0 * np.sqrt(n_docs * 100.0), 30_000, 500_000))
    vocab = _vocab(n_vocab)
    weights = _zipf_weights(len(vocab))
    vocab_ref = ray.put(vocab)
    weights_ref = ray.put(weights)

    @ray.remote(num_cpus=1)
    def _docs(part, start, n, vb, wt):
        t = _gen_docs_part(seed, part, start, n, vb, wt)
        pq.write_table(t, os.path.join(out, "documents.parquet",
                                       f"part-{part:05d}.parquet"))
        return n

    @ray.remote(num_cpus=1)
    def _vecs(part, start, n):
        t = _gen_vecs_part(seed, part, start, n)
        pq.write_table(t, os.path.join(out, "embeddings.parquet",
                                       f"part-{part:05d}.parquet"))
        return n

    @ray.remote(num_cpus=1)
    def _evts(part, start, n):
        t = _gen_events_part(seed, part, start, n, n_users)
        pq.write_table(t, os.path.join(out, "events.parquet",
                                       f"part-{part:05d}.parquet"))
        return n

    refs = []
    for name, total, rows_per, fn in [
        ("documents.parquet", n_docs, _DOC_PART_ROWS, _docs),
        ("embeddings.parquet", n_vecs, _VEC_PART_ROWS, _vecs),
        ("events.parquet", n_events, _EVT_PART_ROWS, _evts),
    ]:
        os.makedirs(os.path.join(out, name), exist_ok=True)
        part = 0
        start = 0
        while start < total:
            n = min(rows_per, total - start)
            if fn is _docs:
                refs.append(fn.remote(part, start, n, vocab_ref, weights_ref))
            else:
                refs.append(fn.remote(part, start, n))
            start += n
            part += 1
    ray.get(refs)
    with open(stamp, "w") as f:
        f.write("ok")
    return out
