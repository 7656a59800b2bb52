"""Text analysis over the ``documents`` table: language-ID, quality scoring,
token counting, document fingerprinting. All vectorized ``map_batches``
stages; the stateful ones (compiled regexes, stopword tables) are callable
classes ⇒ actor pools with per-actor setup.

The SQL-oracle-checkable metrics are defined to match DuckDB expressions
exactly (see __ray_entry__.oracle_sql): e.g. ``n_tokens`` is
``len(string_split(text, ' '))`` semantics — split on single spaces, empty
pieces count — NOT a linguistic tokenizer; the BPE-ish token estimate and
language-ID are heuristic (rows-only checks).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# tiny per-language stopword signatures for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "une", "que", "dans"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "zu"},
    "es": {"el", "la", "los", "de", "que", "y", "en", "un", "es", "por"},
}


class LangIdStage:
    """Heuristic language-ID (stopword-overlap; non-Latin script ratio for
    ja). Stateful: marker tables + regexes built once per actor.

    The decision rule is specced SQL-reproducibly (lowercase first, then
    maximal [letter-class]+ runs as words; marker hit = marker equals a
    run; ties break in en→fr→de→es order) so the DuckDB oracle in
    __ray_entry__.oracle_sql['doc_langid'] re-derives it exactly."""

    WORD_CLASS = "a-zàâçéèêëîïôûùüÿñáíóúäöüß"
    CJK_CLASS = "぀-ヿ一-鿿"

    def __init__(self):
        self.word = re.compile(f"[{self.WORD_CLASS}]+")
        self.cjk = re.compile(f"[{self.CJK_CLASS}]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in batch["text"]:
            t = text[:2000].lower()
            if len(self.cjk.findall(t)) > max(8, len(t) * 0.05):
                preds.append("ja")
                continue
            words = set(self.word.findall(t))
            best, best_n = "en", 0
            for lang, markers in _LANG_MARKERS.items():
                n = len(words & markers)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        batch = batch.copy()
        batch["pred_lang"] = preds
        return batch


def quality_features(df: pd.DataFrame) -> pd.DataFrame:
    """SQL-matchable quality metrics (see oracle in __ray_entry__):
    n_chars, n_tokens (single-space split), n_upper, punct chars, plus a
    composite quality score in [0,1]."""
    text = df["text"]
    n_chars = text.str.len().astype(np.int64)
    n_tokens = (text.str.count(" ") + 1).astype(np.int64)
    n_upper = text.str.count(r"[A-Z]").astype(np.int64)
    n_punct = text.str.count(r"[.,;:!?]").astype(np.int64)
    mean_tok_len = (n_chars - (n_tokens - 1)) / n_tokens.clip(lower=1)
    score = (
        1.0
        - (mean_tok_len.clip(2, 14) - 2) / 24.0
        - (n_punct / n_chars.clip(lower=1)).clip(0, 0.5)
    ).clip(0, 1)
    out = df.copy()
    out["n_chars"] = n_chars
    out["n_tokens"] = n_tokens
    out["n_upper"] = n_upper
    out["n_punct"] = n_punct
    out["quality"] = score.round(6)
    return out


def repetition_features(df: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models" §A1.1 repetition filters): fraction of
    distinct words, fraction taken by the most frequent word, fraction of
    bigrams taken by the most frequent bigram. Stateless, shuffle-free —
    one vectorized kernel per batch (explode → integer-code groupby; no
    per-doc Python loop beyond the initial split).

    SQL-reproducible by construction (oracle in
    __ray_entry__.oracle_sql['doc_repetition']): words =
    ``string_split(text, ' ')`` (empty pieces count), bigrams join
    adjacent words with one space, fractions are ROUND(x, 6) with
    half-away-from-zero ties (DuckDB ROUND semantics — mirrored here via
    floor(x*1e6+0.5), NOT numpy banker's rounding). Docs with < 2 words
    have no bigrams and are dropped (mirrors the oracle's inner join)."""
    words_per_doc = [t.split(" ") for t in df["text"]]
    lens = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64,
                       count=len(words_per_doc))
    n_docs = len(df)
    flat: list = []
    for w in words_per_doc:
        flat.extend(w)
    ids = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    codes = codes.astype(np.uint64)
    v = np.uint64(max(len(uniques), 1))

    # per-(doc, word) counts -> distinct count + max count per doc
    key = ids.astype(np.uint64) * v + codes
    uk, counts = np.unique(key, return_counts=True)
    udoc = (uk // v).astype(np.int64)
    n_distinct = np.bincount(udoc, minlength=n_docs)
    top_word = np.zeros(n_docs, dtype=np.int64)
    np.maximum.at(top_word, udoc, counts)

    # bigrams: adjacent word-code pairs that stay inside one doc
    ends = np.cumsum(lens)
    valid = np.ones(len(codes), dtype=bool)
    if len(ends):
        valid[ends - 1] = False
    pos = np.flatnonzero(valid)
    top_bigram = np.zeros(n_docs, dtype=np.int64)
    if len(pos):
        pk = (ids[pos].astype(np.uint64) * v + codes[pos]) * v + codes[pos + 1]
        upk, pcounts = np.unique(pk, return_counts=True)
        updoc = (upk // (v * v)).astype(np.int64)
        np.maximum.at(top_bigram, updoc, pcounts)

    def _round6_half_up(x: np.ndarray) -> np.ndarray:
        return np.floor(x * 1e6 + 0.5) / 1e6

    keep = lens >= 2
    n_bigrams = np.maximum(lens - 1, 1)
    out = pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy()[keep],
        "n_words": lens[keep],
        "distinct_word_frac": _round6_half_up(n_distinct / lens)[keep],
        "top_word_frac": _round6_half_up(top_word / lens)[keep],
        "top_bigram_frac": _round6_half_up(top_bigram / n_bigrams)[keep],
    })
    return out


_BPE_RE = re.compile(r"\w+|[^\w\s]")


class TokenCountStage:
    """Whitespace tokens + a BPE-ish estimate (regex pieces × avg 1.3
    subwords per 4+ char word). Compiled once per actor."""

    def __init__(self):
        self.re = _BPE_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        est = []
        for text in batch["text"]:
            pieces = self.re.findall(text)
            est.append(sum(1 + (len(p) - 1) // 4 for p in pieces))
        batch = batch.copy()
        batch["n_tokens_ws"] = batch["text"].str.split().map(len).astype(np.int64)
        batch["n_tokens_bpe_est"] = np.asarray(est, dtype=np.int64)
        return batch


def fingerprint(df: pd.DataFrame, window: int = 8) -> pd.DataFrame:
    """Winnowing-style min-shingle document fingerprint: the minimum of
    md5-64 (first 16 hex chars, so lexicographic min ≡ numeric min) over
    sampled character shingles — deterministic, order-independent of
    batching, and exactly SQL-reproducible (DuckDB md5/substr — see
    __ray_entry__.oracle_sql['doc_fingerprint']). Shingle positions are
    subsampled to ≤257 per doc (step = max(1, (n-window)//256)) so work
    per doc is bounded regardless of length."""
    import hashlib

    fps = []
    for text in df["text"]:
        n = len(text)
        if n < window:
            fps.append(hashlib.md5(text.encode("utf-8")).hexdigest()[:16])
            continue
        best = None
        step = max(1, (n - window) // 256)  # bounded work per doc
        for i in range(0, n - window + 1, step):
            h = hashlib.md5(
                text[i: i + window].encode("utf-8")).hexdigest()[:16]
            if best is None or h < best:
                best = h
        fps.append(best)
    out = df.copy()
    out["fingerprint"] = fps
    return out


def top_tokens(docs_ds, k: int = 100):
    """Corpus-wide token-frequency top-k (vocabulary head).

    Scale shape: the per-batch pass IS the combiner — each batch emits
    at most |batch vocab| (token, n) partial rows. Those partials are
    NOT fed to a raw ``groupby("token")``: a natural-text vocabulary is
    Heaps'-law huge (~40-60 % of word TYPES are singletons), so a
    token-keyed aggregate is a sort shuffle over 10^7-10^8 distinct
    STRING keys followed by a global string sort — measured 432 s at
    just 50 k bigsf docs, with cost tracking vocab (Heaps ⇒ ~sqrt
    corpus), not k. Instead: coarse-partition on ``hash(token) %
    n_parts`` (every copy of a token lands in one part, so the
    within-part vectorized groupby-sum is the GLOBAL sum), keep the
    per-part top-k (each global top-k row is top-k in its own part),
    and sort only the surviving ``n_parts·k`` rows. Same 432 s case:
    1.8 s.

    Token semantics match DuckDB ``unnest(string_split(text, ' '))``
    exactly (single-space split, empty pieces count) so the query is
    SQL-oracle-checkable; ties at the k boundary are broken by token
    text, making the result a deterministic total order.
    """
    from zeno_ray.ops.dedup import _coarse_n_parts

    n_parts = _coarse_n_parts()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.split(" ").explode().value_counts()
        toks = vc.index.astype(str)
        return pd.DataFrame({
            "token": toks,
            "n": vc.to_numpy().astype(np.int64),
            "part": (pd.util.hash_array(toks.to_numpy(dtype=object))
                     % np.uint64(n_parts)).astype(np.int64),
        })

    def part_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False, as_index=False)["n"].sum()
        s = s.sort_values(["n", "token"], ascending=[False, True],
                          kind="stable").head(k)
        return s[["token", "n"]]

    return (
        docs_ds.map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("part")
        .map_groups(part_topk, batch_format="pandas")
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


_KNUTH = 2654435761  # Knuth's multiplicative-hash constant (2^32 / phi)


def stratified_sample(docs_ds, rates: dict[str, float],
                      default_rate: float = 0.1, strata_col: str = "lang"):
    """Deterministic per-stratum downsampling — the mixture-building
    primitive for training-data pipelines (e.g. keep 50% of English,
    10% of everything else).

    The keep decision is a pure function of ``doc_id`` via Knuth's
    multiplicative hash mod 2^32 — reproducible in plain SQL integer
    arithmetic (see the ``doc_sample_stratified`` oracle), stable across
    runs/partitionings, and embarrassingly parallel: a stateless
    ``map_batches`` filter, no shuffle, no driver traffic. Rates are
    quantized to 1/10000.

    (BIGINT ``doc_id * 2654435761`` overflows signed-64 only past
    ~3.5e9 docs; the kernel itself uses wrapping uint64 so the Ray side
    is exact at any scale.)
    """
    thresholds = {s: int(round(r * 10000)) for s, r in rates.items()}
    default_thr = int(round(default_rate * 10000))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["doc_id"].to_numpy().astype(np.uint64)
             * np.uint64(_KNUTH)) % np.uint64(2**32)
        thr = df[strata_col].map(
            lambda s: thresholds.get(s, default_thr)).to_numpy(np.uint64)
        return df[(h % np.uint64(10000)) < thr]

    return docs_ds.map_batches(keep, batch_format="pandas", batch_size=8192)


def top_k_per_group(docs_ds, group_col: str, order_col: str, k: int = 3,
                    id_col: str = "doc_id"):
    """Per-group top-k (e.g. the k highest-quality docs per language) —
    the windowed-rank primitive (``ROW_NUMBER() OVER (PARTITION BY g
    ORDER BY v DESC, id)``).

    Scale shape: the per-batch pass keeps only k rows per group seen in
    the batch (the combiner), so the one ``groupby(group)`` shuffle
    moves ≤ k·groups·blocks rows, never the corpus; the final per-group
    head(k) is vectorized. Ties are broken by ascending ``id_col``, so
    the result is a deterministic total order and SQL-oracle-checkable.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values([group_col, order_col, id_col],
                           ascending=[True, False, True], kind="stable")
        return s.groupby(group_col, as_index=False, sort=False).head(k)

    return (
        docs_ds.map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby(group_col)
        .map_groups(
            lambda g: g.sort_values([order_col, id_col],
                                    ascending=[False, True],
                                    kind="stable").head(k),
            batch_format="pandas")
    )


def group_quantiles(docs_ds, group_col: str, value_col: str,
                    qs: tuple = (0.5, 0.9, 0.99), max_value: int = 1 << 20):
    """EXACT per-group quantiles of a bounded non-negative integer
    column via distributed histograms (``quantile_disc`` semantics:
    the returned value is an actual element, index ceil(q·n)-1 of the
    sorted group).

    Scale shape: each batch emits one (group, counts) histogram row
    (counts as an Arrow binary blob of int64 bincounts, trimmed to the
    observed max); one groupby(group) shuffle moves histograms, never
    rows; quantiles are read off the summed histogram's cumsum. Driver
    sees groups×quantiles rows. Exactness holds for any integer column
    with values in [0, max_value) — lengths, token counts, status
    codes; NOT a sketch.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for gval, gg in df.groupby(group_col, sort=False):
            v = gg[value_col].to_numpy(np.int64)
            if (v < 0).any() or (v >= max_value).any():
                raise ValueError(
                    f"{value_col} outside [0, {max_value}) — "
                    "group_quantiles is exact only on bounded ints")
            c = np.bincount(v)
            rows.append((gval, c.tobytes()))
        return pd.DataFrame(rows, columns=[group_col, "hist"])

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        width = max(len(h) for h in g["hist"]) // 8
        acc = np.zeros(width, dtype=np.int64)
        for h in g["hist"]:
            a = np.frombuffer(h, np.int64)
            acc[:len(a)] += a
        cum = np.cumsum(acc)
        n = int(cum[-1])
        out = {group_col: [g[group_col].iloc[0]], "n": [n]}
        for q in qs:
            target = max(1, int(np.ceil(q * n)))
            out[f"q{int(q * 100)}"] = [
                int(np.searchsorted(cum, target, side="left"))]
        return pd.DataFrame(out)

    return (
        docs_ds.map_batches(partial, batch_format="pandas", batch_size=16384)
        .groupby(group_col)
        .map_groups(reduce_group, batch_format="pandas")
    )


def tfidf_top_terms(docs_ds, k: int = 5):
    """Per-source TF-IDF top terms: tf(t,s) = occurrences of t in
    source s; df(t) = sources containing t; score = tf · ln(S/df).

    Scale shape: per-batch (source, token, tf) combiner partials →
    ONE coarse shuffle keyed by hash(token) (tf-sum and df are both
    token-keyed, so a single part computes both with vectorized pandas
    groupbys) → score map → :func:`top_k_per_group` head(k) reduce.
    Shuffle traffic is vocab×sources partial rows, never the corpus.
    Scores are rounded half-away to 6 places BEFORE ranking so the
    pandas and DuckDB orderings agree exactly (ties → token asc).
    """
    from zeno_ray.ops.dedup import _coarse_n_parts

    n_parts = _coarse_n_parts()

    # S = distinct sources: tiny by construction (a label column); the
    # per-batch unique partials bound driver traffic at sources×blocks
    srcs = docs_ds.map_batches(
        lambda df: df[["source"]].drop_duplicates(),
        batch_format="pandas").to_pandas()
    n_sources = int(srcs["source"].nunique())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "source": df["source"],
            "token": df["text"].str.split(" "),
        }).explode("token")
        vc = t.groupby(["source", "token"], as_index=False) \
            .size().rename(columns={"size": "tf"})
        h = pd.util.hash_array(vc["token"].to_numpy(object))
        vc["part"] = (h % np.uint64(n_parts)).astype("int64")
        return vc

    def score_in_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["source", "token"], as_index=False) \
            .agg(tf=("tf", "sum"))
        df_ = agg.groupby("token")["source"].transform("nunique")
        score = agg["tf"].to_numpy(np.float64) \
            * np.log(n_sources / df_.to_numpy(np.float64))
        return pd.DataFrame({
            "source": agg["source"], "token": agg["token"],
            "score": np.floor(score * 1e6 + 0.5) / 1e6,  # half-away 6dp
        })

    scored = (
        docs_ds.map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("part")
        .map_groups(score_in_part, batch_format="pandas")
    )
    return top_k_per_group(scored, "source", "score", k=k, id_col="token")


def lm_score(docs_ds, vocab_size: int = 200_000, oov_count: int = 1):
    """CCNet-style unigram LM quality score: each doc's mean log
    probability of its tokens under a unigram model trained on the
    corpus itself (Wenzek et al. 2020 score docs with a KenLM model and
    keep the head of the distribution; the unigram variant is the
    sandbox-faithful stand-in — same two-pass shape, no external model).
    Lower (more negative) = rarer vocabulary = the tail a quality filter
    drops.

    Scale shape:

    - **Train pass** reuses the :func:`top_tokens` combiner discipline:
      per-batch (token, n) partials, coarse-partitioned on
      ``hash(token) % n_parts`` (never a raw token groupby — Heaps'-law
      vocabularies make that a 10^8-string-key sort), keeping the
      per-part top-``vocab_size`` by count; the global top-V and the
      exact corpus token total come from those partials. V counts
      broadcast via ``ray.put`` as a sorted hash table.
    - **Score pass** is ONE shuffle-free ``map_batches``: factorize the
      batch's tokens, one searchsorted per UNIQUE token against the
      broadcast vocab, per-doc mean via bincount — complete within the
      batch.
    - Tokens outside the kept vocabulary score as ``oov_count``
      occurrences (singleton probability by default) — at sandbox scale
      the full vocabulary fits, so there is no OOV and the result
      exactly matches the closed-form SQL (DuckDB-verified in
      ``test_lm_score_matches_duckdb``).

    Returns a pandas DataFrame (doc_id, n_tokens, lm_score) sorted by
    doc_id; lm_score is ROUND-half-away(mean ln p, 6) to match DuckDB.

    Token semantics: single-space split, empty pieces count (the
    module-wide SQL-matchable convention)."""
    model = lm_fit(docs_ds, vocab_size=vocab_size, oov_count=oov_count)
    pdf = lm_score_ds(docs_ds, model).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def lm_fit(docs_ds, vocab_size: int = 200_000, oov_count: int = 1):
    """Train pass of :func:`lm_score`, exposed separately so pipelines
    can fit the unigram model on one corpus slice and score another (or
    score lazily without collecting). Returns a ``ray.ObjectRef`` to the
    broadcast model: (sorted token-hash table, counts, corpus total,
    oov_count)."""
    import ray

    from zeno_ray.ops.dedup import _coarse_n_parts

    n_parts = _coarse_n_parts()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.split(" ").explode().value_counts()
        toks = vc.index.astype(str)
        return pd.DataFrame({
            "token": toks,
            "n": vc.to_numpy().astype(np.int64),
            "part": (pd.util.hash_array(toks.to_numpy(dtype=object))
                     % np.uint64(n_parts)).astype(np.int64),
        })

    partials = docs_ds.map_batches(partial, batch_format="pandas",
                                   batch_size=8192).materialize()
    total = int(partials.sum("n"))

    def part_topv(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False, as_index=False)["n"].sum()
        s = s.sort_values(["n", "token"], ascending=[False, True],
                          kind="stable").head(vocab_size)
        return s[["token", "n"]]

    # global top-V selected IN the cluster (sort over ≤ parts×V rows,
    # limit V) — the driver receives exactly V rows, never the full
    # Heaps'-law vocabulary
    vocab = (partials.groupby("part")
             .map_groups(part_topv, batch_format="pandas")
             .sort(["n", "token"], descending=[True, False])
             .limit(vocab_size)
             .to_pandas())
    th = pd.util.hash_array(vocab["token"].to_numpy(dtype=object))
    order = np.argsort(th, kind="stable")
    return ray.put((th[order], vocab["n"].to_numpy(np.int64)[order], total,
                    oov_count))


def lm_batch_scores(texts, model):
    """The unigram-LM scoring kernel for ONE batch of texts against an
    :func:`lm_fit` model tuple ``(sorted token-hash table, counts,
    corpus total, oov_count)``. Returns ``(scores, lens)`` where scores
    is ROUND-half-away(mean ln p, 6) per doc (DuckDB semantics; scores
    are negative) and lens the per-doc token counts.

    This is the SINGLE copy of the numerically sensitive math
    (factorize → searchsorted → bincount → copysign rounding): both
    :func:`lm_score_ds` and ``webtext_refine``'s LM gate predicate call
    it, so a quantile cutoff computed over the former always partitions
    exactly as the latter filters."""
    words_per_doc = [t.split(" ") for t in texts]
    lens = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64,
                       count=len(words_per_doc))
    flat: list = []
    for w in words_per_doc:
        flat.extend(w)
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
    h_sorted, cnts, total, oov_count = model
    uh = pd.util.hash_array(np.asarray(uniq, dtype=object))
    pos = np.searchsorted(h_sorted, uh)
    safe = np.minimum(pos, max(len(h_sorted) - 1, 0))
    hit = (pos < len(h_sorted)) & (h_sorted[safe] == uh)
    uc = np.where(hit, cnts[safe], oov_count).astype(np.float64)
    per_tok = np.log(uc / total)[codes]
    ids = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    sums = np.bincount(ids, weights=per_tok, minlength=len(lens))
    mean = sums / np.maximum(lens, 1)
    rounded = np.copysign(np.floor(np.abs(mean) * 1e6 + 0.5), mean) / 1e6
    return rounded, lens


def lm_score_ds(docs_ds, model_ref):
    """Score pass of :func:`lm_score` against a :func:`lm_fit` model:
    ONE shuffle-free ``map_batches`` returning a slim LAZY Dataset
    (doc_id, n_tokens, lm_score) — nothing collected to the driver."""
    import ray

    def score(df: pd.DataFrame) -> pd.DataFrame:
        rounded, lens = lm_batch_scores(df["text"], ray.get(model_ref))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_tokens": lens,
            "lm_score": rounded,
        })

    return docs_ds.map_batches(score, batch_format="pandas",
                               batch_size=4096)


def bottom_k_sample(docs_ds, k: int = 100, id_col: str = "doc_id"):
    """Deterministic uniform k-sample: keep the k rows with the smallest
    md5(id) priority — the classic "bottom-k by hash" sample (a uniform
    random sample under a fixed pseudo-random priority, reproducible
    across runs/engines, composable: the union of two tables' bottom-k
    sets contains the union's bottom-k). Complements
    :func:`stratified_sample` (per-stratum rates) with a global
    fixed-size sample.

    Scale shape: per-batch local bottom-k (the combiner) → ONE
    distributed sort over ≤ batches×k priority rows → limit k. The
    priority is ``md5(CAST(id AS VARCHAR))`` so DuckDB reproduces the
    selection exactly (``ORDER BY md5(id::VARCHAR) LIMIT k`` — verified
    in test_bottom_k_sample_matches_duckdb)."""
    import hashlib

    def local_bottom(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        prio = np.array([hashlib.md5(str(int(i)).encode()).hexdigest()
                         for i in ids], dtype=object)
        out = pd.DataFrame({id_col: ids, "prio": prio})
        return out.sort_values("prio", kind="stable").head(k)

    return (
        docs_ds.map_batches(local_bottom, batch_format="pandas",
                            batch_size=8192)
        .sort("prio")
        .limit(k)
    )


def resample_to_mixture(docs_ds, target_fracs: dict[str, float],
                        strata_col: str = "lang"):
    """Rebalance a corpus toward a target language/source mixture by
    DOWN-sampling over-represented strata — the mixture-building step
    (e.g. "the training set should be 50% en / 20% zh / 30% rest").

    Rates are derived, not guessed: one tiny ``groupby(strata_col)``
    count (strata-sized result), then the largest feasible total N* such
    that every stratum can meet its target share by downsampling alone
    (``N* = min over strata of count_s / frac_s``), giving
    ``rate_s = frac_s · N* / count_s ≤ 1``. Strata absent from
    *target_fracs* are dropped (rate 0). The sampling itself is
    :func:`stratified_sample` — the deterministic Knuth-hash filter:
    shuffle-free, SQL-reproducible, stable across partitionings.

    Returns (sampled_ds, rates) so callers can log / oracle the derived
    rates. Expected composition approaches the target exactly as counts
    grow (rate quantization is 1/10000)."""
    counts = {r[strata_col]: r["count()"] for r in
              docs_ds.groupby(strata_col).count().take_all()}
    feasible = [counts[s] / f for s, f in target_fracs.items()
                if f > 0 and counts.get(s)]
    if not feasible:
        return docs_ds.filter(expr="1 = 0"), {}
    n_star = min(feasible)
    rates = {s: min(1.0, f * n_star / counts[s])
             for s, f in target_fracs.items() if counts.get(s)}
    return (stratified_sample(docs_ds, rates, default_rate=0.0,
                              strata_col=strata_col), rates)


def weighted_bottom_k_sample(docs_ds, k: int = 100,
                             weight_col: str = "n_chars",
                             id_col: str = "doc_id"):
    """Weighted priority sampling (Efraimidis-Spirakis A-ES via
    exponential clocks): keep the k rows with the smallest
    ``-ln(u)/w`` where ``u = hash(id)/2^64`` — inclusion probability
    rises with weight, selection is a pure function of (id, weight):
    deterministic, partitioning-independent, composable.

    The uniform comes from the murmur64 finalizer, bit-identical to
    DuckDB's ``hash(BIGINT)`` (the sketch-module identity), so the SQL
    ``ORDER BY -ln((hash(id)+0.5)/2^64)/w LIMIT k`` reproduces the selection
    exactly (test_weighted_bottom_k_matches_duckdb).

    Scale shape: per-batch local bottom-k combiner → one sort over
    ≤ batches×k rows → limit k. Zero data shuffle."""
    from zeno_ray.ops.sketch import _hash64

    def local_bottom(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        w = df[weight_col].to_numpy(np.float64)
        # +0.5 keeps u strictly inside (0,1) — hash(0) is 0 and ln(0)
        # would blow up on both engines; the offset is computed in
        # identical double arithmetic on the SQL side
        u = (_hash64(ids).astype(np.float64) + 0.5) / 2.0**64
        key = -np.log(u) / np.maximum(w, 1e-300)
        out = pd.DataFrame({id_col: ids, weight_col: df[weight_col],
                            "prio": key})
        return out.sort_values("prio", kind="stable").head(k)

    return (
        docs_ds.map_batches(local_bottom, batch_format="pandas",
                            batch_size=8192)
        .sort("prio")
        .limit(k)
    )
