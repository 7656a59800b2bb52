"""Reprocessing pipelines over a pages Parquet table — the data-processing
face of the engine (as opposed to the live crawl loop in crawl.py): given a
Common-Crawl-style pages table (url, warc_ts, html:binary, text, lang, ...),
re-extract links and text with the same zero-copy Arrow stages the crawl
uses. These are the pipelines a pages-corpus consumer runs without ever
touching the frontier."""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

from zeno_ray.config import CrawlConfig, make_is_excluded
from zeno_ray.extract import extract_from_page
from zeno_ray.urlnorm import canonicalize


def read_pages(corpus_dir: str, columns=None):
    return rd.read_parquet(os.path.join(corpus_dir, "pages"), columns=columns)


class EdgeExtract:
    """pages rows → (src, dst, kind) edge rows (content-type dispatched,
    canonicalized, in-page deduped) — the reprocessing twin of the crawl's
    ExtractStage."""

    def __init__(self, cfg: CrawlConfig | None = None):
        self.cfg = cfg or CrawlConfig()
        self.is_excluded = make_is_excluded(self.cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src_out, dst_out, kind_out = [], [], []
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        statuses = batch["status"].to_pylist()
        cts = batch["content_type"].to_pylist()
        links = batch["link_header"].to_pylist() if "link_header" in batch.schema.names else [None] * len(urls)
        servers = batch["server"].to_pylist() if "server" in batch.schema.names else [None] * len(urls)
        for i, url in enumerate(urls):
            if statuses[i] != 200:
                continue
            res = extract_from_page(
                url, htmls[i] or b"", cts[i], link_header=links[i],
                server=servers[i], is_excluded=self.is_excluded,
            )
            cu = canonicalize(url)
            for d in res.outlinks:
                src_out.append(cu)
                dst_out.append(d)
                kind_out.append("outlink")
            for d in res.assets:
                src_out.append(cu)
                dst_out.append(d)
                kind_out.append("asset")
        return pa.table(
            {
                "src": pa.array(src_out, pa.string()),
                "dst": pa.array(dst_out, pa.string()),
                "kind": pa.array(kind_out, pa.string()),
            }
        )


class TextExtract:
    """pages rows → (url, text) with text re-extracted from the html binary
    column — the byte-identical-text reprocessing pipeline."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from zeno_ray.extract import extract_text

        urls, texts = [], []
        statuses = batch["status"].to_pylist()
        cts = batch["content_type"].to_pylist()
        for url, html, status, ct in zip(
            batch["url"].to_pylist(), batch["html"].to_pylist(), statuses, cts
        ):
            if status == 200 and ct and ct.startswith("text/html"):
                urls.append(url)
                texts.append(extract_text(html or b""))
        return pa.table(
            {"url": pa.array(urls, pa.string()), "text": pa.array(texts, pa.string())}
        )


def extract_edges(corpus_dir: str, cfg: CrawlConfig | None = None):
    """Full-corpus link extraction: read (pruned columns) → parse → edges."""
    ds = read_pages(
        corpus_dir,
        columns=["url", "html", "status", "content_type", "link_header", "server"],
    )
    return ds.map_batches(EdgeExtract(cfg), batch_format="pyarrow", batch_size=128)


def extract_texts(corpus_dir: str):
    ds = read_pages(corpus_dir, columns=["url", "html", "status", "content_type"])
    return ds.map_batches(TextExtract(), batch_format="pyarrow", batch_size=128)


class EnrichStage:
    """pages rows → training-data enrichment columns over the extracted
    text: predicted language (n-gram/stopword heuristic), quality features,
    whitespace/BPE-ish token counts, winnowing fingerprint. A callable
    class ⇒ actor pool (compiled regexes + marker tables once per actor) —
    the per-page enrichment a training-data pipeline bolts onto the crawl."""

    def __init__(self):
        from zeno_ray.ops.text import LangIdStage

        self.langid = LangIdStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        from zeno_ray.extract import extract_text
        from zeno_ray.ops.text import TokenCountStage, fingerprint, quality_features

        rows = []
        for url, html, status, ct in zip(
            batch["url"].to_pylist(), batch["html"].to_pylist(),
            batch["status"].to_pylist(), batch["content_type"].to_pylist(),
        ):
            if status == 200 and ct and ct.startswith("text/html"):
                rows.append({"url": url, "text": extract_text(html or b"")})
        if not rows:
            return pa.table({
                "url": pa.array([], pa.string()),
                "pred_lang": pa.array([], pa.string()),
                "quality": pa.array([], pa.float64()),
                "n_tokens_ws": pa.array([], pa.int64()),
                "fingerprint": pa.array([], pa.string()),
            })
        df = pd.DataFrame(rows)
        df = self.langid(df)
        df = quality_features(df)
        df["doc_id"] = 0  # unused by fingerprint/token stages
        df = TokenCountStage()(df)
        df = fingerprint(df)
        out = df[["url", "pred_lang", "quality", "n_tokens_ws", "fingerprint"]]
        return pa.Table.from_pandas(out, preserve_index=False)


def enrich_pages(corpus_dir: str, concurrency: int = 4):
    """Crawl-output enrichment pipeline: read pages (pruned columns) →
    per-page text re-extraction + language/quality/token/fingerprint
    features, as an actor-pool map_batches stage."""
    ds = read_pages(corpus_dir, columns=["url", "html", "status", "content_type"])
    return ds.map_batches(
        EnrichStage, batch_format="pyarrow", batch_size=256,
        concurrency=(1, concurrency),
    )


def enrich_pages_partitioned(corpus_dir: str, out_dir: str,
                             n_partitions: int = 8, resume: bool = True,
                             concurrency: int = 4) -> dict:
    """Resumable partitioned enrichment: the input page files are split
    into *n_partitions* shards, each enriched and committed as its own
    sealed ``part=<i>/`` directory (tmp+rename+_SUCCESS, zeno_ray.sinks)
    — a failed run reruns only unsealed partitions. Returns the
    written/skipped report; read back with ``sinks.partitioned_dataset``."""
    import glob

    from zeno_ray.sinks import write_partitioned

    files = sorted(glob.glob(os.path.join(corpus_dir, "pages/*.parquet")))
    if not files:
        return {"written": [], "skipped": []}
    n_eff = max(1, min(n_partitions, len(files)))  # one input shard per
    # partition minimum — empty partitions would read_parquet([])

    def make(key: str):
        shard = files[int(key)::n_eff]
        ds = rd.read_parquet(
            shard, columns=["url", "html", "status", "content_type"])
        # autoscaling pool (1, N): a FIXED pool of N can reserve every
        # CPU on a small cluster and starve the read/write tasks feeding
        # it (observed as a livelock at num_cpus=4)
        return ds.map_batches(EnrichStage, batch_format="pyarrow",
                              batch_size=256,
                              concurrency=(1, concurrency))

    return write_partitioned(
        make, out_dir, [str(i) for i in range(n_eff)], resume=resume)


def host_stats(corpus_dir: str):
    """Per-host page counts and byte totals, host derived by vectorized
    canonical-host extraction; pre-aggregated per batch before the small
    groupby."""
    ds = read_pages(corpus_dir, columns=["url", "html"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from zeno_ray.stages import _host_arrow

        urls = batch["url"].combine_chunks()
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.chunk(0) if urls.num_chunks else \
                pa.array([], pa.string())
        hosts = _host_arrow(urls)
        nbytes = pc.cast(pc.binary_length(batch["html"]), pa.int64())
        slim = pa.table({"host": hosts, "n_bytes": nbytes})
        g = slim.group_by("host").aggregate(
            [("n_bytes", "count"), ("n_bytes", "sum")])
        return g.rename_columns(["host", "n_pages", "n_bytes"])

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("host")
        .aggregate(Sum("n_pages", alias_name="n_pages"),
                   Sum("n_bytes", alias_name="n_bytes"))
    )


def webtext_refine(sf_dir: str, out_dir: str, n_shards: int = 8,
                   quality_keep_frac: float = 0.6,
                   top_word_frac_max: float = 0.3,
                   lm_keep_frac: float = 0.9, resume: bool = True,
                   bench_mod: int = 29,
                   max_broadcast_ids: int = 100_000_000) -> dict:
    """The composed webtext pipeline — documents in, training shards out.
    One call chains the engine's training-data stages the way a real
    corpus refresh runs them (CCNet / Gopher / GPT-3 order):

    1. **quality gate**: keep the best *quality_keep_frac* by the
       closed-form quality score (quantile cutoff — fraction-based so
       the gate adapts to any corpus's score distribution) and
       **repetition gate** (Gopher top-word fraction ≤
       *top_word_frac_max*) — both shuffle-free map_batches passes;
    2. **LM gate**: keep the best *lm_keep_frac* of survivors by
       unigram LM score (CCNet-style head of the distribution; the
       model is fit on the stage-1 survivors);
    3. **exact dedup** (hash-partition first-wins);
    4. **decontamination** (word-5-gram overlap vs the benchmark set):
       the benchmark gram set is built from the FULL unfiltered corpus
       — overlap with benchmark docs the earlier gates dropped must
       still count — and benchmark documents themselves
       (``doc_id % bench_mod == 0``) are excluded from the export
       (shipping eval docs into training shards defeats the sweep);
    5. **shuffled shard export** through the resumable sink.

    **No driver-held funnel state** (VERDICT r4 item 5): the quantile
    cutoffs come from the distributed sort read-off
    (``ops.relational.dataset_quantiles_disc`` — quantile_disc
    semantics, O(blocks) driver traffic), and the quality / repetition /
    LM gates are re-applied as pure per-doc PREDICATES (scalar cutoffs +
    the broadcast LM vocab) recomputed inside each stage's map_batches —
    no per-doc id array ever reaches the driver for the gates. The text
    column is re-read from Parquet per stage and never shuffled until
    the final shard sort; the final gate pass hashes while gating, so
    the dedup input is the slim (doc_id, text_hash) projection of that
    same pass (no extra 3-gate corpus re-scan for the after_lm count).
    BOTH driver-adjacent id sets honor *max_broadcast_ids*: the
    contaminated set (``ngram_decontaminate_ds`` stays a distributed
    Dataset; broadcast below the bound, cluster-side anti-join on
    ``doc_id % n_parts`` above it) and the surviving id set (winners ∖
    contaminated ∖ benchmark — broadcast below, hash-partitioned
    semi-join of the ``exact_dedup_incremental`` pattern above, where
    text crosses one coarse shuffle right before the export sort).
    Returns per-stage survivor counts plus the sink result; an empty
    survivor set at any stage short-circuits with zeroed downstream
    counts.

    Not on the driver query surface (50-query cap); e2e-tested in
    tests/test_ops.py::test_webtext_refine_end_to_end, forced-semi-join
    parity in test_webtext_refine_semijoin_parity."""
    import numpy as np
    import pandas as pd
    import ray

    from zeno_ray.ops.dedup import (_coarse_n_parts, add_text_hash,
                                    exact_dedup, ngram_decontaminate_ds)
    from zeno_ray.ops.pack import shuffle_shard_export
    from zeno_ray.ops.relational import dataset_quantiles_disc
    from zeno_ray.ops.text import (lm_batch_scores, lm_fit, lm_score_ds,
                                   quality_features, repetition_features)

    docs_path = os.path.join(sf_dir, "documents.parquet")

    def docs(columns):
        return rd.read_parquet(docs_path, columns=columns)

    stats: dict = {"input": docs(["doc_id"]).count()}
    _STAGES = ["after_quality", "after_repetition", "after_lm",
               "after_dedup", "after_decontaminate"]

    def short_circuit(done_through: str) -> dict:
        for k in _STAGES[_STAGES.index(done_through):]:
            stats.setdefault(k, 0)
        stats["shards"] = {"written": [], "skipped": []}
        return stats

    # 1a. quality cutoff via the distributed sort read-off; the gate is
    # henceforth the PREDICATE quality >= q_cut, recomputed per batch
    qscores = docs(["doc_id", "text"]).map_batches(
        lambda df: quality_features(df)[["doc_id", "quality"]],
        batch_format="pandas")
    (q_cut,), _n = dataset_quantiles_disc(
        qscores, "quality", (1.0 - quality_keep_frac,))

    def gate_q(df):
        return df[quality_features(df)["quality"].to_numpy() >= q_cut]

    # 1b. repetition gate — a fixed-threshold predicate on the quality
    # survivors (docs with < 2 words have no bigrams and fail the gate,
    # mirroring repetition_features' drop semantics)
    def gate_qr(df):
        sub = gate_q(df)
        r = repetition_features(sub)
        good = r.loc[r["top_word_frac"] <= top_word_frac_max, "doc_id"]
        return sub[sub["doc_id"].isin(set(good))]

    # both stage counts from ONE corpus pass (per-batch count partials;
    # quality computed once per batch, not once per gate)
    def gate_count_partials(df):
        import pandas as pd

        sub = gate_q(df)
        r = repetition_features(sub)
        good = r.loc[r["top_word_frac"] <= top_word_frac_max, "doc_id"]
        nqr = int(sub["doc_id"].isin(set(good)).sum())
        return pd.DataFrame({"nq": [len(sub)], "nqr": [nqr]})

    cnt = docs(["doc_id", "text"]).map_batches(
        gate_count_partials, batch_format="pandas").to_pandas()
    stats["after_quality"] = int(cnt["nq"].sum())
    if not stats["after_quality"]:
        return short_circuit("after_quality")
    stats["after_repetition"] = int(cnt["nqr"].sum())
    if not stats["after_repetition"]:
        return short_circuit("after_repetition")

    # 2. LM gate: model fit on the stage-1 survivors, cutoff via the
    # distributed read-off over the LAZY score dataset — per-doc scores
    # never land on the driver
    surv12 = docs(["doc_id", "text"]).map_batches(
        gate_qr, batch_format="pandas")
    lm_model = lm_fit(surv12)
    (lm_cut,), _ = dataset_quantiles_disc(
        lm_score_ds(surv12, lm_model), "lm_score", (1.0 - lm_keep_frac,))

    # per-batch gate predicate: the SHARED lm_batch_scores kernel (the
    # same function lm_score_ds used for the cutoff quantile)
    def gate_qrl(df):
        sub = gate_qr(df)
        if not len(sub):
            return sub
        scores, _lens = lm_batch_scores(sub["text"], ray.get(lm_model))
        return sub[scores >= lm_cut]

    # 3. exact dedup on the gated survivors — ONE gate pass hashes while
    # gating (slim distributed (doc_id, text_hash) rows; the after_lm
    # count and the dedup input share it, saving a full 3-gate corpus
    # re-scan)
    def gate_qrl_hashed(df):
        sub = gate_qrl(df)
        return add_text_hash(sub)[["doc_id", "text_hash"]]

    surv_hashed = docs(["doc_id", "text"]).map_batches(
        gate_qrl_hashed, batch_format="pandas").materialize()
    stats["after_lm"] = surv_hashed.count()
    if not stats["after_lm"]:
        return short_circuit("after_lm")

    winners = exact_dedup(surv_hashed, prehashed=True).materialize()
    stats["after_dedup"] = winners.count()
    if not stats["after_dedup"]:
        return short_circuit("after_dedup")

    # 4. decontamination over the FULL corpus (bench grams must include
    # benchmark docs the gates dropped), plus the benchmark docs
    # themselves excluded from the final set. The contaminated-id set is
    # broadcast below max_broadcast_ids and anti-joined in the cluster
    # above it — the same bound discipline as the export filter (no
    # unbounded per-doc id collect on the driver).
    cont = ngram_decontaminate_ds(docs(["doc_id", "text"]),
                                  bench_mod=bench_mod).materialize()
    n_bad = cont.count()
    if n_bad <= max_broadcast_ids:
        bad_arr = cont.to_pandas()["doc_id"].to_numpy(np.int64) \
            if n_bad else np.array([], dtype=np.int64)
        bad_arr.sort()
        bad_ref = ray.put(bad_arr)

        def final_filter(df):
            ids = df["doc_id"].to_numpy(np.int64)
            b = ray.get(bad_ref)
            pos = np.searchsorted(b, ids)
            safe = np.minimum(pos, max(len(b) - 1, 0))
            contaminated_mask = (pos < len(b)) & (b[safe] == ids) \
                if len(b) else np.zeros(len(ids), dtype=bool)
            return df[~contaminated_mask & (ids % bench_mod != 0)]

        final = winners.map_batches(final_filter,
                                    batch_format="pandas").materialize()
    else:
        anti_parts = _coarse_n_parts()

        def win_side(df):
            sub = df[df["doc_id"].to_numpy(np.int64) % bench_mod != 0]
            ids = sub["doc_id"].to_numpy(np.int64)
            return pd.DataFrame({
                "doc_id": ids, "side": np.zeros(len(sub), dtype=np.int8),
                "part": (ids % anti_parts).astype("int64")})

        def bad_side(df):
            ids = df["doc_id"].to_numpy(np.int64)
            return pd.DataFrame({
                "doc_id": ids, "side": np.ones(len(df), dtype=np.int8),
                "part": (ids % anti_parts).astype("int64")})

        def drop_in_part(g):
            bad_ids = set(g.loc[g["side"] == 1, "doc_id"])
            d = g[g["side"] == 0]
            return d[~d["doc_id"].isin(bad_ids)][["doc_id"]]

        final = (
            winners.map_batches(win_side, batch_format="pandas")
            .union(cont.map_batches(bad_side, batch_format="pandas"))
            .groupby("part")
            .map_groups(drop_in_part, batch_format="pandas")
        ).materialize()
    stats["after_decontaminate"] = final.count()
    if not stats["after_decontaminate"]:
        return short_circuit("after_decontaminate")

    # 5. shuffled shard export: filter the full-width docs down to the
    # final winner set — broadcast ids below the bound, hash-partitioned
    # semi-join (the exact_dedup_incremental pattern) above it
    full = docs(["doc_id", "text", "lang", "source"])
    if stats["after_decontaminate"] <= max_broadcast_ids:
        fid = final.to_pandas()["doc_id"].to_numpy(np.int64)
        fid.sort()
        f_ref = ray.put(fid)

        def final_survivors(df):
            ids = df["doc_id"].to_numpy(np.int64)
            s = ray.get(f_ref)
            pos = np.searchsorted(s, ids)
            safe = np.minimum(pos, max(len(s) - 1, 0))
            return df[(pos < len(s)) & (s[safe] == ids)]

        export_ds = full.map_batches(final_survivors, batch_format="pandas")
    else:
        n_parts = _coarse_n_parts()

        def doc_side(df):
            return df.assign(
                side=np.zeros(len(df), dtype=np.int8),
                part=(df["doc_id"].to_numpy(np.int64)
                      % n_parts).astype("int64"))

        def id_side(df):
            import pandas as pd

            k = len(df)
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "text": np.full(k, "", dtype=object),
                "lang": np.full(k, "", dtype=object),
                "source": np.full(k, "", dtype=object),
                "side": np.ones(k, dtype=np.int8),
                "part": (df["doc_id"].to_numpy(np.int64)
                         % n_parts).astype("int64")})

        def keep_in_part(g):
            keep = set(g.loc[g["side"] == 1, "doc_id"])
            d = g[g["side"] == 0]
            return d[d["doc_id"].isin(keep)][
                ["doc_id", "text", "lang", "source"]]

        export_ds = (
            full.map_batches(doc_side, batch_format="pandas")
            .union(final.map_batches(id_side, batch_format="pandas"))
            .groupby("part")
            .map_groups(keep_in_part, batch_format="pandas"))

    sink = shuffle_shard_export(export_ds, out_dir, n_shards=n_shards,
                                resume=resume)
    stats["shards"] = sink
    return stats
