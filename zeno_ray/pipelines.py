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
                   lm_keep_frac: float = 0.9, resume: bool = True) -> dict:
    """The composed webtext pipeline — documents in, training shards out.
    One call chains the engine's training-data stages the way a real
    corpus refresh runs them (CCNet / Gopher / GPT-3 order):

    1. **quality gate**: keep the best *quality_keep_frac* by the
       closed-form quality score (quantile cutoff — fraction-based so
       the gate adapts to any corpus's score distribution) and
       **repetition gate** (Gopher top-word fraction ≤
       *top_word_frac_max*) — both shuffle-free map_batches passes;
    2. **LM gate**: keep the best *lm_keep_frac* of survivors by
       unigram LM score (CCNet-style head of the distribution);
    3. **exact dedup** (hash-partition first-wins);
    4. **decontamination** (word-5-gram overlap vs the benchmark set —
       contaminated docs dropped);
    5. **shuffled shard export** through the resumable sink.

    Each stage consumes the previous stage's surviving doc_ids as a
    broadcast filter (ray.put once — the id sets shrink monotonically),
    so the text column is re-read from Parquet per stage but never
    shuffled until the final shard sort. Quantile cutoffs are computed
    driver-side over per-doc score rows (at 10^9+ docs swap in the
    distributed ``value_quantiles`` read-off). Returns per-stage
    survivor counts plus the sink result; an empty survivor set at any
    stage short-circuits with zeroed downstream counts.

    Not on the driver query surface (50-query cap); e2e-tested in
    tests/test_ops.py::test_webtext_refine_end_to_end."""
    import numpy as np
    import ray

    from zeno_ray.ops.dedup import exact_dedup, ngram_decontaminate
    from zeno_ray.ops.pack import shuffle_shard_export
    from zeno_ray.ops.text import (lm_score, quality_features,
                                   repetition_features)

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

    def in_sorted(values, sorted_arr):
        # membership against a SORTED id array via searchsorted — avoids
        # np.isin re-sorting the broadcast set for every batch
        pos = np.searchsorted(sorted_arr, values)
        safe = np.minimum(pos, max(len(sorted_arr) - 1, 0))
        return (pos < len(sorted_arr)) & (sorted_arr[safe] == values)

    def ids_of(pdf) -> "np.ndarray":
        if len(pdf) == 0 or "doc_id" not in pdf.columns:
            return np.array([], dtype=np.int64)
        out = pdf["doc_id"].to_numpy(np.int64)
        out.sort()
        return out

    # 1a. quality gate: fraction kept by quantile of the score
    def qscore(df):
        q = quality_features(df)
        return q[["doc_id", "quality"]]

    qscores = docs(["doc_id", "text"]).map_batches(
        qscore, batch_format="pandas").to_pandas()
    q_cut = np.quantile(qscores["quality"].to_numpy(),
                        1.0 - quality_keep_frac) if len(qscores) else 0.0
    q_ids = ids_of(qscores[qscores["quality"] >= q_cut])
    stats["after_quality"] = len(q_ids)
    if not len(q_ids):
        return short_circuit("after_quality")
    q_ref = ray.put(q_ids)

    # 1b. repetition gate on the survivors
    def rep_ids(df):
        mask = in_sorted(df["doc_id"].to_numpy(), ray.get(q_ref))
        r = repetition_features(df[mask])
        return r.loc[r["top_word_frac"] <= top_word_frac_max, ["doc_id"]]

    r_ids = ids_of(docs(["doc_id", "text"]).map_batches(
        rep_ids, batch_format="pandas").to_pandas())
    stats["after_repetition"] = len(r_ids)
    if not len(r_ids):
        return short_circuit("after_repetition")
    r_ref = ray.put(r_ids)

    # 2. LM gate on the survivors
    def survivors(df):
        return df[in_sorted(df["doc_id"].to_numpy(), ray.get(r_ref))]

    surv_ds = docs(["doc_id", "text"]).map_batches(
        survivors, batch_format="pandas")
    scores = lm_score(surv_ds)
    cutoff = np.quantile(scores["lm_score"].to_numpy(),
                         1.0 - lm_keep_frac) if len(scores) else 0.0
    lm_ids = ids_of(scores[scores["lm_score"] >= cutoff])
    stats["after_lm"] = len(lm_ids)
    if not len(lm_ids):
        return short_circuit("after_lm")
    lm_ref = ray.put(lm_ids)

    def lm_survivors(df):
        return df[in_sorted(df["doc_id"].to_numpy(), ray.get(lm_ref))]

    # 3. exact dedup on the survivors
    kept = exact_dedup(docs(["doc_id", "text"]).map_batches(
        lm_survivors, batch_format="pandas")).to_pandas()
    dd_ids = ids_of(kept)
    stats["after_dedup"] = len(dd_ids)
    if not len(dd_ids):
        return short_circuit("after_dedup")
    dd_ref = ray.put(dd_ids)

    def dd_survivors(df):
        return df[in_sorted(df["doc_id"].to_numpy(), ray.get(dd_ref))]

    # 4. decontamination: drop survivors sharing grams with the benchmark
    contaminated = ngram_decontaminate(docs(["doc_id", "text"]).map_batches(
        dd_survivors, batch_format="pandas"))
    bad = set(contaminated["doc_id"].tolist())
    final_ids = np.array([i for i in dd_ids if i not in bad], dtype=np.int64)
    stats["after_decontaminate"] = len(final_ids)
    if not len(final_ids):
        return short_circuit("after_decontaminate")
    f_ref = ray.put(final_ids)

    def final_survivors(df):
        return df[in_sorted(df["doc_id"].to_numpy(), ray.get(f_ref))]

    # 5. shuffled shard export of the surviving documents
    sink = shuffle_shard_export(
        docs(["doc_id", "text", "lang", "source"]).map_batches(
            final_survivors, batch_format="pandas"),
        out_dir, n_shards=n_shards, resume=resume)
    stats["shards"] = sink
    return stats
