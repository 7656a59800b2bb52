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
