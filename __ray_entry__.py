"""Driver contract for the rayzeno graft (Ray Data target).

``entry()`` — flagship crawl on the sf0.001 synthetic corpus.
``queries()`` — one entry per implemented operator family (SURVEY.md §2 +
the training-data ops); each callable takes ``sf_dir`` and returns a
Dataset / pandas DataFrame / pyarrow Table.
``oracle_sql()`` — DuckDB-checkable equivalents (34 of the 51 queries).
Crawl-family oracles read the deterministic corpus Parquet that the
matching query materializes under /tmp/rayzeno_corpus/sf0.01 (same seeded
generator, so the SQL and the Ray pipeline see identical inputs). Queries
without a SQL equivalent (minhash/simhash/embedding near-dup, language-ID,
fingerprint, multimodal, enrich) carry driver-independent python oracles
in scripts/check_oracles.py (sequential re-execution / semantic ground
truth); ``crawl_budget_order`` is checked by a sequential epoch-BSP
replay (``simulator.simulate_crawl_budget``) — no query is rows-only.

Ray is initialised by the driver — nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np

# the sf the driver's correctness gate runs at; oracle SQL strings are
# static, so they hardcode this sf's corpus path
_ORACLE_SF = 0.01
_CORPUS_ROOT = "/tmp/rayzeno_corpus"
_CRAWL_ROOT = "/tmp/rayzeno_crawl"

# crawl config shared by the queries AND the recursive-CTE oracle
_MAX_HOPS = 6


def _quiet():
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    except Exception:
        pass


def _corpus(sf_dir: str):
    from zeno_ray.corpus import CorpusSpec, corpus_dir_for_sf, ensure_corpus, sf_of_dir

    _quiet()
    sf = sf_of_dir(sf_dir)
    spec = CorpusSpec.for_sf(sf)
    cdir = ensure_corpus(spec, corpus_dir_for_sf(sf, _CORPUS_ROOT))
    return spec, cdir, sf


def _crawl_cfg():
    from zeno_ray.config import CrawlConfig

    return CrawlConfig(max_hops=_MAX_HOPS, max_epochs=32, host_budget=0,
                       seen_shards=8, fetch_concurrency=4)


def _crawl(sf_dir: str):
    """Run (once, cached on disk) the full BFS crawl for this sf; return the
    CrawlResult with pages readable."""
    from zeno_ray.crawl import CrawlResult, run_crawl

    from zeno_ray import ENGINE_VERSION
    from zeno_ray.corpus import CORPUS_VERSION

    spec, cdir, sf = _corpus(sf_dir)
    cfg = _crawl_cfg()
    ckpt = os.path.join(_CRAWL_ROOT, f"sf{sf:g}")
    done = os.path.join(ckpt, "_CRAWL_DONE")
    stamp = f"{spec}|v{CORPUS_VERSION}|e{ENGINE_VERSION}|{cfg}"
    if os.path.exists(done):
        try:
            if open(done).read().strip() == stamp:
                return CrawlResult(ckpt_dir=ckpt, epochs=0, pages_fetched=0,
                                   seen_size=0)
        except OSError:
            pass  # stale/corrupt marker → rerun below
    res = run_crawl(spec, cfg, ckpt)
    with open(done, "w") as f:
        f.write(stamp)
    return res


# ------------------------------------------------------------------ entry


def entry() -> Any:
    """Flagship: full crawl of the sf0.001 synthetic web; returns the
    crawled pages (url, host, status, hop, type, text, ...) as a Dataset."""
    _quiet()
    res = _crawl("/root/testdata/sf0.001")
    return res.pages_dataset()


# ------------------------------------------------------------------ queries


def _q_crawl_pages(sf_dir: str):
    res = _crawl(sf_dir)
    # column-pruned read: the fat html payload never reaches the driver
    pdf = res.pages_dataset(columns=["url", "hop", "type"]).to_pandas()
    out = pdf[pdf["type"] == "seed"][["url", "hop"]].copy()
    out["hop"] = out["hop"].astype("int64")
    return out.sort_values("url").reset_index(drop=True)


def _q_crawl_text(sf_dir: str):
    res = _crawl(sf_dir)
    pdf = res.pages_dataset(
        columns=["url", "text", "type", "status", "content_type"]).to_pandas()
    m = (
        (pdf["type"] == "seed")
        & (pdf["status"] == 200)
        & pdf["content_type"].str.startswith("text/html")
    )
    return pdf[m][["url", "text"]].sort_values("url").reset_index(drop=True)


def _q_crawl_assets(sf_dir: str):
    res = _crawl(sf_dir)
    pdf = res.pages_dataset(columns=["url", "type"]).to_pandas()
    out = pdf[pdf["type"] == "asset"][["url"]].drop_duplicates()
    return out.sort_values("url").reset_index(drop=True)


def _q_crawl_digest_dedup(sf_dir: str):
    """WARC payload-digest dedup (crawl.go:96-99, SURVEY §2.8 scoped-down
    form): group the crawled HTML pages by payload digest; per digest keep
    the first (min) URL and count the revisits. Distributed groupby over
    the slim (digest, url) projection — html stays on disk."""
    import pandas as pd
    from ray.data.aggregate import Min, Sum

    res = _crawl(sf_dir)
    ds = res.pages_dataset(
        columns=["url", "payload_digest", "type", "status", "content_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = (
            (df["type"] == "seed") & (df["status"] == 200)
            & df["content_type"].str.startswith("text/html")
        )
        return (
            df[m].groupby("payload_digest", as_index=False)
            .agg(url=("url", "min"), n_copies=("url", "size"))
        )

    pdf = (
        ds.map_batches(partial, batch_format="pandas", batch_size=32768)
        .groupby("payload_digest")
        .aggregate(Min("url", alias_name="url"),
                   Sum("n_copies", alias_name="n_copies"))
        .to_pandas()
    )
    pdf["n_copies"] = pdf["n_copies"].astype("int64")
    return pdf.sort_values("payload_digest").reset_index(drop=True)


def _q_extract_edges(sf_dir: str):
    from zeno_ray.pipelines import extract_edges

    _, cdir, _ = _corpus(sf_dir)
    pdf = extract_edges(cdir).to_pandas().drop_duplicates()
    return pdf.sort_values(["src", "dst", "kind"]).reset_index(drop=True)


def _q_extract_text(sf_dir: str):
    from zeno_ray.pipelines import extract_texts

    _, cdir, _ = _corpus(sf_dir)
    return extract_texts(cdir).to_pandas().sort_values("url").reset_index(drop=True)


def _q_enrich_pages(sf_dir: str):
    """Deterministic per-page enrichment (lang/quality/tokens/fingerprint)
    over the crawl corpus — the crawl→training-data handoff; verified by
    sequential re-execution in scripts/check_oracles.py."""
    from zeno_ray.pipelines import enrich_pages

    _, cdir, _ = _corpus(sf_dir)
    pdf = enrich_pages(cdir).to_pandas()
    pdf["n_tokens_ws"] = pdf["n_tokens_ws"].astype("int64")
    return pdf.sort_values("url").reset_index(drop=True)


def _q_host_stats(sf_dir: str):
    from zeno_ray.pipelines import host_stats

    _, cdir, _ = _corpus(sf_dir)
    pdf = host_stats(cdir).to_pandas()
    pdf["n_pages"] = pdf["n_pages"].astype("int64")
    pdf["n_bytes"] = pdf["n_bytes"].astype("int64")
    return pdf.sort_values("host").reset_index(drop=True)


def _q_doc_dedup_exact(sf_dir: str):
    import ray.data as rd

    from zeno_ray.ops.dedup import exact_dedup

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    pdf = exact_dedup(docs).to_pandas()[["doc_id"]]
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    return pdf.sort_values("doc_id").reset_index(drop=True)


def _q_doc_quality(sf_dir: str):
    """Quality metrics + the training-data gate in ONE query (merged with
    the former doc_quality_filter so queries() fits the driver's 50-row
    record cap — VERDICT r4 item 2): per-doc counting features, the
    composite quality score (rounded half-AWAY to 4 places BEFORE the
    threshold: DuckDB's round() is half-away while numpy's is half-even,
    and the gate must match the SQL oracle's rounded comparison exactly),
    and ``kept`` = the ≥0.895 filter verdict as int64."""
    import numpy as np
    import ray.data as rd

    from zeno_ray.ops.text import quality_features

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def feats(df):
        out = quality_features(df)[
            ["doc_id", "n_chars", "n_tokens", "n_upper", "n_punct",
             "quality"]].copy()
        out["quality"] = np.floor(out["quality"] * 10000 + 0.5) / 10000
        out["kept"] = (out["quality"] >= 0.895).astype("int64")
        return out

    pdf = docs.map_batches(feats, batch_format="pandas",
                           batch_size=4096).to_pandas()
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    return pdf.sort_values("doc_id").reset_index(drop=True)


def _q_doc_lang_stats(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "n_chars"])
    pdf = (
        docs.groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pdf["n_docs"] = pdf["n_docs"].astype("int64")
    pdf["sum_chars"] = pdf["sum_chars"].astype("int64")
    return pdf


def _q_doc_token_totals(sf_dir: str):
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "source": df["source"],
            "n_tokens": (df["text"].str.count(" ") + 1).astype("int64"),
        })
        return out.groupby("source", as_index=False).agg(
            total_tokens=("n_tokens", "sum"), n_docs=("n_tokens", "size"))

    pdf = (
        docs.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("source")
        .aggregate(Sum("total_tokens", alias_name="total_tokens"),
                   Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    pdf["total_tokens"] = pdf["total_tokens"].astype("int64")
    pdf["n_docs"] = pdf["n_docs"].astype("int64")
    return pdf


def _q_ann_topk(sf_dir: str):
    import ray.data as rd

    from zeno_ray.ops.ann import brute_force_topk

    _quiet()
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    pdf = emb.to_pandas()
    queries = np.stack(
        pdf[pdf["vec_id"].isin([0, 1, 2])].sort_values("vec_id")["embedding"].to_numpy()
    )
    out = brute_force_topk(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")), queries, k=10
    )[["q", "vec_id"]]
    out["q"] = out["q"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values(["q", "vec_id"]).reset_index(drop=True)


def _q_ann_topk_ivf(sf_dir: str):
    """IVF approximate top-k (k-means coarse quantizer, nprobe=12 of 16
    lists) for the same three queries as ann_topk; python-oracled for
    recall ≥ 0.9 vs the brute-force truth. The synthetic embeddings are
    UNIFORM random (no cluster structure), the worst case for IVF —
    hence the high nprobe; clustered real-world embeddings recall well
    at nprobe ≈ n_lists/8 (see test_ivf_topk_recall)."""
    import pandas as pd
    import ray.data as rd

    from zeno_ray.ops.ann import ivf_topk

    _quiet()
    pdf = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    queries = np.stack(
        pdf[pdf["vec_id"].isin([0, 1, 2])].sort_values("vec_id")["embedding"].to_numpy()
    )
    out = ivf_topk(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")),
        queries, k=10, n_lists=16, nprobe=12,
    )[["q", "vec_id", "sim"]]
    out["q"] = out["q"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values(["q", "vec_id"]).reset_index(drop=True)


def _q_ann_topk_lsh(sf_dir: str):
    """Random-hyperplane LSH approximate top-k for the same three queries
    as ann_topk; python-oracled for recall ≥ 0.8 vs brute-force truth plus
    every reported sim == true cosine. Uniform-random embeddings are the
    LSH worst case (no cluster structure), so the query uses
    QUERY-DIRECTED multi-probe (directed_probes): the 36 cheapest-margin
    buckets of 6 planes — measured recall 0.87 scanning ~59% of rows vs
    the old blind hamming≤3 ball's 42 buckets / 66% of rows. Clustered
    real embeddings reach recall ≥0.9 probing ≤10% of rows
    (test_lsh_topk_directed_clustered)."""
    import ray.data as rd

    from zeno_ray.ops.ann import lsh_topk

    _quiet()
    pdf = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    queries = np.stack(
        pdf[pdf["vec_id"].isin([0, 1, 2])].sort_values("vec_id")["embedding"].to_numpy()
    )
    out = lsh_topk(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")),
        queries, k=10, n_planes=6, probes=36,
    )[["q", "vec_id", "sim"]]
    out["q"] = out["q"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values(["q", "vec_id"]).reset_index(drop=True)


def _q_dedup_minhash(sf_dir: str):
    import ray.data as rd

    from zeno_ray.ops.dedup import minhash_dedup

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return minhash_dedup(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def _q_dedup_ngram(sf_dir: str):
    import ray.data as rd

    from zeno_ray.ops.dedup import ngram_jaccard_dedup

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return ngram_jaccard_dedup(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def _q_dedup_simhash(sf_dir: str):
    import ray.data as rd

    from zeno_ray.ops.dedup import simhash_groups

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    pdf = simhash_groups(docs).to_pandas()[["doc_id", "cluster"]]
    return pdf.sort_values("doc_id").reset_index(drop=True)


def _q_doc_langid(sf_dir: str):
    import ray.data as rd

    from zeno_ray.ops.text import LangIdStage

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    pdf = docs.map_batches(LangIdStage, batch_format="pandas", batch_size=2048,
                           concurrency=2).to_pandas()[["doc_id", "pred_lang"]]
    return pdf.sort_values("doc_id").reset_index(drop=True)


def _q_doc_fingerprint(sf_dir: str):
    import ray.data as rd

    from zeno_ray.ops.text import fingerprint

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    pdf = docs.map_batches(fingerprint, batch_format="pandas",
                           batch_size=2048).to_pandas()[["doc_id", "fingerprint"]]
    return pdf.sort_values("doc_id").reset_index(drop=True)


def _q_embedding_near_dup(sf_dir: str):
    import ray.data as rd

    from zeno_ray.ops.dedup import embedding_nn_lsh

    _quiet()
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # threshold 0 ⇒ nearest-neighbor join: every vector reports its closest
    # bucket-mate. The LSH-bucketed keyed shuffle IS the query path (no
    # broadcast matrix, no driver materialization); the broadcast
    # embedding_near_dup stays as the small-N verifier.
    pdf = embedding_nn_lsh(emb, threshold=0.0, n_planes=6,
                           max_hamming=2).to_pandas()
    if pdf.empty:
        import pandas as pd

        return pd.DataFrame({"vec_id": [], "dup_of": [], "sim": []})
    return pdf.sort_values("vec_id").reset_index(drop=True)


def _q_lineitem_agg(sf_dir: str):
    from zeno_ray.ops.relational import lineitem_agg

    _quiet()
    return lineitem_agg(sf_dir)


def _q_orders_by_segment(sf_dir: str):
    from zeno_ray.ops.relational import orders_by_segment

    _quiet()
    return orders_by_segment(sf_dir)


def _q_top_users(sf_dir: str):
    from zeno_ray.ops.relational import top_users_by_value

    _quiet()
    out = _round(top_users_by_value(sf_dir, k=10), "total_value", 4)
    out["user_id"] = out["user_id"].astype("int64")
    return out


def _q_events_hourly(sf_dir: str):
    from zeno_ray.ops.relational import events_hourly_window

    _quiet()
    out = events_hourly_window(sf_dir)
    out = _round(out, "sum_value", 4)
    out["n_events"] = out["n_events"].astype("int64")
    return out


def _q_events_sliding(sf_dir: str):
    from zeno_ray.ops.relational import events_sliding_window

    _quiet()
    out = _round(events_sliding_window(sf_dir), "sum_value", 4)
    out["n_events"] = out["n_events"].astype("int64")
    return out


def _q_events_sessions(sf_dir: str):
    # the keyed-shuffle scale path IS the query path; the driver-side
    # sessionize_events remains as the small-data verifier
    from zeno_ray.ops.relational import sessionize_events_distributed

    _quiet()
    out = sessionize_events_distributed(sf_dir, gap_minutes=30)
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.reset_index(drop=True)


def _q_doc_top_tokens(sf_dir: str):
    """Corpus vocabulary head: token-frequency top-100 via per-batch
    combiner partials → one vocab-sized groupby → sort+limit (driver
    sees k rows). Token semantics = DuckDB string_split(text, ' ')."""
    import ray.data as rd

    from zeno_ray.ops.text import top_tokens

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["text"])
    pdf = top_tokens(docs, k=100).to_pandas()
    pdf["n"] = pdf["n"].astype("int64")
    return pdf.reset_index(drop=True)


def _q_doc_pack_plan(sf_dir: str):
    """Sequence-packing plan (GPT-style, docs concatenated in doc_id
    order, split allowed) — a distributed prefix-sum: per-range partial
    sums, O(parts) driver-side exclusive scan, per-range vectorized
    cumsum. Oracle: SUM() OVER (ORDER BY doc_id) window in DuckDB."""
    import ray.data as rd

    from zeno_ray.ops.pack import pack_plan

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    pdf = pack_plan(docs, context_len=2048).to_pandas()
    for c in pdf.columns:
        pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values("doc_id").reset_index(drop=True)


def _q_doc_pack_chunks(sf_dir: str):
    """Materialized sequence packing: the actual 2048-token windows
    (docs concatenated in doc_id order, split at pack boundaries).
    Range shuffle with per-range offsets from the O(parts) driver scan,
    per-doc segment slicing, pack-keyed stitch shuffle. The export
    variant (ops.pack.pack_export) writes these through the resumable
    partitioned sink."""
    import ray.data as rd

    from zeno_ray.ops.pack import pack_chunks

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    pdf = pack_chunks(docs, context_len=2048).to_pandas()
    pdf["pack_id"] = pdf["pack_id"].astype("int64")
    pdf["n_tokens"] = pdf["n_tokens"].astype("int64")
    return pdf.sort_values("pack_id").reset_index(drop=True)


def _q_doc_pack_map(sf_dir: str):
    """Pack->document lineage: one row per (doc_id, pack_id) the doc
    contributes tokens to — the training-data provenance index,
    derived from the pack_plan by exploding [pack_first, pack_last]
    ranges inside map_batches (no extra shuffle)."""
    import pandas as pd
    import ray.data as rd

    from zeno_ray.ops.pack import pack_plan

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        n = (df["pack_last"] - df["pack_first"] + 1).to_numpy()
        return pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), n),
            "pack_id": np.concatenate([
                np.arange(a, b + 1, dtype=np.int64)
                for a, b in zip(df["pack_first"], df["pack_last"])])
            if len(df) else np.zeros(0, dtype=np.int64)})

    pdf = pack_plan(docs, context_len=2048)         .map_batches(explode, batch_format="pandas").to_pandas()
    return pdf.sort_values(["doc_id", "pack_id"]).reset_index(drop=True)


def _q_doc_sample_stratified(sf_dir: str):
    """Deterministic per-language downsampling (en 50% / de 25% /
    rest 10%) via Knuth multiplicative hash of doc_id — the
    mixture-building primitive; a stateless shuffle-free filter whose
    keep set is reproducible in plain SQL integer arithmetic."""
    import ray.data as rd

    from zeno_ray.ops.text import stratified_sample

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang"])
    pdf = stratified_sample(
        docs, {"en": 0.5, "de": 0.25}, default_rate=0.1).to_pandas()
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    return pdf.sort_values("doc_id").reset_index(drop=True)


def _q_doc_top_quality_per_lang(sf_dir: str):
    """Windowed-rank primitive: the 3 highest-quality docs per language
    (ROW_NUMBER() OVER (PARTITION BY lang ORDER BY quality DESC,
    doc_id)). Per-batch head(k) combiner → one groups-sized shuffle.
    Quality is rounded half-away to 4 places BEFORE ranking so the
    pandas and DuckDB orderings agree exactly."""
    import ray.data as rd

    from zeno_ray.ops.text import quality_features, top_k_per_group

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang", "text"])

    def score(df):
        out = quality_features(df)[["doc_id", "lang", "quality"]].copy()
        out["quality"] = np.floor(out["quality"] * 10000 + 0.5) / 10000
        return out

    scored = docs.map_batches(score, batch_format="pandas", batch_size=4096)
    pdf = top_k_per_group(scored, "lang", "quality", k=3).to_pandas()
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    return pdf[["lang", "doc_id", "quality"]] \
        .sort_values(["lang", "doc_id"]).reset_index(drop=True)


def _q_doc_chars_quantiles(sf_dir: str):
    """EXACT per-language quantiles of n_chars via distributed
    histograms (quantile_disc semantics) — one histogram row per
    (batch, group) moves through the shuffle, never the rows."""
    import ray.data as rd

    from zeno_ray.ops.text import group_quantiles

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "n_chars"])
    pdf = group_quantiles(docs, "lang", "n_chars",
                          qs=(0.5, 0.9, 0.99)).to_pandas()
    for c in ("n", "q50", "q90", "q99"):
        pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values("lang").reset_index(drop=True)


def _q_embedding_label_centroids(sf_dir: str):
    """Per-label embedding centroid components (vector aggregate):
    per-batch numpy reductions emit labels x dims slim partials; SQL
    oracle reconstructs per-component sums with unnest +
    generate_subscripts."""
    import ray.data as rd

    from zeno_ray.ops.ann import label_centroids

    _quiet()
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["label", "embedding"])
    out = label_centroids(emb)
    out["label"] = out["label"].astype("int64")
    return out


def _q_embedding_kmeans(sf_dir: str):
    """Spherical k-means clustering of the embeddings (seeded,
    deterministic): bounded driver-side training sample, broadcast
    centroids, one shuffle-free assign pass. Python oracle re-runs the
    same computation sequentially and matches exactly."""
    import ray.data as rd

    from zeno_ray.ops.ann import kmeans_assign

    _quiet()
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    pdf = kmeans_assign(emb, n_clusters=16).to_pandas()
    return pdf.sort_values("vec_id").reset_index(drop=True)


def _q_host_pagerank(sf_dir: str):
    """PageRank over the host-level outlink graph of the crawled corpus
    (5 power iterations, d=0.85) — the iterative keyed-shuffle operator
    class. Host edges come from the real extractor pipeline
    (extract_edges, itself oracle-checked); ranks are verified against
    a sequential numpy power iteration in scripts/check_oracles.py."""
    from zeno_ray.ops.graph import pagerank
    from zeno_ray.pipelines import extract_edges

    _, cdir, _ = _corpus(sf_dir)

    def host_pairs(df):
        import pandas as _pd

        e = df[df["kind"] == "outlink"]
        hs = e["src"].str.extract(r"^https://([^/]+)", expand=False)
        hd = e["dst"].str.extract(r"^https://([^/]+)", expand=False)
        out = _pd.DataFrame({"src": hs, "dst": hd}).dropna()
        return out[out["src"] != out["dst"]].drop_duplicates()

    hp = extract_edges(cdir).map_batches(host_pairs, batch_format="pandas")
    pdf = pagerank(hp, n_iter=5).to_pandas().rename(columns={"node": "host"})
    pdf["rank"] = pdf["rank"].astype("float64")
    return pdf.sort_values("host").reset_index(drop=True)


def _q_host_components(sf_dir: str):
    """Connected components of the (undirected) host-level outlink
    graph — min-label propagation; component representative is the
    lexicographically smallest host, so the result is EXACTLY
    reproducible by a sequential union-find (scripts/check_oracles.py)."""
    from zeno_ray.ops.graph import connected_components
    from zeno_ray.pipelines import extract_edges

    _, cdir, _ = _corpus(sf_dir)

    def host_pairs(df):
        import pandas as _pd

        e = df[df["kind"] == "outlink"]
        hs = e["src"].str.extract(r"^https://([^/]+)", expand=False)
        hd = e["dst"].str.extract(r"^https://([^/]+)", expand=False)
        out = _pd.DataFrame({"src": hs, "dst": hd}).dropna()
        return out[out["src"] != out["dst"]].drop_duplicates()

    hp = extract_edges(cdir).map_batches(host_pairs, batch_format="pandas")
    pdf = connected_components(hp).to_pandas() \
        .rename(columns={"node": "host"})
    return pdf.sort_values("host").reset_index(drop=True)


def _q_doc_tfidf_terms(sf_dir: str):
    """Per-source TF-IDF top-5 terms (tf x ln(S/df)) — feature
    extraction over the corpus vocabulary; one token-keyed coarse
    shuffle computes tf-sums and document frequencies together."""
    import ray.data as rd

    from zeno_ray.ops.text import tfidf_top_terms

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["source", "text"])
    pdf = tfidf_top_terms(docs, k=5).to_pandas()
    return pdf.sort_values(["source", "token"]).reset_index(drop=True)


def _q_events_distinct_users(sf_dir: str):
    """Approximate COUNT(DISTINCT user_id) per event_type via
    HyperLogLog (p=12, ~1.6% theoretical error) — the mergeable-sketch
    primitive: one 4 KiB register blob per (batch, group) moves through
    the shuffle, never the rows. The estimate is a pure function of the
    value set (fixed-key hash), so the python oracle re-derives it
    EXACTLY and also bounds it against the true distinct count."""
    import ray.data as rd

    from zeno_ray.ops.sketch import hll_distinct

    _quiet()
    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id"])
    pdf = hll_distinct(ev, "event_type", "user_id", p=12).to_pandas()
    return pdf.sort_values("event_type").reset_index(drop=True)


def _q_revenue_by_segment_priority(sf_dir: str):
    """Big-big repartition equi-join (lineitem x orders on orderkey,
    pre-aggregated per orderkey inside each scan batch) + broadcast
    customer-dim lookup + tiny aggregate."""
    from zeno_ray.ops.relational import revenue_by_segment_priority

    _quiet()
    return revenue_by_segment_priority(sf_dir)


def _q_suppliers_by_region(sf_dir: str):
    """Dimension-chain broadcast join supplier x nation x region — no
    shuffle at all; dims ride as a ray.put lookup frame."""
    from zeno_ray.ops.relational import suppliers_by_region

    _quiet()
    return suppliers_by_region(sf_dir)


def _q_parts_by_brand(sf_dir: str):
    from zeno_ray.ops.relational import parts_by_brand

    _quiet()
    return parts_by_brand(sf_dir)


def _q_events_funnel(sf_dir: str):
    """Ordered conversion funnel (signup -> later click -> later
    purchase): sequential-milestone semantics, per-user coarse shuffle,
    vectorized merge-chain kernel per part."""
    from zeno_ray.ops.relational import events_funnel

    _quiet()
    return events_funnel(sf_dir)


def _q_events_value_quantiles(sf_dir: str):
    """EXACT global quantiles of the unbounded float value column via
    the distributed sort + split_at_indices targeted block reads —
    the range-partitioned all-to-all sort operator class."""
    from zeno_ray.ops.relational import value_quantiles

    _quiet()
    out = value_quantiles(sf_dir)
    out["n"] = out["n"].astype("int64")
    return out


def _q_events_asof(sf_dir: str):
    """Distributed AS-OF join (DuckDB ASOF JOIN semantics): each
    purchase matched to the user's most recent click at ts <= purchase
    ts. Both sides co-partitioned by user in one union'd shuffle, then
    a single vectorized pd.merge_asof per part."""
    from zeno_ray.ops.relational import asof_join_events

    _quiet()
    return asof_join_events(sf_dir)


def _q_crawl_budget_order(sf_dir: str):
    """Politeness-budget mode: a bounded crawl with host_budget=8 and
    strict (byte-deterministic) candidate dedupe. Returns the fetched
    (url, hop) set — exercises the groupby(host) rank/budget/carryover
    shuffle end-to-end. Not SQL-expressible (budget hops are not
    BFS-minimal); its oracle is the sequential epoch-BSP replay in
    ``scripts/check_oracles.py`` (``simulate_crawl_budget``)."""
    import os as _os

    from zeno_ray import ENGINE_VERSION
    from zeno_ray.config import CrawlConfig
    from zeno_ray.crawl import run_crawl
    from zeno_ray.corpus import CORPUS_VERSION

    spec, cdir, sf = _corpus(sf_dir)
    cfg = CrawlConfig(max_hops=3, max_epochs=10, host_budget=8,
                      seen_shards=8, fetch_concurrency=4)
    ckpt = _os.path.join(_CRAWL_ROOT, f"budget_sf{sf:g}")
    done = _os.path.join(ckpt, "_CRAWL_DONE")
    stamp = f"{spec}|v{CORPUS_VERSION}|e{ENGINE_VERSION}|{cfg}"
    if not (_os.path.exists(done) and open(done).read().strip() == stamp):
        run_crawl(spec, cfg, ckpt, strict_dedupe=True)
        with open(done, "w") as f:
            f.write(stamp)
    from zeno_ray.crawl import CrawlResult

    res = CrawlResult(ckpt_dir=ckpt, epochs=0, pages_fetched=0, seen_size=0)
    pdf = res.pages_dataset().to_pandas()
    out = pdf[pdf["type"] == "seed"][["url", "hop"]].copy()
    out["hop"] = out["hop"].astype("int64")
    return out.sort_values(["url", "hop"]).reset_index(drop=True)


def _media_ds(sf_dir: str):
    import ray.data as rd

    from zeno_ray.ops.multimodal import docs_to_media

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return docs.map_batches(docs_to_media, batch_format="pandas",
                            batch_size=256)


def _q_mm_decode(sf_dir: str):
    """REAL image decode (PPM/BMP parsed with numpy — true dimensions,
    true pixel luma, true nearest-neighbor resize) over the generated
    media table's image rows."""
    import pandas as pd

    from zeno_ray.ops.multimodal import DecodeImageStage

    _quiet()
    pdf = (
        _media_ds(sf_dir)
        .map_batches(lambda df: df[df["kind"] == "image"],
                     batch_format="pandas")
        .map_batches(DecodeImageStage, fn_constructor_kwargs={"fake": False},
                     batch_format="pandas", batch_size=64, concurrency=2)
        .to_pandas()
    )
    return pdf.sort_values("media_id").reset_index(drop=True)


def _q_mm_audio(sf_dir: str):
    """REAL WAV PCM decode (stdlib wave + numpy — true sample counts,
    durations, RMS) over the media table's audio rows."""
    from zeno_ray.ops.multimodal import DecodeAudioStage

    _quiet()
    pdf = (
        _media_ds(sf_dir)
        .map_batches(lambda df: df[df["kind"] == "audio"],
                     batch_format="pandas")
        .map_batches(DecodeAudioStage, batch_format="pandas",
                     batch_size=64, concurrency=2)
        .to_pandas()
    )
    return pdf.sort_values("media_id").reset_index(drop=True)


def _q_mm_frames(sf_dir: str):
    """REAL video frame sampling (concatenated-PPM container): every 4th
    frame's true mean luma + pixel-content hash."""
    from zeno_ray.ops.multimodal import FrameSampleStage

    _quiet()
    pdf = (
        _media_ds(sf_dir)
        .map_batches(lambda df: df[df["kind"] == "video"],
                     batch_format="pandas")
        .map_batches(FrameSampleStage,
                     fn_constructor_kwargs={"every_n": 4},
                     batch_format="pandas", batch_size=32, concurrency=2)
        .to_pandas()
    )
    return pdf.sort_values(["media_id", "frame"]).reset_index(drop=True)


def _q_doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (distinct-word /
    top-word / top-bigram fractions) — shuffle-free vectorized
    map_batches; DuckDB-oracled (list ops reproduce the fractions
    exactly, incl. half-away rounding)."""
    import ray.data as rd

    from zeno_ray.ops.text import repetition_features

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    pdf = docs.map_batches(repetition_features, batch_format="pandas",
                           batch_size=4096).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def _q_doc_decontaminate(sf_dir: str):
    """Benchmark decontamination sweep: non-benchmark docs sharing any
    word-5-gram with the benchmark subset (doc_id % 29 == 0), with
    distinct shared-gram counts. Keyed-shuffle semi-join on gram hash;
    DuckDB-oracled (the oracle joins on the gram strings)."""
    import ray.data as rd

    from zeno_ray.ops.dedup import ngram_decontaminate

    _quiet()
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return ngram_decontaminate(docs, n=5, bench_mod=29)


def _q_events_retention(sf_dir: str):
    from zeno_ray.ops.relational import events_retention

    _quiet()
    return events_retention(sf_dir)


def _q_ann_topk_approx(sf_dir: str):
    """Both approximate-ANN paths in one result: IVF (k-means coarse
    quantizer, nprobe=12/16) and query-directed multi-probe LSH rows,
    tagged by a ``method`` column — python-oracled for recall vs the
    brute-force truth (ann_topk is the hash-verified exact baseline).
    See _q_ann_topk_ivf/_q_ann_topk_lsh docstrings for the per-method
    tuning story; this wrapper exists because the driver records at
    most 50 queries and the two methods share one slot."""
    import pandas as pd

    ivf = _q_ann_topk_ivf(sf_dir).assign(method="ivf")
    lsh = _q_ann_topk_lsh(sf_dir).assign(method="lsh")
    out = pd.concat([ivf, lsh], ignore_index=True)
    return out[["method", "q", "vec_id", "sim"]] \
        .sort_values(["method", "q", "vec_id"]).reset_index(drop=True)


def _q_mm_features(sf_dir: str):
    """All three multimodal decode paths in one result, tagged by a
    ``modality`` column: image (PPM/BMP numpy decode), audio (WAV PCM)
    and video (every-4th-frame luma/hash) feature rows over the media
    table. Columns are the per-modality superset; absent features fill
    -1 (ints) / "" (strings). Python-oracled per modality in
    scripts/check_oracles.py; merged because the driver records at most
    50 queries and the three stages share one slot."""
    import pandas as pd

    frames = [
        _q_mm_decode(sf_dir).assign(modality="image"),
        _q_mm_audio(sf_dir).assign(modality="audio"),
        _q_mm_frames(sf_dir).assign(modality="video"),
    ]
    # union of columns, with each frame pre-filled at ITS OWN dtype so
    # concat never NaN-promotes (an int64 feature_hash through float64
    # would silently lose bits past 2^53)
    dtypes: dict = {}
    for f in frames:
        for c in f.columns:
            dtypes.setdefault(c, f[c].dtype)
    for f in frames:
        for c, dt in dtypes.items():
            if c not in f.columns:
                if dt == object:
                    f[c] = ""
                elif str(dt).startswith("float"):
                    f[c] = -1.0
                elif str(dt).startswith("uint"):
                    f[c] = pd.Series(np.zeros(len(f)), dtype=dt)
                else:
                    f[c] = pd.Series(np.full(len(f), -1), dtype=dt)
    lead = ["modality", "media_id"]
    rest = sorted(c for c in dtypes if c not in lead)
    out = pd.concat([f[lead + rest] for f in frames], ignore_index=True)
    return out.sort_values(["modality", "media_id", "frame"]) \
        .reset_index(drop=True)


def _round(df, col, n):
    df = df.copy()
    df[col] = df[col].round(n)
    return df


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # crawl family (SURVEY.md §2 operators, over the synthetic corpus)
        "crawl_pages": _q_crawl_pages,
        "crawl_text": _q_crawl_text,
        "crawl_assets": _q_crawl_assets,
        "crawl_digest_dedup": _q_crawl_digest_dedup,
        "extract_edges": _q_extract_edges,
        "extract_text": _q_extract_text,
        "host_stats": _q_host_stats,
        # training-data ops (driver tables)
        "doc_dedup_exact": _q_doc_dedup_exact,
        "doc_quality": _q_doc_quality,
        "doc_lang_stats": _q_doc_lang_stats,
        "doc_token_totals": _q_doc_token_totals,
        "ann_topk": _q_ann_topk,
        "ann_topk_approx": _q_ann_topk_approx,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_ngram": _q_dedup_ngram,
        "dedup_simhash": _q_dedup_simhash,
        "doc_langid": _q_doc_langid,
        "doc_fingerprint": _q_doc_fingerprint,
        "doc_top_tokens": _q_doc_top_tokens,
        "doc_tfidf_terms": _q_doc_tfidf_terms,
        "doc_top_quality_per_lang": _q_doc_top_quality_per_lang,
        "doc_chars_quantiles": _q_doc_chars_quantiles,
        "doc_pack_plan": _q_doc_pack_plan,
        "doc_pack_chunks": _q_doc_pack_chunks,
        "doc_pack_map": _q_doc_pack_map,
        "doc_sample_stratified": _q_doc_sample_stratified,
        "doc_repetition": _q_doc_repetition,
        "doc_decontaminate": _q_doc_decontaminate,
        "host_pagerank": _q_host_pagerank,
        "host_components": _q_host_components,
        "embedding_near_dup": _q_embedding_near_dup,
        "embedding_kmeans": _q_embedding_kmeans,
        "embedding_label_centroids": _q_embedding_label_centroids,
        # relational / streaming-shaped demos
        "lineitem_agg": _q_lineitem_agg,
        "orders_by_segment": _q_orders_by_segment,
        "revenue_by_segment_priority": _q_revenue_by_segment_priority,
        "suppliers_by_region": _q_suppliers_by_region,
        "parts_by_brand": _q_parts_by_brand,
        "top_users": _q_top_users,
        "events_hourly": _q_events_hourly,
        "events_sliding": _q_events_sliding,
        "events_sessions": _q_events_sessions,
        "events_asof": _q_events_asof,
        "events_value_quantiles": _q_events_value_quantiles,
        "events_funnel": _q_events_funnel,
        "events_distinct_users": _q_events_distinct_users,
        "events_retention": _q_events_retention,
        "crawl_budget_order": _q_crawl_budget_order,
        # multimodal: real PPM/BMP/WAV/PPM-stream kernels (numpy/stdlib),
        # all three stages (image/audio/video) in one tagged result
        "mm_features": _q_mm_features,
        # exactly 50 entries: the driver records at most 50 rows (observed
        # r3/r4) — doc_quality_filter was merged into doc_quality (a
        # `kept` column) in r5 so enrich_pages finally gets a row too
        "enrich_pages": _q_enrich_pages,
    }


# ------------------------------------------------------------------ oracles

_CD = f"{_CORPUS_ROOT}/sf{_ORACLE_SF:g}"
_PAGES = f"read_parquet('{_CD}/pages/*.parquet')"
_EDGES = f"read_parquet('{_CD}/edges/*.parquet')"
_SEEDS = f"read_parquet('{_CD}/seeds.parquet')"

_REACH_CTE = f"""
WITH RECURSIVE reach(url, hop) AS (
    SELECT url, 0 AS hop FROM {_SEEDS}
    UNION
    SELECT e.dst,
           r.hop + CASE WHEN e.kind = 'redirect' THEN 0 ELSE 1 END
    FROM reach r
    JOIN {_EDGES} e ON e.src = r.url
    WHERE e.kind IN ('outlink', 'redirect')
      AND r.hop + CASE WHEN e.kind = 'redirect' THEN 0 ELSE 1 END <= {_MAX_HOPS}
),
reach_min AS (SELECT url, MIN(hop) AS hop FROM reach GROUP BY url)
"""


def _langid_pieces() -> tuple[str, str, str]:
    """Shared SQL fragments re-deriving ops/text.py::LangIdStage, built
    from the SAME marker tables / character classes so they can't drift.
    Returns (per-lang count select-list over column ``t``, the tie-break
    CASE tail, the CJK class)."""
    from zeno_ray.ops.text import _LANG_MARKERS, LangIdStage

    L = LangIdStage.WORD_CLASS
    C = LangIdStage.CJK_CLASS

    def count_expr(markers) -> str:
        return " + ".join(
            f"CASE WHEN regexp_matches(t, '(^|[^{L}]){m}($|[^{L}])') "
            "THEN 1 ELSE 0 END"
            for m in sorted(markers))

    per_lang = ",\n               ".join(
        f"({count_expr(ms)}) AS n_{lang}"
        for lang, ms in _LANG_MARKERS.items())
    langs = list(_LANG_MARKERS)  # dict order IS the python tie-break order
    chain = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"n_{lang} >= n_{o}" for o in langs[i + 1:])
        chain.append(f"WHEN {conds} THEN '{lang}'")
    chain.append(f"ELSE '{langs[-1]}' END")
    return per_lang, "\n                ".join(chain), C


def _langid_sql() -> str:
    """DuckDB re-derivation of ops/text.py::LangIdStage over documents:
    lowercase first-2000 chars; 'ja' when CJK count > max(8, 5% of
    length); else the first language in marker-table order achieving the
    max whole-word stopword overlap (maximal [letter]+ runs)."""
    per_lang, chain_sql, C = _langid_pieces()
    return f"""
        WITH t AS (SELECT doc_id, lower(substr(text, 1, 2000)) AS t
                   FROM documents),
        f AS (SELECT doc_id, t, length(t) AS n,
                     length(regexp_replace(t, '[^{C}]', '', 'g')) AS cjk
              FROM t),
        c AS (SELECT doc_id, cjk > greatest(8.0, n * 0.05) AS is_ja,
               {per_lang}
              FROM f)
        SELECT doc_id,
               CASE WHEN is_ja THEN 'ja'
                {chain_sql} AS pred_lang
        FROM c ORDER BY doc_id"""


def _enrich_sql() -> str:
    """DuckDB re-derivation of pipelines.py::EnrichStage over the corpus
    pages: the extracted text per url is byte-identical to the corpus
    ``text`` column (the extract_text oracle proves that), so every
    enrichment feature — langid, quality score, whitespace token count,
    min-shingle fingerprint — is recomputed from ``p.text`` with the
    same SQL fragments the per-feature oracles use."""
    per_lang, chain_sql, C = _langid_pieces()
    return f"""
        WITH base AS (
            SELECT url, text FROM {_PAGES}
            WHERE status = 200 AND content_type LIKE 'text/html%'),
        lid AS (
            SELECT url,
                   CASE WHEN length(regexp_replace(t, '[^{C}]', '', 'g'))
                        > greatest(8.0, length(t) * 0.05)
                        THEN 'ja'
                   {chain_sql} AS pred_lang
            FROM (SELECT url, lower(substr(text, 1, 2000)) AS t,
                         {per_lang}
                  FROM base)),
        q AS (
            SELECT url,
                   length(text) AS n_chars,
                   length(text) - length(replace(text, ' ', '')) + 1
                       AS n_tokens,
                   length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                       AS n_punct
            FROM base),
        qual AS (
            SELECT url,
                   round(LEAST(GREATEST(
                       1.0
                       - (LEAST(GREATEST(
                             (n_chars - (n_tokens - 1))
                             / CAST(GREATEST(n_tokens, 1) AS DOUBLE),
                             2.0), 14.0) - 2.0) / 24.0
                       - LEAST(n_punct / CAST(GREATEST(n_chars, 1) AS DOUBLE),
                               0.5),
                   0.0), 1.0), 6) AS quality
            FROM q),
        toks AS (
            SELECT url,
                   CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                        x -> x <> '')) AS BIGINT)
                       AS n_tokens_ws
            FROM base),
        fp AS (
            SELECT url,
                   min(substr(md5(substr(text, i + 1, 8)), 1, 16))
                       AS fingerprint
            FROM (SELECT url, text,
                         unnest(range(0, length(text) - 7,
                                      greatest((length(text) - 8) // 256, 1)))
                             AS i
                  FROM base WHERE length(text) >= 8)
            GROUP BY url
            UNION ALL
            SELECT url, substr(md5(text), 1, 16) AS fingerprint
            FROM base WHERE length(text) < 8)
        SELECT b.url AS url, lid.pred_lang, qual.quality, toks.n_tokens_ws,
               fp.fingerprint
        FROM base b JOIN lid USING (url) JOIN qual USING (url)
        JOIN toks USING (url) JOIN fp USING (url)
        ORDER BY url"""


def _pagerank_sql(n_iter: int = 5) -> str:
    """DuckDB re-derivation of ops/graph.py::pagerank over the host graph
    (the same derivation as _q_host_pagerank's host_pairs): n_iter power
    iterations UNROLLED as chained CTEs — no recursion needed. Float ops
    are written in the exact order the kernel computes them
    ((1-d)/n + d*dangling/n + d*insum, contributions rank/deg), so both
    sides agree to ~1e-13 and trivially at the 6-dp compare."""
    D = "CAST(0.85 AS DOUBLE)"
    H = "regexp_extract({}, '^https://([^/]+)', 1)"
    hs, hd = H.format("src"), H.format("dst")
    iters = []
    prev = "r0"
    for k in range(1, n_iter + 1):
        iters.append(f"""
        r{k} AS (
            SELECT nd.node,
                   (1.0 - {D}) / (SELECT n FROM nn)
                   + {D} * (SELECT COALESCE(SUM(r.rank), 0.0)
                            FROM {prev} r LEFT JOIN deg dg ON r.node = dg.src
                            WHERE dg.src IS NULL) / (SELECT n FROM nn)
                   + {D} * COALESCE(s.insum, 0.0) AS rank
            FROM nodes nd LEFT JOIN (
                SELECT e.dst AS node, SUM(r.rank / dg.deg) AS insum
                FROM hedges e
                JOIN {prev} r ON e.src = r.node
                JOIN deg dg ON e.src = dg.src
                GROUP BY e.dst) s ON nd.node = s.node)""")
        prev = f"r{k}"
    return f"""
        WITH hedges AS (
            SELECT DISTINCT {hs} AS src, {hd} AS dst
            FROM {_EDGES} WHERE kind = 'outlink'
              AND {hs} <> {hd} AND {hs} <> '' AND {hd} <> ''),
        nodes AS (SELECT src AS node FROM hedges
                  UNION SELECT dst FROM hedges),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                FROM hedges GROUP BY src),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
        {','.join(iters)}
        SELECT node AS host, rank FROM {prev} ORDER BY host"""


def oracle_sql() -> dict[str, str]:
    return {
        "crawl_pages": _REACH_CTE
        + "SELECT url, hop FROM reach_min ORDER BY url",
        "crawl_text": _REACH_CTE
        + f"""
        SELECT p.url AS url, p.text AS text
        FROM reach_min r JOIN {_PAGES} p ON p.url = r.url
        WHERE p.status = 200 AND p.content_type LIKE 'text/html%'
        ORDER BY url""",
        "crawl_assets": _REACH_CTE
        + f"""
        SELECT DISTINCT e.dst AS url
        FROM reach_min r JOIN {_EDGES} e ON e.src = r.url
        WHERE e.kind = 'asset' ORDER BY url""",
        "crawl_digest_dedup": _REACH_CTE
        + f"""
        SELECT sha256(decode(p.html)) AS payload_digest,
               MIN(p.url) AS url, COUNT(*) AS n_copies
        FROM reach_min r JOIN {_PAGES} p ON p.url = r.url
        WHERE p.status = 200 AND p.content_type LIKE 'text/html%'
        GROUP BY 1 ORDER BY payload_digest""",
        "extract_edges": f"""
        SELECT DISTINCT src, dst, kind FROM {_EDGES}
        WHERE kind != 'redirect' ORDER BY src, dst, kind""",
        "extract_text": f"""
        SELECT url, text FROM {_PAGES}
        WHERE status = 200 AND content_type LIKE 'text/html%' ORDER BY url""",
        "host_stats": f"""
        SELECT regexp_extract(url, '^https://([^/]+)', 1) AS host,
               COUNT(*) AS n_pages, CAST(SUM(octet_length(html)) AS BIGINT) AS n_bytes
        FROM {_PAGES} GROUP BY 1 ORDER BY host""",
        "doc_dedup_exact": """
        SELECT doc_id FROM (
            SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM documents) WHERE rn = 1 ORDER BY doc_id""",
        "doc_quality": """
        WITH q AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
                   length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
                   length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
            FROM documents),
        s AS (
            SELECT *,
                   round(LEAST(GREATEST(
                       1.0
                       - (LEAST(GREATEST(
                             (n_chars - (n_tokens - 1))
                             / CAST(GREATEST(n_tokens, 1) AS DOUBLE),
                             2.0), 14.0) - 2.0) / 24.0
                       - LEAST(n_punct / CAST(GREATEST(n_chars, 1) AS DOUBLE),
                               0.5),
                   0.0), 1.0), 4) AS quality
            FROM q)
        SELECT doc_id, n_chars, n_tokens, n_upper, n_punct, quality,
               CAST(quality >= 0.895 AS BIGINT) AS kept
        FROM s ORDER BY doc_id""",
        "doc_lang_stats": """
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang ORDER BY lang""",
        "doc_top_quality_per_lang": """
        WITH q AS (
            SELECT doc_id, lang,
                   length(text) AS n_chars,
                   length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
                   length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
            FROM documents),
        s AS (
            SELECT doc_id, lang,
                   round(LEAST(GREATEST(
                       1.0
                       - (LEAST(GREATEST(
                             (n_chars - (n_tokens - 1))
                             / CAST(GREATEST(n_tokens, 1) AS DOUBLE),
                             2.0), 14.0) - 2.0) / 24.0
                       - LEAST(n_punct / CAST(GREATEST(n_chars, 1) AS DOUBLE),
                               0.5),
                   0.0), 1.0), 4) AS quality
            FROM q),
        r AS (
            SELECT lang, doc_id, quality,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY quality DESC, doc_id) AS rn
            FROM s)
        SELECT lang, doc_id, quality FROM r WHERE rn <= 3
        ORDER BY lang, doc_id""",
        "doc_chars_quantiles": """
        SELECT lang, COUNT(*) AS n,
               quantile_disc(n_chars, 0.5) AS q50,
               quantile_disc(n_chars, 0.9) AS q90,
               quantile_disc(n_chars, 0.99) AS q99
        FROM documents GROUP BY lang ORDER BY lang""",
        "doc_tfidf_terms": """
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS token
            FROM documents),
        tf AS (SELECT source, token, COUNT(*) AS tf
               FROM tok GROUP BY source, token),
        dfreq AS (SELECT token, COUNT(DISTINCT source) AS df
                  FROM tf GROUP BY token),
        sc AS (
            SELECT tf.source, tf.token,
                   round(tf.tf * ln(
                       (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE)
                        FROM documents) / dfreq.df), 6) AS score
            FROM tf JOIN dfreq USING (token)),
        r AS (
            SELECT source, token, score,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY score DESC, token) AS rn
            FROM sc)
        SELECT source, token, score FROM r WHERE rn <= 5
        ORDER BY source, token""",
        "doc_top_tokens": """
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT 100""",
        # EXACT n-gram Jaccard dedup is SQL-expressible end-to-end: the Ray
        # kernel hashes char-5-grams of " ".join(text.lower().split()) only
        # for speed — set Jaccard over 64-bit gram hashes equals set Jaccard
        # over the gram strings (no collisions at oracle scale), and the
        # testdata text is ASCII/single-spaced so normalization = lower().
        # Components + min-id representative via recursive min-label CTE.
        "dedup_ngram": """
        WITH RECURSIVE norm AS (
            SELECT doc_id, lower(text) AS t FROM documents),
        grams AS (
            SELECT DISTINCT doc_id, substr(t, CAST(i AS INTEGER), 5) AS gram
            FROM norm, LATERAL unnest(
                generate_series(1, greatest(length(t) - 4, 1))) AS u(i)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        inter AS (
            SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS i
            FROM grams ga JOIN grams gb
              ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
            GROUP BY 1, 2),
        edges AS (
            SELECT i.a, i.b
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.a
            JOIN sizes sb ON sb.doc_id = i.b
            WHERE CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) >= 0.8),
        sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
        reach(doc_id, lbl) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.doc_id)
        SELECT doc_id, CAST(min(lbl) AS BIGINT) AS cluster
        FROM reach GROUP BY doc_id ORDER BY doc_id""",
        "doc_pack_plan": """
        WITH t AS (
            SELECT doc_id,
                   length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
            FROM documents),
        s AS (
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(SUM(n_tokens) OVER (ORDER BY doc_id) - n_tokens
                        AS BIGINT) AS start_token
            FROM t)
        SELECT doc_id, n_tokens, start_token,
               start_token // 2048 AS pack_first,
               (start_token + GREATEST(n_tokens, 1) - 1) // 2048 AS pack_last,
               (start_token + GREATEST(n_tokens, 1) - 1) // 2048
                   - start_token // 2048 + 1 AS n_packs
        FROM s ORDER BY doc_id""",
        "doc_pack_chunks": """
        WITH l AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS token,
                       generate_subscripts(toks, 1) AS ord
                FROM l),
        pos AS (SELECT token,
                       ROW_NUMBER() OVER (ORDER BY doc_id, ord) - 1 AS p
                FROM tok)
        SELECT p // 2048 AS pack_id, COUNT(*) AS n_tokens,
               string_agg(token, ' ' ORDER BY p) AS pack_text
        FROM pos GROUP BY 1 ORDER BY 1""",
        "doc_pack_map": """
        WITH t AS (
            SELECT doc_id,
                   length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
            FROM documents),
        s AS (
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(SUM(n_tokens) OVER (ORDER BY doc_id) - n_tokens
                        AS BIGINT) AS start_token
            FROM t)
        SELECT doc_id, unnest(generate_series(start_token // 2048,
               (start_token + GREATEST(n_tokens, 1) - 1) // 2048)) AS pack_id
        FROM s ORDER BY doc_id, pack_id""",
        "doc_sample_stratified": """
        SELECT doc_id, lang FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 % 10000 <
              CASE WHEN lang = 'en' THEN 5000
                   WHEN lang = 'de' THEN 2500 ELSE 1000 END
        ORDER BY doc_id""",
        "doc_token_totals": """
        SELECT source,
               CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS total_tokens,
               COUNT(*) AS n_docs
        FROM documents GROUP BY source ORDER BY source""",
        # Gopher-style repetition signals: words = string_split(text,' ')
        # (empty pieces count), bigrams join adjacent words with one
        # space; ROUND is half-away, mirrored in the Ray kernel via
        # floor(x*1e6+0.5). Docs with <2 words drop (inner join).
        "doc_repetition": """
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        ex AS (SELECT doc_id, unnest(words) AS word FROM w),
        cnts AS (SELECT doc_id, word, COUNT(*) AS cnt
                 FROM ex GROUP BY doc_id, word),
        wc AS (
            SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
                   COUNT(*) AS n_distinct, MAX(cnt) AS top_word_n
            FROM cnts GROUP BY doc_id),
        g AS (
            SELECT doc_id,
                   list_transform(generate_series(1, len(words) - 1),
                                  i -> words[i] || ' ' || words[i + 1]) AS grams
            FROM w),
        gx AS (SELECT doc_id, unnest(grams) AS gram FROM g),
        gcnts AS (SELECT doc_id, gram, COUNT(*) AS cnt
                  FROM gx GROUP BY doc_id, gram),
        gc AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
                      MAX(cnt) AS top_gram_n
               FROM gcnts GROUP BY doc_id)
        SELECT wc.doc_id, wc.n_words,
               ROUND(wc.n_distinct * 1.0 / wc.n_words, 6) AS distinct_word_frac,
               ROUND(wc.top_word_n * 1.0 / wc.n_words, 6) AS top_word_frac,
               ROUND(gc.top_gram_n * 1.0 / gc.n_bigrams, 6) AS top_bigram_frac
        FROM wc JOIN gc USING (doc_id) ORDER BY wc.doc_id""",
        # Decontamination: the Ray kernel joins on 64-bit gram hashes
        # (collision-free at oracle scale); the oracle joins on the gram
        # STRINGS — equal results unless blake2b+splitmix collide.
        "doc_decontaminate": """
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        g AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       generate_series(1, len(words) - 4),
                       i -> words[i] || ' ' || words[i+1] || ' ' ||
                            words[i+2] || ' ' || words[i+3] || ' ' ||
                            words[i+4]))) AS gram
            FROM w),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 29 = 0)
        SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared
        FROM g JOIN bench USING (gram)
        WHERE g.doc_id % 29 <> 0
        GROUP BY g.doc_id ORDER BY g.doc_id""",
        "ann_topk": """
        SELECT q, vec_id FROM (
            SELECT q.vec_id AS q, e.vec_id AS vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                                e.vec_id) AS rn
            FROM embeddings e
            CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id IN (0, 1, 2)) q)
        WHERE rn <= 10 ORDER BY q, vec_id""",
        "lineitem_agg": """
        SELECT l_returnflag, l_linestatus,
               round(SUM(l_quantity), 2) AS sum_qty,
               round(SUM(l_extendedprice), 2) AS sum_price,
               round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""",
        "orders_by_segment": """
        SELECT c_mktsegment, round(SUM(o_totalprice), 2) AS total_price,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        "revenue_by_segment_priority": """
        SELECT c_mktsegment, o_orderpriority,
               round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority
        ORDER BY c_mktsegment, o_orderpriority""",
        "suppliers_by_region": """
        SELECT r_name, n_name, COUNT(*) AS n_suppliers,
               round(SUM(s_acctbal), 2) AS total_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name""",
        "parts_by_brand": """
        SELECT p_brand, COUNT(*) AS n_parts,
               round(SUM(p_retailprice), 2) AS total_price,
               CAST(MAX(p_size) AS BIGINT) AS max_size
        FROM part GROUP BY p_brand ORDER BY p_brand""",
        "top_users": """
        SELECT user_id, round(SUM(value), 4) AS total_value
        FROM events GROUP BY user_id ORDER BY SUM(value) DESC LIMIT 10""",
        "events_hourly": """
        SELECT event_type, date_trunc('hour', ts) AS window_start,
               COUNT(*) AS n_events, round(SUM(value), 4) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY event_type, window_start""",
        "events_sliding": """
        SELECT event_type, window_start, COUNT(*) AS n_events,
               round(SUM(value), 4) AS sum_value
        FROM (
            SELECT event_type, value,
                   date_trunc('hour', ts) + INTERVAL (CASE WHEN minute(ts) >= 30 THEN 30 ELSE 0 END) MINUTE AS w0,
                   ts
            FROM events
        ), LATERAL (VALUES (w0), (w0 - INTERVAL 30 MINUTE)) AS t(window_start)
        GROUP BY event_type, window_start
        ORDER BY event_type, window_start""",
        "embedding_label_centroids": """
        WITH e AS (SELECT label, unnest(embedding) AS val,
                          generate_subscripts(embedding, 1) AS dim
                   FROM embeddings)
        SELECT CAST(label AS BIGINT) AS label, dim,
               round(SUM(val), 4) AS sum_val, COUNT(*) AS n
        FROM e GROUP BY label, dim ORDER BY label, dim""",
        "events_retention": """
        WITH firstday AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id),
        activity AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
               CAST(a.day - f.cohort_day AS BIGINT) AS day_offset,
               COUNT(*) AS n_users
        FROM activity a JOIN firstday f USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_funnel": """
        WITH s AS (SELECT user_id, MIN(ts) AS t1 FROM events
                   WHERE event_type = 'signup' GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
              JOIN s ON e.user_id = s.user_id
              WHERE e.event_type = 'click' AND e.ts > s.t1
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
              JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.t2
              GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM s) AS n_signup,
               (SELECT COUNT(*) FROM c) AS n_click,
               (SELECT COUNT(*) FROM p) AS n_purchase""",
        "events_value_quantiles": """
        SELECT COUNT(*) AS n,
               round(quantile_disc(value, 0.5), 6) AS q50,
               round(quantile_disc(value, 0.9), 6) AS q90,
               round(quantile_disc(value, 0.99), 6) AS q99
        FROM events""",
        "events_asof": """
        -- clicks pre-deduped to max(event_id) per (user_id, ts): the
        -- ASOF JOIN pick among equal-ts matches is otherwise
        -- unspecified; the Ray side applies the identical tie-break
        SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS ts,
               c.event_id AS click_event_id, c.ts AS click_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT user_id, ts, max(event_id) AS event_id
                   FROM events WHERE event_type = 'click'
                   GROUP BY user_id, ts) c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY event_id""",
        "events_sessions": """
        WITH g AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (
            SELECT user_id, ts,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM g)
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
        # ------- SQL re-derivations of formerly python-oracled kernels
        "doc_langid": _langid_sql(),
        "enrich_pages": _enrich_sql(),
        "doc_fingerprint": """
        -- mirrors ops/text.py::fingerprint exactly: min over character
        -- shingles (window 8, step max(1,(n-8)//256)) of the first 16
        -- md5 hex chars; short texts hash whole. Positions are
        -- 0-indexed i with i <= n-8 and i % step = 0.
        WITH docs AS (SELECT doc_id, text, length(text) AS n FROM documents),
        lng AS (
            SELECT doc_id,
                   min(substr(md5(substr(text, i + 1, 8)), 1, 16))
                       AS fingerprint
            FROM (SELECT doc_id, text,
                         unnest(range(0, n - 7,
                                      greatest((n - 8) // 256, 1))) AS i
                  FROM docs WHERE n >= 8)
            GROUP BY doc_id),
        short AS (
            SELECT doc_id, substr(md5(text), 1, 16) AS fingerprint
            FROM docs WHERE n < 8)
        SELECT doc_id, fingerprint FROM lng
        UNION ALL SELECT doc_id, fingerprint FROM short
        ORDER BY doc_id""",
        "events_distinct_users": """
        -- HyperLogLog p=12 re-derived in SQL: hash(BIGINT) is DuckDB's
        -- murmur64 finalizer, bit-identical to ops/sketch.py::_hash64;
        -- registers = max rho per top-12-bit index, estimate = the
        -- standard bias-corrected formula + linear counting small range
        WITH hv AS (
            SELECT DISTINCT event_type, hash(user_id) AS h FROM events),
        regs AS (
            SELECT event_type, h >> 52 AS idx,
                   MAX(CASE WHEN (h & 4503599627370495) = 0 THEN 53
                       ELSE 52 - CAST(floor(log2(
                           (h & 4503599627370495)::DOUBLE)) AS INT) END) AS rho
            FROM hv GROUP BY event_type, idx),
        est AS (
            SELECT event_type,
                   (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 /
                       (SUM(pow(2.0, -rho)) + (4096 - COUNT(*))) AS raw,
                   4096 - COUNT(*) AS zeros
            FROM regs GROUP BY event_type)
        SELECT event_type,
               CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
                    THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END
                   AS distinct_est
        FROM est ORDER BY event_type""",
        "host_pagerank": _pagerank_sql(),
        "host_components": f"""
        -- undirected min-label components via transitive closure: the
        -- recursive reach set (who can reach whom over undirected host
        -- edges), then component = min reachable label per node —
        -- identical to graph.py's lexicographic-min representative
        WITH RECURSIVE hedges AS (
            SELECT DISTINCT regexp_extract(src, '^https://([^/]+)', 1) AS a,
                            regexp_extract(dst, '^https://([^/]+)', 1) AS b
            FROM {_EDGES} WHERE kind = 'outlink'
              AND regexp_extract(src, '^https://([^/]+)', 1)
                  <> regexp_extract(dst, '^https://([^/]+)', 1)
              AND regexp_extract(src, '^https://([^/]+)', 1) <> ''
              AND regexp_extract(dst, '^https://([^/]+)', 1) <> ''),
        und AS (SELECT a, b FROM hedges UNION SELECT b, a FROM hedges),
        reach(node, lab) AS (
            SELECT a, a FROM und
            UNION
            SELECT u.b, r.lab FROM reach r JOIN und u ON u.a = r.node)
        SELECT node AS host, min(lab) AS component
        FROM reach GROUP BY node ORDER BY host""",
    }
