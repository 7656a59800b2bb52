"""Stateless map_batches stages: extract-and-text, candidate explode/gate.

These are the zero-copy Arrow per-batch transforms between the Fetcher actor
pool and the frontier shuffle. One HTML parse per page produces BOTH the
pages-table row (with the byte-identical extracted ``text``) and the raw
candidate list (as an Arrow ``list<struct>`` column, exploded vectorized in
the next stage) — no page is parsed twice.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from zeno_ray.config import CrawlConfig, make_is_excluded
from zeno_ray.extract import extract_from_page
from zeno_ray.extract.m3u8x import is_m3u8_content_type
from zeno_ray.urlnorm import hash64, hash64_batch, host_of, registrable_domain

# outlink candidates become future "seed" items, asset candidates are
# fetched inline — the only two item types the reference ever creates
# (cmd/get_url.go:46, assets.go:109)
PAGES_CAND_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("status", pa.int16()),
        ("content_type", pa.string()),
        ("html", pa.binary()),
        # WARC payload digest (crawl.go:96-99 dedupes on it; SURVEY §2.8
        # scopes that down to "record the digest column"). sha256 hex — the
        # reference uses sha1-base32, but sha256 is the one digest DuckDB
        # can recompute, making the dedup query oracle-checkable.
        ("payload_digest", pa.string()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("redirect_location", pa.string()),
        ("hop", pa.int32()),
        ("type", pa.string()),
        ("parent_url", pa.string()),
        ("order", pa.int64()),
        ("n_retries", pa.int32()),
        ("candidates", pa.list_(pa.struct(
            [("url", pa.string()), ("kind", pa.string()), ("pos", pa.int32())]
        ))),
    ]
)

PAGES_COLUMNS = [n for n in PAGES_CAND_SCHEMA.names if n != "candidates"]

CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("hash", pa.uint64()),
        ("hop", pa.int32()),
        ("type", pa.string()),  # "seed" (outlink) | "asset"
        ("parent_url", pa.string()),
        ("seq_order", pa.int64()),
        ("seq_pos", pa.int32()),
    ]
)


class ExtractStage:
    """Fetched records → pages rows + per-page candidate lists.

    Content-type dispatch and tag inventory per capture.go:459-607 /
    assets.go:182-457; asset-type items are parsed ONLY when they are M3U8
    playlists (recursive media capture, assets.go:55-65) — other assets are
    recorded, never parsed, and never yield outlinks (SURVEY.md §2.7.4).
    """

    def __init__(self, cfg: CrawlConfig, pages_dir: str | None = None,
                 plugins=None, meta_dir: str | None = None,
                 counts_dir: str | None = None):
        self.cfg = cfg
        self.pages_dir = pages_dir
        self.meta_dir = meta_dir  # WARC-metadata-style side records sink
        # slim per-batch (host, type, n) rows for epoch metrics/lineage —
        # lets the commit path aggregate a few tiny files instead of
        # re-reading every pages part (O(pages/epoch) driver scan)
        self.counts_dir = counts_dir
        self.plugins = plugins  # PluginRegistry | None — post-fetch/extract
        self.is_excluded = make_is_excluded(cfg)
        self.disabled = frozenset(cfg.disabled_html_tags)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        out = {n: [] for n in PAGES_CAND_SCHEMA.names}
        cols = {n: batch[n].to_pylist() for n in batch.schema.names}
        n = batch.num_rows
        meta_records: list[tuple[str, str]] = []
        for i in range(n):
            url = cols["url"][i]
            status = cols["status"][i]
            typ = cols["type"][i]
            ct = cols["content_type"][i] or ""
            html = cols["html"][i] or b""
            cands: list[dict] = []
            text = ""
            parse = status == 200 and (
                typ == "seed" or (typ == "asset" and is_m3u8_content_type(ct))
            )
            # post-fetch plugin chain (capture.go:339-437): response-body
            # extractors run before (or instead of) the generic extractor
            pf = None
            if self.plugins is not None and status == 200 and typ == "seed":
                pf = self.plugins.apply_post_fetch(url, html, ct)
                if pf is not None:
                    if pf.metadata:
                        meta_records.append((url, pf.metadata))
                    if pf.consume:
                        parse = False
            if parse and not cfg.disable_assets_capture and typ == "asset":
                res = extract_from_page(
                    url, html, ct, server=cols["server"][i],
                    is_excluded=self.is_excluded,
                )
                cands = [
                    {"url": u, "kind": "asset", "pos": p}
                    for p, u in enumerate(res.assets)
                ]
            elif parse and typ == "seed":
                res = extract_from_page(
                    url, html, ct,
                    link_header=cols["link_header"][i],
                    server=cols["server"][i],
                    disabled_tags=self.disabled,
                    capture_alternate_pages=cfg.capture_alternate_pages,
                    is_excluded=self.is_excluded,
                )
                text = res.text
                outlinks, assets = res.outlinks, res.assets
                if self.plugins is not None:
                    outlinks, assets = self.plugins.apply_post_extract(
                        url, outlinks, assets)
                cands = [
                    {"url": u, "kind": "outlink", "pos": p}
                    for p, u in enumerate(outlinks)
                ]
                if not cfg.disable_assets_capture:
                    base = len(cands)
                    cands += [
                        {"url": u, "kind": "asset", "pos": base + p}
                        for p, u in enumerate(assets)
                    ]
            if pf is not None:
                # plugin-extracted outlinks/assets (reddit permalinks,
                # youtube stream/meta URLs, ina player set) enqueue after
                # the page's own links
                base = len(cands)
                cands += [
                    {"url": u, "kind": "outlink", "pos": base + p}
                    for p, u in enumerate(pf.outlinks)
                ]
                base = len(cands)
                cands += [
                    {"url": u, "kind": "asset", "pos": base + p}
                    for p, u in enumerate(pf.assets)
                ]
            for name in ("url", "host", "status", "content_type", "html",
                         "lang", "warc_ts", "redirect_location", "hop",
                         "type", "parent_url", "order", "n_retries"):
                out[name].append(cols[name][i])
            out["payload_digest"].append(hashlib.sha256(html).hexdigest())
            out["text"].append(text)
            out["candidates"].append(cands)
        table = pa.table(
            {k: pa.array(v, PAGES_CAND_SCHEMA.field(k).type) for k, v in out.items()},
            schema=PAGES_CAND_SCHEMA,
        )
        if self.meta_dir is not None and meta_records:
            # WARC metadata record side-table (capture.go:387-389 writes a
            # metadata WARC record per extracted video; here one Parquet
            # row (url, metadata) per record, same idempotent part naming)
            import pyarrow.parquet as pq

            mt = pa.table({
                "url": pa.array([u for u, _ in meta_records], pa.string()),
                "metadata": pa.array([m for _, m in meta_records], pa.string()),
            })
            key = hashlib.blake2b(
                "|".join(u for u, _ in meta_records).encode(), digest_size=12
            ).hexdigest()
            tmp = os.path.join(self.meta_dir, f".part-{key}.tmp")
            final = os.path.join(self.meta_dir, f"part-{key}.parquet")
            pq.write_table(mt, tmp)
            os.replace(tmp, final)
        if self.pages_dir is None:
            return table
        # sink mode: write this batch's pages part here (side-effect sink —
        # the html bytes never re-enter the object store) and pass only the
        # slim candidate columns downstream. Filenames are deterministic in
        # the batch content, so a retried task overwrites its own part
        # (idempotent), and a resumed epoch rewrites the same files.
        if table.num_rows:
            key = hashlib.blake2b(
                f"{out['url'][0]}|{out['url'][-1]}|{table.num_rows}|"
                f"{min(out['order'])}".encode(), digest_size=12
            ).hexdigest()
            import pyarrow.parquet as pq

            tmp = os.path.join(self.pages_dir, f".part-{key}.tmp")
            final = os.path.join(self.pages_dir, f"part-{key}.parquet")
            pq.write_table(table.drop_columns(["candidates"]), tmp)
            os.replace(tmp, final)
            if self.counts_dir is not None:
                import pandas as pd

                counts = (
                    pd.DataFrame({"host": out["host"], "type": out["type"]})
                    .groupby(["host", "type"], as_index=False).size()
                    .rename(columns={"size": "n"})
                )
                ct = pa.table({
                    "host": pa.array(counts["host"], pa.string()),
                    "type": pa.array(counts["type"], pa.string()),
                    "n": pa.array(counts["n"], pa.int64()),
                })
                ctmp = os.path.join(self.counts_dir, f".part-{key}.tmp")
                cfinal = os.path.join(self.counts_dir, f"part-{key}.parquet")
                pq.write_table(ct, ctmp)
                os.replace(ctmp, cfinal)
        return table.select(["url", "host", "hop", "order", "candidates"])


def _host_arrow(urls: pa.Array) -> pa.Array:
    """Vectorized canonical-host extraction for canonical http(s) URLs
    (candidates are post-clean_urls, so the shape is guaranteed); falls back
    to the exact Python host_of for any residual null."""
    import pyarrow.compute as pc

    extracted = pc.extract_regex(urls, r"^[a-z][a-z0-9+.\-]*://(?P<h>[^/?#]*)")
    hosts = extracted.field("h") if extracted.null_count == 0 else None
    if hosts is not None:
        # strip userinfo if ever present
        return pc.replace_substring_regex(hosts, r"^[^@]*@", "")
    return pa.array([host_of(u) for u in urls.to_pylist()], pa.string())


class CandidateStage:
    """Explode candidate lists and apply the enqueue gates:
    - domains-crawl same-registrable-domain re-entry at hop 0
      (outlinks.go:65-76, 100-164);
    - hop limit: enqueue only when ``max_hops >= hop+1`` (outlinks.go:77);
    - assets keep the parent's hop and are never hop-gated
      (assets.go:139-180).
    Emits the canonical candidate schema with the deterministic FIFO order
    key (seq_order = parent fetch order, seq_pos = in-page position)."""

    # hosted-domain carve-out for --domains-crawl (outlinks.go:103-129)
    HOSTED_DOMAINS = frozenset({
        "forumactif.com", "canalblog.com", "blogspot.com", "wordpress.com",
        "tumblr.com", "weebly.com", "jimdo.com", "webnode.com", "yola.com",
        "strikingly.com", "site123.com", "simplesite.com", "webstarts.com",
        "webflow.com", "weblium.com", "webself.net", "one.com", "free.fr",
        "000webhost.com", "hostinger.com", "hostgator.com", "bluehost.com",
        "godaddy.com", "siteground.com", "ionos.com",
    })

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg

    def _domains_crawl_pass(self, origin_host: str, outlink_host: str,
                            origin_hop: int) -> bool:
        if not self.cfg.domains_crawl or origin_hop != 0:
            return False
        od = registrable_domain(origin_host)
        ld = registrable_domain(outlink_host)
        if not od or not ld:
            return False
        if od in self.HOSTED_DOMAINS:
            # crawl the subdomain, not the entire hosted domain
            # (outlinks.go:156-161)
            return origin_host.partition(":")[0] in outlink_host
        return od == ld

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        if batch.num_rows == 0:
            return CANDIDATE_SCHEMA.empty_table()
        import pyarrow.compute as pc

        # vectorized explode: list<struct> → flat arrays + parent indices
        cands = batch["candidates"].combine_chunks()
        if isinstance(cands, pa.ChunkedArray):  # single chunk after combine
            cands = cands.chunk(0)
        flat = pc.list_flatten(cands)
        if len(flat) == 0:
            return CANDIDATE_SCHEMA.empty_table()
        parent_idx = pc.list_parent_indices(cands)
        urls = flat.field("url")
        kinds = flat.field("kind")
        poss = flat.field("pos")
        p_url = batch["url"].take(parent_idx)
        p_host = batch["host"].take(parent_idx)
        p_hop = batch["hop"].take(parent_idx)
        p_order = batch["order"].take(parent_idx)

        is_outlink = pc.equal(kinds, "outlink")
        hop_next = pc.add(p_hop, 1)
        if cfg.domains_crawl:
            # slow path: per-row registrable-domain comparison
            keep_dc = [
                self._domains_crawl_pass(ph, host_of(u), h)
                for u, ph, h in zip(urls.to_pylist(), p_host.to_pylist(),
                                    p_hop.to_pylist())
            ]
            keep_dc = pa.array(keep_dc, pa.bool_())
        else:
            keep_dc = pa.array([False] * len(flat), pa.bool_())
        hop_ok = pc.less_equal(hop_next, cfg.max_hops)
        keep = pc.if_else(is_outlink, pc.or_(keep_dc, hop_ok),
                          pa.scalar(True, pa.bool_()))
        hop = pc.if_else(
            is_outlink,
            pc.if_else(keep_dc, pa.scalar(0, p_hop.type), hop_next),
            p_hop,
        )
        typ = pc.if_else(is_outlink, pa.scalar("seed"), pa.scalar("asset"))

        t = pa.table(
            {
                "url": urls,
                "host": _host_arrow(urls),  # canonical host, C-speed regex
                "hash": pa.array(hash64_batch(urls.to_pylist()), pa.uint64()),
                "hop": pc.cast(hop, pa.int32()),
                "type": typ,
                "parent_url": p_url,
                "seq_order": pc.cast(p_order, pa.int64()),
                "seq_pos": pc.cast(poss, pa.int32()),
            }
        ).filter(keep)
        return t.cast(CANDIDATE_SCHEMA)


def dedupe_candidates_within_epoch(cand_ds, strict: bool = False):
    """First-wins dedupe of one epoch's candidate set BEFORE the seen-filter
    actors.

    Default (scalable) mode: a vectorized within-batch dedupe (pandas
    sort + drop_duplicates over the candidate rows only — urls + small
    ints, the html never enters this step); residual cross-batch
    duplicates are resolved atomically by the seen-shard actors, so the
    surviving URL *set* is always exact, while the surviving row's
    (parent_url, seq) attribution can vary between runs for the rare URL
    discovered twice in one epoch. With budget=0 BFS all same-epoch
    duplicates carry the same hop, so hop assignment stays deterministic.

    ``strict=True``: a coarse-partition keyed shuffle choosing the winner
    by (seq_order, seq_pos, parent_url) — byte-deterministic attribution,
    used by the ordering-contract tests, budget-mode crawls and
    exact-resume comparisons. Every copy of a hash lands in one part
    (part = hash % n_parts), the winner inside a part is picked by ONE
    vectorized sort + drop_duplicates — never a raw groupby(hash), whose
    near-distinct key cardinality would mean single-row pandas groups.
    A within-batch pre-dedupe (same winner rule, so the global winner
    always survives the combiner) cuts shuffle volume first.
    """
    if strict:
        import ray as _ray

        n_parts = max(64, int(_ray.cluster_resources().get("CPU", 8)) * 8) \
            if _ray.is_initialized() else 64

        def combine(df):
            df = df.sort_values(
                ["hash", "seq_order", "seq_pos", "parent_url"], kind="stable"
            ).drop_duplicates(subset=["hash"], keep="first")
            df = df.assign(part=(df["hash"].to_numpy(np.uint64)
                                 % np.uint64(n_parts)).astype(np.int64))
            return df

        def first_in_part(g):
            g = g.sort_values(
                ["hash", "seq_order", "seq_pos", "parent_url"], kind="stable"
            ).drop_duplicates(subset=["hash"], keep="first")
            return g.drop(columns=["part"])

        return (
            cand_ds.map_batches(combine, batch_format="pandas",
                                batch_size=16384)
            .groupby("part")
            .map_groups(first_in_part, batch_format="pandas")
        )

    def batch_dedupe(df):
        df = df.sort_values(["seq_order", "seq_pos", "parent_url"], kind="stable")
        return df.drop_duplicates(subset=["hash"], keep="first")

    return cand_ds.map_batches(batch_dedupe, batch_format="pandas",
                               batch_size=16384)
