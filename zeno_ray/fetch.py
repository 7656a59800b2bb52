"""Fetcher actor-pool stage: frontier rows → fetched page records.

Role of the reference's WARC-recording HTTP client + executeGET
(``internal/pkg/crawl/capture.go:58-181``, ``crawl.go:101-150``):
- retry loop, ≤ ``max_retry`` attempts, 429 handled by backing off and
  retrying (capture.go:84-114) — the sandbox corpus encodes "needs N
  retries" in ``attempts_needed``; backoff sleeps are counted, not slept;
- redirect follower, ≤ ``max_redirect`` hops, each hop recorded as its own
  row, the target seen-checked mid-chain and the chain abandoned when the
  target was already seen (capture.go:120-178);
- in this sandbox the "HTTP server" is the deterministic pure function
  :meth:`zeno_ray.corpus.CorpusSpec.lookup`, so fetching is CPU-only,
  needs no lookup table, and scales with the actor pool.

A callable class ⇒ Ray actor pool: per-actor state (corpus spec, seen-shard
handles) is built once in ``__init__``; batches stream through ``__call__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from zeno_ray.corpus import CorpusSpec
from zeno_ray.seen import check_and_add_batched
from zeno_ray.urlnorm import REDIRECT_STATUSES, canonicalize, hash64, host_of, make_absolute

FETCHED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("status", pa.int16()),
        ("content_type", pa.string()),
        ("html", pa.binary()),
        ("lang", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("redirect_location", pa.string()),
        ("link_header", pa.string()),
        ("server", pa.string()),
        ("hop", pa.int32()),
        ("type", pa.string()),
        ("parent_url", pa.string()),
        ("order", pa.int64()),
        ("n_retries", pa.int32()),
    ]
)


class CookieJar:
    """The fetcher's cookie jar — role of ``crawl.go:175-182`` (a Netscape
    ``cookies.txt`` parsed into the HTTP client's jar). Thin wrapper over
    stdlib ``http.cookiejar.MozillaCookieJar`` with a dict view per URL;
    plugin cookies (reddit.go:34-48) merge on top without clobbering."""

    def __init__(self, cookie_file: str | None = None):
        import http.cookiejar

        self._jar = http.cookiejar.MozillaCookieJar()
        if cookie_file:
            self._jar.load(cookie_file, ignore_discard=True,
                           ignore_expires=True)

    def cookies_for(self, url: str) -> dict:
        from urllib.parse import urlsplit

        host = urlsplit(url).netloc.partition(":")[0]
        path = urlsplit(url).path or "/"
        out = {}
        for c in self._jar:
            dom = c.domain.lstrip(".")
            if (host == dom or host.endswith("." + dom)) and \
                    path.startswith(c.path or "/"):
                out[c.name] = c.value
        return out

    def __len__(self):
        return len(self._jar)


class Fetcher:
    """map_batches(Fetcher, concurrency=N) — batch of frontier rows in,
    batch of fetched records out (one extra row per redirect hop)."""

    def __init__(self, spec: CorpusSpec, seen_shards: list, max_retry: int = 5,
                 max_redirect: int = 20, plugins=None,
                 cookie_file: str | None = None):
        self.spec = spec
        self.seen = seen_shards
        self.max_retry = max_retry
        self.max_redirect = max_redirect
        self.plugins = plugins  # PluginRegistry | None — pre-fetch URL
        # rewrites (the capture.go:213-315 hook point)
        self.jar = CookieJar(cookie_file) if cookie_file else None

    def _fetch_one(self, url: str):
        """(record, n_retries, companion_urls) after the pre-fetch plugin
        chain and the 429 retry loop (capture.go:58-117, 213-315)."""
        companions: list = []
        if self.plugins is not None:
            act = self.plugins.apply_pre_fetch(url)
            url = act.url or url
            companions = act.companions
            # act.headers / act.cookies decorate the request here
            # (tiktok/vk/reddit, capture.go:294-315), layered over the
            # jar's cookies for this URL (no-clobber); the sandbox corpus
            # function takes no headers, so the request decoration is
            # computed (and unit-tested) but not transmittable.
            if self.jar is not None:
                # jar cookies are the request's existing cookies; plugin
                # cookies add only when absent (reddit.go:34-48)
                merged = self.jar.cookies_for(url)
                for k, v in act.cookies.items():
                    merged.setdefault(k, v)
                act.cookies = merged
        rec = self.spec.lookup(url)
        retries = 0
        while retries < rec.attempts_needed and retries < self.max_retry:
            retries += 1  # 429 → backoff → retry (backoff counted, not slept)
        if rec.attempts_needed > 0 and retries >= self.max_retry:
            return None, retries, companions  # gave up on a permanent-429
        return rec, retries, companions

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in FETCHED_SCHEMA.names}
        if batch.num_rows == 0:
            return pa.table({k: [] for k in out}, schema=FETCHED_SCHEMA)

        urls = batch["url"].to_pylist()
        hops = batch["hop"].to_pylist()
        types = batch["type"].to_pylist()
        parents = batch["parent_url"].to_pylist()
        orders = batch["order"].to_pylist()

        def emit(url, rec, hop, typ, parent, order, retries):
            out["url"].append(url)
            out["host"].append(host_of(url))
            out["status"].append(rec.status)
            out["content_type"].append(rec.content_type)
            out["html"].append(rec.html)
            out["lang"].append(rec.lang)
            out["warc_ts"].append(rec.warc_ts)
            out["redirect_location"].append(rec.redirect_location)
            out["link_header"].append(rec.link_header)
            out["server"].append(rec.server)
            out["hop"].append(hop)
            out["type"].append(typ)
            out["parent_url"].append(parent)
            out["order"].append(order)
            out["n_retries"].append(retries)

        # redirect chains (and plugin companion items) advance in waves so
        # the mid-chain seen-checks are batched across the whole input
        # batch (capture.go:142-158 does one URL at a time; same
        # semantics, one RPC round per chain depth). Companions are the
        # reference's recursive in-line c.Capture(...) calls
        # (capture.go:230-252) — seen-checked, fetched in the next wave,
        # recorded with the parent's hop/order.
        pending = list(zip(urls, hops, types, parents, orders))
        depth = 0
        while pending and depth <= self.max_redirect:
            next_targets = []  # (target, hop, typ, parent, order)
            for url, hop, typ, parent, order in pending:
                rec, retries, companions = self._fetch_one(url)
                for comp in companions:
                    target = canonicalize(comp)
                    if target and target != url:
                        next_targets.append((target, hop, typ, url, order))
                if rec is None:
                    continue
                emit(url, rec, hop, typ, parent, order, retries)
                if rec.status in REDIRECT_STATUSES and rec.redirect_location:
                    target = canonicalize(
                        make_absolute(url, rec.redirect_location)
                    )
                    if target and target != url:  # self-redirect stop (capture.go:121)
                        next_targets.append((target, hop, typ, url, order))
            if not next_targets:
                break
            # seen-check redirect targets + companions; only new ones follow
            h = np.array([hash64(t[0]) for t in next_targets], dtype=np.uint64)
            new_mask = check_and_add_batched(self.seen, h)
            pending = [t for t, m in zip(next_targets, new_mask) if m]
            depth += 1

        return pa.table({k: pa.array(v, FETCHED_SCHEMA.field(k).type) for k, v in out.items()},
                        schema=FETCHED_SCHEMA)
