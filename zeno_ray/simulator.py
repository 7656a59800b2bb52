"""Sequential reference simulator — the pure-Python oracle for crawl tests.

Implements the reference's *sequential contract* (SURVEY.md §2.7, §5): one
item at a time, per-host FIFO queues, strict round-robin over hosts in
first-appearance order (``queue/dequeue.go:135-158``), seencheck-at-enqueue
(``outlinks.go:59-63``), hop gating (``outlinks.go:77``), inline asset
capture (``assets.go:72-180``), redirect following with mid-chain
seenchecks (``capture.go:120-178``), M3U8 asset recursion
(``assets.go:55-65``). No Ray, no parallelism — deliberately boring, so it
can be trusted as the oracle for seen-set equality and ordering tests.
"""

from __future__ import annotations

from collections import OrderedDict, deque
from dataclasses import dataclass, field

from zeno_ray.config import CrawlConfig, make_is_excluded
from zeno_ray.corpus import CorpusSpec
from zeno_ray.extract import extract_from_page
from zeno_ray.extract.m3u8x import is_m3u8_content_type
from zeno_ray.urlnorm import (
    REDIRECT_STATUSES,
    canonicalize,
    host_of,
    is_valid_url,
    make_absolute,
)


@dataclass
class SimResult:
    fetch_order: list[str] = field(default_factory=list)  # dequeue order (seed items)
    crawled_pages: dict[str, int] = field(default_factory=dict)  # url -> hop
    crawled_assets: list[str] = field(default_factory=list)
    seen: set = field(default_factory=set)
    redirect_hops: list[str] = field(default_factory=list)


def simulate_crawl(spec: CorpusSpec, cfg: CrawlConfig,
                   seeds: list[str] | None = None) -> SimResult:
    is_excluded = make_is_excluded(cfg)
    res = SimResult()
    robots_cache: dict[str, tuple] = {}

    def robots_allowed(url: str) -> bool:
        if not cfg.robots_enforce:
            return True
        from zeno_ray.politeness import parse_robots

        h = host_of(url)
        rules = robots_cache.get(h)
        if rules is None:
            rec = spec.lookup(f"https://{h}/robots.txt")
            rules = tuple(parse_robots(rec.html.decode("utf-8", "replace"))) if rec.status == 200 else ()
            robots_cache[h] = rules
        idx = url.find(h)
        path = url[idx + len(h):] if idx >= 0 else "/"
        return not any(path.startswith(p) for p in rules)
    # host -> FIFO of (url, hop); OrderedDict preserves first-appearance order
    queues: "OrderedDict[str, deque]" = OrderedDict()
    rotation: list[str] = []  # ordered host list; emptied hosts removed
    rot_idx = 0

    def enqueue(url: str, hop: int) -> None:
        if url in res.seen or not robots_allowed(url):
            return
        res.seen.add(url)
        h = host_of(url)
        if h not in queues:
            queues[h] = deque()
            rotation.append(h)
        queues[h].append((url, hop))

    for raw in seeds if seeds is not None else spec.seeds():
        c = canonicalize(raw)
        if c and is_valid_url(c):
            enqueue(c, 0)

    def fetch(url: str, hop: int, as_asset: bool) -> None:
        """Fetch one item incl. retries/redirects; parse; capture assets."""
        cur = url
        depth = 0
        while True:
            rec = spec.lookup(cur)
            if rec.attempts_needed >= cfg.max_retry:
                return
            if rec.status in REDIRECT_STATUSES and rec.redirect_location:
                res.redirect_hops.append(cur)
                target = canonicalize(make_absolute(cur, rec.redirect_location))
                depth += 1
                if not target or target == cur or depth > cfg.max_redirect:
                    return
                if target in res.seen:
                    return  # capture.go:142-158
                res.seen.add(target)
                cur = target
                continue
            break
        if as_asset:
            res.crawled_assets.append(cur)
            if is_m3u8_content_type(rec.content_type) and rec.status == 200:
                sub = extract_from_page(cur, rec.html, rec.content_type,
                                        server=rec.server,
                                        is_excluded=is_excluded)
                for a in sub.assets:
                    if a not in res.seen and robots_allowed(a):
                        res.seen.add(a)
                        fetch(a, hop, as_asset=True)
            return
        res.crawled_pages[cur] = hop
        if rec.status != 200:
            return
        ext = extract_from_page(
            cur, rec.html, rec.content_type,
            link_header=rec.link_header, server=rec.server,
            disabled_tags=frozenset(cfg.disabled_html_tags),
            capture_alternate_pages=cfg.capture_alternate_pages,
            is_excluded=is_excluded,
        )
        for o in ext.outlinks:
            if cfg.max_hops >= hop + 1:
                enqueue(o, hop + 1)
        if not cfg.disable_assets_capture:
            for a in ext.assets:
                if a not in res.seen and robots_allowed(a):
                    res.seen.add(a)
                    fetch(a, hop, as_asset=True)

    nonempty = lambda: any(queues.values())  # noqa: E731
    while nonempty():
        # strict rotation: hosts[currentHost % len], emptied hosts dropped
        nonlocal_rotation = [h for h in rotation if queues.get(h)]
        rotation[:] = nonlocal_rotation
        if not rotation:
            break
        h = rotation[rot_idx % len(rotation)]
        rot_idx += 1
        url, hop = queues[h].popleft()
        res.fetch_order.append(url)
        fetch(url, hop, as_asset=False)

    return res
