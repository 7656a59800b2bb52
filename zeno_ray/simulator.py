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


def simulate_crawl_budget(spec: CorpusSpec, cfg: CrawlConfig,
                          seeds: list[str] | None = None) -> SimResult:
    """Sequential replay of the BUDGET-mode epoch-BSP contract — the
    driver-independent oracle for the ``crawl_budget_order`` query.

    Unlike ``simulate_crawl`` (the reference's one-item-at-a-time
    rotation), this replays the engine's epoch semantics exactly, with
    plain Python lists instead of Datasets/actors:

    - per-epoch rank/budget/carryover (``frontier.rank_frontier``): per
      host, page ("seed") items ranked in (seq_epoch, seq_order, seq_pos)
      enqueue order, first ``host_budget`` fetched, rest carried; assets
      are budget-exempt (rank −1);
    - fetch order key = rank·2³¹ + host_seq (``ORDER_RANK_SHIFT``);
    - redirect chains: emit the hop row, then seen-check-and-add the
      target (``fetch.py`` wave semantics, sequentialized);
    - extract/candidate gates as ``ExtractStage``/``CandidateStage``:
      outlinks gated by ``max_hops >= hop+1`` (hop = parent+1), assets
      keep the parent's hop, M3U8 assets recurse via next-epoch
      candidates;
    - strict within-epoch dedupe: winner by (seq_order, seq_pos,
      parent_url) per URL (``dedupe_candidates_within_epoch(strict)``);
    - seen-filter at enqueue; new hosts registered in
      (min seq_order, min seq_pos, host) order (``assign_host_seq``);
    - stop after ``max_epochs`` epochs or an empty frontier.

    Assumes cfg has robots off, no plugins, no domains_crawl (the
    query's config). ``crawled_pages`` maps seed-type fetched URL → hop.
    """
    assert not cfg.robots_enforce and not cfg.domains_crawl
    is_excluded = make_is_excluded(cfg)
    res = SimResult()
    shift = 1 << 31

    # --- seed load (seed_frontier + seed seencheck) ---
    hosts: dict[str, int] = {}
    frontier: list[tuple] = []  # (url, host, hop, typ, parent, se, so, sp)
    for i, raw in enumerate(seeds if seeds is not None else spec.seeds()):
        c = canonicalize(raw)
        if not c or not is_valid_url(c) or c in res.seen:
            continue
        res.seen.add(c)
        h = host_of(c)
        if h not in hosts:
            hosts[h] = len(hosts)
        frontier.append((c, h, 0, "seed", "", -1, i, 0))

    for epoch in range(cfg.max_epochs):
        if not frontier:
            break
        # --- rank/budget split ---
        by_host: dict[str, list] = {}
        for row in frontier:
            by_host.setdefault(row[1], []).append(row)
        fetch_rows: list[tuple] = []  # (order, row)
        carry: list[tuple] = []
        for h, rows in by_host.items():
            rows.sort(key=lambda r: (r[5], r[6], r[7]))
            rank = 0
            for r in rows:
                if r[3] == "seed":
                    this_rank, rank = rank, rank + 1
                else:
                    this_rank = -1  # assets are budget-exempt
                if this_rank < cfg.host_budget:
                    fetch_rows.append(
                        (max(this_rank, 0) * shift + hosts[h], r))
                else:
                    carry.append(r)
        fetch_rows.sort(key=lambda t: t[0])

        # --- fetch (retries, redirect chains with mid-chain seenchecks) ---
        emitted: list[tuple] = []  # (url, rec, hop, typ, order)
        for order, (url, _h, hop, typ, parent, *_seq) in fetch_rows:
            cur, depth = url, 0
            while True:
                rec = spec.lookup(cur)
                if rec.attempts_needed >= cfg.max_retry:
                    break  # gave up (permanent-429)
                emitted.append((cur, rec, hop, typ, order))
                if typ == "seed":
                    res.crawled_pages[cur] = hop
                else:
                    res.crawled_assets.append(cur)
                if rec.status in REDIRECT_STATUSES and rec.redirect_location:
                    target = canonicalize(
                        make_absolute(cur, rec.redirect_location))
                    if target and target != cur and target not in res.seen:
                        # the engine seen-marks the target even when the
                        # chain is about to hit the redirect cap
                        res.seen.add(target)
                        if depth + 1 <= cfg.max_redirect:
                            cur, depth = target, depth + 1
                            continue
                break

        # --- extract + candidate gates (ExtractStage/CandidateStage) ---
        cands: list[tuple] = []  # (url, hop, typ, parent, so, sp)
        for url, rec, hop, typ, order in emitted:
            if rec.status != 200:
                continue
            if typ == "asset":
                if not is_m3u8_content_type(rec.content_type) or \
                        cfg.disable_assets_capture:
                    continue
                ext = extract_from_page(url, rec.html, rec.content_type,
                                        server=rec.server,
                                        is_excluded=is_excluded)
                for p, a in enumerate(ext.assets):
                    cands.append((a, hop, "asset", url, order, p))
                continue
            ext = extract_from_page(
                url, rec.html, rec.content_type,
                link_header=rec.link_header, server=rec.server,
                disabled_tags=frozenset(cfg.disabled_html_tags),
                capture_alternate_pages=cfg.capture_alternate_pages,
                is_excluded=is_excluded,
            )
            pos = 0
            for o in ext.outlinks:
                if cfg.max_hops >= hop + 1:
                    cands.append((o, hop + 1, "seed", url, order, pos))
                pos += 1
            if not cfg.disable_assets_capture:
                for a in ext.assets:
                    cands.append((a, hop, "asset", url, order, pos))
                    pos += 1

        # --- strict dedupe → seen filter ---
        cands.sort(key=lambda c: (c[4], c[5], c[3]))
        new_rows: list[tuple] = []
        taken: set[str] = set()
        for url, hop, typ, parent, so, sp in cands:
            if url in taken or url in res.seen:
                continue
            taken.add(url)
            new_rows.append((url, host_of(url), hop, typ, parent,
                             epoch, so, sp))
        res.seen.update(taken)

        # --- host registry: new hosts by (min so, min sp, host) ---
        agg: dict[str, list] = {}
        for r in new_rows:
            a = agg.setdefault(r[1], [r[6], r[7]])
            a[0] = min(a[0], r[6])
            a[1] = min(a[1], r[7])
        for h, _ in sorted(((h, a) for h, a in agg.items()
                            if h not in hosts),
                           key=lambda t: (t[1][0], t[1][1], t[0])):
            hosts[h] = len(hosts)

        frontier = new_rows + carry

    return res
