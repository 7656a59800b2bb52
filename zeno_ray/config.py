"""Crawl configuration — the subset of the reference's ~60 flags
(``cmd/get.go:29-112``, ``config/config.go:16-90``) that affects dataflow
semantics, with the reference's defaults where one exists."""

from __future__ import annotations

from dataclasses import dataclass, field

# hardcoded always-excluded hosts (crawl/config.go:231)
DEFAULT_EXCLUDED_HOSTS = ("archive.org", "archive-it.org")


@dataclass(frozen=True)
class CrawlConfig:
    max_hops: int = 2  # --max-hops; outlinks enqueue iff max_hops >= hop+1 (outlinks.go:77)
    max_redirect: int = 20  # --max-redirect (capture.go:121)
    max_retry: int = 5  # --max-retry (capture.go:58)
    domains_crawl: bool = False  # --domains-crawl (outlinks.go:100-164)
    disable_assets_capture: bool = False  # --disable-assets-capture
    capture_alternate_pages: bool = False  # --capture-alternate-pages (assets.go:386-391)
    disabled_html_tags: tuple = ()  # --disable-html-tag
    excluded_hosts: tuple = ()  # --exclude-host (plus DEFAULT_EXCLUDED_HOSTS)
    included_hosts: tuple = ()  # --include-host
    excluded_strings: tuple = ()  # --exclude-string
    included_strings: tuple = ()  # --include-string

    # rebuild-side execution knobs (no reference equivalent; Ray-native)
    host_budget: int = 0  # rows per host per epoch; 0 = unlimited (pure BFS)
    max_epochs: int = 64
    seen_shards: int = 8
    fetch_concurrency: int = 4  # Fetcher actor pool size
    fetch_batch_size: int = 256
    extract_batch_size: int = 128
    robots_enforce: bool = False  # fetch+honor per-host /robots.txt (ADDITIVE:
                                  # the reference has no robots code; default
                                  # off preserves reference behavior)
    robots_deny_prefixes: tuple = ()  # static deny list; default allow-all
                                      # (the reference has NO robots code —
                                      # SURVEY.md §2.4; additive, default
                                      # preserves reference behavior)

    def all_excluded_hosts(self) -> tuple:
        return tuple(self.excluded_hosts) + DEFAULT_EXCLUDED_HOSTS


def make_is_excluded(cfg: CrawlConfig):
    """URL-exclusion predicate (crawl/exclusion.go:10-58): include-host
    allowlist, exclude-host blocklist, substring exclude/include."""
    excluded_hosts = set(cfg.all_excluded_hosts())
    included_hosts = set(cfg.included_hosts)
    ex_strings = tuple(cfg.excluded_strings)
    in_strings = tuple(cfg.included_strings)
    robots_deny = tuple(cfg.robots_deny_prefixes)

    from zeno_ray.urlnorm import host_of

    def is_excluded(url: str) -> bool:
        host = host_of(url).partition(":")[0]
        # NOTE (exclusion.go:12-15): if the host is NOT in the include list
        # the reference returns false ("not excluded") — faithfully kept.
        if included_hosts and host not in included_hosts:
            return False
        if host in excluded_hosts:
            return True
        for s in ex_strings:
            if s in url:
                return True
        if in_strings and not any(s in url for s in in_strings):
            return True
        if any(url.startswith(p) for p in robots_deny):
            return True
        return False

    return is_excluded
