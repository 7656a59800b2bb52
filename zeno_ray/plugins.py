"""Site-specific plugin registry — the user-extension surface.

Role of the reference's sitespecific modules hooked into Capture
(``capture.go:213-315`` pre-request rewrites/companions/headers,
``:339-437`` post-response handlers, ``:509-553`` DOM-stage handlers;
modules under ``internal/pkg/crawl/sitespecific/``). Re-expressed as a
registry of ``(match, hook)`` pairs applied inside the fetch/extract
stages; plugins are plain Python callables over rows, registered at
pipeline-build time and shipped to workers by closure capture — a
stateful plugin (e.g. the ina player-version cache) is simply a callable
object whose attributes live per worker process, like the reference's
``sync.Mutex``-guarded package globals (``ina/ina.go:19-25``).

Hook shapes (each mirrors a concrete reference hook site):

- ``pre_fetch``: ``hook(url) -> PreFetchAction | str | None`` — rewrite
  the request URL, add request headers/cookies (tiktok/vk/reddit,
  capture.go:294-315), and/or spawn companion items fetched alongside
  (truthsocial API+embeds capture.go:213-252, facebook embed :253-273,
  libsyn highwinds :274-293, telegram embed :296-312).
- ``post_fetch``: ``hook(url, body, content_type, fetch) -> PostFetchResult``
  — response-body extractors (youtube watch-page ytdlp capture.go:339-395,
  reddit post API :396-414, ina API medias :415-437). ``fetch`` is the
  engine's fetch function for hooks that need side lookups (the ina
  player-version probe, ina.go:110-170); returned ``metadata`` JSON
  strings become WARC-metadata-style side records (capture.go:387-389).
- ``post_extract``: ``hook(url, outlinks, assets) -> (outlinks, assets)``
  — DOM-stage rewrites over the extracted link sets (cloudflarestream
  capture.go:509-541).

The yt-dlp / headless-browser dependencies are out of scope in this
sandbox (no network, no subprocess) — the hook points are real, the deps
are pluggable parsers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable


@dataclass
class PreFetchAction:
    """What a pre-fetch hook wants done to this request."""

    url: str | None = None            # rewrite the request URL
    headers: dict = field(default_factory=dict)   # add request headers
    cookies: dict = field(default_factory=dict)   # add cookies (no clobber)
    companions: list = field(default_factory=list)  # extra URLs to capture
    # companion items are seen-checked and fetched alongside the original
    # (the reference captures them recursively in-line, capture.go:230-252)


@dataclass
class PostFetchResult:
    """What a post-fetch hook extracted from a response body."""

    outlinks: list = field(default_factory=list)
    assets: list = field(default_factory=list)
    metadata: str | None = None  # JSON side record (WARC metadata record)
    consume: bool = False        # True = skip the generic HTML extractor
    # (youtube watch pages return after ytdlp handling, capture.go:339-395)


@dataclass
class PluginRegistry:
    pre_fetch: list[tuple[Callable[[str], bool], Callable]] = field(
        default_factory=list
    )
    post_fetch: list[tuple[Callable[[str, str], bool], Callable]] = field(
        default_factory=list
    )
    # post-extract: (url, outlinks, assets) -> (outlinks, assets)
    post_extract: list[
        tuple[Callable[[str], bool], Callable[[str, list, list], tuple]]
    ] = field(default_factory=list)
    _fetch_fn: Callable | None = None

    def register_pre_fetch(self, match, hook):
        self.pre_fetch.append((match, hook))
        return self

    def register_post_fetch(self, match, hook):
        """match(url, content_type) -> bool;
        hook(url, body, content_type, fetch) -> PostFetchResult"""
        self.post_fetch.append((match, hook))
        return self

    def register_post_extract(self, match, hook):
        self.post_extract.append((match, hook))
        return self

    def bind_fetch(self, fetch_fn) -> None:
        """Give post-fetch hooks access to the engine's fetch function
        (the corpus pure function here; an HTTP client in production)."""
        self._fetch_fn = fetch_fn

    def apply_pre_fetch(self, url: str) -> PreFetchAction:
        """Fold every matching pre-fetch hook; returns the merged action
        (final url, merged headers/cookies, all companion URLs)."""
        act = PreFetchAction(url=url)
        for match, hook in self.pre_fetch:
            if match(act.url):
                res = hook(act.url)
                if res is None:
                    continue
                if isinstance(res, str):  # legacy url-rewrite-only hooks
                    act.url = res
                    continue
                if res.url:
                    act.url = res.url
                act.headers.update(res.headers)
                for k, v in res.cookies.items():  # no-clobber (reddit.go:34-48)
                    act.cookies.setdefault(k, v)
                act.companions.extend(res.companions)
        return act

    def apply_post_fetch(self, url: str, body: bytes, content_type: str
                         ) -> PostFetchResult | None:
        """First matching post-fetch hook wins (the reference's else-if
        chain, capture.go:339-437)."""
        for match, hook in self.post_fetch:
            if match(url, content_type):
                return hook(url, body, content_type, self._fetch_fn)
        return None

    def apply_post_extract(self, url: str, outlinks: list, assets: list):
        for match, hook in self.post_extract:
            if match(url):
                outlinks, assets = hook(url, outlinks, assets)
        return outlinks, assets


def example_registry() -> PluginRegistry:
    """Two example plugins proving the hook shapes:
    - an embed-rewrite plugin (the truthsocial/facebook embed pattern,
      capture.go:213-273): /embed/X is fetched as /page/X;
    - a media-segment plugin (the cloudflarestream pattern,
      capture.go:509-541): playlist pages get their manifest injected as an
      extra asset."""
    reg = PluginRegistry()
    reg.register_pre_fetch(
        lambda u: "/embed/" in u,
        lambda u: u.replace("/embed/", "/page/"),
    )

    def add_manifest(url, outlinks, assets):
        manifest = url.rsplit("/", 1)[0] + "/playlist.m3u8"
        if manifest not in assets:
            assets = assets + [manifest]
        return outlinks, assets

    reg.register_post_extract(lambda u: "/media/seg" in u, add_manifest)
    return reg
