"""Site-specific plugin registry — the user-extension surface.

Role of the reference's sitespecific modules hooked into Capture
(``capture.go:213-315`` pre-request rewrites, ``:339-437`` post-response
handlers, ``:509-553`` DOM-stage handlers; modules under
``internal/pkg/crawl/sitespecific/``). Re-expressed as a registry of
``(match(url) -> bool, hook)`` pairs applied inside the fetch/extract
stages; plugins are plain Python functions over rows, registered at
pipeline-build time and shipped to workers by closure capture. The yt-dlp /
headless dependencies are out of scope in this sandbox (no network, no
subprocess) — the hook points exist, the deps don't.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable


@dataclass
class PluginRegistry:
    # pre-fetch: url -> url | None (None = leave unchanged); may also return
    # (url, headers) in a richer build — headers are meaningless here
    pre_fetch: list[tuple[Callable[[str], bool], Callable[[str], str | None]]] = field(
        default_factory=list
    )
    # post-extract: (url, outlinks, assets) -> (outlinks, assets)
    post_extract: list[
        tuple[Callable[[str], bool], Callable[[str, list, list], tuple]]
    ] = field(default_factory=list)

    def register_pre_fetch(self, match, hook):
        self.pre_fetch.append((match, hook))
        return self

    def register_post_extract(self, match, hook):
        self.post_extract.append((match, hook))
        return self

    def apply_pre_fetch(self, url: str) -> str:
        for match, hook in self.pre_fetch:
            if match(url):
                new = hook(url)
                if new:
                    url = new
        return url

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
