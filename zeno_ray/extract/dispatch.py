"""Content-type dispatch: one fetched response → (outlinks, assets, text).

Behavioral spec: reference ``internal/pkg/crawl/capture.go:440-607``:
- ``Link:`` response header URLs are queued as outlinks (capture.go:440-450).
- Content-Type containing ``xml``: S3 listing if the ``Server`` header is an
  S3 implementation (→ all URLs), else XML — sitemap URLs are outlinks,
  other XML URLs are assets (capture.go:461-480).
- Content-Type containing ``json`` → assets (capture.go:481-486).
- M3U8 content types → assets (capture.go:487-492).
- other non-``text/*`` → not parsed (capture.go:493-501).
- else: HTML — ``<base>`` honored, outlinks + assets extracted.

Returned URL lists are RAW (pre-clean); callers run the clean/canonicalize
stage (exclusion → absolutize → de-fragment → dedupe → http(s)-only).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zeno_ray.extract.html import extract_html
from zeno_ray.extract.m3u8x import extract_m3u8, is_m3u8_content_type
from zeno_ray.extract.xmlx import extract_s3, extract_xml, is_s3_server
from zeno_ray.extract.jsonx import urls_from_json
from zeno_ray.linkheader import parse_link_header
from zeno_ray.urlnorm import clean_urls


@dataclass
class ExtractResult:
    outlinks: list[str] = field(default_factory=list)  # canonical, deduped
    assets: list[str] = field(default_factory=list)  # canonical, deduped
    text: str = ""


def extract_from_page(
    url: str,
    body: bytes | str,
    content_type: str | None,
    link_header: str | None = None,
    server: str | None = None,
    disabled_tags: frozenset[str] = frozenset(),
    capture_alternate_pages: bool = False,
    is_excluded=None,
) -> ExtractResult:
    """Parse one response exactly the way the reference's Capture does."""
    ct = content_type or ""
    raw_outlinks: list[str] = []
    raw_assets: list[str] = []
    text = ""
    base = url

    # Link response header → outlinks, resolved against the request URL
    # itself, not the <base> tag (capture.go:440-450)
    header_outlinks: list[str] = []
    if link_header:
        header_outlinks = [l.url for l in parse_link_header(link_header) if l.url]

    if "xml" in ct:
        if is_s3_server(server):
            raw_outlinks.extend(extract_s3(body, url))
        else:
            urls, is_sitemap = extract_xml(body)
            if is_sitemap:
                raw_outlinks.extend(urls)
            else:
                raw_assets.extend(urls)
    elif "json" in ct:
        raw_assets.extend(urls_from_json(body))
    elif is_m3u8_content_type(ct):
        raw_assets.extend(extract_m3u8(body, url))
    elif "text/" not in ct:
        pass  # skip parse (capture.go:493-501)
    else:
        h = extract_html(
            body,
            disabled_tags=disabled_tags,
            capture_alternate_pages=capture_alternate_pages,
        )
        if h.base:
            # <base href> may itself be relative (capture.go:565-575)
            from zeno_ray.urlnorm import make_absolute

            base = make_absolute(url, h.base)
        raw_outlinks.extend(h.outlinks)
        raw_assets.extend(h.assets)
        text = h.text

    outlinks = clean_urls(url, header_outlinks, is_excluded=is_excluded)
    body_outlinks = clean_urls(base, raw_outlinks, is_excluded=is_excluded)
    seen = set(outlinks)
    outlinks.extend(u for u in body_outlinks if u not in seen)
    return ExtractResult(
        outlinks=outlinks,
        assets=clean_urls(base, raw_assets, is_excluded=is_excluded),
        text=text,
    )
