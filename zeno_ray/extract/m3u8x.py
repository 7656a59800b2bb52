"""M3U8 playlist extraction (media segments + master variants/alternatives).

Behavioral spec: reference ``internal/pkg/crawl/extractor/m3u8.go:10-62`` —
media playlists yield each segment URI; master playlists yield each variant
URI plus its alternative-rendition URIs; all resolved against the request
URL. Content-type gate: ``application/vnd.apple.mpegurl`` or
``application/x-mpegURL`` (m3u8.go:10-13).
"""

from __future__ import annotations

import re

from zeno_ray.urlnorm import make_absolute

_URI_ATTR = re.compile(r'URI="([^"]*)"')


def is_m3u8_content_type(content_type: str | None) -> bool:
    if not content_type:
        return False
    ct = content_type.lower()
    return "application/vnd.apple.mpegurl" in ct or "application/x-mpegurl" in ct


def extract_m3u8(body: str | bytes, request_url: str) -> list[str]:
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    lines = [ln.strip() for ln in body.splitlines()]
    if not lines or lines[0] != "#EXTM3U":
        return []
    is_master = any(ln.startswith("#EXT-X-STREAM-INF") for ln in lines)
    raw: list[str] = []
    if is_master:
        # alternative renditions carry URI="..." attributes (m3u8.go:40-44)
        for ln in lines:
            if ln.startswith("#EXT-X-MEDIA"):
                m = _URI_ATTR.search(ln)
                if m and m.group(1):
                    raw.append(m.group(1))
        # variant URIs are the non-comment lines (m3u8.go:34-38)
        for ln in lines:
            if ln and not ln.startswith("#"):
                raw.append(ln)
    else:
        # media playlist: every non-comment line is a segment (m3u8.go:23-29)
        for ln in lines:
            if ln and not ln.startswith("#"):
                raw.append(ln)
    return [make_absolute(request_url, u) for u in raw]
