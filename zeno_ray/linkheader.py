"""RFC-8288 ``Link:`` header parsing.

Behavioral spec: reference ``internal/pkg/crawl/link_header.go:20-63`` —
entries split on ``", "``, parts on ``";"``, first part is ``<url>``,
the first ``rel=`` attribute wins; malformed attrs are skipped.
"""

from __future__ import annotations

from typing import NamedTuple


class Link(NamedTuple):
    url: str
    rel: str


def parse_link_header(value: str) -> list[Link]:
    links: list[Link] = []
    if not value:
        return links
    for entry in value.split(", "):
        parts = entry.split(";")
        # Go order: Trim("<>") THEN TrimSpace (link_header.go:30)
        url = parts[0].strip("<>").strip()
        rel = ""
        for attr in parts[1:]:
            key, attr_value = parse_attr(attr)
            if not key:
                continue  # malformed key — skipped (link_header.go:35-38)
            if key == "rel":
                rel = attr_value
                break
        links.append(Link(url=url, rel=rel))
    return links


def parse_attr(attr: str) -> tuple[str, str]:
    """Single ``key=value`` pair; value unquoted (link_header.go:52-63)."""
    kv = attr.split("=", 1)
    if len(kv) != 2:
        return "", ""
    # Go order: Trim('"') THEN TrimSpace (link_header.go:60)
    return kv[0].strip(), kv[1].strip('"').strip()
