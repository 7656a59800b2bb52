"""URL harvesting from arbitrary JSON.

Behavioral spec: reference ``internal/pkg/crawl/extractor/json.go:10-64`` —
recursive walk of the decoded document; every string value that parses to a
URL with both a scheme and a host is collected, in document order (dicts in
insertion order — Go ranges maps randomly; we make it deterministic).
"""

from __future__ import annotations

import json
from urllib.parse import urlsplit


def _is_urlish(s: str) -> bool:
    # json.go:61-64 — scheme and host both present
    try:
        parts = urlsplit(s)
    except ValueError:
        return False
    return bool(parts.scheme) and bool(parts.netloc)


def _walk(node, out: list[str]) -> None:
    if isinstance(node, str):
        if _is_urlish(node):
            out.append(node)
    elif isinstance(node, list):
        for element in node:
            _walk(element, out)
    elif isinstance(node, dict):
        for value in node.values():
            _walk(value, out)


def urls_from_json(body: str | bytes) -> list[str]:
    """All URL-shaped strings in a JSON document; [] on parse failure
    (callers log-and-continue, capture.go:482-486)."""
    try:
        data = json.loads(body)
    except (ValueError, UnicodeDecodeError):
        return []
    out: list[str] = []
    _walk(data, out)
    return out
