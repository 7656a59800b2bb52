"""XML / sitemap and S3-listing extraction.

Behavioral spec:
- ``internal/pkg/crawl/extractor/xml.go:12-47`` — leaf-walk any XML; every
  leaf string starting with ``http`` is a URL; the document is a *sitemap*
  when the raw body contains ``sitemaps.org/schemas/sitemap/`` or any leaf
  path contains ``sitemap``.
- ``internal/pkg/crawl/extractor/s3.go:13-124`` — S3 ``ListBucketResult``
  detection by ``Server`` header; emits marker-pagination URL, common-prefix
  URLs or file URLs, and a continuation-token URL.

Sitemap URLs are treated as outlinks, other XML URLs as assets
(``capture.go:470-479``).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from urllib.parse import urlsplit, urlunsplit

from zeno_ray.urlnorm import encode_query

S3_SERVERS = (
    "AmazonS3",
    "WasabiS3",
    "UploadServer",  # Google Cloud Storage
    "Windows-Azure-Blob",
    "AliyunOSS",
)


def is_s3_server(server_header: str | None) -> bool:
    """extractor/s3.go:44-46 (substring match per utils.StringContainsSliceElements)."""
    if not server_header:
        return False
    return any(s in server_header for s in S3_SERVERS)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def extract_xml(body: str | bytes) -> tuple[list[str], bool]:
    """Returns (urls, is_sitemap); ([], detected-by-string) on parse failure."""
    if isinstance(body, bytes):
        try:
            text = body.decode("utf-8", "replace")
        except Exception:
            return [], False
    else:
        text = body
    sitemap = "sitemaps.org/schemas/sitemap/" in text  # xml.go:18-20
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return [], sitemap
    urls: list[str] = []

    def walk(elem, path: str) -> None:
        nonlocal sitemap
        name = _localname(elem.tag)
        child_path = f"{path}.{name}" if path else name
        children = list(elem)
        if not children:
            # leaf node: tag path containing "sitemap" marks a sitemap
            # (xml.go:28-33); leaf string values starting "http" are URLs
            # (xml.go:35-44)
            if "sitemap" in child_path.lower():
                sitemap = True
            value = (elem.text or "").strip()
            if value.startswith("http"):
                urls.append(value)
        for child in children:
            walk(child, child_path)

    walk(root, "")
    return urls, sitemap


def _with_query_param(url: str, key: str, value: str) -> str:
    """Clone *url* with query param *key* set (Go q.Set + Encode — Encode
    sorts keys, s3.go:72-75; we keep that sorted behavior here)."""
    parts = urlsplit(url)
    pairs = []
    seen = False
    from urllib.parse import parse_qsl, quote_plus

    for k, v in parse_qsl(parts.query, keep_blank_values=True):
        if k == key:
            if not seen:
                pairs.append((key, value))
                seen = True
        else:
            pairs.append((k, v))
    if not seen:
        pairs.append((key, value))
    pairs.sort(key=lambda kv: kv[0])  # Go url.Values.Encode sorts keys
    query = "&".join(f"{quote_plus(k)}={quote_plus(v)}" for k, v in pairs)
    return urlunsplit((parts.scheme, parts.netloc, parts.path, query, ""))


def extract_s3(body: str | bytes, request_url: str) -> list[str]:
    """S3 bucket-listing pagination/file URLs (extractor/s3.go:50-108)."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return []
    if _localname(root.tag) != "ListBucketResult":
        return []

    def findall(name):
        return [e for e in root if _localname(e.tag) == name]

    def text_of(elem, name, default=""):
        for e in elem:
            if _localname(e.tag) == name:
                return e.text or default
        return default

    contents = findall("Contents")
    common_prefixes = findall("CommonPrefixes")
    is_truncated = text_of(root, "IsTruncated", "false").lower() == "true"
    next_token = text_of(root, "NextContinuationToken", "")

    req = urlsplit(request_url)
    from urllib.parse import parse_qsl

    request_query = dict(parse_qsl(req.query, keep_blank_values=True))
    base = f"https://{req.netloc}"

    urls: list[str] = []
    # marker pagination (ListObjects v1 only, s3.go:69-76)
    if request_query.get("list-type") != "2" and contents:
        last_key = text_of(contents[-1], "Key", "")
        urls.append(_with_query_param(request_url, "marker", last_key))
    if common_prefixes:
        for cp in common_prefixes:
            prefix = text_of(cp, "Prefix", "")
            urls.append(_with_query_param(request_url, "prefix", prefix))
    else:
        for obj in contents:
            size = text_of(obj, "Size", "0")
            try:
                nonempty = int(size) > 0
            except ValueError:
                nonempty = False
            if nonempty:
                urls.append(f"{base}/{text_of(obj, 'Key', '')}")
    if is_truncated and next_token:
        urls.append(_with_query_param(request_url, "continuation-token", next_token))
    return urls
