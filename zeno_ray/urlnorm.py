"""URL canonicalization with the reference's ``URLToString`` semantics.

Behavioral spec (reference, read-only):
- ``internal/pkg/utils/url.go:14-74``  — URLToString: re-encode the query
  (Go ``QueryEscape`` of every key/value; keys NOT sorted), IDNA/punycode the
  host (with a host:port fallback split), carve-out: reddit media hosts'
  queries are left untouched (``url.go:17-24``).
- ``internal/pkg/utils/url.go:78-127`` — MakeAbsolute / RemoveFragments /
  DedupeURLs (http+https only) / ValidateURL.
- Test vectors mirrored from ``internal/pkg/utils/url_test.go:8-125``.

Determinism note: the reference's query re-encode iterates a Go map, whose
iteration order is randomized per run; this rebuild makes the only sane
deterministic choice — keys in first-appearance order, each key's values
grouped in original order (the shape Go emits, made stable).

Hashing: the reference uses FNV-64a of the canonical URL string
(``queue/item.go:18-19``) purely as an internal key; this rebuild uses
blake2b-64 (stable across processes/versions, unlike Python's ``hash``).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import parse_qsl, quote_plus, urljoin, urlsplit

try:  # IDNA 2008 (preferred), fall back to the stdlib IDNA-2003 codec
    import idna as _idna
except ImportError:  # pragma: no cover
    _idna = None

# Hosts whose query strings must NOT be re-encoded (signature-bearing URLs) —
# reference carve-out at internal/pkg/utils/url.go:17-24.
REDDIT_NO_ENCODE_HOSTS = frozenset(
    {"external-preview.redd.it", "styles.redditmedia.com", "preview.redd.it"}
)

# RFC 3986 path charset Go's (*url.URL).EscapedPath keeps literal: unreserved
# + sub-delims + ":@/" and '%' (existing escapes preserved).
_PATH_UNSAFE = re.compile(r"[^A-Za-z0-9\-._~!$&'()*+,;=:@/%]")

# Hop-0 redirect statuses — internal/pkg/crawl/utils.go:86-93.
REDIRECT_STATUSES = frozenset({300, 301, 302, 307, 308})


def _pct(m: re.Match) -> str:
    return "".join(f"%{b:02X}" for b in m.group(0).encode("utf-8"))


def _encode_path(path: str) -> str:
    return _PATH_UNSAFE.sub(_pct, path)


def _idna_label(label: str) -> str:
    if label.isascii():
        return label
    if _idna is not None:
        try:
            return _idna.encode(label, uts46=True).decode("ascii")
        except Exception:
            pass
    try:
        return label.encode("idna").decode("ascii")
    except Exception:
        # reference keeps the host unchanged on encode failure (url.go:36-41)
        return label


def encode_host(netloc: str) -> str:
    """IDNA-encode a host[:port] netloc; IPv6 literals pass through.

    Mirrors url.go:25-42 including the host:port fallback split.
    """
    if not netloc or netloc.startswith("["):  # IPv6 literal (with opt. port)
        return netloc
    host, sep, port = netloc.partition(":")
    if not host.isascii():
        host = ".".join(_idna_label(lab) for lab in host.split("."))
    return host + sep + port


def encode_query(query: str) -> str:
    """Re-encode a raw query string the way Go's modified encodeQuery does
    (url.go:50-74): decode to key/value pairs, re-escape with QueryEscape
    (space → '+', unreserved kept), group values under their key, keys in
    first-appearance order (made deterministic; see module docstring)."""
    if not query:
        return ""
    pairs = parse_qsl(query, keep_blank_values=True)
    if not pairs:
        return query  # unparseable — leave as-is
    order: dict[str, list[str]] = {}
    for k, v in pairs:
        order.setdefault(k, []).append(v)
    out = []
    for k, vs in order.items():
        ke = quote_plus(k)
        for v in vs:
            out.append(f"{ke}={quote_plus(v)}")
    return "&".join(out)


def canonicalize(url: str, keep_fragment: bool = False) -> str | None:
    """Canonical string form of *url* (reference URLToString parity).

    Returns None when the URL cannot be parsed at all. Does NOT validate
    scheme — pair with :func:`is_valid_url` (crawl pipelines drop
    non-http(s), utils/url.go:105,118).
    """
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    netloc = parts.netloc
    # strip userinfo (reference corpus never carries credentials)
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    host_for_carveout = netloc.partition(":")[0]
    query = parts.query
    if host_for_carveout not in REDDIT_NO_ENCODE_HOSTS:
        query = encode_query(query)
    netloc = encode_host(netloc)
    path = _encode_path(parts.path)
    out = f"{scheme}://{netloc}" if scheme else f"//{netloc}" if netloc else ""
    out += path
    if query:
        out += f"?{query}"
    if keep_fragment and parts.fragment:
        out += f"#{parts.fragment}"
    return out


_HOST_OK = re.compile(r"^[A-Za-z0-9.\-_:\[\]]+$")


def is_valid_url(url: str) -> bool:
    """Scheme+shape check standing in for govalidator.IsURL + the scheme
    gate (utils/url.go:115-127): http(s) only, non-empty plausible host."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return False
    if parts.scheme not in ("http", "https"):
        return False
    host = parts.netloc.rsplit("@", 1)[-1]
    if not host or not _HOST_OK.match(host):
        return False
    return any(c.isalnum() for c in host)


# scheme://netloc prefix of a canonical http(s) base — used to resolve
# root-relative and protocol-relative references without urljoin
_ORIGIN_RE = re.compile(r"^(https?)://([^/?#]*)")


def make_absolute(base: str, url: str) -> str:
    """Resolve *url* against *base* (utils/url.go:78-86).

    Fast paths (equivalence property-tested against ``urljoin`` in
    test_urlnorm):
    - an already-absolute http(s) URL with no dot-segments is returned
      as-is — ``urljoin`` would only apply remove_dot_segments, a no-op
      then (the ``"/."`` guard conservatively sends any candidate
      dot-segment through the slow path);
    - a root-relative reference (``/path...``) against an http(s) base is
      ``scheme://netloc`` of the base + the reference (RFC 3986 §5.3: the
      base's path/query never contribute);
    - a protocol-relative reference (``//host/...``) takes only the base's
      scheme.
    The page loop in :func:`clean_urls` hoists the base-origin match out of
    the per-URL path via :func:`_make_absolute_fast`. Any URL carrying
    ``\\t``/``\\n``/``\\r`` (which ``urlsplit`` strips anywhere, possibly
    changing the reference's structure) takes the ``urljoin`` path."""
    return _make_absolute_fast(
        base, _ORIGIN_RE.match(base) if not _tab_nl(base) else None, url)


def _tab_nl(s: str) -> bool:
    # urlsplit strips \t\r\n ANYWHERE before parsing (WHATWG unsafe-byte
    # removal), which can change a reference's structure (e.g. "/\t/x"
    # strips to the protocol-relative "//x"); any URL carrying them must
    # take the urljoin path so stripping happens at the same point.
    return "\t" in s or "\n" in s or "\r" in s


def _make_absolute_fast(base: str, origin_m: "re.Match | None", url: str) -> str:
    """make_absolute with the base's origin match precomputed (one regex
    per page instead of one per candidate URL)."""
    if "/." in url or _tab_nl(url):
        return urljoin(base, url)
    if url.startswith("http://") or url.startswith("https://"):
        return url
    if origin_m is not None:
        if url.startswith("//"):
            return origin_m.group(1) + ":" + url
        if url.startswith("/"):
            return origin_m.group(0) + url
    return urljoin(base, url)


def strip_fragment(url: str) -> str:
    """Remove #fragment (utils/url.go:88-94)."""
    i = url.find("#")
    return url if i < 0 else url[:i]


_NETLOC_END = re.compile(r"[/?#]")


def host_of(url: str) -> str:
    """Canonical host (post-IDNA, with port) of a canonical URL.

    Fast path for the dominant shape (lowercase http(s) scheme, no
    stripped-whitespace bytes): the netloc is the span between ``://`` and
    the first ``/``, ``?`` or ``#`` — exactly ``urlsplit``'s netloc rule."""
    if url.startswith("http://"):
        start = 7
    elif url.startswith("https://"):
        start = 8
    else:
        start = -1
    if start >= 0 and not _tab_nl(url):
        m = _NETLOC_END.search(url, start)
        netloc = url[start: m.start()] if m else url[start:]
    else:
        try:
            netloc = urlsplit(url).netloc
        except ValueError:
            return ""
    return netloc.rsplit("@", 1)[-1]


def registrable_domain(host: str) -> str:
    """Last-two-labels 'registrable domain' exactly as the reference computes
    it (crawl/outlinks.go:140-154) — NOT a public-suffix-list lookup."""
    host = host.partition(":")[0]
    parts = host.split(".")
    if len(parts) < 2:
        return ""
    return parts[-2] + "." + parts[-1]


def hash64(s: str) -> int:
    """Stable 64-bit hash of a canonical URL string (seen-set key).

    Role of FNV-64a in the reference (queue/item.go:18-19); blake2b-64 here
    for collision quality; internal-only, so algorithm parity isn't required.
    """
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
    )


def hash64_batch(urls) -> "list[int]":
    b2b = hashlib.blake2b
    return [
        int.from_bytes(b2b(u.encode("utf-8"), digest_size=8).digest(), "big")
        for u in urls
    ]


# Fast-path shape for which canonicalize() is provably the identity AND
# is_valid_url() is True: lowercase http(s) scheme, ASCII host (≥1
# alnum; encode_host only rewrites non-ASCII, and canonicalize preserves
# host case), optional :port, no query/fragment, path containing only the
# characters _encode_path keeps literal (incl. '%': existing escapes are
# preserved). Everything else takes the full canonicalizer. Equivalence is
# property-tested in test_urlnorm.
_CANON_FAST = re.compile(
    r"^https?://[A-Za-z0-9.\-]*[A-Za-z0-9][A-Za-z0-9.\-]*(:[0-9]+)?"
    r"(/[A-Za-z0-9\-._~!$&'()*+,;=:@/%]*)?$"
)


def clean_urls(
    base: str | None,
    urls: list[str],
    is_excluded=None,
) -> list[str]:
    """exclusion-filter → absolutize → de-fragment → canonicalize → in-page
    dedupe (first wins) → http(s) only.  Composition of cleanURLs
    (crawl/assets.go:459-474) + DedupeURLs (utils/url.go:97-112)."""
    seen: set[str] = set()
    out: list[str] = []
    fast = _CANON_FAST.match
    origin_m = None
    if base is not None and not _tab_nl(base):
        origin_m = _ORIGIN_RE.match(base)
    for u in urls:
        if base is not None:
            u = _make_absolute_fast(base, origin_m, u)
        u = strip_fragment(u)
        if fast(u):
            c = u  # canonical + valid http(s) by construction
            if c in seen:
                continue
            seen.add(c)
        else:
            c = canonicalize(u)
            if c is None or c in seen:
                continue
            seen.add(c)
            if not is_valid_url(c):
                continue
        if is_excluded is not None and is_excluded(c):
            continue
        out.append(c)
    return out
