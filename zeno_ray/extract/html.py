"""HTML outlink / asset / text extraction.

Behavioral spec (reference, read-only):
- outlinks: ``a[href]``, ``iframe[src]``, ``ref[target]`` + plain-text URLs in
  body text with ``<script>`` subtrees removed (``crawl/outlinks.go:13-51``,
  ``crawl/utils.go:59-79``).
- assets: ``[data-item]`` JSON, every element's ``style`` background-image
  ``url()`` + ``data-preview``, ``img[src|data-src|data-lazy-src|srcset|
  data-srcset]``, ``video[src]``, ``<style>`` CSS ``url()``, ``script`` (src +
  ``application/json`` bodies + URL-regex over outer HTML + ``var x = {...}``
  brace-matched JSON payloads), ``link[href]`` (skip ``rel=alternate``),
  ``audio[src]``, ``meta[href | content~http]``, ``source[src|srcset|
  data-srcset]`` (``crawl/assets.go:182-457``); per-tag disable mirrors
  ``--disable-html-tag``.
- ``<base href>`` honored, first one wins (``capture.go:558-578``).
- text: concatenation of body text nodes excluding ``<script>``/``<style>``
  subtrees, entity-unescaped, whitespace preserved — the goquery
  ``Find("body").RemoveFiltered("script").Text()`` contract
  (``outlinks.go:43``); this column is the byte-identical-text oracle.

Single streaming pass with the stdlib ``html.parser`` (no lxml in this
environment); categories are emitted in the reference's category order, each
category in document order, so extraction order — and therefore candidate
``pos`` — is deterministic.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from html import unescape as _unescape
from html.parser import HTMLParser

from zeno_ray.extract.jsonx import urls_from_json

# stand-in for xurls.Relaxed() (crawl/crawl.go:57) restricted to the
# scheme-ful matches that survive the reference's ValidateURL gate
# (crawl/utils.go:59-79): scheme-less matches are dropped there anyway.
TEXT_URL_RE = re.compile(r"""https?://[^\s<>"'`\\{}|^\[\]]+""")
_TRAIL_PUNCT = ".,;:!?')"

# assets.go:20-21
BACKGROUND_IMAGE_RE = re.compile(r"\(['\"]?(.*?)['\"]?\)")
CSS_URL_RE = re.compile(r"url\((.*?)\)", re.M)


def _text_links(source: str) -> list[str]:
    """extractLinksFromText: regex match → dedupe (first wins) → trailing
    punctuation trim (xurls behavior)."""
    seen: set[str] = set()
    out: list[str] = []
    for m in TEXT_URL_RE.finditer(source):
        u = m.group(0).rstrip(_TRAIL_PUNCT)
        if u and u not in seen:
            seen.add(u)
            out.append(u)
    return out


def _split_srcset(value: str) -> list[str]:
    """assets.go:253-267 — split on ',', trim, take first space token."""
    out = []
    for part in value.split(","):
        tok = part.strip().split(" ")[0]
        if tok:
            out.append(tok)
    return out


def _go_unquote(s: str) -> str | None:
    """strconv.Unquote semantics for \\uXXXX-escaped URLs in script bodies
    (assets.go:330-335); None on invalid escapes (the reference skips)."""
    if "\\" not in s:
        return s
    try:
        return json.loads('"' + s.replace('"', '\\"') + '"')
    except ValueError:
        return None


@dataclass
class HtmlExtract:
    outlinks: list[str] = field(default_factory=list)  # raw, pre-clean
    assets: list[str] = field(default_factory=list)  # raw, pre-clean
    base: str | None = None  # <base href> value, first one wins
    text: str = ""  # body text minus script/style subtrees


class _Collector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.a_href: list[str] = []
        self.iframe_src: list[str] = []
        self.ref_target: list[str] = []
        self.base_href: str | None = None
        self.data_item: list[str] = []
        self.style_attr: list[str] = []
        self.data_preview: list[str] = []
        self.img: list[str] = []
        self.video: list[str] = []
        self.audio: list[str] = []
        self.style_css: list[str] = []
        self.scripts: list[tuple[dict, str, str]] = []  # (attrs, text, start_tag)
        self.link_href: list[str] = []
        self.meta: list[str] = []
        self.source: list[str] = []
        self.text_parts: list[str] = []
        self._prebody_parts: list[str] = []  # used only for body-less docs
        self._body_depth = 0
        self._saw_body = False
        self._skip_text_depth = 0  # inside script/style
        self._script_text: list[str] | None = None
        self._script_attrs: dict | None = None
        self._script_start = ""
        self._style_text: list[str] | None = None

    # -- tag handlers -----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        a = {}
        for k, v in attrs:
            if k not in a:
                a[k] = v if v is not None else ""
        self._element(tag, a, self.get_starttag_text() or "")
        if tag == "body":
            self._body_depth += 1
            self._saw_body = True
        elif tag == "script":
            self._skip_text_depth += 1
            self._script_text = []
            self._script_attrs = a
            self._script_start = self.get_starttag_text() or "<script>"
        elif tag == "style":
            self._skip_text_depth += 1
            self._style_text = []

    def handle_startendtag(self, tag, attrs):
        a = {}
        for k, v in attrs:
            if k not in a:
                a[k] = v if v is not None else ""
        self._element(tag, a, self.get_starttag_text() or "")

    def handle_endtag(self, tag):
        if tag == "body" and self._body_depth:
            self._body_depth -= 1
        elif tag == "script" and self._script_text is not None:
            self._skip_text_depth = max(0, self._skip_text_depth - 1)
            text = "".join(self._script_text)
            self.scripts.append((self._script_attrs or {}, text, self._script_start))
            self._script_text = None
            self._script_attrs = None
        elif tag == "style" and self._style_text is not None:
            self._skip_text_depth = max(0, self._skip_text_depth - 1)
            self.style_css.append("".join(self._style_text))
            self._style_text = None

    def handle_data(self, data):
        if self._script_text is not None:
            self._script_text.append(data)
            return
        if self._style_text is not None:
            self._style_text.append(data)
            return
        if self._body_depth > 0:
            self.text_parts.append(data)
        else:
            # head / pre-body text — only counted when the document never
            # opens a <body> (goquery's net/html synthesizes one around
            # everything in that case)
            self._prebody_parts.append(data)

    # -- per-element attribute harvesting --------------------------------
    def _element(self, tag, a, start_tag):
        if "data-item" in a:  # assets.go:197-207
            self.data_item.append(a["data-item"])
        if "style" in a:  # assets.go:210-225
            self.style_attr.append(a["style"])
        if "data-preview" in a:  # assets.go:227-232
            if a["data-preview"].startswith("http"):
                self.data_preview.append(a["data-preview"])

        if tag == "a":
            if "href" in a:
                self.a_href.append(a["href"])
        elif tag == "iframe":
            if "src" in a:
                self.iframe_src.append(a["src"])
        elif tag == "ref":
            if "target" in a:
                self.ref_target.append(a["target"])
        elif tag == "base":
            if self.base_href is None and "href" in a:
                self.base_href = a["href"]
        elif tag == "img":  # assets.go:237-268
            for key in ("src", "data-src", "data-lazy-src"):
                if key in a:
                    self.img.append(a[key])
            for key in ("data-srcset", "srcset"):
                if key in a:
                    self.img.extend(_split_srcset(a[key]))
        elif tag == "video":
            if "src" in a:
                self.video.append(a["src"])
        elif tag == "audio":
            if "src" in a:
                self.audio.append(a["src"])
        elif tag == "link":  # assets.go:384-398 — rel=alternate handled later
            self.link_href.append((a.get("rel", ""), a.get("href")))
        elif tag == "meta":  # assets.go:409-422
            if "href" in a:
                self.meta.append(a["href"])
            if "content" in a and "http" in a["content"]:
                self.meta.append(a["content"])
        elif tag == "source":  # assets.go:424-447
            if "src" in a:
                self.source.append(a["src"])
            for key in ("srcset", "data-srcset"):
                if key in a:
                    self.source.extend(_split_srcset(a[key]))


# ----------------------------------------------------------------- fast scan
#
# A single-regex scanner for the well-formed-HTML subset: plain start/end/
# self-closing tags with optionally-quoted attributes, charref text runs,
# and exactly-terminated <script>/<style> CDATA blocks. Anything outside
# the subset (comments, doctypes, PIs, CDATA sections, malformed tags,
# tolerant end-tag shapes) returns None and the caller re-parses with the
# stdlib html.parser, whose semantics this scanner replicates (same
# _Collector fields, same first-wins attrs, same charref unescaping, same
# dropped-unterminated-script behavior). Equivalence is enforced by the
# extractor unit fixtures AND the full-corpus byte-identical-text /
# edge-hash oracles, which run both engines over every page shape.

# Attr names and unquoted values exclude <, ", ' — html.parser is more
# tolerant there, but a failed _FAST_TAG match at a '<'+alpha position
# falls back to html.parser, so extra strictness only costs speed, never
# correctness. Quoted values may contain '<' (html.parser agrees).
_FAST_TAG = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:_\-]*)"
    r"((?:\s+[^\s=/><\"']+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s><\"']*))?)*)"
    r"\s*(/?)>"
)
_ATTR_RE = re.compile(
    r"([^\s=/><\"']+)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s><\"']*))?")
_SCRIPT_END = re.compile(r"</\s*script\s*>", re.I)
_STYLE_END = re.compile(r"</\s*style\s*>", re.I)

# tags whose attributes the collector actually reads; everything else only
# needs attr parsing when a data-*/style attribute might be present
_ATTR_TAGS = frozenset({
    "a", "iframe", "ref", "base", "img", "video", "audio", "link", "meta",
    "source", "script",
})


def _fast_attrs(raw: str) -> dict:
    a: dict = {}
    for m in _ATTR_RE.finditer(raw):
        k, v = m.group(1, 2)
        k = k.lower()
        if k in a:
            continue  # first-wins, like _Collector.handle_starttag
        if v is None:
            a[k] = ""
            continue
        if v[:1] in ("'", '"'):
            v = v[1:-1]
        if v and "&" in v:
            v = _unescape(v)
        a[k] = v
    return a


def _fast_collect(doc: str) -> "_Collector | None":
    """Fill a _Collector without html.parser, or None → caller falls back."""
    col = _Collector()

    def text_chunk(t: str) -> None:
        if "&" in t:
            t = _unescape(t)
        if col._body_depth > 0:
            col.text_parts.append(t)
        else:
            col._prebody_parts.append(t)

    pos, n = 0, len(doc)
    while pos < n:
        lt = doc.find("<", pos)
        if lt < 0:
            text_chunk(doc[pos:])
            break
        if lt > pos:
            text_chunk(doc[pos:lt])
        m = _FAST_TAG.match(doc, lt)
        if m is None:
            nc = doc[lt + 1: lt + 2]
            if nc and (nc.isalpha() or nc in "/!?"):
                return None  # construct outside the fast subset
            text_chunk("<")  # literal '<' data, like html.parser
            pos = lt + 1
            continue
        closing, tag, attrs_raw, selfclose = m.group(1, 2, 3, 4)
        tag = tag.lower()
        pos = m.end()
        if closing:
            if tag == "body" and col._body_depth:
                col._body_depth -= 1
            continue
        if attrs_raw and tag not in _ATTR_TAGS:
            # attr NAMES are lowercased on parse, so sniff case-insensitively
            al = attrs_raw.lower()
            need_attrs = "data-" in al or "style" in al
        else:
            need_attrs = bool(attrs_raw)
        a = _fast_attrs(attrs_raw) if need_attrs else {}
        if a or tag in ("a", "iframe", "ref", "base", "img", "video",
                        "audio", "link", "meta", "source"):
            col._element(tag, a, m.group(0))
        if selfclose:
            continue  # handle_startendtag: no content model, no body depth
        if tag == "body":
            col._body_depth += 1
            col._saw_body = True
        elif tag == "script":
            end = _SCRIPT_END.search(doc, pos)
            if end is None:
                break  # unterminated CDATA: html.parser drops it too
            col.scripts.append((a, doc[pos: end.start()], m.group(0)))
            pos = end.end()
        elif tag == "style":
            end = _STYLE_END.search(doc, pos)
            if end is None:
                break
            col.style_css.append(doc[pos: end.start()])
            pos = end.end()
    return col


def _style_urls(css: str) -> list[str]:
    """<style> body scraping (assets.go:281-299)."""
    out = []
    for m in CSS_URL_RE.finditer(css):
        v = m.group(1).replace("'", "").replace('"', "")
        if "http" not in v:
            v = v.replace("//", "http://")
        if v.startswith("#wp-"):
            continue
        out.append(v)
    return out


def _style_attr_urls(style: str) -> list[str]:
    """inline style= background-image scraping with the CSS-noise filter
    (assets.go:213-224)."""
    out = []
    for m in BACKGROUND_IMAGE_RE.finditer(style):
        v = m.group(1)
        if not v:
            continue
        if (
            "%" in v
            or v.startswith("0.")
            or v.startswith("--font")
            or v.startswith("--size")
            or v.startswith("--color")
            or v.startswith("--shreddit")
            or v.startswith("100vh")
        ):
            continue
        out.append(v)
    return out


def _script_assets(attrs: dict, text: str, start_tag: str) -> list[str]:
    """All four script-tag extraction modes (assets.go:302-382)."""
    out: list[str] = []
    if "src" in attrs:
        out.append(attrs["src"])
    if attrs.get("type") == "application/json":
        out.extend(urls_from_json(text))
    # URL regex over the script's outer HTML, http-prefixed, deduped,
    # unicode-unquoted (assets.go:322-339)
    outer = start_tag + text + "</script>"
    for link in _text_links(outer):
        if link.startswith("http"):
            unq = _go_unquote(link)
            if unq is not None:
                out.append(unq)
    # `var x = {...}` payload carve-out (assets.go:341-380)
    if not text.startswith("{") and "=" in text:
        payload = text.split("=", 1)[1]
        open_n = close_n = 0
        end = 0
        for pos, ch in enumerate(payload):
            if ch == "{":
                open_n += 1
            elif ch == "}":
                close_n += 1
            else:
                continue
            if open_n > 0 and open_n == close_n:
                end = pos
                break
        if len(payload) > end:
            out.extend(urls_from_json(payload[: end + 1]))
    return out


def extract_html(
    body: str | bytes,
    disabled_tags: frozenset[str] = frozenset(),
    capture_alternate_pages: bool = False,
) -> HtmlExtract:
    """One-pass outlink/asset/text/base extraction over an HTML document."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    col = _fast_collect(body)
    if col is None:  # outside the fast subset → stdlib html.parser
        col = _Collector()
        try:
            col.feed(body)
            col.close()
        except Exception:
            pass  # parse as far as possible; goquery is similarly lenient

    text = "".join(col.text_parts if col._saw_body else col._prebody_parts + col.text_parts)

    outlinks: list[str] = []
    outlinks += col.a_href
    outlinks += col.iframe_src
    outlinks += col.ref_target
    outlinks += _text_links(text)

    assets: list[str] = []
    for item in col.data_item:
        assets.extend(urls_from_json(item))
    for style in col.style_attr:
        assets.extend(_style_attr_urls(style))
    assets.extend(col.data_preview)
    if "img" not in disabled_tags:
        assets.extend(col.img)
    if "video" not in disabled_tags:
        assets.extend(col.video)
    if "style" not in disabled_tags:
        for css in col.style_css:
            assets.extend(_style_urls(css))
    if "script" not in disabled_tags:
        for attrs, stext, start_tag in col.scripts:
            assets.extend(_script_assets(attrs, stext, start_tag))
    if "link" not in disabled_tags:
        for rel, href in col.link_href:
            if rel == "alternate" and not capture_alternate_pages:
                continue
            if href is not None:
                assets.append(href)
    if "audio" not in disabled_tags:
        assets.extend(col.audio)
    if "meta" not in disabled_tags:
        assets.extend(col.meta)
    if "source" not in disabled_tags:
        assets.extend(col.source)

    base = None if "base" in disabled_tags else col.base_href
    return HtmlExtract(outlinks=outlinks, assets=assets, base=base, text=text)


def extract_text(body: str | bytes) -> str:
    """Just the byte-identical-text contract (cheap path for text-only use)."""
    return extract_html(body, disabled_tags=frozenset({"img", "video", "style",
                                                       "script", "link", "audio",
                                                       "meta", "source"})).text
