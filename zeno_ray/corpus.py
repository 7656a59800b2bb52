"""Deterministic synthetic Common-Crawl-style corpus (the sandbox "web").

Authoritative table shape per the driver input hint: ``url:string,
warc_ts:timestamp, html:binary, text:string, lang:string`` plus fetch-sim
columns (``status, redirect_location, content_type, link_header, server,
attempts_needed``) per FIXTURES.md §1.

Everything is a pure function of ``(CorpusSpec, url)``:
- :meth:`CorpusSpec.lookup` synthesizes the full page record for any URL —
  the crawl's Fetcher actors "fetch" by calling it, so fetching needs no
  corpus I/O, no broadcast table, and scales to any frontier size.
- :meth:`CorpusSpec.page_edges` returns the ground-truth canonical link
  edges the page embeds. The edges parquet built from it is the oracle the
  HTML/XML/JSON/M3U8 extraction pipeline is checked against (the generator
  composes edges from its own link lists + urlnorm — NOT by running the
  HTML parser, so extraction correctness is a real test, not a tautology).

The page graph: ``n_hosts`` hosts × ``pages_per_host`` article pages, plus
per host a root page, a sitemap.xml, a JSON API page, an M3U8 playlist with
segments, shared image/js/css assets, 301 redirect aliases, 404s and
429-flaky pages. Roots chain to the next host's root via a ``Link:``
preconnect header; article pages carry intra-host links, one cross-host
link, and one plain-text cross-host URL. Seeds are every 4th host root, so
a full crawl must discover most of the web transitively.

Determinism: every random draw is a SplitMix64 counter stream keyed by
``hash64(f"{seed}:{url}")``.
No wall-clock, no global state.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import re
from dataclasses import dataclass
from typing import Optional

from zeno_ray.urlnorm import canonicalize, hash64

LANGS = ["en", "en", "en", "fr", "de", "es", "ja", "en"]

_BASE_TS = _dt.datetime(2025, 1, 1, 0, 0, 0)

_WORDS = (
    "archive web crawl data frontier host page link index fetch parse "
    "stream batch arrow shard epoch budget polite robot queue seen hash "
    "graph node edge text corpus record schema block spill merge scan"
).split()


@dataclass(frozen=True)
class PageRecord:
    url: str
    status: int
    content_type: str
    html: bytes
    text: str
    lang: str
    warc_ts: _dt.datetime
    redirect_location: Optional[str] = None
    link_header: Optional[str] = None
    server: Optional[str] = None
    attempts_needed: int = 0  # of leading 429 responses before success


_PAGE_RE = re.compile(
    r"^https://(?P<host>host(?P<i>\d{4,})\.example)(?P<path>/.*)$"
)

# bump when generated content changes — ensure_corpus regenerates any
# cached corpus whose marker records a different version/spec
CORPUS_VERSION = 7


@dataclass(frozen=True)
class CorpusSpec:
    seed: int = 42
    n_hosts: int = 12
    pages_per_host: int = 12
    imgs_per_host: int = 6
    sitemap_max: int = 50
    seed_stride: int = 4  # every Nth host root is a crawl seed

    # ------------------------------------------------------------ naming
    @classmethod
    def for_sf(cls, sf: float) -> "CorpusSpec":
        """Scale-factor presets (FIXTURES.md §7): t1 ≈ 10^2-10^3 pages,
        t2 ≈ 10^4, bench ≈ 10^5."""
        if sf <= 0.001:
            return cls(n_hosts=12, pages_per_host=12)
        if sf <= 0.01:
            return cls(n_hosts=80, pages_per_host=60)
        if sf <= 0.1:
            # bench scale: ~2M-row universe so crawl compute dominates the
            # per-epoch scheduling floor (the scaling-efficiency regime)
            return cls(n_hosts=2000, pages_per_host=800)
        if sf <= 0.5:
            # bigsf battery scale (~8M fetched pages)
            return cls(n_hosts=6000, pages_per_host=1000)
        # probe scale: ~20M-URL universe (~21M fetched incl. alias
        # redirects), the 2.5x step past sf0.3 for the memory-ceiling audit
        return cls(n_hosts=16000, pages_per_host=1000)

    def host(self, i: int) -> str:
        return f"host{i:04d}.example"

    def hosts(self) -> list[str]:
        return [self.host(i) for i in range(self.n_hosts)]

    def root(self, i: int) -> str:
        return f"https://{self.host(i)}/"

    def seeds(self) -> list[str]:
        return [self.root(i) for i in range(0, self.n_hosts, self.seed_stride)]

    # ------------------------------------------------------------ universe
    def universe_urls(self):
        """Every URL that exists (status != 404) — one pages-table row each.
        404 targets (/missing/*) are NOT rows; lookup() synthesizes them."""
        H, P = self.n_hosts, self.pages_per_host
        for i in range(H):
            h = self.host(i)
            yield f"https://{h}/"
            for j in range(P):
                yield f"https://{h}/page/{j}"
            yield f"https://{h}/robots.txt"
            yield f"https://{h}/sitemap.xml"
            yield f"https://{h}/api/data.json"
            yield f"https://{h}/media/playlist.m3u8"
            for k in range(3):
                yield f"https://{h}/media/seg{k}.ts"
            for k in range(self.imgs_per_host):
                yield f"https://{h}/img/{k}.png"
            for k in range(4):
                yield f"https://{h}/img/og{k}.png"
            yield f"https://{h}/js/app.js"
            yield f"https://{h}/static/main.css"
            if i % 29 == 11:
                yield f"https://{h}/s3/?prefix=data"  # S3 bucket listing
                for k in range(2):
                    yield f"https://{h}/s3/data/file{k}.bin"
            for j in range(P):
                if j % 7 == 3:
                    yield f"https://{h}/r/{j}"  # 301 alias
                if j % 13 == 6:
                    yield f"https://{h}/flaky/{j}"  # 429-then-200

    def universe_size(self) -> int:
        H, P = self.n_hosts, self.pages_per_host
        per_host = (
            1 + P + 1 + 1 + 1 + 1 + 3 + self.imgs_per_host + 4 + 1 + 1
            + len([j for j in range(P) if j % 7 == 3])
            + len([j for j in range(P) if j % 13 == 6])
        )
        n_s3_hosts = len([i for i in range(H) if i % 29 == 11])
        return H * per_host + n_s3_hosts * 3

    # ------------------------------------------------------------ lookup
    def lookup(self, url: str) -> PageRecord:
        """Synthesize the response for *url* (404 when outside the universe).
        Pure and O(1) — this IS the sandbox HTTP server."""
        m = _PAGE_RE.match(url)
        ts = _BASE_TS + _dt.timedelta(seconds=hash64(f"{self.seed}:{url}") % (86400 * 30))
        if not m:
            return self._error(url, 404, ts)
        i = int(m.group("i"))
        if i >= self.n_hosts:
            return self._error(url, 404, ts)
        host, path = m.group("host"), m.group("path")
        lang = LANGS[i % len(LANGS)]
        P = self.pages_per_host

        if path == "/":
            return self._root_page(i, host, lang, ts)
        if path.startswith("/page/"):
            j = _to_int(path[len("/page/"):])
            if j is None or j >= P:
                return self._error(url, 404, ts)
            return self._article(i, j, host, lang, ts)
        if path.startswith("/s3/"):
            return self._s3(i, host, path, lang, ts)
        if path == "/robots.txt":
            return self._robots(i, host, lang, ts)
        if path == "/sitemap.xml":
            return self._sitemap(i, host, lang, ts)
        if path == "/api/data.json":
            return self._api(i, host, lang, ts)
        if path == "/media/playlist.m3u8":
            return self._playlist(i, host, lang, ts)
        if path.startswith("/media/seg") and path.endswith(".ts"):
            k = _to_int(path[len("/media/seg"):-3])
            if k is None or k >= 3:
                return self._error(url, 404, ts)
            return self._binary(url, "video/mp2t", lang, ts, 700)
        if path.startswith("/img/og"):
            k = _to_int(path[len("/img/og"):-4]) if path.endswith(".png") else None
            if k is None or k >= 4:
                return self._error(url, 404, ts)
            return self._binary(url, "image/png", lang, ts, 400)
        if path.startswith("/img/"):
            k = _to_int(path[len("/img/"):-4]) if path.endswith(".png") else None
            if k is None or k >= self.imgs_per_host:
                return self._error(url, 404, ts)
            return self._binary(url, "image/png", lang, ts, 500)
        if path == "/js/app.js":
            return self._binary(url, "application/javascript", lang, ts, 300)
        if path == "/static/main.css":
            # text/css bodies must contain no absolute URLs (they would leak
            # into text-link extraction, capture.go:493 + utils.go:59-79)
            css = "body { background: url(bg.png); color: #222; }\n"
            return PageRecord(url, 200, "text/css", css.encode(), "", lang, ts)
        if path.startswith("/r/"):
            j = _to_int(path[len("/r/"):])
            if j is None or j >= P or j % 7 != 3:
                return self._error(url, 404, ts)
            # relative Location — must be resolved (capture.go:130-139)
            return PageRecord(
                url, 301, "text/html", b"", "", lang, ts,
                redirect_location=f"/page/{(j + 1) % P}",
            )
        if path.startswith("/flaky/"):
            j = _to_int(path[len("/flaky/"):])
            if j is None or j >= P or j % 13 != 6:
                return self._error(url, 404, ts)
            rec = self._article(i, j, host, lang, ts)
            # identical body to /page/j but served at this URL after 1-2 429s
            attempts = 1 + (hash64(f"{self.seed}:flaky:{url}") % 2)
            return PageRecord(
                url, 200, "text/html", rec.html, rec.text, lang, ts,
                attempts_needed=attempts,
            )
        return self._error(url, 404, ts)

    # ------------------------------------------------------------ builders
    def _error(self, url: str, status: int, ts) -> PageRecord:
        return PageRecord(url, status, "text/html", b"", "", "en", ts)

    def _binary(self, url: str, ct: str, lang: str, ts, size: int) -> PageRecord:
        seed_bytes = hash64(f"{self.seed}:bin:{url}").to_bytes(8, "big")
        body = (seed_bytes * (size // 8 + 1))[:size]
        return PageRecord(url, 200, ct, body, "", lang, ts)

    def _filler(self, url: str, n: int) -> str:
        # vectorized word salad: a SplitMix64 counter stream off the
        # deterministic url hash — no RNG object at all (random.Random
        # string seeding + per-word choice() was the hottest path of the
        # whole synthetic fetch; PCG64's SeedSequence init is just as bad)
        import numpy as np

        x = (np.uint64(hash64(f"{self.seed}:txt:{url}"))
             + np.uint64(0x9E3779B97F4A7C15)
             * np.arange(1, n + 1, dtype=np.uint64))
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        w = _WORDS
        return " ".join([w[i] for i in (x % np.uint64(len(w))).tolist()])

    def _root_page(self, i: int, host: str, lang: str, ts) -> PageRecord:
        P = self.pages_per_host
        links = [f"/page/{j}" for j in range(min(P, 12))] + ["/sitemap.xml", "/api/data.json"]
        if self.s3_host(i):
            links.append("/s3/?prefix=data")
        text_parts = [f"Welcome to {host} — index & archive. ", self._filler(f"https://{host}/", 24)]
        html, text = _compose_html(
            title=f"{host} home",
            links=links,
            text_parts=text_parts,
            imgs=[f"/img/{0}.png"],
            css_href="/static/main.css",
            js_src="/js/app.js",
        )
        # roots chain to the next host's root via the Link header
        nxt = self.root((i + 1) % self.n_hosts)
        return PageRecord(
            f"https://{host}/", 200, "text/html; charset=utf-8", html, text,
            lang, ts, link_header=f'<{nxt}>; rel="preconnect"',
        )

    def _article_links(self, i: int, j: int) -> tuple[list[str], list[str], str]:
        """(anchor hrefs, img srcs, text-link url) for /page/j — the single
        source of truth shared by the HTML builder and page_edges()."""
        H, P = self.n_hosts, self.pages_per_host
        links = [
            f"/page/{(j * 3 + 1) % P}",
            f"/page/{(j + 13) % P}",
            f"/page/{(j * 5 + 2) % P}",
            f"/page/{(j + 29) % P}",
            f"/page/{(j * 9 + 4) % P}",
            f"/page/{(j * 7 + 6) % P}",
            f"/page/{(j + 41) % P}",
        ]
        if j % 7 == 3:
            links.append(f"/r/{j}")
        if j % 13 == 6:
            links.append(f"/flaky/{j}")
        if j % 11 == 5:
            links.append(f"/missing/{j}")  # 404 target
        links.append(f"https://{self.host((i + j + 1) % H)}/page/{(j * 5) % P}")
        links.append(f"https://{self.host((i * 3 + j + 2) % H)}/page/{(j * 7 + 3) % P}")
        if j % 5 == 0:
            links.append(f"https://{self.host((i + 2) % H)}/")
        imgs = [f"/img/{j % self.imgs_per_host}.png"]
        if j % 3 == 0:
            imgs.append(f"/img/{(j + 1) % self.imgs_per_host}.png")
        text_link = f"https://{self.host((i * 7 + j) % H)}/page/{(j * 11) % P}"
        return links, imgs, text_link

    def _article(self, i: int, j: int, host: str, lang: str, ts) -> PageRecord:
        links, imgs, text_link = self._article_links(i, j)
        og = f"https://{host}/img/og{j % 4}.png"
        media = f"/media/playlist.m3u8" if j % 17 == 9 else None
        if media:
            links = links + [media]
        text_parts = [
            f"Article {j} on {host}. ",
            self._filler(f"https://{host}/page/{j}", 40),
            f" More at {text_link} today. ",
            "Fish & chips <3 ",
            self._filler(f"https://{host}/page/{j}:2", 20),
        ]
        html, text = _compose_html(
            title=f"article {j}",
            links=links,
            text_parts=text_parts,
            imgs=imgs,
            css_href="/static/main.css",
            js_src="/js/app.js",
            og_image=og,
            json_cfg={"media": f"https://{host}/media/seg0.ts"} if j % 19 == 7 else None,
        )
        return PageRecord(
            f"https://{host}/page/{j}", 200, "text/html; charset=utf-8",
            html, text, lang, ts,
        )

    def robots_disallows(self, i: int) -> list:
        """Deterministic per-host robots rules: every 11th-ish host
        disallows its /media/ subtree (observable: playlists+segments
        skipped when enforcement is on); everyone else allows all."""
        return ["/media/"] if i % 11 == 7 else []

    def _robots(self, i: int, host: str, lang: str, ts) -> PageRecord:
        lines = ["User-agent: *"]
        dis = self.robots_disallows(i)
        lines += [f"Disallow: {d}" for d in dis] or ["Disallow:"]
        body = "\n".join(lines) + "\n"
        return PageRecord(
            f"https://{host}/robots.txt", 200, "text/plain",
            body.encode(), "", lang, ts,
        )

    def s3_host(self, i: int) -> bool:
        return i % 29 == 11

    def _s3(self, i: int, host: str, path: str, lang: str, ts) -> PageRecord:
        """S3 bucket-listing pages with marker pagination + the listed
        binary objects (exercises extractor/s3.go:44-124 end-to-end)."""
        if not self.s3_host(i):
            return self._error(f"https://{host}{path}", 404, ts)
        url = f"https://{host}{path}"
        if path.startswith("/s3/data/file") and path.endswith(".bin"):
            k = _to_int(path[len("/s3/data/file"):-4])
            if k is None or k >= 2:
                return self._error(url, 404, ts)
            return PageRecord(
                url, 200, "application/octet-stream",
                self._binary(url, "application/octet-stream", lang, ts, 600).html,
                "", lang, ts, server="AmazonS3",
            )
        if not path.startswith("/s3/?"):
            return self._error(url, 404, ts)
        query = path.split("?", 1)[1]
        if "marker=" in query:
            # page 2: empty listing terminates the pagination
            body = ('<?xml version="1.0" encoding="UTF-8"?>'
                    "<ListBucketResult><Name>bucket</Name>"
                    "<IsTruncated>false</IsTruncated></ListBucketResult>")
        else:
            contents = "".join(
                f"<Contents><Key>s3/data/file{k}.bin</Key><Size>600</Size></Contents>"
                for k in range(2)
            )
            body = ('<?xml version="1.0" encoding="UTF-8"?>'
                    f"<ListBucketResult><Name>bucket</Name>{contents}"
                    "<IsTruncated>false</IsTruncated></ListBucketResult>")
        return PageRecord(
            url, 200, "application/xml", body.encode(), "", lang, ts,
            server="AmazonS3",
        )

    def _sitemap(self, i: int, host: str, lang: str, ts) -> PageRecord:
        n = min(self.pages_per_host, self.sitemap_max)
        locs = "".join(
            f"<url><loc>https://{host}/page/{j}</loc></url>" for j in range(n)
        )
        body = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{locs}</urlset>"
        )
        return PageRecord(
            f"https://{host}/sitemap.xml", 200, "application/xml",
            body.encode(), "", lang, ts,
        )

    def _api(self, i: int, host: str, lang: str, ts) -> PageRecord:
        data = {
            "host": host,
            "images": [f"https://{host}/img/{k}.png" for k in range(2)],
            "banner": {"src": f"https://{host}/img/og0.png"},
            "count": self.pages_per_host,
        }
        return PageRecord(
            f"https://{host}/api/data.json", 200, "application/json",
            json.dumps(data, sort_keys=True).encode(), "", lang, ts,
        )

    def _playlist(self, i: int, host: str, lang: str, ts) -> PageRecord:
        body = "#EXTM3U\n#EXT-X-TARGETDURATION:10\n" + "".join(
            f"#EXTINF:9.0,\n/media/seg{k}.ts\n" for k in range(3)
        ) + "#EXT-X-ENDLIST\n"
        return PageRecord(
            f"https://{host}/media/playlist.m3u8", 200,
            "application/vnd.apple.mpegurl", body.encode(), "", lang, ts,
        )

    # ------------------------------------------------------------ edges
    def page_edges(self, url: str) -> list[tuple[str, str]]:
        """Ground-truth (dst, kind) edges for *url*, canonicalized and
        in-page-deduped — what extraction must recover. kind ∈
        {outlink, asset, redirect}."""
        rec = self.lookup(url)
        m = _PAGE_RE.match(url)
        if rec.status == 301:
            dst = canonicalize(_urljoin(url, rec.redirect_location))
            return [(dst, "redirect")]
        if rec.status != 200 or m is None:
            return []
        i, path, host = int(m.group("i")), m.group("path"), m.group("host")
        out: list[tuple[str, str]] = []

        def add(dsts, kind):
            seen = {d for d, _ in out}
            for d in dsts:
                c = canonicalize(_urljoin(url, d))
                if c and c not in seen:
                    seen.add(c)
                    out.append((c, kind))

        if path == "/":
            P = self.pages_per_host
            nxt = self.root((i + 1) % self.n_hosts)
            add([nxt], "outlink")  # Link: header
            root_links = [f"/page/{j}" for j in range(min(P, 12))] + ["/sitemap.xml", "/api/data.json"]
            if self.s3_host(i):
                root_links.append("/s3/?prefix=data")
            add(root_links, "outlink")
            add([f"/img/{0}.png", "/static/main.css", "/js/app.js"], "asset")
        elif path.startswith("/s3/"):
            if path.startswith("/s3/?") and "marker=" not in path:
                from zeno_ray.extract.xmlx import _with_query_param

                add([_with_query_param(url, "marker", "s3/data/file1.bin")]
                    + [f"https://{host}/s3/data/file{k}.bin" for k in range(2)],
                    "outlink")
        elif path.startswith("/page/") or path.startswith("/flaky/"):
            j = _to_int(path.rsplit("/", 1)[1])
            links, imgs, text_link = self._article_links(i, j)
            if j % 17 == 9:
                links = links + ["/media/playlist.m3u8"]
            add(links + [text_link], "outlink")
            og = f"https://{host}/img/og{j % 4}.png"
            json_urls = [f"https://{host}/media/seg0.ts"] if j % 19 == 7 else []
            add(imgs + ["/static/main.css", "/js/app.js"] + json_urls + [og], "asset")
        elif path == "/sitemap.xml":
            n = min(self.pages_per_host, self.sitemap_max)
            add([f"/page/{j}" for j in range(n)], "outlink")
        elif path == "/api/data.json":
            add([f"https://{host}/img/{k}.png" for k in range(2)]
                + [f"https://{host}/img/og0.png"], "asset")
        elif path == "/media/playlist.m3u8":
            add([f"/media/seg{k}.ts" for k in range(3)], "asset")
        return out


def _to_int(s: str):
    try:
        return int(s)
    except ValueError:
        return None


def _urljoin(base: str, rel: str) -> str:
    from urllib.parse import urljoin

    return urljoin(base, rel)


def _compose_html(
    title: str,
    links: list[str],
    text_parts: list[str],
    imgs: list[str],
    css_href: str,
    js_src: str,
    og_image: str | None = None,
    json_cfg: dict | None = None,
) -> tuple[bytes, str]:
    """Build an HTML page whose body text nodes concatenate to exactly the
    returned ``text`` (the byte-identical-text oracle) and whose embedded
    URLs are exactly the link/img/og/json inputs."""
    from html import escape

    head = [f"<html><head><title>{escape(title)}</title>"]
    head.append(f'<link rel="stylesheet" href="{css_href}">')
    if og_image:
        head.append(f'<meta property="og:image" content="{og_image}">')
    head.append(f'<script src="{js_src}"></script>')
    if json_cfg is not None:
        head.append(f"<script>var cfg = {json.dumps(json_cfg, sort_keys=True)};</script>")
    head.append("</head><body>")

    body: list[str] = []
    text_acc: list[str] = []

    def emit_text(t: str):
        body.append(escape(t, quote=False))
        text_acc.append(t)

    body.append("<h1>")
    emit_text(title)
    body.append("</h1><p>")
    for part in text_parts:
        emit_text(part)
    body.append("</p><ul>")
    for n, href in enumerate(links):
        body.append(f'<li><a href="{escape(href)}">')
        emit_text(f"link {n}")
        body.append("</a></li>")
    body.append("</ul>")
    for src in imgs:
        body.append(f'<img src="{escape(src)}">')
    body.append("</body></html>")

    html = "".join(head) + "".join(body)
    return html.encode("utf-8"), "".join(text_acc)


# ---------------------------------------------------------------- parquet IO

PAGES_SCHEMA_COLS = [
    "url", "warc_ts", "html", "text", "lang",
    "status", "redirect_location", "content_type", "link_header", "server",
    "attempts_needed",
]


def sf_of_dir(sf_dir: str) -> float:
    """Map a driver testdata dir like /root/testdata/sf0.01 to its sf."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.01


def corpus_dir_for_sf(sf: float, root: str = "/tmp/rayzeno_corpus") -> str:
    return os.path.join(root, f"sf{sf:g}")


def records_to_table(records: list[PageRecord]):
    import pyarrow as pa

    return pa.table(
        {
            "url": pa.array([r.url for r in records], pa.string()),
            "warc_ts": pa.array([r.warc_ts for r in records], pa.timestamp("us")),
            "html": pa.array([r.html for r in records], pa.binary()),
            "text": pa.array([r.text for r in records], pa.string()),
            "lang": pa.array([r.lang for r in records], pa.string()),
            "status": pa.array([r.status for r in records], pa.int16()),
            "redirect_location": pa.array(
                [r.redirect_location for r in records], pa.string()
            ),
            "content_type": pa.array([r.content_type for r in records], pa.string()),
            "link_header": pa.array([r.link_header for r in records], pa.string()),
            "server": pa.array([r.server for r in records], pa.string()),
            "attempts_needed": pa.array(
                [r.attempts_needed for r in records], pa.int16()
            ),
        }
    )


class _BuildPages:
    """map_batches task: url batch → full page rows (zero-copy Arrow out)."""

    def __init__(self, spec: CorpusSpec):
        self.spec = spec

    def __call__(self, batch):
        records = [self.spec.lookup(u) for u in batch["url"].to_pylist()]
        return records_to_table(records)


class _BuildEdges:
    def __init__(self, spec: CorpusSpec):
        self.spec = spec

    def __call__(self, batch):
        import pyarrow as pa

        src, dst, kind, pos = [], [], [], []
        for u in batch["url"].to_pylist():
            cu = canonicalize(u)
            for p, (d, k) in enumerate(self.spec.page_edges(u)):
                src.append(cu)
                dst.append(d)
                kind.append(k)
                pos.append(p)
        return pa.table(
            {
                "src": pa.array(src, pa.string()),
                "dst": pa.array(dst, pa.string()),
                "kind": pa.array(kind, pa.string()),
                "pos": pa.array(pos, pa.int32()),
            }
        )


def ensure_corpus(spec: CorpusSpec, out_dir: str) -> str:
    """Materialize pages.parquet/, edges.parquet/ and seeds.parquet under
    *out_dir* (idempotent: guarded by a _SUCCESS marker; atomic via
    tmp-dir rename so concurrent callers and killed runs are safe)."""
    marker = os.path.join(out_dir, "_SUCCESS")
    stamp = f"{spec}|v{CORPUS_VERSION}"
    # sweep torn tmp siblings left by crashed generators (their pid is
    # gone; a LIVE concurrent generator's tmp dir is at most minutes old,
    # so only dirs older than an hour are reaped)
    import glob
    import shutil
    import time

    for stale in glob.glob(out_dir + ".tmp.*"):
        try:
            if time.time() - os.path.getmtime(stale) > 3600:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass
    if os.path.exists(marker):
        try:
            if open(marker).read().strip() == stamp:
                return out_dir
        except OSError:
            pass
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    tmp = out_dir + f".tmp.{os.getpid()}"
    os.makedirs(os.path.join(tmp, "pages"), exist_ok=True)
    os.makedirs(os.path.join(tmp, "edges"), exist_ok=True)

    urls = list(spec.universe_urls())
    ds = rd.from_items([{"url": u} for u in urls])
    ds.map_batches(
        _BuildPages, fn_constructor_kwargs={"spec": spec},
        batch_format="pyarrow", batch_size=2048, concurrency=4,
    ).write_parquet(os.path.join(tmp, "pages"))
    rd.from_items([{"url": u} for u in urls]).map_batches(
        _BuildEdges, fn_constructor_kwargs={"spec": spec},
        batch_format="pyarrow", batch_size=2048, concurrency=4,
    ).write_parquet(os.path.join(tmp, "edges"))
    pq.write_table(
        pa.table({"url": pa.array(spec.seeds(), pa.string())}),
        os.path.join(tmp, "seeds.parquet"),
    )
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write(stamp)
    try:
        os.rename(tmp, out_dir)
    except OSError:
        # another process won the race — keep theirs
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def ensure_corpus_for_sf(sf: float) -> tuple[CorpusSpec, str]:
    spec = CorpusSpec.for_sf(sf)
    return spec, ensure_corpus(spec, corpus_dir_for_sf(sf))
