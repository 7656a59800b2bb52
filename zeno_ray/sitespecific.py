"""Concrete site-specific modules — ports of the reference's
``internal/pkg/crawl/sitespecific/`` handlers onto the plugin registry.

Each function below mirrors one reference module's URL predicates and
derived-URL generation exactly (file:line cited per plugin); the
network-bound parsers (yt-dlp, headless JS) are pluggable callables with
deterministic defaults, since this sandbox has no network/subprocess.

``default_registry()`` wires them all, matching the hook order of the
reference's Capture else-if chain (capture.go:213-315, 339-437, 509-553).
"""

from __future__ import annotations

import json
import re
from urllib.parse import quote, urlencode, urlsplit, urlunsplit, parse_qsl

from zeno_ray.plugins import PluginRegistry, PostFetchResult, PreFetchAction

# ---------------------------------------------------------------- youtube

_YT_WATCH_RE = re.compile(r"youtube\.com")


def is_youtube_watch_page(url: str) -> bool:
    """youtube/youtube.go:9-11: host contains youtube.com AND path
    contains /watch or /v/."""
    parts = urlsplit(url)
    return "youtube.com" in parts.netloc and (
        "/watch" in parts.path or "/v/" in parts.path)


def make_youtube_plugin(parser=None):
    """Watch pages run through a video extractor (capture.go:339-395):
    stream/meta URLs are captured as assets and the extractor's raw JSON
    becomes a WARC-metadata-style side record. *parser* replaces yt-dlp
    (``parser(body) -> (stream_urls, meta_urls, raw_json)``); the default
    deterministically pulls googlevideo-style URLs out of the page."""
    def default_parser(body: bytes):
        text = body.decode("utf-8", "replace")
        urls = re.findall(r"https?://[^\s\"'<>]+googlevideo[^\s\"'<>]*", text)
        raw = json.dumps({"generator": "stub-ytdlp", "n_urls": len(urls)})
        return urls[:2], urls[2:], raw

    parse = parser or default_parser

    def hook(url, body, content_type, fetch):
        streams, metas, raw_json = parse(body)
        return PostFetchResult(
            assets=list(streams) + list(metas),
            metadata=raw_json or None,
            consume=True,  # capture.go:395 returns after ytdlp handling
        )

    return (lambda u, ct: is_youtube_watch_page(u)
            and ct.startswith("text/html")), hook


# ---------------------------------------------------------------- tiktok

TIKTOK_HEADERS = {
    # tiktok/tiktok.go:12-26, verbatim header set
    "Authority": "www.tiktok.com",
    "Sec-Ch-Ua": "\" Not A;Brand\";v=\"99\", \"Chromium\";v=\"99\", "
                 "\"Microsoft Edge\";v=\"99\"",
    "Sec-Ch-Ua-Mobile": "?0",
    "Sec-Ch-Ua-Platform": "\"Linux\"",
    "Dnt": "1",
    "Upgrade-Insecure-Requests": "1",
    "User-Agent": "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
                  "(KHTML, like Gecko) Chrome/99.0.4844.74 Safari/537.36 "
                  "Edg/99.0.1150.52",
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,"
              "image/webp,image/apng,*/*;q=0.8,"
              "application/signed-exchange;v=b3;q=0.9",
    "Sec-Fetch-Site": "none",
    "Sec-Fetch-Mode": "navigate",
    "Sec-Fetch-User": "?1",
    "Sec-Fetch-Dest": "document",
    "Accept-Language": "en-US,en;q=0.9,fr;q=0.8",
}


def is_tiktok_url(url: str) -> bool:
    return "/tiktok.com" in url  # tiktok.go:8-10 (substring, incl. the /)


# -------------------------------------------------------------------- vk

VK_USER_AGENT = ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) "
                 "AppleWebKit/537.36 (KHTML, like Gecko) "
                 "Chrome/118.0.0.0 Safari/537.36")


def is_vk_url(url: str) -> bool:
    return "/vk.com" in url  # vk.go:8-10


def vk_headers() -> dict:
    """vk/vk.go:12-29 — the out-of-date-browser workaround UA + the
    session cookie block (sent as a Cookie header there)."""
    return {
        "Authority": "vk.com",
        "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,"
                  "image/avif,image/webp,image/apng,*/*;q=0.8,"
                  "application/signed-exchange;v=b3;q=0.7",
        "Accept-Language": "fr-FR,fr;q=0.9,en-US;q=0.8,en;q=0.7",
        "Cache-Control": "max-age=0",
        "Sec-Fetch-Dest": "document",
        "Sec-Fetch-Mode": "navigate",
        "Sec-Fetch-Site": "same-origin",
        "Sec-Fetch-User": "?1",
        "Upgrade-Insecure-Requests": "1",
        "User-Agent": VK_USER_AGENT,
    }


# ---------------------------------------------------------------- reddit

REDDIT_COOKIES = {
    # reddit/reddit.go:13-31 — EU-consent / over-18 / quarantine opt-ins,
    # added only when absent (no-clobber, reddit.go:34-48)
    "eu_cookie_v2": "3",
    "over18": "1",
    "_options": "%7B%22pref_quarantine_optin%22%3A%20true%2C%20"
                "%22pref_gated_sr_optin%22%3A%20true%7D",
}


def is_reddit_url(url: str) -> bool:
    return "reddit.com" in url  # reddit.go:8-10


def is_reddit_post_api(url: str) -> bool:
    return "reddit.com/api/info.json?id=t3_" in url  # post.go:188-190


def reddit_post_hook(url, body, content_type, fetch):
    """post.go:192-218: the post API response yields two permalink
    outlinks (www + old) and every URL-ish string in the JSON as assets
    (amp;-cleaned, percent-unescaped)."""
    from urllib.parse import unquote

    from zeno_ray.extract.jsonx import urls_from_json

    try:
        data = json.loads(body)
        permalink = data["data"]["children"][0]["data"]["permalink"]
    except (ValueError, KeyError, IndexError):
        return PostFetchResult()
    outlinks = [f"https://www.reddit.com{permalink}",
                f"https://old.reddit.com{permalink}"]
    assets = [unquote(a.replace("amp;", "")) for a in urls_from_json(body)]
    return PostFetchResult(outlinks=outlinks, assets=assets, consume=True)


# ----------------------------------------------------------- truthsocial

_TRUTHSOCIAL_POST_RE = re.compile(
    r"https?://truthsocial\.com/@[A-Za-z0-9_]+/posts/\d+")  # truthsocial.go:10

TRUTHSOCIAL_EMBED_URLS = (
    # truthsocial.go:40-53, verbatim (minus the one duplicate entry,
    # which the seen-check collapses anyway)
    "https://truthsocial.com/api/v1/instance",
    "https://truthsocial.com/api/v2/pepe/instance",
    "https://truthsocial.com/api/v1/pepe/registrations",
    "https://truthsocial.com/packs/js/features/status-c45930b03ed6733263f7.chunk.js",
    "https://truthsocial.com/packs/js/features/ui-41c7fc2c5c89af476253.chunk.js",
    "https://truthsocial.com/packs/js/locale_en-json-6faa20d336d4db2ae5c2.chunk.js",
    "https://truthsocial.com/packs/js/error-f79ccf9f9c62540e8d24.chunk.js",
    "https://truthsocial.com/packs/js/error-7db9c592d5533abc11c4.chunk.js",
    "https://truthsocial.com/packs/js/locale_fr-json-be2806b06f0a4e32cc10.chunk.js",
    "https://truthsocial.com/packs/js/features/status-a9a9466d867b55c49645.chunk.js",
    "https://truthsocial.com/packs/js/features/ui-309139abd01199a782af.chunk.js",
)


def is_truthsocial_url(url: str) -> bool:
    return bool(_TRUTHSOCIAL_POST_RE.search(url))


def truthsocial_api_url(url: str) -> str | None:
    """truthsocial.go:17-37: /@user/posts/<id> → /api/v1/statuses/<id>."""
    parts = url.split("/")
    if len(parts) < 6:
        return None
    return "https://truthsocial.com/api/v1/statuses/" + parts[5]


def truthsocial_pre_fetch(url: str) -> PreFetchAction:
    """capture.go:213-252: the post page additionally captures its API
    status document and the playback embed chunk set."""
    companions = []
    api = truthsocial_api_url(url)
    if api:
        companions.append(api)
    companions.extend(TRUTHSOCIAL_EMBED_URLS)
    return PreFetchAction(companions=companions)


# --------------------------------------------------------------- facebook

def is_facebook_post_url(url: str) -> bool:
    return "facebook.com" in url and "/posts/" in url  # facebook.go:9-11


def facebook_embed_url(url: str) -> str:
    """facebook.go:13-20: the post's plugin-embed rendition."""
    return ("https://www.facebook.com/plugins/post.php?href="
            + quote(url, safe="") + "&show_text=true")


# ----------------------------------------------------------------- libsyn

def is_libsyn_url(url: str) -> bool:
    # libsyn.go:10-13
    return ("traffic.libsyn.com" in url and url.endswith(".mp3")
            and "force-cdn/highwinds" not in url)


def libsyn_highwinds_url(url: str) -> str:
    # libsyn.go:15-22
    return url.replace("traffic.libsyn.com",
                       "traffic.libsyn.com/secure/force-cdn/highwinds", 1)


# --------------------------------------------------------------- telegram

def is_telegram_url(url: str) -> bool:
    return "/t.me/" in url  # telegram.go:12-14


def is_telegram_embed_url(url: str) -> bool:
    return "/t.me/" in url and "embed=1" in url  # telegram.go:8-10


def telegram_embed_url(url: str) -> str:
    """telegram.go:16-22: add embed=1&mode=tme to the query (Go's
    url.Values.Encode() emits keys in sorted order — mirrored)."""
    parts = urlsplit(url)
    q = parse_qsl(parts.query, keep_blank_values=True)
    q += [("embed", "1"), ("mode", "tme")]
    q.sort(key=lambda kv: kv[0])
    return urlunsplit(
        (parts.scheme, parts.netloc, parts.path, urlencode(q), parts.fragment))


# ------------------------------------------------------- cloudflarestream

def is_cloudflarestream_url(url: str) -> bool:
    return "cloudflarestream.com" in url  # cloudflarestream.go:62-64


def parse_mpd_duration(duration: str) -> int:
    """cloudflarestream.go:418-453 (parseDuration) — the reference's own
    ISO-8601-ish walk, quirks included: the 'T' marker falls through the
    switch as a zero, 'M' always means minutes, fractional seconds are
    ceil'd."""
    import math

    days = hours = minutes = 0
    seconds = 0.0
    duration = duration.removeprefix("P")
    while True:
        idx = next((i for i, ch in enumerate(duration) if ch in "DTHM"), -1)
        if idx == -1:
            break
        try:
            num = int(duration[:idx])
        except ValueError:
            num = 0  # Go's Atoi error-as-zero on "" (the T marker)
        ch = duration[idx]
        if ch == "D":
            days = num
        elif ch == "H":
            hours = num
        elif ch == "M":
            minutes = num
        duration = duration[idx + 1:]
    if duration.endswith("S"):
        try:
            seconds = math.ceil(float(duration[:-1]))
        except ValueError:
            seconds = 0
    return days * 86400 + hours * 3600 + minutes * 60 + int(seconds)


def cloudflarestream_mpd_url(url: str) -> str | None:
    """cloudflarestream.go:320-335: /watch → the DASH manifest URL with
    the parentOrigin query."""
    if len(url) < 6 or not url.endswith("/watch"):
        return None
    parts = urlsplit(url)
    origin = f"{parts.scheme}://{parts.netloc}"
    return url[: -len("/watch")] + "/manifest/video.mpd?parentOrigin=" + origin


def cloudflarestream_segments(watch_url: str, mpd_xml: bytes) -> list[str]:
    """cloudflarestream.go:359-416: expand every Representation's
    SegmentTemplate — the init file plus ceil(duration×timescale/
    segmentDuration) numbered media segments ($Number$ → 1-based index,
    '../../' stripped), re-rooted on the watch URL's scheme://host."""
    import math
    import xml.etree.ElementTree as ET

    parts = urlsplit(watch_url)
    root = ET.fromstring(mpd_xml.decode("utf-8", "replace"))

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def findall(el, name):
        return [c for c in el.iter() if local(c.tag) == name]

    duration = parse_mpd_duration(root.get("mediaPresentationDuration", ""))
    out: list[str] = []

    def rooted(path: str) -> str:
        return f"{parts.scheme}://{parts.netloc}/{path.lstrip('/')}"

    for rep in findall(root, "Representation"):
        for st in findall(rep, "SegmentTemplate"):
            init = st.get("initialization", "").replace("../../", "", 1)
            if init:
                out.append(rooted(init))
            try:
                timescale = float(st.get("timescale", ""))
                seg_dur = float(st.get("duration", ""))
            except ValueError:
                continue
            n_segments = math.ceil(duration * timescale / seg_dur)
            media = st.get("media", "")
            for i in range(int(n_segments)):
                seg = media.replace("$Number$", str(i + 1), 1)
                seg = seg.replace("../../", "")
                out.append(rooted(seg))
    return out


def cloudflarestream_watch_pre_fetch(url: str) -> PreFetchAction:
    """The watch page's DASH manifest rides along as a companion item
    (the reference fetches it inline from the DOM stage)."""
    mpd = cloudflarestream_mpd_url(url)
    return PreFetchAction(companions=[mpd] if mpd else [])


def cloudflarestream_manifest_hook(url, body, content_type, fetch
                                   ) -> PostFetchResult:
    """When the fetched resource IS the DASH manifest, every expanded
    segment becomes an asset."""
    watch = url.split("/manifest/", 1)[0] + "/watch"
    try:
        return PostFetchResult(
            assets=cloudflarestream_segments(watch, body), consume=True)
    except Exception:
        return PostFetchResult()


def cloudflarestream_post_extract(url, outlinks, assets):
    """cloudflarestream.go:66-100 (GetJSFiles): the watch page's
    latest.js player bundle must ride along for playback — keep any
    latest.js script the extractor found and add the iframe HTML shell
    next to it."""
    extra = []
    for a in assets:
        if "latest.js" in a:
            extra.append(a.replace("latest.js", "iframe.html"))
    return outlinks, assets + [e for e in extra if e not in assets]


# -------------------------------------------------------------------- ina

_JWPLAYER_ASSET_RE = re.compile(r'"//ssl\.p\.jwpcdn\.com[^"]+\.js"')


def _extract_jwplayer_version(body: str) -> str:
    """ina.go:168-176 (extractJWPlayerVersion) — line-scan for the
    banner comment."""
    for line in body.split("\n"):
        if "JW Player version" in line:
            return line.split("JW Player version ")[1]
    return ""


class InaPlayerPlugin:
    """ina/ina.go:19-25,107-166 — the one reference plugin with cached
    state: the player version is fetched ONCE per process (guarded by a
    package-global + mutex there; a per-worker instance attribute here)
    and the derived player asset URLs are injected on every ina page.
    Like the reference, a FAILED version probe caches nothing (the
    package-global stays empty) so the next page retries; only a
    successful probe is cached. The secondary jwplayer.js fetch
    (ina.go:139-163) is best-effort within a successful probe: its
    ssl.p.jwpcdn.com script URLs and the versioned core-controls bundle
    ride along when it succeeds, but its failure does not un-cache the
    six base player assets (matching the reference's early returns)."""

    PLAYER_VERSION_URL = "https://player-hub.ina.fr/version"
    JWPLAYER_JS_URL = "https://player-hub.ina.fr/js/jwplayer/jwplayer.js?version={version}"

    def __init__(self):
        self._player_urls: list[str] | None = None
        self.n_probes = 0  # test observability: ≤1 on a healthy fetcher

    def _jwplayer_assets(self, fetch, version: str) -> list[str]:
        rec = fetch(self.JWPLAYER_JS_URL.format(version=version))
        if rec is None or getattr(rec, "status", 0) != 200:
            return []
        body = rec.html.decode("utf-8", "replace")
        urls = ["https:" + m[1:-1]
                for m in _JWPLAYER_ASSET_RE.findall(body)]
        urls.append(
            "https://ssl.p.jwpcdn.com/player/v/"
            + _extract_jwplayer_version(body)
            + "/jwplayer.core.controls.html5.js")
        return urls

    def _player_assets(self, fetch) -> list[str]:
        if self._player_urls is None:
            self.n_probes += 1
            version = ""
            if fetch is not None:
                rec = fetch(self.PLAYER_VERSION_URL)
                if rec is not None and getattr(rec, "status", 0) == 200:
                    version = rec.html.decode("utf-8", "replace").strip()
            if not version:
                return []  # probe failed: do NOT cache; retry next page
            self._player_urls = [
                f"https://player-hub.ina.fr/dist/ina-player.min.js?version={version}",
                f"https://player-hub.ina.fr/dist/player-default-skin.min.css?version={version}",
                "https://player-hub.ina.fr/assets/player/svg/pause.svg",
                "https://player-hub.ina.fr/assets/player/svg/play.svg",
                "https://player-hub.ina.fr/assets/player/svg/backward.svg",
                "https://player-hub.ina.fr/assets/player/svg/forward.svg",
            ] + self._jwplayer_assets(fetch, version)
        return self._player_urls

    @staticmethod
    def matches(url: str, content_type: str) -> bool:
        return "ina.fr" in url and content_type.startswith("text/html")

    def __call__(self, url, body, content_type, fetch) -> PostFetchResult:
        return PostFetchResult(assets=list(self._player_assets(fetch)))


# ---------------------------------------------------------------- wiring

def default_registry(youtube_parser=None) -> PluginRegistry:
    """All ported site-specific modules on one registry, in the
    reference's Capture hook order."""
    reg = PluginRegistry()

    # pre-request chain (capture.go:213-315)
    reg.register_pre_fetch(is_truthsocial_url, truthsocial_pre_fetch)
    reg.register_pre_fetch(
        is_facebook_post_url,
        lambda u: PreFetchAction(companions=[facebook_embed_url(u)]))
    reg.register_pre_fetch(
        is_libsyn_url,
        lambda u: PreFetchAction(companions=[libsyn_highwinds_url(u)]))
    reg.register_pre_fetch(
        lambda u: is_tiktok_url(u),
        lambda u: PreFetchAction(headers=dict(TIKTOK_HEADERS)))
    reg.register_pre_fetch(
        lambda u: is_telegram_url(u) and not is_telegram_embed_url(u),
        lambda u: PreFetchAction(companions=[telegram_embed_url(u)]))
    reg.register_pre_fetch(
        lambda u: is_vk_url(u),
        lambda u: PreFetchAction(headers=vk_headers()))
    reg.register_pre_fetch(
        is_reddit_url,
        lambda u: PreFetchAction(cookies=dict(REDDIT_COOKIES)))

    reg.register_pre_fetch(
        lambda u: is_cloudflarestream_url(u) and u.endswith("/watch"),
        cloudflarestream_watch_pre_fetch)

    # post-response chain (capture.go:339-437)
    yt_match, yt_hook = make_youtube_plugin(parser=youtube_parser)
    reg.register_post_fetch(yt_match, yt_hook)
    reg.register_post_fetch(
        lambda u, ct: is_cloudflarestream_url(u)
        and ct.startswith("application/dash+xml"),
        cloudflarestream_manifest_hook)
    reg.register_post_fetch(
        lambda u, ct: is_reddit_post_api(u), reddit_post_hook)
    reg.register_post_fetch(InaPlayerPlugin.matches, InaPlayerPlugin())

    # DOM stage (capture.go:509-553)
    reg.register_post_extract(
        is_cloudflarestream_url, cloudflarestream_post_extract)
    return reg
