"""Ported site-specific modules — fixture tests mirroring the reference's
predicates and derived-URL generation (sitespecific/*/ *.go), plus an e2e
crawl proving the post-fetch hook + metadata side records are live."""

import json

import pytest

from zeno_ray.plugins import PluginRegistry, PostFetchResult, PreFetchAction
from zeno_ray import sitespecific as ss


# ------------------------------------------------------------- predicates


def test_youtube_watch_predicate():
    # youtube.go:9-11: host contains youtube.com AND path /watch or /v/
    assert ss.is_youtube_watch_page("https://www.youtube.com/watch?v=abc")
    assert ss.is_youtube_watch_page("https://youtube.com/v/abc")
    assert not ss.is_youtube_watch_page("https://www.youtube.com/channel/x")
    assert not ss.is_youtube_watch_page("https://example.com/watch?v=abc")


def test_tiktok_vk_reddit_predicates():
    # tiktok.go:8-10 matches the "/tiktok.com" SUBSTRING — so the bare
    # domain matches but www.tiktok.com does not (faithful reference quirk)
    assert ss.is_tiktok_url("https://tiktok.com/@u/video/1")
    assert not ss.is_tiktok_url("https://www.tiktok.com/@u/video/1")
    assert not ss.is_tiktok_url("https://tiktok.example/v")
    assert ss.is_vk_url("https://vk.com/wall-1_1")
    assert ss.is_reddit_url("https://www.reddit.com/r/pics/")
    assert ss.is_reddit_post_api(
        "https://www.reddit.com/api/info.json?id=t3_abc")
    assert not ss.is_reddit_post_api("https://www.reddit.com/r/pics/")


def test_truthsocial_api_url():
    # truthsocial.go:17-37
    u = "https://truthsocial.com/@user_1/posts/1234567"
    assert ss.is_truthsocial_url(u)
    assert not ss.is_truthsocial_url("https://truthsocial.com/@user_1")
    assert ss.truthsocial_api_url(u) == \
        "https://truthsocial.com/api/v1/statuses/1234567"
    act = ss.truthsocial_pre_fetch(u)
    assert act.companions[0] == "https://truthsocial.com/api/v1/statuses/1234567"
    assert "https://truthsocial.com/api/v1/instance" in act.companions


def test_facebook_embed_url():
    # facebook.go:13-20 (url.QueryEscape percent-encodes : and /)
    u = "https://www.facebook.com/someone/posts/123"
    assert ss.is_facebook_post_url(u)
    embed = ss.facebook_embed_url(u)
    assert embed == ("https://www.facebook.com/plugins/post.php?href="
                     "https%3A%2F%2Fwww.facebook.com%2Fsomeone%2Fposts%2F123"
                     "&show_text=true")


def test_libsyn_highwinds_url():
    # libsyn.go:8-22 — the module's own doc comment example
    u = "https://traffic.libsyn.com/democratieparticipative/DPS09E16.mp3"
    assert ss.is_libsyn_url(u)
    assert ss.libsyn_highwinds_url(u) == (
        "https://traffic.libsyn.com/secure/force-cdn/highwinds/"
        "democratieparticipative/DPS09E16.mp3")
    assert not ss.is_libsyn_url(ss.libsyn_highwinds_url(u))  # no re-trigger


def test_telegram_embed_url():
    # telegram.go:8-22; Go's Values.Encode() sorts keys
    u = "https://t.me/somechannel/42"
    assert ss.is_telegram_url(u)
    assert not ss.is_telegram_embed_url(u)
    e = ss.telegram_embed_url(u)
    assert e == "https://t.me/somechannel/42?embed=1&mode=tme"
    assert ss.is_telegram_embed_url(e)


def test_header_plugins_merge():
    reg = ss.default_registry()
    act = reg.apply_pre_fetch("https://tiktok.com/@u/video/1")
    assert act.headers["Authority"] == "www.tiktok.com"
    assert act.headers["Sec-Fetch-Mode"] == "navigate"
    act = reg.apply_pre_fetch("https://vk.com/wall-1_1")
    assert "Chrome/118.0.0.0" in act.headers["User-Agent"]
    act = reg.apply_pre_fetch("https://www.reddit.com/r/pics/")
    assert act.cookies["over18"] == "1"
    assert act.cookies["eu_cookie_v2"] == "3"


# ----------------------------------------------------- post-fetch parsers


def test_reddit_post_hook_extracts_permalinks_and_assets():
    body = json.dumps({
        "kind": "Listing",
        "data": {"children": [{"kind": "t3", "data": {
            "permalink": "/r/pics/comments/abc/title/",
            "url": "https://i.redd.it/xyz.jpg",
            "secure_media": {"reddit_video": {
                "fallback_url": "https://v.redd.it/abc/DASH_720.mp4?source=fallback"
            }},
        }}]},
    }).encode()
    res = ss.reddit_post_hook(
        "https://www.reddit.com/api/info.json?id=t3_abc", body,
        "application/json", None)
    assert res.outlinks == [
        "https://www.reddit.com/r/pics/comments/abc/title/",
        "https://old.reddit.com/r/pics/comments/abc/title/",
    ]
    assert "https://i.redd.it/xyz.jpg" in res.assets
    assert res.consume


def test_youtube_plugin_emits_metadata_and_assets():
    match, hook = ss.make_youtube_plugin()
    assert match("https://www.youtube.com/watch?v=abc", "text/html")
    body = (b"<html><script>var a='https://r1.googlevideo.example/videoplayback"
            b"?id=1';var b='https://r2.googlevideo.example/videoplayback?id=2'"
            b"</script></html>")
    res = hook("https://www.youtube.com/watch?v=abc", body, "text/html", None)
    assert len(res.assets) == 2
    assert res.consume
    meta = json.loads(res.metadata)
    assert meta["n_urls"] == 2


def test_ina_player_cache_probes_once():
    """ina.go:19-25,107-166: the player version is fetched once per
    process; subsequent pages reuse the cached asset list. The probe
    also triggers the secondary jwplayer.js fetch (ina.go:139-163)."""

    class Rec:
        status = 200
        html = b"1.2.3\n"

    calls = []

    def fetch(url):
        calls.append(url)
        return Rec()

    plugin = ss.InaPlayerPlugin()
    r1 = plugin("https://www.ina.fr/video/x", b"<html>", "text/html", fetch)
    r2 = plugin("https://www.ina.fr/video/y", b"<html>", "text/html", fetch)
    assert calls == [
        ss.InaPlayerPlugin.PLAYER_VERSION_URL,
        ss.InaPlayerPlugin.JWPLAYER_JS_URL.format(version="1.2.3"),
    ]
    assert plugin.n_probes == 1
    assert ("https://player-hub.ina.fr/dist/ina-player.min.js?version=1.2.3"
            in r1.assets)
    assert r1.assets == r2.assets


def test_ina_player_failed_probe_retries():
    """ina.go:112-120: a failed version probe leaves the package-global
    unset, so the NEXT page retries instead of permanently disabling
    player-asset injection."""

    class Good:
        status = 200
        html = b"9.9\n"

    state = {"fail": True, "calls": 0}

    def fetch(url):
        state["calls"] += 1
        return None if state["fail"] else Good()

    plugin = ss.InaPlayerPlugin()
    r1 = plugin("https://www.ina.fr/video/x", b"", "text/html", fetch)
    assert r1.assets == []
    state["fail"] = False
    r2 = plugin("https://www.ina.fr/video/y", b"", "text/html", fetch)
    assert any("version=9.9" in a for a in r2.assets)
    # probe + jwplayer fetch succeeded on the retry; now cached
    plugin("https://www.ina.fr/video/z", b"", "text/html", fetch)
    assert state["calls"] == 3  # 1 failed probe + probe + jwplayer


def test_ina_jwplayer_asset_extraction():
    """ina.go:139-163: jwplayer.js is scanned for ssl.p.jwpcdn.com
    script URLs and the JW Player version banner."""

    jw_body = (b'x("//ssl.p.jwpcdn.com/player/v/8.9.3/provider.hlsjs.js");\n'
               b'/* JW Player version 8.9.3\n */\n')

    class VerRec:
        status = 200
        html = b"1.2.3"

    class JwRec:
        status = 200
        html = jw_body

    def fetch(url):
        return JwRec() if "jwplayer" in url else VerRec()

    plugin = ss.InaPlayerPlugin()
    r = plugin("https://www.ina.fr/video/x", b"", "text/html", fetch)
    assert ("https://ssl.p.jwpcdn.com/player/v/8.9.3/provider.hlsjs.js"
            in r.assets)
    assert ("https://ssl.p.jwpcdn.com/player/v/8.9.3"
            "/jwplayer.core.controls.html5.js" in r.assets)


def test_cloudflarestream_post_extract():
    outlinks, assets = ss.cloudflarestream_post_extract(
        "https://watch.cloudflarestream.com/abc",
        ["https://x/next"],
        ["https://embed.cloudflarestream.com/embed/latest.js?video=abc"],
    )
    assert "https://embed.cloudflarestream.com/embed/iframe.html?video=abc" \
        in assets
    assert outlinks == ["https://x/next"]


# ------------------------------------------------------------------- e2e


@pytest.mark.usefixtures("ray_session")
def test_post_fetch_plugin_e2e_metadata_and_companions(tmp_path):
    """A post-fetch hook and a companion pre-fetch hook run inside a real
    crawl: metadata side records land in meta_epoch_*, the companion URL
    is fetched, and plugin-injected assets enter the frontier."""
    from zeno_ray.config import CrawlConfig
    from zeno_ray.corpus import CorpusSpec
    from zeno_ray.crawl import run_crawl

    spec = CorpusSpec(n_hosts=4, pages_per_host=8, seed_stride=1)
    host0 = spec.host(0)
    companion = f"https://{spec.host(1)}/page/5"
    reg = PluginRegistry()
    reg.register_pre_fetch(
        lambda u: u == f"https://{host0}/",
        lambda u: PreFetchAction(companions=[companion]))
    reg.register_post_fetch(
        lambda u, ct: u.endswith("/page/1") and ct.startswith("text/html"),
        lambda u, body, ct, fetch: PostFetchResult(
            metadata=json.dumps({"page": u, "bytes": len(body)})))
    cfg = CrawlConfig(max_hops=2, max_epochs=8, seen_shards=4,
                      fetch_concurrency=2)
    res = run_crawl(spec, cfg, str(tmp_path / "ckpt"), plugins=reg)
    pages = res.pages_dataset(columns=["url", "type"]).to_pandas()
    assert companion in set(pages["url"])
    meta = res.metadata_records()
    assert len(meta) > 0
    rec = json.loads(meta.iloc[0]["metadata"])
    assert rec["page"].endswith("/page/1")


# -------------------------------------------------- cloudflarestream DASH


def test_mpd_duration_parser():
    # cloudflarestream.go:418-453's walk, quirks included
    assert ss.parse_mpd_duration("PT1M30.5S") == 91
    assert ss.parse_mpd_duration("P1DT2H") == 93600
    assert ss.parse_mpd_duration("PT10S") == 10
    assert ss.parse_mpd_duration("PT2M") == 120


MPD_FIXTURE = b"""<?xml version="1.0" encoding="utf-8"?>
<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" type="static"
     mediaPresentationDuration="PT10S" minBufferTime="PT2S">
  <Period id="0">
    <AdaptationSet id="0" mimeType="video/mp4">
      <Representation id="v1" bandwidth="800000" width="640" height="360">
        <SegmentTemplate duration="2000" timescale="1000"
            initialization="../../v1/init.mp4"
            media="../../v1/seg_$Number$.mp4" startNumber="1"/>
      </Representation>
    </AdaptationSet>
    <AdaptationSet id="1" mimeType="audio/mp4">
      <Representation id="a1" bandwidth="128000">
        <SegmentTemplate duration="5000" timescale="1000"
            initialization="../../a1/init.mp4"
            media="../../a1/seg_$Number$.mp4" startNumber="1"/>
      </Representation>
    </AdaptationSet>
  </Period>
</MPD>"""


def test_cloudflarestream_mpd_url_and_segments():
    watch = "https://watch.cloudflarestream.com/abc123/watch"
    assert ss.cloudflarestream_mpd_url(watch) == (
        "https://watch.cloudflarestream.com/abc123/manifest/video.mpd"
        "?parentOrigin=https://watch.cloudflarestream.com")
    assert ss.cloudflarestream_mpd_url("https://x.example/nope") is None

    urls = ss.cloudflarestream_segments(watch, MPD_FIXTURE)
    host = "https://watch.cloudflarestream.com"
    # video: init + ceil(10*1000/2000)=5 segments; audio: init + 2
    assert urls[0] == f"{host}/v1/init.mp4"
    assert urls[1:6] == [f"{host}/v1/seg_{i}.mp4" for i in range(1, 6)]
    assert f"{host}/a1/init.mp4" in urls
    assert f"{host}/a1/seg_2.mp4" in urls
    assert len(urls) == 1 + 5 + 1 + 2


def test_cloudflarestream_hooks_in_registry():
    reg = ss.default_registry()
    act = reg.apply_pre_fetch("https://watch.cloudflarestream.com/abc/watch")
    assert act.companions and act.companions[0].endswith(
        "?parentOrigin=https://watch.cloudflarestream.com")
    res = reg.apply_post_fetch(
        "https://watch.cloudflarestream.com/abc/manifest/video.mpd",
        MPD_FIXTURE, "application/dash+xml")
    assert res is not None and len(res.assets) == 9 and res.consume
