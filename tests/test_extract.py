"""Extractor fixtures mirrored from the reference test suite:
- JSON: /root/reference/internal/pkg/crawl/extractor/json_test.go:12-83
- XML:  /root/reference/internal/pkg/crawl/extractor/xml_test.go:12-129
- Link header: /root/reference/internal/pkg/crawl/link_header_test.go:8-100
plus HTML tag-inventory cases per crawl/assets.go:182-457 / outlinks.go:13-51.
No Ray needed.
"""

from zeno_ray.extract import (
    extract_from_page,
    extract_html,
    extract_m3u8,
    extract_s3,
    extract_text,
    extract_xml,
    urls_from_json,
)
from zeno_ray.linkheader import Link, parse_link_header


# ---------------------------------------------------------------- JSON


def test_json_valid_with_urls():
    assert urls_from_json(
        '{"url": "https://example.com", "nested": {"link": "http://test.com"}}'
    ) == ["https://example.com", "http://test.com"]


def test_json_invalid():
    assert urls_from_json('{"url": "https://example.com"') == []


def test_json_no_urls():
    assert urls_from_json('{"key": "value", "number": 42}') == []


def test_json_array_of_urls():
    assert urls_from_json('{"links": ["https://example1.com", "https://example2.com"]}') == [
        "https://example1.com",
        "https://example2.com",
    ]


# ---------------------------------------------------------------- XML


def test_xml_valid_with_urls():
    urls, sitemap = extract_xml(
        """
        <root>
            <item>http://example.com</item>
            <nested><url>https://example.org</url></nested>
            <noturl>just some text</noturl>
        </root>"""
    )
    assert urls == ["http://example.com", "https://example.org"]
    assert sitemap is False


def test_xml_empty():
    assert extract_xml("<root></root>") == ([], False)


def test_xml_invalid():
    assert extract_xml("<root><unclosed>") == ([], False)


def test_xml_sitemap_by_namespace():
    urls, sitemap = extract_xml(
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://h.example/p1</loc></url>"
        "<url><loc>https://h.example/p2</loc></url></urlset>"
    )
    assert sitemap is True
    assert urls == ["https://h.example/p1", "https://h.example/p2"]


def test_xml_sitemap_by_leaf_path():
    _, sitemap = extract_xml("<x><sitemapentry>hello</sitemapentry></x>")
    assert sitemap is True


# ---------------------------------------------------------------- S3


S3_LISTING_V1 = """<?xml version="1.0" encoding="UTF-8"?>
<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">
  <Name>bucket</Name><Prefix></Prefix><Marker></Marker>
  <Contents><Key>a/file1.bin</Key><Size>10</Size></Contents>
  <Contents><Key>a/file2.bin</Key><Size>0</Size></Contents>
  <IsTruncated>false</IsTruncated>
</ListBucketResult>"""


def test_s3_v1_marker_and_files():
    urls = extract_s3(S3_LISTING_V1, "https://bucket.s3.example/?prefix=a")
    # marker pagination URL first (s3.go:69-76), then non-empty files
    assert urls[0] == "https://bucket.s3.example/?marker=a%2Ffile2.bin&prefix=a"
    assert "https://bucket.s3.example/a/file1.bin" in urls
    assert "https://bucket.s3.example/a/file2.bin" not in urls  # Size 0 skipped


def test_s3_v2_prefixes_and_continuation():
    body = """<ListBucketResult>
      <CommonPrefixes><Prefix>a/</Prefix></CommonPrefixes>
      <CommonPrefixes><Prefix>b/</Prefix></CommonPrefixes>
      <IsTruncated>true</IsTruncated>
      <NextContinuationToken>tok1</NextContinuationToken>
    </ListBucketResult>"""
    urls = extract_s3(body, "https://bucket.s3.example/?list-type=2")
    assert urls == [
        "https://bucket.s3.example/?list-type=2&prefix=a%2F",
        "https://bucket.s3.example/?list-type=2&prefix=b%2F",
        "https://bucket.s3.example/?continuation-token=tok1&list-type=2",
    ]


# ---------------------------------------------------------------- M3U8


def test_m3u8_media_playlist():
    body = "#EXTM3U\n#EXT-X-TARGETDURATION:10\n#EXTINF:9.0,\nseg1.ts\n#EXTINF:9.0,\nseg2.ts\n#EXT-X-ENDLIST\n"
    assert extract_m3u8(body, "https://h.example/v/playlist.m3u8") == [
        "https://h.example/v/seg1.ts",
        "https://h.example/v/seg2.ts",
    ]


def test_m3u8_master_playlist():
    body = (
        "#EXTM3U\n"
        '#EXT-X-MEDIA:TYPE=AUDIO,GROUP-ID="aud",URI="audio/en.m3u8"\n'
        "#EXT-X-STREAM-INF:BANDWIDTH=1280000\n"
        "low/index.m3u8\n"
        "#EXT-X-STREAM-INF:BANDWIDTH=2560000\n"
        "https://cdn.example/high/index.m3u8\n"
    )
    assert extract_m3u8(body, "https://h.example/v/master.m3u8") == [
        "https://h.example/v/audio/en.m3u8",
        "https://h.example/v/low/index.m3u8",
        "https://cdn.example/high/index.m3u8",
    ]


def test_m3u8_not_a_playlist():
    assert extract_m3u8("hello", "https://h.example/x") == []


# ---------------------------------------------------------------- Link header


def test_link_header_one():
    assert parse_link_header('<https://one.example.com>; rel="preconnect"') == [
        Link("https://one.example.com", "preconnect")
    ]


def test_link_header_multiple():
    got = parse_link_header(
        '<https://test.com>; rel="preconnect", '
        '<https://app.test.com>; rel="preconnect"; foo="bar", '
        '<https://example.com>; rel="preconnect"'
    )
    assert got == [
        Link("https://test.com", "preconnect"),
        Link("https://app.test.com", "preconnect"),
        Link("https://example.com", "preconnect"),
    ]


def test_link_header_one_malformed():
    assert parse_link_header('https://one.example.com>;; rel=preconnect";') == [
        Link("https://one.example.com", "preconnect")
    ]


def test_link_header_multiple_malformed():
    got = parse_link_header(
        '; rel="preconnect", https://app.test.com; rel=""; "bar", <>; ="preconnect"'
    )
    assert got == [Link("", "preconnect"), Link("https://app.test.com", ""), Link("", "")]


# ---------------------------------------------------------------- HTML


FULL_HTML = b"""<html><head>
<base href="/sub/">
<link rel="stylesheet" href="main.css">
<link rel="alternate" href="feed.xml">
<meta property="og:image" content="https://cdn.example/og.png">
<style>body { background: url('bg.png'); }</style>
<script src="app.js"></script>
<script type="application/json">{"api": "https://api.example/v1"}</script>
<script>var cfg = {"media": "https://cdn.example/m.mp4"};</script>
</head><body>
<p>Hello <b>world</b> &amp; visit https://plain.example/x now.</p>
<a href="page2.html">two</a>
<a href="https://other.example/abs#frag">abs</a>
<iframe src="embed.html"></iframe>
<ref target="reffed.html"></ref>
<img src="i1.png" data-src="i2.png" srcset="i3.png 1x, i4.png 2x">
<video src="v.mp4"></video>
<audio src="a.mp3"></audio>
<source src="s.webm" srcset="s1.webm 1x">
<div style="background-image:url('div-bg.jpg')" data-preview="https://pre.example/p.jpg"></div>
<div data-item='{"u": "https://item.example/d.json"}'></div>
<script>ignored text</script>
</body></html>"""


def test_html_outlinks_and_base():
    res = extract_from_page(
        "https://h.example/dir/page.html", FULL_HTML, "text/html; charset=utf-8"
    )
    # <base href="/sub/"> resolves relative URLs (capture.go:558-578)
    assert "https://h.example/sub/page2.html" in res.outlinks
    assert "https://other.example/abs" in res.outlinks  # fragment removed
    assert "https://h.example/sub/embed.html" in res.outlinks  # iframe
    assert "https://h.example/sub/reffed.html" in res.outlinks  # ref[target]
    assert "https://plain.example/x" in res.outlinks  # text link
    # script text excluded from text scrape: "ignored text" has no URL anyway
    assert res.text.count("https://plain.example/x") == 1


def test_html_assets_inventory():
    res = extract_from_page(
        "https://h.example/dir/page.html", FULL_HTML, "text/html; charset=utf-8"
    )
    a = set(res.assets)
    assert "https://h.example/sub/main.css" in a
    assert "https://h.example/sub/feed.xml" not in a  # rel=alternate skipped
    assert "https://cdn.example/og.png" in a  # meta content
    assert "https://h.example/sub/bg.png" in a  # <style> css url()
    assert "https://h.example/sub/app.js" in a  # script src
    assert "https://api.example/v1" in a  # script application/json
    assert "https://cdn.example/m.mp4" in a  # var x = {...} payload
    assert {"https://h.example/sub/i1.png", "https://h.example/sub/i2.png",
            "https://h.example/sub/i3.png", "https://h.example/sub/i4.png"} <= a
    assert "https://h.example/sub/v.mp4" in a
    assert "https://h.example/sub/a.mp3" in a
    assert {"https://h.example/sub/s.webm", "https://h.example/sub/s1.webm"} <= a
    assert "https://h.example/sub/div-bg.jpg" in a  # inline style bg
    assert "https://pre.example/p.jpg" in a  # data-preview
    assert "https://item.example/d.json" in a  # data-item JSON


def test_html_capture_alternate_pages_flag():
    res = extract_from_page(
        "https://h.example/p", b'<html><body><link rel="alternate" href="f.xml"></body></html>',
        "text/html", capture_alternate_pages=True,
    )
    assert res.assets == ["https://h.example/f.xml"]


def test_html_disabled_tags():
    res = extract_from_page(
        "https://h.example/p",
        b'<html><body><img src="x.png"><a href="y.html">y</a></body></html>',
        "text/html",
        disabled_tags=frozenset({"img"}),
    )
    assert res.assets == []
    assert res.outlinks == ["https://h.example/y.html"]


def test_text_extraction_entities_and_scripts():
    html = b"<html><body><p>A &amp; B</p><script>var x = 'http://no.example';</script><i>C</i></body></html>"
    # goquery .Text() semantics: raw text-node concatenation, no synthesized
    # whitespace; script content excluded
    assert extract_text(html) == "A & BC"


def test_dispatch_binary_skipped():
    res = extract_from_page("https://h.example/f.bin", b"\x00\x01", "application/octet-stream")
    assert res.outlinks == [] and res.assets == [] and res.text == ""


def test_dispatch_sitemap_vs_plain_xml():
    sm = '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><url><loc>https://h.example/p</loc></url></urlset>'
    res = extract_from_page("https://h.example/sitemap.xml", sm, "application/xml")
    assert res.outlinks == ["https://h.example/p"] and res.assets == []
    plain = "<feed><media>https://h.example/m.png</media></feed>"
    res2 = extract_from_page("https://h.example/feed.xml", plain, "application/xml")
    assert res2.assets == ["https://h.example/m.png"] and res2.outlinks == []


def test_dispatch_s3_by_server_header():
    res = extract_from_page(
        "https://bucket.s3.example/?prefix=a",
        S3_LISTING_V1,
        "application/xml",
        server="AmazonS3",
    )
    assert "https://bucket.s3.example/a/file1.bin" in res.outlinks


def test_dispatch_link_header_resolved_against_request_url():
    res = extract_from_page(
        "https://h.example/dir/p",
        b"<html><head><base href='https://elsewhere.example/'></head><body></body></html>",
        "text/html",
        link_header='</style.css>; rel="preload"',
    )
    assert res.outlinks == ["https://h.example/style.css"]


def test_script_unicode_unquote():
    html = '<html><body><script>var u = "https://u.example/aéb";</script></body></html>'.encode()
    res = extract_from_page("https://h.example/p", html, "text/html")
    assert "https://u.example/a%C3%A9b" in res.assets


def test_html_in_page_dedupe_first_wins():
    html = b'<html><body><a href="a.html">1</a><a href="a.html">2</a><a href="b.html">3</a></body></html>'
    res = extract_from_page("https://h.example/", html, "text/html")
    assert res.outlinks == ["https://h.example/a.html", "https://h.example/b.html"]


# ------------------------------------------- fast-scanner differential


def _slow_collect(body: str):
    from zeno_ray.extract.html import _Collector

    col = _Collector()
    try:
        col.feed(body)
        col.close()
    except Exception:
        pass
    return col


def _col_state(col):
    text = "".join(col.text_parts if col._saw_body
                   else col._prebody_parts + col.text_parts)
    return {
        "a": col.a_href, "iframe": col.iframe_src, "ref": col.ref_target,
        "base": col.base_href, "data_item": col.data_item,
        "style_attr": col.style_attr, "data_preview": col.data_preview,
        "img": col.img, "video": col.video, "audio": col.audio,
        "style_css": col.style_css, "scripts": col.scripts,
        "link": col.link_href, "meta": col.meta, "source": col.source,
        "text": text,
    }


def test_fast_collect_differential_structured():
    """The fast scanner must agree with html.parser on every well-formed
    construct it claims to handle, and must REFUSE (return None) anything
    outside its subset so the caller falls back."""
    from zeno_ray.extract.html import _fast_collect

    in_subset = [
        "<html><head><title>t &amp; u</title><link rel=\"stylesheet\" href=\"/c.css\">"
        "<script src=\"/j.js\"></script><script>var cfg = {\"u\": \"https://h/x\"};"
        "</script></head><body><h1>Ti&#116;le</h1><p>a &lt; b</p>"
        "<ul><li><a href=\"/p/1\">link 0</a></li></ul>"
        "<img src=\"/i.png\"><img src='/j.png' data-src=/k.png>"
        "<div style=\"background-image: url('/bg.png')\">x</div>"
        "<style>.a{background:url(/s.png)}</style>"
        "<video src=/v.mp4/><audio src=\"/a.mp3\"></audio>"
        "<meta property=\"og:image\" content=\"https://h/og.png\">"
        "<source srcset=\"/s1.png 1x, /s2.png 2x\">"
        "<BASE HREF=\"/base/\"><A HREF=\"UP.html\">t</A>"
        "</body></html>",
        "<body>plain < 3 text</body>",                 # literal '<' data
        "no tags at all &copy; 2020",
        "<body><script>unterminated...",               # dropped by both
        "<body><style>unterminated{",
        "<body>t</body><body>u</body>",                # body depth twice
        "<p>pre-body only, no body tag",
        "<body><a href=\"x&amp;y\">z</a></body>",      # charref in attr
        "<body><a href>bare</a><a href=>empty</a></body>",
        "<body><div data-item='{\"url\": \"https://h/d\"}'>i</div></body>",
        "<body><ref target=\"/r\"></ref><iframe src=\"/f\"></iframe></body>",
        "<body><script type=\"application/json\">{\"u\":\"https://h/sj\"}"
        "</script></body>",
        "<body><img src=\"a\" src=\"b\"></body>",      # first-wins dup attr
        "<body><SCRIPT>x</ScRiPt >tail</body>",        # case/space close tag
    ]
    for doc in in_subset:
        fast = _fast_collect(doc)
        assert fast is not None, doc
        assert _col_state(fast) == _col_state(_slow_collect(doc)), doc

    must_refuse = [
        "<!DOCTYPE html><body>x</body>",
        "<body><!-- comment --></body>",
        "<?xml version=\"1.0\"?><body>x</body>",
        "<body><![CDATA[x]]></body>",
        "<body><a href=\"x\"</body>",   # malformed: '<' inside tag
        "<body><a href='unterminated></body>",
        "<body></body",                                 # truncated close tag
    ]
    for doc in must_refuse:
        assert _fast_collect(doc) is None, doc


def test_fast_collect_differential_fuzz():
    """Randomized tag soup: wherever the fast scanner accepts, it must
    match html.parser field-for-field."""
    import random

    from zeno_ray.extract.html import _fast_collect

    rng = random.Random(1234)
    tags = ["a", "img", "div", "p", "script", "style", "body", "link",
            "meta", "source", "video", "audio", "iframe", "base", "ref",
            "ul", "li", "h1", "span"]
    attrs = ["href=\"/x/{i}\"", "src='/y/{i}'", "data-src=/z/{i}",
             "srcset=\"/a{i}.png 1x, /b{i}.png 2x\"", "rel=\"alternate\"",
             "rel=stylesheet", "style=\"background-image: url('/bg{i}.png')\"",
             "data-preview=\"http://h/p{i}\"", "content=\"http://h/c{i}\"",
             "target=\"/t{i}\"", "", "class=\"c{i}\"",
             "data-item='{{\"u\": \"https://h/d{i}\"}}'", "href=\"a&amp;b{i}\""]
    texts = ["plain", "a &lt; b", "x &amp; y", "5 < 6", "tail &copy;",
             "läks &#228;", " ", ""]
    n_accepted = 0
    for trial in range(400):
        parts = ["<body>"] if trial % 3 else []
        for i in range(rng.randint(1, 25)):
            r = rng.random()
            if r < 0.45:
                t = rng.choice(tags)
                at = rng.choice(attrs).format(i=i)
                sc = rng.choice(["", "", "/"])
                parts.append(f"<{t} {at}{sc}>" if at else f"<{t}{sc}>")
                if t == "script" and not sc:
                    parts.append(rng.choice(["var x = 1;", "",
                                             "if (a<b) { x(); }",
                                             'var cfg = {"u": "https://h/q"};']))
                    parts.append("</script>")
                elif t == "style" and not sc:
                    parts.append(".c{background:url(/u.png)}")
                    parts.append("</style>")
            elif r < 0.8:
                parts.append(rng.choice(texts))
            else:
                t = rng.choice(tags)
                parts.append(f"</{t}>")
        doc = "".join(parts)
        fast = _fast_collect(doc)
        if fast is None:
            continue
        n_accepted += 1
        assert _col_state(fast) == _col_state(_slow_collect(doc)), doc
    assert n_accepted >= 350  # the subset must actually cover tag soup


def test_fast_collect_differential_hypothesis():
    """Property: on ANY document assembled from text runs (incl. entities,
    stray '<'/'&'/quotes) and tag fragments, wherever the fast scanner
    accepts it must match html.parser field-for-field; where it refuses,
    extract_html still succeeds via the fallback."""
    from hypothesis import given, settings, strategies as st

    from zeno_ray.extract.html import _fast_collect

    text_run = st.text(
        alphabet="ab <>&;\"'=/xä\n\t&amp;&lt;&#65;", max_size=12)
    tag_name = st.sampled_from(
        ["a", "img", "body", "script", "style", "p", "base", "link",
         "meta", "source", "video", "iframe", "br"])
    attr = st.sampled_from(
        ['href="/x"', "src='/y'", "data-src=/z", "href", "href=",
         'href="a&amp;b"', "style=\"background:url('/b.png')\"",
         'srcset="/a 1x, /b 2x"', 'content="http://h/c"', "rel=alternate",
         "x-weird='v'", 'a="<"', ""])
    start_tag = st.builds(
        lambda t, a, sc: f"<{t} {a}{sc}>" if a else f"<{t}{sc}>",
        tag_name, attr, st.sampled_from(["", "/"]))
    end_tag = st.builds(lambda t: f"</{t}>", tag_name)
    cdata_close = st.sampled_from(["</script>", "</style>", "</script >",
                                   "</SCRIPT>", ""])
    piece = st.one_of(text_run, start_tag, end_tag, cdata_close)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(piece, max_size=14).map("".join))
    def check(doc):
        fast = _fast_collect(doc)
        if fast is not None:
            assert _col_state(fast) == _col_state(_slow_collect(doc)), doc

    check()


# ------------------------------------------------- boilerplate removal


def test_main_content_drops_link_lists_and_chrome():
    from zeno_ray.extract.boiler import main_content

    html = (
        "<html><head><title>t</title><script>var x=1;</script></head><body>"
        "<nav><a href='/a'>Home</a> <a href='/b'>About</a></nav>"
        "<h1>The Article Title</h1>"
        "<p>This is the real prose of the page, long enough to keep, "
        "with an inline <a href='/ref'>reference</a> that should not "
        "disqualify the block.</p>"
        "<ul><li><a href='/1'>link one</a></li>"
        "<li><a href='/2'>link two</a></li></ul>"
        "<footer><a href='/tos'>Terms</a></footer>"
        "</body></html>"
    )
    got = main_content(html)
    assert "The Article Title" in got
    assert "real prose" in got and "reference" in got
    assert "link one" not in got and "Terms" not in got and "Home" not in got
    assert "var x=1" not in got


def test_main_content_reconstructs_corpus_split():
    """On the synthetic corpus, main content + the dropped link texts
    re-concatenate to exactly the page's full extracted text — the
    byte-identical oracle split at the block level."""
    from zeno_ray.corpus import CorpusSpec
    from zeno_ray.extract.boiler import main_content

    spec = CorpusSpec(n_hosts=8, pages_per_host=10)
    checked = 0
    for h in range(8):
        for p in range(4):
            url = f"https://host{h:04d}.example/page/{p}"
            rec = spec.lookup(url)
            if rec.status != 200 or not rec.html or \
                    not (rec.content_type or "").startswith("text/html"):
                continue
            html = rec.html.decode("utf-8")
            main = main_content(html, min_chars=1).replace("\n", "")
            # the generator's body = prose blocks + "link N" anchors
            import re as _re

            links = "".join(_re.findall(r"link \d+", rec.text))
            assert main + links == rec.text, url
            checked += 1
    assert checked >= 10


def test_main_content_stage_batch(ray_session):
    import ray.data as rd

    from zeno_ray.corpus import CorpusSpec
    from zeno_ray.extract.boiler import MainContentStage

    spec = CorpusSpec(n_hosts=4, pages_per_host=6)
    rows = []
    for h in range(4):
        for p in range(3):
            rec = spec.lookup(f"https://host{h:04d}.example/page/{p}")
            if rec.status == 200 and rec.html and \
                    (rec.content_type or "").startswith("text/html"):
                rows.append({"url": rec.url, "html": rec.html,
                             "text": rec.text})
    out = (rd.from_items(rows)
           .map_batches(MainContentStage, batch_format="pandas",
                        concurrency=2)
           .to_pandas())
    assert len(out) == len(rows)
    assert (out["main_chars"] > 0).all()
    assert ((out["boiler_frac"] >= 0) & (out["boiler_frac"] <= 1)).all()


def test_main_content_edge_cases():
    from zeno_ray.extract.boiler import main_content

    assert main_content("") == ""
    assert main_content("just bare text, no tags at all") == \
        "just bare text, no tags at all"
    # unclosed tags / stray close tags must not crash html.parser
    assert "prose" in main_content("<p>some prose<div><a href=x>l</a>")
    assert main_content("</p></div>nonsense<p>real words here</p>") \
        .endswith("real words here")
    # a pure link farm yields nothing
    assert main_content(
        "<ul>" + "".join(f"<li><a href='/{i}'>go {i}</a></li>"
                         for i in range(20)) + "</ul>") == ""
