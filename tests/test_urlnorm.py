"""URL normalization vectors mirrored from the reference test suite
(/root/reference/internal/pkg/utils/url_test.go:8-125). No Ray needed."""

import pytest

from zeno_ray import urlnorm


VECTORS = [
    # punycode host passthrough (url_test.go:8-19)
    (
        "https://xn----8sbddjhbicfsohgbg1aeo.xn--p1ia/pic/file/map_of_sarlat.pdf",
        "https://xn----8sbddjhbicfsohgbg1aeo.xn--p1ia/pic/file/map_of_sarlat.pdf",
    ),
    # punycode + port (url_test.go:21-32)
    (
        "https://xn----8sbddjhbicfsohgbg1aeo.xn--p1ia:8080/pic/file/map_of_sarlat.pdf",
        "https://xn----8sbddjhbicfsohgbg1aeo.xn--p1ia:8080/pic/file/map_of_sarlat.pdf",
    ),
    # unicode host -> IDNA, with port (url_test.go:34-45, 60-71)
    (
        "https://о-змладйвеклблнозеж.xn--p1ia:8080/pic/file/map_of_sarlat.pdf",
        "https://xn----8sbddjhbicfsohgbg1aeo.xn--p1ia:8080/pic/file/map_of_sarlat.pdf",
    ),
    # unicode path percent-encoding (url_test.go:47-58)
    (
        "http://παράδειγμα.δοκιμή/Αρχική_σελίδα",
        "http://xn--hxajbheg2az3al.xn--jxalpdlp/%CE%91%CF%81%CF%87%CE%B9%CE%BA%CE%AE_%CF%83%CE%B5%CE%BB%CE%AF%CE%B4%CE%B1",
    ),
    # IPv6 with and without port (url_test.go:73-97)
    (
        "https://[2600:4040:23c7:a620:3642:ebaa:ab23:735e]/test",
        "https://[2600:4040:23c7:a620:3642:ebaa:ab23:735e]/test",
    ),
    (
        "https://[2600:4040:23c7:a620:3642:ebaa:ab23:735e]:8080/test",
        "https://[2600:4040:23c7:a620:3642:ebaa:ab23:735e]:8080/test",
    ),
    # spaces/unicode in query — youtube watch case (url_test.go:99-110)
    (
        "https://www.youtube.com/watch/0HBwC_wIFF4?t=18363石神視点【Minecraft】平日もど真ん中なんだから早く寝なきゃ【石神のぞみ／にじさんじ所属】https://www.youtube.com/watch/L30uAR9X8Uw?t=10100【倉持エン足中",
        "https://www.youtube.com/watch/0HBwC_wIFF4?t=18363%E7%9F%B3%E7%A5%9E%E8%A6%96%E7%82%B9%E3%80%90Minecraft%E3%80%91%E5%B9%B3%E6%97%A5%E3%82%82%E3%81%A9%E7%9C%9F%E3%82%93%E4%B8%AD%E3%81%AA%E3%82%93%E3%81%A0%E3%81%8B%E3%82%89%E6%97%A9%E3%81%8F%E5%AF%9D%E3%81%AA%E3%81%8D%E3%82%83%E3%80%90%E7%9F%B3%E7%A5%9E%E3%81%AE%E3%81%9E%E3%81%BF%EF%BC%8F%E3%81%AB%E3%81%98%E3%81%95%E3%82%93%E3%81%98%E6%89%80%E5%B1%9E%E3%80%91https%3A%2F%2Fwww.youtube.com%2Fwatch%2FL30uAR9X8Uw%3Ft%3D10100%E3%80%90%E5%80%89%E6%8C%81%E3%82%A8%E3%83%B3%E8%B6%B3%E4%B8%AD",
    ),
    # reddit signature carve-out — query left untouched (url_test.go:113-124)
    (
        "https://styles.redditmedia.com/t5_7wkhw/styles/profileIcon_8w6r6fr3rh2d1.jpeg?width=64&height=64&frame=1&auto=webp&crop=64:64,smart&s=6d8ab9b89c9b846c9eb65622db9ced4992dc0905",
        "https://styles.redditmedia.com/t5_7wkhw/styles/profileIcon_8w6r6fr3rh2d1.jpeg?width=64&height=64&frame=1&auto=webp&crop=64:64,smart&s=6d8ab9b89c9b846c9eb65622db9ced4992dc0905",
    ),
]


@pytest.mark.parametrize("raw,expected", VECTORS)
def test_url_to_string_vectors(raw, expected):
    assert urlnorm.canonicalize(raw, keep_fragment=True) == expected


def test_query_key_order_preserved():
    # keys never sorted (url.go:59-60); deterministic first-appearance order
    assert (
        urlnorm.canonicalize("http://h.example/p?z=1&a=2&m=3")
        == "http://h.example/p?z=1&a=2&m=3"
    )


def test_query_values_grouped_by_key():
    # Go's url.Values groups all values of one key together
    assert (
        urlnorm.canonicalize("http://h.example/p?b=1&a=2&b=3")
        == "http://h.example/p?b=1&b=3&a=2"
    )


def test_fragment_removed_by_default():
    assert urlnorm.canonicalize("http://h.example/p#frag") == "http://h.example/p"
    assert urlnorm.strip_fragment("http://h.example/p#frag") == "http://h.example/p"


def test_make_absolute():
    assert (
        urlnorm.make_absolute("http://h.example/dir/page", "../img.png")
        == "http://h.example/img.png"
    )
    assert (
        urlnorm.make_absolute("http://h.example/dir/", "http://other.example/x")
        == "http://other.example/x"
    )


def test_validate_scheme_gate():
    assert urlnorm.is_valid_url("https://ok.example/x")
    assert not urlnorm.is_valid_url("ftp://nope.example/x")
    assert not urlnorm.is_valid_url("mailto:a@b.c")
    assert not urlnorm.is_valid_url("https:///nopath")
    assert not urlnorm.is_valid_url("example.com/no-scheme")


def test_clean_urls_dedupe_first_wins_and_scheme_filter():
    out = urlnorm.clean_urls(
        "http://h.example/base/",
        ["a.html", "a.html#x", "ftp://h.example/f", "http://h2.example/b"],
    )
    assert out == ["http://h.example/base/a.html", "http://h2.example/b"]


def test_registrable_domain():
    assert urlnorm.registrable_domain("sub.foo.blogspot.com") == "blogspot.com"
    assert urlnorm.registrable_domain("foo.example") == "foo.example"
    assert urlnorm.registrable_domain("localhost") == ""


def test_hash64_stable():
    h = urlnorm.hash64("https://h.example/p")
    assert h == urlnorm.hash64("https://h.example/p")
    assert 0 <= h < 2**64
    assert urlnorm.hash64_batch(["a", "b"]) == [urlnorm.hash64("a"), urlnorm.hash64("b")]


# ------------------------------------------------- fast-path equivalence


def test_make_absolute_fast_path_matches_urljoin():
    from urllib.parse import urljoin

    from zeno_ray.urlnorm import make_absolute

    cases = [
        "https://host.example/a/b", "http://h.example/",
        "https://h.example/a%20b/c", "https://h.example/a/../b",
        "https://h.example/./x", "https://h.example/a/.", "//h.example/x",
        "/relative/path", "relative.html", "?q=1", "https://h.example",
        "https://h.example/a?q=1#f", "ftp://h.example/x",
        "https://h.example/trailing/", "https://h.example/a/b/../../c/d",
    ]
    base = "https://base.example/dir/page.html"
    for u in cases:
        assert make_absolute(base, u) == urljoin(base, u), u


def test_canonical_fast_path_is_identity_of_canonicalize():
    """Every URL the _CANON_FAST regex accepts must be a fixed point of the
    full canonicalizer AND valid; URLs it rejects go down the slow path
    anyway, so only acceptance needs proving."""
    from zeno_ray.urlnorm import _CANON_FAST, canonicalize, is_valid_url

    accept = [
        "https://host0001.example/page/3",
        "http://h.example/",
        "https://h.example",
        "https://h.example:8080/a/b.c_d~e",
        "https://h.example/a%20b/c",          # existing escapes preserved
        "https://h.example/a!$&'()*+,;=:@/b",  # full literal-keep charset
        "https://sub.h-2.example/x/y/z/",
    ]
    for u in accept:
        assert _CANON_FAST.match(u), u
        assert canonicalize(u) == u, u
        assert is_valid_url(u), u
    reject = [
        "HTTPS://h.example/x",     # scheme case → slow path lowercases
        "https://h.example/x?q=1",  # query re-encode
        "https://h.example/x#f",
        "https://héh.example/x",    # IDNA host
        "https://h.example/ä",      # path needs escaping
        "https://user@h.example/x",  # userinfo strip
        "https://h.example/a b",    # space needs escaping
        "ftp://h.example/x",
        "https://.../x",            # no alnum in host
    ]
    for u in reject:
        assert not _CANON_FAST.match(u), u


def test_canonical_fast_path_fuzz_equivalence():
    """Randomized cross-check: for fuzzed URL-ish strings, clean_urls'
    fast path never changes the output vs the pure slow path."""
    import random

    from zeno_ray.urlnorm import _CANON_FAST, canonicalize, clean_urls, is_valid_url

    rng = random.Random(99)
    alphabet = list("abcXYZ019-._~!$&'()*+,;=:@/%?#äé ")
    urls = []
    for _ in range(3000):
        n = rng.randint(0, 18)
        path = "".join(rng.choice(alphabet) for _ in range(n))
        host = rng.choice(["h.example", "H-2.example", "héh.example",
                           "h.example:8080", "..."])
        scheme = rng.choice(["https", "http", "HTTPS", "ftp"])
        urls.append(f"{scheme}://{host}/{path}")

    def slow_clean(base, us):
        seen, out = set(), []
        for u in us:
            u = u if u.startswith(("http://", "https://")) else u
            from zeno_ray.urlnorm import make_absolute, strip_fragment

            if base is not None:
                u = make_absolute(base, u)
            u = strip_fragment(u)
            c = canonicalize(u)
            if c is None or c in seen:
                continue
            seen.add(c)
            if not is_valid_url(c):
                continue
            out.append(c)
        return out

    base = "https://base.example/d/p.html"
    assert clean_urls(base, urls) == slow_clean(base, urls)
    # and specifically: every fast-accepted url is a canonicalize fixpoint
    for u in urls:
        if _CANON_FAST.match(u):
            assert canonicalize(u) == u and is_valid_url(u), u


def test_make_absolute_fuzz_equivalence_with_urljoin():
    """Randomized cross-check of ALL make_absolute fast paths (absolute
    as-is, root-relative origin-concat, protocol-relative scheme-concat,
    and the \\t/\\n/\\r and dot-segment bail-outs) against urljoin."""
    import random
    from urllib.parse import urljoin

    from zeno_ray.urlnorm import _ORIGIN_RE, _make_absolute_fast, make_absolute

    rng = random.Random(7)
    # ';' excluded: urljoin round-trips through urlparse/urlunparse, which
    # drops a bare trailing ';' (empty params) — Go's ResolveReference
    # (the reference semantics, utils/url.go:78-86) keeps it, and so do
    # the fast paths. That intentional deviation is asserted separately.
    seg_alphabet = list("abz09-._~%!$&,=:@äé \t\n.")
    bases = [
        "https://base.example/d/p.html",
        "http://b.example:8080/x?q=1",
        "https://b.example",
        "http://b\t.example/x",  # base with stripped whitespace
    ]

    def rand_ref():
        kind = rng.randrange(8)
        seg = "".join(rng.choice(seg_alphabet) for _ in range(rng.randint(0, 10)))
        if kind == 0:
            return f"https://abs.example/{seg}"
        if kind == 1:
            return f"/{seg}"
        if kind == 2:
            return f"//other.example/{seg}"
        if kind == 3:
            return seg  # relative path
        if kind == 4:
            return f"/{seg}/../x"
        if kind == 5:
            return f"?q={seg}"
        if kind == 6:
            return f"/\t/{seg}"  # whitespace-strip structure change
        return f"#{seg}"

    for base in bases:
        origin_m = _ORIGIN_RE.match(base) if not any(
            c in base for c in "\t\n\r") else None
        for _ in range(2000):
            u = rand_ref()
            want = urljoin(base, u)
            assert make_absolute(base, u) == want, (base, u)
            assert _make_absolute_fast(base, origin_m, u) == want, (base, u)


def test_host_of_fast_path_matches_urlsplit():
    from urllib.parse import urlsplit

    from zeno_ray.urlnorm import host_of

    cases = [
        "https://h.example/p", "http://h.example", "https://h.example?q=1",
        "https://h.example#f", "https://h.example:8080/p",
        "https://user@h.example/p", "https://[::1]:80/p",
        "http://h\t.example/p", "HTTPS://h.example/p", "not a url",
        "ftp://h.example/x", "https://h.example/a@b",
    ]
    for u in cases:
        want = urlsplit(u).netloc.rsplit("@", 1)[-1]
        assert host_of(u) == want, u


def test_make_absolute_keeps_bare_trailing_semicolon():
    """Go's ResolveReference keeps a bare trailing ';' (utils/url.go:78-86);
    urljoin's urlparse/urlunparse round-trip would drop it. The fast paths
    follow the reference."""
    from zeno_ray.urlnorm import make_absolute

    assert make_absolute("https://b.example/d/", "https://a.example/x;") == \
        "https://a.example/x;"
    assert make_absolute("https://b.example/d/", "/x;") == \
        "https://b.example/x;"
