"""Corpus generator invariants — the load-bearing guarantees everything else
relies on:
1. extraction parity: parsing any generated page recovers EXACTLY the
   generator's ground-truth edges (set equality per page) — a real test,
   since edges are composed from link lists + urlnorm, never from the parser;
2. byte-identical text: extract_text(html) == stored text for every page;
3. determinism: two lookups/builds agree;
4. parquet materialization (schema, counts, idempotence).
"""

import os

import pytest

from zeno_ray.corpus import CorpusSpec, ensure_corpus
from zeno_ray.extract import extract_from_page
from zeno_ray.urlnorm import canonicalize

# 12 hosts covers the special-host variants: an S3-listing host
# (i % 29 == 11) and a robots-restricted host (i % 11 == 7)
SPEC = CorpusSpec(n_hosts=12, pages_per_host=12)


def _extract(spec, url):
    rec = spec.lookup(url)
    return rec, extract_from_page(
        url,
        rec.html,
        rec.content_type,
        link_header=rec.link_header,
        server=rec.server,
    )


def test_every_page_extraction_matches_ground_truth_edges():
    for url in SPEC.universe_urls():
        rec = SPEC.lookup(url)
        if rec.status != 200:
            continue
        rec, res = _extract(SPEC, url)
        got = {(d, "outlink") for d in res.outlinks} | {(d, "asset") for d in res.assets}
        want = set(SPEC.page_edges(url))
        assert got == want, f"{url}: extracted {got ^ want} differ"


def test_every_page_text_is_byte_identical():
    from zeno_ray.extract import extract_text

    for url in SPEC.universe_urls():
        rec = SPEC.lookup(url)
        if rec.status == 200 and "text/html" in rec.content_type:
            assert extract_text(rec.html) == rec.text, url


def test_redirect_rows():
    # /r/{j} exists only for j % 7 == 3 and 301s to /page/{j+1}
    url = "https://host0001.example/r/3"
    rec = SPEC.lookup(url)
    assert rec.status == 301
    assert rec.redirect_location == "/page/4"
    assert SPEC.page_edges(url) == [("https://host0001.example/page/4", "redirect")]


def test_flaky_rows_need_retries_and_mirror_article():
    url = "https://host0002.example/flaky/6"
    rec = SPEC.lookup(url)
    assert rec.status == 200 and rec.attempts_needed in (1, 2)
    assert rec.text == SPEC.lookup("https://host0002.example/page/6").text


def test_404_outside_universe():
    assert SPEC.lookup("https://host0001.example/missing/5").status == 404
    assert SPEC.lookup("https://nope.example/").status == 404
    assert SPEC.lookup("https://host9999.example/").status == 404


def test_lookup_deterministic():
    a = SPEC.lookup("https://host0000.example/page/3")
    b = SPEC.lookup("https://host0000.example/page/3")
    assert a == b


def test_seeds_are_canonical_roots():
    seeds = SPEC.seeds()
    assert seeds[0] == "https://host0000.example/"
    assert all(canonicalize(s) == s for s in seeds)
    assert len(seeds) == 3  # 12 hosts, stride 4 -> hosts 0, 4, 8


def test_universe_size_matches_iterator():
    assert SPEC.universe_size() == len(list(SPEC.universe_urls()))


@pytest.mark.usefixtures("ray_session")
def test_ensure_corpus_parquet(tmp_path):
    import pyarrow.parquet as pq

    out = ensure_corpus(SPEC, str(tmp_path / "corpus"))
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    pages = pq.read_table(os.path.join(out, "pages"))
    assert pages.num_rows == SPEC.universe_size()
    names = set(pages.schema.names)
    assert {"url", "warc_ts", "html", "text", "lang", "status",
            "redirect_location", "content_type", "link_header", "server",
            "attempts_needed"} <= names
    assert str(pages.schema.field("html").type) == "binary"
    edges = pq.read_table(os.path.join(out, "edges"))
    assert edges.num_rows > SPEC.universe_size()  # several edges per page
    seeds = pq.read_table(os.path.join(out, "seeds.parquet"))
    assert seeds.num_rows == len(SPEC.seeds())
    # idempotent second call
    assert ensure_corpus(SPEC, out) == out
