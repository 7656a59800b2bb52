"""Live stats API (crawl/api.go:34-110): JSON endpoints + Prometheus
text format, standalone and wired into a running crawl."""

import json
import socket
import urllib.request

import pytest


def _get(port, path):
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=5) as r:
            return r.status, r.headers.get("Content-Type"), r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read().decode()


def test_stats_server_endpoints():
    from zeno_ray.statsapi import StatsServer

    state = {"crawled_seeds": 10, "crawled_assets": 4, "queued": 7,
             "hosts": 3, "epoch": 2, "seen_size": 21,
             "workers": [{"worker_id": "fetch-pool", "status": "busy"}]}
    srv = StatsServer(lambda: state, port=0, job="testjob")
    try:
        status, ct, body = _get(srv.port, "/")
        assert status == 200 and ct == "application/json"
        root = json.loads(body)
        assert root["crawled"] == 14
        assert root["crawledSeeds"] == 10
        assert root["crawledAssets"] == 4
        assert root["queued"] == 7
        assert "uptime" in root and root["rate"] >= 0

        _, _, body = _get(srv.port, "/queue")
        q = json.loads(body)
        assert q["TotalElements"] == 7 and q["UniqueHosts"] == 3
        assert q["SeenSize"] == 21

        _, _, body = _get(srv.port, "/workers")
        assert json.loads(body)["workers"][0]["worker_id"] == "fetch-pool"

        status, ct, body = _get(srv.port, "/metrics")
        assert status == 200 and ct.startswith("text/plain")
        assert '# TYPE zeno_downloaded_uri_count_total counter' in body
        assert 'zeno_downloaded_uri_count_total{crawljob="testjob"} 14' in body
        assert 'zeno_queued_elements{crawljob="testjob"} 7' in body

        status, _, _ = _get(srv.port, "/nope")
        assert status == 404
    finally:
        srv.close()


@pytest.mark.usefixtures("ray_session")
def test_stats_api_wired_into_crawl(tmp_path):
    """cfg.api=True serves live counters during the crawl; after the last
    epoch commit the totals match the CrawlResult."""
    from zeno_ray.config import CrawlConfig
    from zeno_ray.corpus import CorpusSpec
    from zeno_ray.crawl import run_crawl
    from zeno_ray import crawl as crawl_mod

    # grab the server the crawl starts (ephemeral port) via monkeypatch
    started = {}
    from zeno_ray.statsapi import StatsServer as RealServer

    class Capture(RealServer):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            started["srv"] = self
            started["snapshots"] = []

        def close(self):
            # snapshot the final state before shutdown
            started["final"] = _get(self.port, "/")
            started["queue"] = _get(self.port, "/queue")
            super().close()

    import zeno_ray.statsapi as sa
    orig = sa.StatsServer
    sa.StatsServer = Capture
    try:
        spec = CorpusSpec(n_hosts=3, pages_per_host=6, seed_stride=1)
        cfg = CrawlConfig(max_hops=3, max_epochs=6, seen_shards=2,
                          fetch_concurrency=2, api=True, api_port=0)
        res = run_crawl(spec, cfg, str(tmp_path / "ckpt"))
    finally:
        sa.StatsServer = orig
    _, _, body = started["final"]
    root = json.loads(body)
    assert root["crawled"] == res.pages_fetched
    q = json.loads(started["queue"][2])
    assert q["SeenSize"] == res.seen_size
    assert q["TotalElements"] == 0  # drained frontier at crawl end
