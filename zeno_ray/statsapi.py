"""Live stats API — the crawl's queryable surface while it runs.

Role of the reference's API server (``crawl/api.go:34-110``): JSON
endpoints ``/`` (headline counters), ``/queue`` (frontier stats),
``/workers`` (per-stage state), plus ``/metrics`` in Prometheus text
exposition format (``api.go:91-110`` + ``stats.go``'s counter set —
emitted directly; the promhttp dependency is just a formatter).

Ray-native shape: the driver owns the epoch loop, so the server is a
driver-side thread reading a shared state dict the loop updates at epoch
boundaries (the reference updates counters per URL; epoch granularity is
the BSP equivalent). Stateless handlers, ephemeral port support for
tests, clean shutdown via ``close()``.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class StatsServer:
    """Serve crawl state over HTTP; ``state_fn() -> dict`` is polled per
    request. Expected keys (all optional): crawled_seeds, crawled_assets,
    queued, hosts, epoch, seen_size, workers (list of dicts)."""

    def __init__(self, state_fn, port: int = 0, job: str = "rayzeno"):
        self.state_fn = state_fn
        self.job = job
        self.start_time = time.time()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, obj, status=200):
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                s = outer.state_fn() or {}
                seeds = int(s.get("crawled_seeds", 0))
                assets = int(s.get("crawled_assets", 0))
                uptime = time.time() - outer.start_time
                if self.path == "/":
                    # api.go:35-52's response shape
                    self._json({
                        "rate": round((seeds + assets) / max(uptime, 1e-9), 2),
                        "crawled": seeds + assets,
                        "crawledSeeds": seeds,
                        "crawledAssets": assets,
                        "queued": int(s.get("queued", 0)),
                        "uptime": f"{uptime:.3f}s",
                    })
                elif self.path == "/queue":
                    # api.go:58-61 (queue.GetStats shape, Ray-native fields)
                    self._json({
                        "TotalElements": int(s.get("queued", 0)),
                        "UniqueHosts": int(s.get("hosts", 0)),
                        "Epoch": int(s.get("epoch", 0)),
                        "SeenSize": int(s.get("seen_size", 0)),
                    })
                elif self.path == "/workers":
                    self._json({"workers": s.get("workers", [])})
                elif self.path == "/metrics":
                    # Prometheus text exposition (api.go:91-110 counters)
                    p = "zeno"
                    lines = []
                    for name, val, help_ in (
                        ("downloaded_uri_count_total", seeds + assets,
                         "The total number of crawled URI"),
                        ("crawled_seeds_total", seeds, "Crawled seed pages"),
                        ("crawled_assets_total", assets, "Crawled assets"),
                        ("queued_elements", int(s.get("queued", 0)),
                         "Frontier backlog"),
                        ("seen_urls_total", int(s.get("seen_size", 0)),
                         "Seen-set size"),
                    ):
                        lines.append(f"# HELP {p}_{name} {help_}")
                        lines.append(f"# TYPE {p}_{name} "
                                     + ("counter" if name.endswith("_total")
                                        else "gauge"))
                        lines.append(
                            f'{p}_{name}{{crawljob="{outer.job}"}} {val}')
                    body = ("\n".join(lines) + "\n").encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._json({"error": "not found"}, status=404)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)
