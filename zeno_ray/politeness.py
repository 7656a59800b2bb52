"""Per-host politeness & robots.txt enforcement — host-keyed stateful
stages.

The reference has NO robots.txt code at all and its per-domain concurrency
check is commented out (``crawl/utils.go:81-84``) — SURVEY.md §2.4. These
are therefore ADDITIVE capabilities required by the north rule, built so
their defaults preserve reference-equivalent behavior:

- politeness = the per-host per-epoch fetch budget (frontier.rank_frontier)
  — Zeno's one-item-per-host-per-rotation-turn generalized — plus the 429
  retry/backoff accounting inside the Fetcher;
- robots = a sharded host-keyed actor cache (``RobotsShard``): each shard
  owns ``hash(host) % n`` of the host space, fetches /robots.txt once per
  host (here via the corpus pure function; in production via HTTP), parses
  the ``User-agent: *`` group's Disallow prefixes, and answers batched
  allow/deny queries. ``RobotsFilterStage`` is the map_batches stage that
  drops disallowed candidate URLs before they are seen-marked/enqueued.

Scale: state per shard is O(hosts/shards × rules); queries are batched one
RPC per shard per batch, like the seen filter.
"""

from __future__ import annotations

import numpy as np
import ray

from zeno_ray.urlnorm import hash64


def parse_robots(body: str) -> list[str]:
    """Disallow prefixes from the ``User-agent: *`` group (simplified
    robots.txt: no wildcards, first matching group, Allow ignored)."""
    disallows: list[str] = []
    in_star = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            in_star = value == "*"
        elif key == "disallow" and in_star and value:
            disallows.append(value)
    return disallows


@ray.remote(num_cpus=0)
class RobotsShard:
    """Robots-rule cache for the hosts in this shard of the host space."""

    def __init__(self, spec):
        self.spec = spec
        self.rules: dict[str, tuple] = {}

    def _rules_for(self, host: str) -> tuple:
        cached = self.rules.get(host)
        if cached is None:
            rec = self.spec.lookup(f"https://{host}/robots.txt")
            if rec.status == 200:
                cached = tuple(parse_robots(rec.html.decode("utf-8", "replace")))
            else:
                cached = ()  # no robots file ⇒ allow all
            self.rules[host] = cached
        return cached

    def allowed(self, hosts: list, paths: list) -> np.ndarray:
        out = np.ones(len(hosts), dtype=bool)
        for i, (h, p) in enumerate(zip(hosts, paths)):
            for prefix in self._rules_for(h):
                if p.startswith(prefix):
                    out[i] = False
                    break
        return out

    def n_hosts_cached(self) -> int:
        return len(self.rules)


def create_robots_actors(spec, n_shards: int) -> list:
    return [RobotsShard.remote(spec) for _ in range(n_shards)]


class RobotsFilterStage:
    """map_batches stage: drop candidate rows whose (host, path) is
    disallowed. One RPC per touched shard per batch."""

    def __init__(self, shards: list):
        self.shards = shards

    def __call__(self, batch):
        import pyarrow as pa

        if batch.num_rows == 0:
            return batch
        hosts = batch["host"].to_pylist()
        urls = batch["url"].to_pylist()
        paths = []
        for u, h in zip(urls, hosts):
            idx = u.find(h)
            paths.append(u[idx + len(h):] if idx >= 0 else "/")
        n = len(self.shards)
        shard_ids = np.fromiter(
            (hash64(h.partition(":")[0]) % n for h in hosts),
            dtype=np.int64, count=len(hosts))
        mask = np.ones(len(hosts), dtype=bool)
        futures, indices = [], []
        for s in np.unique(shard_ids):
            idxs = np.nonzero(shard_ids == s)[0]
            futures.append(self.shards[int(s)].allowed.remote(
                [hosts[i] for i in idxs], [paths[i] for i in idxs]))
            indices.append(idxs)
        for idxs, res in zip(indices, ray.get(futures)):
            mask[idxs] = res
        return batch.filter(pa.array(mask))
