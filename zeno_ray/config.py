"""Crawl configuration — the subset of the reference's ~60 flags
(``cmd/get.go:29-112``, ``config/config.go:16-90``) that affects dataflow
semantics, with the reference's defaults where one exists."""

from __future__ import annotations

from dataclasses import dataclass, field

# hardcoded always-excluded hosts (crawl/config.go:231)
DEFAULT_EXCLUDED_HOSTS = ("archive.org", "archive-it.org")


@dataclass(frozen=True)
class CrawlConfig:
    max_hops: int = 2  # --max-hops; outlinks enqueue iff max_hops >= hop+1 (outlinks.go:77)
    max_redirect: int = 20  # --max-redirect (capture.go:121)
    max_retry: int = 5  # --max-retry (capture.go:58)
    domains_crawl: bool = False  # --domains-crawl (outlinks.go:100-164)
    disable_assets_capture: bool = False  # --disable-assets-capture
    capture_alternate_pages: bool = False  # --capture-alternate-pages (assets.go:386-391)
    disabled_html_tags: tuple = ()  # --disable-html-tag
    excluded_hosts: tuple = ()  # --exclude-host (plus DEFAULT_EXCLUDED_HOSTS)
    included_hosts: tuple = ()  # --include-host
    excluded_strings: tuple = ()  # --exclude-string
    included_strings: tuple = ()  # --include-string

    # rebuild-side execution knobs (no reference equivalent; Ray-native)
    host_budget: int = 0  # rows per host per epoch; 0 = unlimited (pure BFS)
    pages_target_part_bytes: int = 128 * 1024 * 1024  # epoch-commit pages
    # compaction target: per-batch sink parts are merged up to ~this size
    # on the committer thread (small-files control at 100-TB scale)
    max_epochs: int = 64
    seen_shards: int = 8
    fetch_concurrency: int = 4  # Fetcher actor pool size
    fetch_batch_size: int = 256
    extract_batch_size: int = 128
    robots_enforce: bool = False  # fetch+honor per-host /robots.txt (ADDITIVE:
                                  # the reference has no robots code; default
                                  # off preserves reference behavior)
    robots_deny_prefixes: tuple = ()  # static deny list; default allow-all
                                      # (the reference has NO robots code —
                                      # SURVEY.md §2.4; additive, default
                                      # preserves reference behavior)
    cookie_file: str = ""  # --cookies: Netscape cookies.txt loaded into the
                           # fetcher's jar (crawl.go:175-182)
    api: bool = False      # --api: serve live stats JSON + /metrics
    api_port: int = 0      # --api-port (reference default 9443; 0 here =
                           # ephemeral, the test-friendly default)
    crawl_time_limit: int = 0  # --crawl-time-limit (cmd/get.go:55): seconds
                               # until the crawl sets itself finished; a BSP
                               # crawl can only stop at an epoch boundary, so
                               # that is where the clock is checked
    crawl_max_time_limit: int = 0  # --crawl-max-time-limit (cmd/get.go:56):
                                   # hard abort; 0 = time_limit + 10% like the
                                   # reference default
    hq_feed_dir: str = ""  # HQ stand-in (hq.go:149-228 HQConsumer): watched
                           # directory of parquet URL batches ingested at
                           # each epoch boundary; "" = disabled
    hq_produce: bool = False  # HQ stand-in (hq.go:52-147 HQProducer):
                              # export discovered frontier rows to
                              # hq_feed_dir instead of the local frontier
    host_registry: str = "mem"  # host→host_seq registry backend (budget
                                # mode): "mem" = driver dict (fast, fine to
                                # ~10^6 hosts), "parquet" = on-disk registry
                                # with a per-epoch distributed semi-join —
                                # driver memory O(hosts touched per epoch),
                                # the 10^8-host scale path
    min_space_required: int = 0  # --min-space-required GB (cmd/get.go:58 +
                                 # crawl/utils.go:42-57 handleCrawlPause):
                                 # pause at the epoch boundary while free disk
                                 # under the job path is at or below this.
                                 # Reference default is 20; default 0 (off)
                                 # here so sandbox runs can't silently hang.

    def all_excluded_hosts(self) -> tuple:
        return tuple(self.excluded_hosts) + DEFAULT_EXCLUDED_HOSTS


# flag aliases (config.go handleFlagsAliases: e.g. --hops → max-hops)
CONFIG_ALIASES = {
    "hops": "max_hops",
    "msr": "min_space_required",  # deprecated alias (cmd/get.go:111)
    "cookies": "cookie_file",
    "exclude_host": "excluded_hosts",
    "include_host": "included_hosts",
    "exclude_string": "excluded_strings",
    "include_string": "included_strings",
}

ENV_PREFIX = "RAYZENO_"  # the reference's ZENO_* (config.go:120-123)


def _coerce(value, target_type):
    """Coerce a string (env/yaml) value to a CrawlConfig field type."""
    if isinstance(value, target_type) and not isinstance(value, str):
        return value
    if target_type is bool:
        if isinstance(value, bool):
            return value
        return str(value).strip().lower() in ("1", "true", "yes", "on")
    if target_type is int:
        return int(value)
    if target_type is tuple:
        if isinstance(value, (list, tuple)):
            return tuple(value)
        return tuple(s.strip() for s in str(value).split(",") if s.strip())
    return str(value)


def load_config(flags: dict | None = None, yaml_path: str | None = None,
                env: dict | None = None,
                consul_kv_path: str | None = None) -> CrawlConfig:
    """Build a CrawlConfig with the reference's precedence chain
    (config.go:98-156: flags → env → config file → consul KV → defaults,
    viper's standard layer order; AutomaticEnv with the ``ZENO_`` prefix
    and ``-``/``.`` → ``_`` replacement becomes ``RAYZENO_<FIELD>``).

    The consul layer (config.go:129-144 — ``viper.AddRemoteProvider(
    "consul", addr, path)`` gated on ``consul-config`` +
    ``consul-address``) is a NETWORK-FREE stand-in here: the remote KV
    document is a local yaml/json file, passed as *consul_kv_path* or —
    mirroring the reference's flag surface — as flags ``consul_config``
    (truthy) + ``consul_path`` (the document path; the reference splits
    it into KV prefix + file name, config.go:136-139). Alias keys
    (``hops`` → ``max_hops``) are accepted in every layer, like
    handleFlagsAliases."""
    import dataclasses
    import os

    field_types = {f.name: f.type for f in dataclasses.fields(CrawlConfig)}
    # dataclass stores annotations as strings under __future__.annotations
    resolved = {
        "int": int, "bool": bool, "tuple": tuple, "str": str,
    }

    def norm_key(key: str) -> str:
        k = key.replace("-", "_").replace(".", "_").lower()
        return CONFIG_ALIASES.get(k, k)

    def typ(name: str):
        t = field_types[name]
        return resolved.get(t, t) if isinstance(t, str) else t

    values: dict = {}
    # layer 0 (lowest): consul KV document stand-in
    raw_flags = {norm_key(k): v for k, v in (flags or {}).items()}
    if consul_kv_path is None and _coerce(
            raw_flags.get("consul_config", False), bool):
        consul_kv_path = str(raw_flags.get("consul_path", "") or "")
    if consul_kv_path and os.path.exists(consul_kv_path):
        import json as _json

        import yaml as _yaml

        text = open(consul_kv_path).read()
        loader = (_json.loads if consul_kv_path.endswith(".json")
                  else _yaml.safe_load)
        for k, v in (loader(text) or {}).items():
            k = norm_key(k)
            if k in field_types:
                values[k] = _coerce(v, typ(k))
    # layer 1: yaml config file
    if yaml_path and os.path.exists(yaml_path):
        import yaml as _yaml

        loaded = _yaml.safe_load(open(yaml_path)) or {}
        for k, v in loaded.items():
            k = norm_key(k)
            if k in field_types:
                values[k] = _coerce(v, typ(k))
    # layer 2: environment (RAYZENO_MAX_HOPS=6 etc.)
    env_map = env if env is not None else os.environ
    for k, v in env_map.items():
        if k.startswith(ENV_PREFIX):
            name = norm_key(k[len(ENV_PREFIX):])
            if name in field_types:
                values[name] = _coerce(v, typ(name))
    # layer 3 (highest): explicit flags
    for k, v in (flags or {}).items():
        k = norm_key(k)
        if k in field_types:
            values[k] = _coerce(v, typ(k))
    return CrawlConfig(**values)


def make_is_excluded(cfg: CrawlConfig):
    """URL-exclusion predicate (crawl/exclusion.go:10-58): include-host
    allowlist, exclude-host blocklist, substring exclude/include."""
    excluded_hosts = set(cfg.all_excluded_hosts())
    included_hosts = set(cfg.included_hosts)
    ex_strings = tuple(cfg.excluded_strings)
    in_strings = tuple(cfg.included_strings)
    robots_deny = tuple(cfg.robots_deny_prefixes)

    from zeno_ray.urlnorm import host_of

    def is_excluded(url: str) -> bool:
        host = host_of(url).partition(":")[0]
        # NOTE (exclusion.go:12-15): if the host is NOT in the include list
        # the reference returns false ("not excluded") — faithfully kept.
        if included_hosts and host not in included_hosts:
            return False
        if host in excluded_hosts:
            return True
        for s in ex_strings:
            if s in url:
                return True
        if in_strings and not any(s in url for s in in_strings):
            return True
        if any(url.startswith(p) for p in robots_deny):
            return True
        return False

    return is_excluded
