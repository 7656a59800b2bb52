"""Config precedence (flags → env → yaml → defaults, config.go:98-156)
and the cookie jar (crawl.go:175-182)."""

from zeno_ray.config import CrawlConfig, load_config


def test_defaults_when_nothing_set():
    cfg = load_config(env={})
    assert cfg == CrawlConfig()


def test_yaml_layer(tmp_path):
    y = tmp_path / "zeno-config.yaml"
    y.write_text("max-hops: 5\nexclude-host:\n  - a.example\n  - b.example\n"
                 "domains-crawl: true\n")
    cfg = load_config(yaml_path=str(y), env={})
    assert cfg.max_hops == 5
    assert cfg.excluded_hosts == ("a.example", "b.example")
    assert cfg.domains_crawl is True


def test_env_overrides_yaml(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("max-hops: 5\nmax-retry: 9\n")
    env = {"RAYZENO_MAX_HOPS": "7", "RAYZENO_ROBOTS_ENFORCE": "true",
           "RAYZENO_EXCLUDED_STRINGS": "/tracker/,/ads/"}
    cfg = load_config(yaml_path=str(y), env=env)
    assert cfg.max_hops == 7        # env wins over yaml
    assert cfg.max_retry == 9       # yaml survives where env silent
    assert cfg.robots_enforce is True
    assert cfg.excluded_strings == ("/tracker/", "/ads/")


def test_flags_override_env(tmp_path):
    env = {"RAYZENO_MAX_HOPS": "7"}
    cfg = load_config(flags={"max-hops": 3}, env=env)
    assert cfg.max_hops == 3        # flags win over env


def test_consul_kv_layer_lowest_precedence(tmp_path):
    """config.go:129-144 stand-in: the consul KV document (a local
    yaml/json file, no network) sits BELOW the config file in viper's
    layer order — yaml/env/flags all override it, and it fills in where
    the higher layers are silent."""
    kv = tmp_path / "zeno-kv.yaml"
    kv.write_text("max-hops: 9\nmax-retry: 2\nseen-shards: 3\n")
    y = tmp_path / "c.yaml"
    y.write_text("max-hops: 5\n")
    cfg = load_config(yaml_path=str(y), env={"RAYZENO_MAX_RETRY": "6"},
                      consul_kv_path=str(kv))
    assert cfg.max_hops == 5       # config file wins over consul
    assert cfg.max_retry == 6      # env wins over consul
    assert cfg.seen_shards == 3    # consul fills in where others silent
    # reference flag surface: consul-config gates, consul-path locates
    kvj = tmp_path / "zeno-kv.json"
    kvj.write_text('{"max-hops": 11}')
    cfg = load_config(flags={"consul-config": True,
                             "consul-path": str(kvj)}, env={})
    assert cfg.max_hops == 11
    cfg = load_config(flags={"consul-path": str(kvj)}, env={})
    assert cfg.max_hops == 2       # not gated on ⇒ layer ignored


def test_alias_keys():
    # handleFlagsAliases: hops → max-hops; cookies → cookie-file
    cfg = load_config(flags={"hops": 4, "cookies": "/tmp/c.txt"}, env={})
    assert cfg.max_hops == 4
    assert cfg.cookie_file == "/tmp/c.txt"
    cfg = load_config(env={"RAYZENO_HOPS": "9"})
    assert cfg.max_hops == 9


def test_unknown_keys_ignored():
    cfg = load_config(flags={"no-such-flag": 1}, env={"RAYZENO_BOGUS": "x"})
    assert cfg == CrawlConfig()


NETSCAPE = """# Netscape HTTP Cookie File
.example.com\tTRUE\t/\tFALSE\t2147483647\tsession\tabc123
.example.com\tTRUE\t/private\tFALSE\t2147483647\tscoped\tppp
other.org\tFALSE\t/\tFALSE\t2147483647\tfoo\tbar
"""


def test_cookie_jar_domain_and_path_matching(tmp_path):
    from zeno_ray.fetch import CookieJar

    f = tmp_path / "cookies.txt"
    f.write_text(NETSCAPE)
    jar = CookieJar(str(f))
    assert len(jar) == 3
    c = jar.cookies_for("https://www.example.com/page")
    assert c == {"session": "abc123"}
    c = jar.cookies_for("https://example.com/private/x")
    assert c == {"session": "abc123", "scoped": "ppp"}
    assert jar.cookies_for("https://unrelated.net/") == {}


def test_cookie_jar_merges_under_plugin_cookies(tmp_path):
    """Plugin cookies layer on top of the jar (no clobber the other way:
    a plugin's value wins, reddit.go:34-48 adds only when absent — the
    jar is 'existing', the plugin is 'new')."""
    from zeno_ray.fetch import CookieJar
    from zeno_ray.plugins import PluginRegistry, PreFetchAction

    f = tmp_path / "cookies.txt"
    f.write_text("# Netscape HTTP Cookie File\n"
                 ".reddit.com\tTRUE\t/\tFALSE\t2147483647\tover18\t0\n")
    jar = CookieJar(str(f))
    merged = jar.cookies_for("https://www.reddit.com/r/x")
    act = PreFetchAction(cookies={"over18": "1", "eu_cookie_v2": "3"})
    # reference semantics: AddCookies skips names already on the request
    for k, v in act.cookies.items():
        merged.setdefault(k, v)
    assert merged == {"over18": "0", "eu_cookie_v2": "3"}
