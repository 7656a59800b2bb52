"""rayzeno — a Ray-Data-native web-crawl data engine.

A from-scratch rebuild (not a port) of the data-processing capabilities of the
Zeno web crawler (reference studied read-only at /root/reference; see
SURVEY.md).  The frontier lives in host-partitioned Parquet consumed as a
``ray.data.Dataset``; per-record stages are ``map_batches`` over zero-copy
Arrow; stateful stages (URL-seen filter, politeness/robots) are actor pools;
host-keyed scheduling is a ``groupby(host)`` rank/budget shuffle.
"""

__version__ = "0.2.0"

# Bump on ANY change to the crawl engine's persisted output (pages schema,
# frontier schema, commit layout) — cached crawls under /tmp/rayzeno_crawl
# are stamped with this so stale-schema checkpoints regenerate.
ENGINE_VERSION = 4


def _shim_fsspec_http() -> None:
    """Pre-seed ``fsspec.implementations.http`` when aiohttp is absent.

    Ray Data's path resolver probes ``from fsspec.implementations.http
    import HTTPFileSystem`` on EVERY read/write call; without aiohttp that
    import fails, is never cached, and re-executes the module each time.
    Two threads probing concurrently (the epoch committer's write_parquet
    racing the main loop's read_parquet) can observe a partially-
    initialized module and die with ``cannot import name 'HTTPFileSystem'``
    — an ImportError Ray's ``except ModuleNotFoundError`` does not catch.
    Seeding a stub module with a sentinel class makes the probe a cached,
    race-free no-op; Ray only ever isinstance-checks against the name, so
    the sentinel correctly reports "not an HTTP filesystem" everywhere in
    this no-network container.
    """
    import sys

    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class _NoHTTPFileSystem:  # sentinel: nothing is ever an instance
            pass

        mod.HTTPFileSystem = _NoHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_shim_fsspec_http()
