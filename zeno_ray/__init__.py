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
ENGINE_VERSION = 3
