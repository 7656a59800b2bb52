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


def _patch_schema_dedup() -> None:
    """Restore Ray Data's schema-dedup fast path under pyarrow 16.

    ``pa.Schema.__hash__`` raises ``TypeError: unhashable type: 'dict'``
    whenever the schema carries key/value metadata — and the ``b'pandas'``
    blob is attached by every pandas-written parquet file and re-attached
    by every ``batch_format="pandas"`` stage's arrow conversion.  Ray's
    ``unify_schemas`` (ray/data/_internal/arrow_ops/transform_pyarrow.py)
    tries ``len(set(schemas)) == 1`` as an early exit, so every block
    merge over such schemas logs "Failed to hash the schemas (for
    deduplication)" AND falls through to the expensive full unification.

    Fix: dedupe on metadata-stripped schemas (hashable; metadata is
    irrelevant to type unification) and return the stripped schema on the
    fast path — which also makes downstream blocks metadata-free, so the
    cleanup propagates.  Genuinely differing schemas delegate to the
    original.  Rebinding the module attribute covers all callers: both
    ``concat()`` (module-global lookup) and ``ray.data._internal.util``
    (function-local import) resolve the name at call time.  Idempotent;
    exported as :func:`apply_runtime_patches` for
    ``ray.init(runtime_env={"worker_process_setup_hook": ...})`` so pure
    read tasks (which never import zeno_ray) get it too.
    """
    try:
        from ray.data._internal.arrow_ops import transform_pyarrow as _tp
    except ImportError:  # ray absent / layout changed: patch is optional
        return
    if getattr(_tp.unify_schemas, "_rayzeno_patched", False):
        return
    _orig = _tp.unify_schemas

    def unify_schemas(schemas, **kwargs):
        schemas = list(schemas)  # a one-shot iterable must survive the
        try:                     # fast path failing into the fallback
            bare = {s.remove_metadata() for s in schemas}
            if len(bare) == 1:
                return bare.pop()
        except Exception:
            pass  # field-level metadata etc. — fall through to the original
        return _orig(list(schemas), **kwargs)

    unify_schemas._rayzeno_patched = True
    _tp.unify_schemas = unify_schemas


def apply_runtime_patches() -> None:
    """Worker-process setup hook: apply zeno_ray's Ray runtime shims in a
    worker that may never import the package otherwise (e.g. bare
    ``ReadParquet`` tasks).  Pass as ``worker_process_setup_hook``."""
    _shim_fsspec_http()
    _patch_schema_dedup()


def runtime_env() -> dict:
    """``runtime_env`` for ``ray.init`` in sessions this repo owns (bench,
    tests, scripts — never the driver's own session): ships the repo path
    so the setup hook deserializes in bare workers, and installs
    :func:`apply_runtime_patches` in every worker process."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev = os.environ.get("PYTHONPATH", "")
    path = f"{root}{os.pathsep}{prev}" if prev else root
    return {"env_vars": {"PYTHONPATH": path},
            "worker_process_setup_hook": apply_runtime_patches}


_shim_fsspec_http()
_patch_schema_dedup()
