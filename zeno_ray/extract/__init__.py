"""Content extractors (HTML / XML / sitemap / S3 listing / JSON / M3U8) and
the content-type dispatcher — the parse side of the reference's Capture stage
(``internal/pkg/crawl/capture.go:459-607``), re-expressed as pure functions
suitable for vectorized ``map_batches`` use."""

from zeno_ray.extract.dispatch import ExtractResult, extract_from_page  # noqa: F401
from zeno_ray.extract.html import extract_html, extract_text  # noqa: F401
from zeno_ray.extract.jsonx import urls_from_json  # noqa: F401
from zeno_ray.extract.m3u8x import extract_m3u8  # noqa: F401
from zeno_ray.extract.xmlx import extract_s3, extract_xml  # noqa: F401
