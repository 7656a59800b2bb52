"""Seed sources.

Behavioral spec: reference ``internal/pkg/queue/item.go:53-102``
(``FileToItems``): one URL per line, whitespace-trimmed, invalid URLs
skipped (counted), error on an empty seed list; CLI args seeds
(``cmd/get_url.go:22-69``) are the same minus the file read.
"""

from __future__ import annotations

from zeno_ray.urlnorm import canonicalize, is_valid_url


class EmptySeedListError(ValueError):
    pass


def seeds_from_lines(lines) -> tuple[list[str], int]:
    """(valid canonical seed urls in order, n_skipped). First-wins dedupe
    happens later at seed-load seencheck (crawl.go:218-235), not here."""
    out: list[str] = []
    skipped = 0
    for raw in lines:
        url = raw.strip()
        if not url or url.startswith("#"):
            continue
        c = canonicalize(url)
        if c is None or not is_valid_url(c):
            skipped += 1
            continue
        out.append(c)
    if not out:
        raise EmptySeedListError("seed list contains no valid URLs")
    return out, skipped


def read_seed_file(path: str) -> tuple[list[str], int]:
    """Plain-file reader (driver-side — seed lists are small)."""
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        return seeds_from_lines(f)


def read_seed_dataset(path: str):
    """Distributed variant for very large seed lists: ray.data.read_text →
    vectorized validate/canonicalize; returns a Dataset of {url}."""
    import pandas as pd
    import ray.data as rd

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        urls = []
        for raw in df[df.columns[0]]:
            url = str(raw).strip()
            if not url or url.startswith("#"):
                continue
            c = canonicalize(url)
            if c is not None and is_valid_url(c):
                urls.append(c)
        return pd.DataFrame({"url": urls})

    return rd.read_text(path).map_batches(clean, batch_format="pandas")
