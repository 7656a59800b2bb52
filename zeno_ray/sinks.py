"""Resumable partitioned Parquet output for reprocessing pipelines.

The brief's resumable-output rule, factored out of the crawl's epoch
commits (``crawl.py``) for any batch pipeline: output is one directory
per input shard / key range, each committed atomically (write to a tmp
dir → rename) and sealed with a ``_SUCCESS`` marker; a rerun skips
sealed partitions, deletes torn ones, and recomputes only the rest —
never one giant file, never a partial directory mistaken for done.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable


def _marker(part_dir: str) -> str:
    return part_dir + "._SUCCESS"


def write_partitioned(
    make_ds: Callable[[str], "object"],
    out_dir: str,
    partitions: list[str],
    resume: bool = True,
) -> dict:
    """Write ``make_ds(key)`` (a Dataset) to ``out_dir/part=<key>/`` for
    every key in *partitions*; returns {"written": [...], "skipped": [...]}.

    Each partition commit is atomic (tmp dir + rename, then the marker),
    so a killed run leaves either a sealed partition or a torn tmp that
    the next run replaces. ``resume=False`` rewrites everything."""
    os.makedirs(out_dir, exist_ok=True)
    written, skipped = [], []
    for key in partitions:
        pdir = os.path.join(out_dir, f"part={key}")
        if resume and os.path.exists(_marker(pdir)) and os.path.isdir(pdir):
            skipped.append(key)
            continue
        # torn from a crashed attempt (or resume=False) — replace
        if os.path.exists(_marker(pdir)):
            os.remove(_marker(pdir))
        tmp = pdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds = make_ds(key)
        ds.write_parquet(tmp)
        os.makedirs(tmp, exist_ok=True)  # empty partitions still commit
        shutil.rmtree(pdir, ignore_errors=True)
        os.rename(tmp, pdir)
        with open(_marker(pdir), "w") as f:
            f.write("ok")
        written.append(key)
    return {"written": written, "skipped": skipped}


def finished_partitions(out_dir: str) -> list[str]:
    """Keys of sealed partitions under *out_dir*."""
    if not os.path.isdir(out_dir):
        return []
    out = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("part=") and not name.endswith(".tmp") \
                and os.path.exists(_marker(os.path.join(out_dir, name))):
            out.append(name[len("part="):])
    return out


def partitioned_dataset(out_dir: str):
    """Read back ONLY the sealed partitions as one Dataset."""
    import ray.data as rd

    files = []
    for key in finished_partitions(out_dir):
        root = os.path.join(out_dir, f"part={key}")
        for dirpath, _d, fs in os.walk(root):
            files.extend(os.path.join(dirpath, f)
                         for f in sorted(fs) if f.endswith(".parquet"))
    return rd.read_parquet(files)
