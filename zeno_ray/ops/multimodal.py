"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decode / feature-extract / resize /
frame-sample as actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (no PIL/ffmpeg in this
container): ``DecodeImageStage`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (size/aspect
derived from the byte content) exercises the real Ray-side plumbing —
schema, batch sizing for large binary payloads, actor signature, output
layout — which is tested for real.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("n_bytes", pa.int64()),
    ]
)


def docs_to_fake_media(df: pd.DataFrame) -> pd.DataFrame:
    """Adapter: documents rows → opaque media rows (deterministic payload
    from the text bytes), for exercising the media stages in this sandbox."""
    payloads = [t.encode("utf-8", "ignore")[:4096] for t in df["text"]]
    kinds = ["image", "audio", "video"]
    return pd.DataFrame(
        {
            "media_id": df["doc_id"].to_numpy(),
            "kind": [kinds[int(i) % 3] for i in df["doc_id"]],
            "payload": payloads,
            "mime": ["application/octet-stream"] * len(df),
            "n_bytes": np.asarray([len(p) for p in payloads], dtype=np.int64),
        }
    )


class DecodeImageStage:
    """Actor-pool decode stage. Real decode is NOT available in this
    container — fake=True uses a deterministic stand-in; fake=False raises,
    marking exactly where a PIL/turbojpeg call goes in production.

    Batch sizing: images are large binary payloads — callers should use a
    small batch_size (≤64) so batch × concurrency fits worker heaps."""

    def __init__(self, fake: bool = False, target: tuple = (64, 64)):
        self.fake = fake
        self.target = target

    def _fake_decode(self, payload: bytes) -> tuple:
        h = hashlib.blake2b(payload, digest_size=8).digest()
        w = 64 + h[0] % 192
        ht = 64 + h[1] % 192
        mean = float(sum(h) / 8 / 255.0)
        return w, ht, round(mean, 6)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/libjpeg — not present in this "
                "container; construct with fake=True for plumbing tests"
            )
        dims = [self._fake_decode(p) for p in batch["payload"]]
        out = batch[["media_id", "kind", "n_bytes"]].copy()
        out["width"] = np.asarray([d[0] for d in dims], dtype=np.int32)
        out["height"] = np.asarray([d[1] for d in dims], dtype=np.int32)
        out["mean_luma"] = np.asarray([d[2] for d in dims], dtype=np.float64)
        out["resized_w"], out["resized_h"] = self.target
        return out


class FrameSampleStage:
    """Video frame-sampling plumbing: emits every Nth deterministic frame
    index with a per-frame feature hash (stub for the ffmpeg call)."""

    def __init__(self, every_n: int = 10, fake: bool = False):
        self.every_n = every_n
        self.fake = fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError("frame sampling requires ffmpeg — stubbed")
        ids, frames, feats = [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            n_frames = max(1, len(payload) // 256)
            for f in range(0, n_frames, self.every_n):
                ids.append(mid)
                frames.append(f)
                feats.append(
                    int.from_bytes(
                        hashlib.blake2b(payload[f * 256: (f + 1) * 256],
                                        digest_size=8).digest(), "big"
                    )
                )
        return pd.DataFrame({
            "media_id": np.asarray(ids, dtype=np.int64),
            "frame": np.asarray(frames, dtype=np.int32),
            "feature_hash": np.asarray(feats, dtype=np.uint64),
        })
