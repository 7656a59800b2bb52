"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata; decode / feature-extract / resize / frame-sample as
actor-pool ``map_batches`` stages.

The decode kernels are REAL for the container-decodable formats — PPM
(P6) and uncompressed 24-bit BMP images parsed with numpy, WAV PCM audio
via stdlib ``wave``, and a concatenated-PPM video container — computing
true pixel/sample statistics and true nearest-neighbor resizes. Formats
that need native codecs (JPEG/PNG/MP4: no PIL/ffmpeg in this container)
raise ``NotImplementedError`` at the exact call site a production build
would place the codec, unless ``fake=True`` supplies the deterministic
stand-in for plumbing tests.

Batch sizing: media payloads are large — callers use a small batch_size
(≤64) so batch × concurrency fits worker heaps (the brief's memory rule).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

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


# ------------------------------------------------------------- generators
# Deterministic REAL payloads (decodable by the kernels below), seeded
# from text so the media tables are reproducible pure functions.


def _rng_from(text: str) -> np.random.RandomState:
    seed = int.from_bytes(
        hashlib.blake2b(text.encode("utf-8", "ignore"),
                        digest_size=4).digest(), "big")
    return np.random.RandomState(seed)


def make_ppm(text: str) -> bytes:
    """A real P6 PPM image (8-64 px per side) with content-seeded pixels."""
    rng = _rng_from(text)
    w, h = int(rng.randint(8, 65)), int(rng.randint(8, 65))
    pix = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes()


def make_bmp(text: str) -> bytes:
    """A real uncompressed 24-bit BMP (BITMAPINFOHEADER, 4-byte row pad)."""
    rng = _rng_from(text)
    w, h = int(rng.randint(8, 65)), int(rng.randint(8, 65))
    pix = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)  # BGR rows
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b"".join(pix[r].tobytes() + b"\x00" * pad
                    for r in range(h - 1, -1, -1))  # bottom-up
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


def make_wav(text: str) -> bytes:
    """A real PCM-16 mono WAV: content-seeded sine + noise, 8 kHz."""
    rng = _rng_from(text)
    sr = 8000
    n = int(rng.randint(sr // 4, sr))  # 0.25-1.0 s
    t = np.arange(n) / sr
    freq = float(rng.randint(100, 2000))
    sig = 0.5 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.randn(n)
    pcm = np.clip(sig * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sr)
        wv.writeframes(pcm.tobytes())
    return buf.getvalue()


def make_ppm_video(text: str, n_frames: int = 12) -> bytes:
    """The sandbox video container: *n_frames* concatenated P6 frames of
    one (content-seeded) size."""
    rng = _rng_from(text)
    w, h = int(rng.randint(8, 33)), int(rng.randint(8, 33))
    out = []
    for _f in range(n_frames):
        pix = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        out.append(b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes())
    return b"".join(out)


def docs_to_media(df: pd.DataFrame) -> pd.DataFrame:
    """documents rows → REAL media rows: doc_id%3 rotates image (PPM or
    BMP alternating), audio (WAV), video (PPM stream)."""
    ids, kinds, payloads, mimes = [], [], [], []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        i = int(doc_id)
        if i % 3 == 0:
            p = make_ppm(text) if i % 2 == 0 else make_bmp(text)
            k, m = "image", ("image/x-portable-pixmap" if i % 2 == 0
                             else "image/bmp")
        elif i % 3 == 1:
            p, k, m = make_wav(text), "audio", "audio/wav"
        else:
            p, k, m = make_ppm_video(text), "video", "video/x-ppm-stream"
        ids.append(i)
        kinds.append(k)
        payloads.append(p)
        mimes.append(m)
    return pd.DataFrame({
        "media_id": np.asarray(ids, dtype=np.int64), "kind": kinds,
        "payload": payloads, "mime": mimes,
        "n_bytes": np.asarray([len(p) for p in payloads], dtype=np.int64),
    })


def docs_to_fake_media(df: pd.DataFrame) -> pd.DataFrame:
    """Adapter kept for opaque-payload plumbing tests: raw text bytes as
    undecodable payloads (exercises the fake/NotImplemented paths)."""
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


# --------------------------------------------------------------- decoders


def decode_ppm(payload: bytes):
    """P6 PPM → (w, h, HxWx3 uint8). Returns consumed-bytes too (for the
    frame-stream parser)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts, pos, vals = payload, 2, []
    while len(vals) < 3:
        while pos < len(parts) and parts[pos:pos + 1].isspace():
            pos += 1
        if parts[pos:pos + 1] == b"#":  # comment line
            pos = parts.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(parts) and not parts[end:end + 1].isspace():
            end += 1
        vals.append(int(parts[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, _maxval = vals
    n = w * h * 3
    pix = np.frombuffer(parts, dtype=np.uint8, count=n, offset=pos)
    return w, h, pix.reshape(h, w, 3), pos + n


def decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP → (w, h, HxWx3 uint8, n_bytes)."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    pix = rows[:, : w * 3].reshape(h, w, 3)
    if flip:
        pix = pix[::-1]
    # BMP stores BGR; hand RGB to _mean_luma like the PPM path does.
    pix = pix[..., ::-1]
    return w, h, pix, len(payload)


def resize_nearest(pix: np.ndarray, target: tuple) -> np.ndarray:
    """True nearest-neighbor resize via numpy fancy indexing."""
    tw, th = target
    h, w = pix.shape[:2]
    yi = (np.arange(th) * h // th).clip(0, h - 1)
    xi = (np.arange(tw) * w // tw).clip(0, w - 1)
    return pix[yi][:, xi]


def _mean_luma(pix: np.ndarray) -> float:
    # Rec.601 luma over real pixels
    luma = (0.299 * pix[..., 0] + 0.587 * pix[..., 1] + 0.114 * pix[..., 2])
    return round(float(luma.mean() / 255.0), 6)


class DecodeImageStage:
    """Actor-pool image decode: REAL for PPM/BMP (numpy parse, true pixel
    stats, true nearest-neighbor resize). Compressed formats raise at the
    codec call site unless ``fake=True`` supplies the deterministic
    stand-in (capture the plumbing, not the codec)."""

    def __init__(self, fake: bool = False, target: tuple = (64, 64)):
        self.fake = fake
        self.target = target

    def _fake_decode(self, payload: bytes) -> tuple:
        h = hashlib.blake2b(payload, digest_size=8).digest()
        w = 64 + h[0] % 192
        ht = 64 + h[1] % 192
        mean = float(sum(h) / 8 / 255.0)
        return w, ht, round(mean, 6)

    def decode(self, payload: bytes) -> tuple:
        """(width, height, mean_luma, resized_mean_luma)."""
        if payload.startswith(b"P6"):
            w, h, pix, _ = decode_ppm(payload)
        elif payload.startswith(b"BM"):
            w, h, pix, _ = decode_bmp(payload)
        elif self.fake:
            w, h, m = self._fake_decode(payload)
            return w, h, m, m
        else:
            raise NotImplementedError(
                "compressed image decode requires PIL/libjpeg — not in "
                "this container; PPM/BMP decode natively, or construct "
                "with fake=True for opaque-payload plumbing tests")
        resized = resize_nearest(pix, self.target)
        return w, h, _mean_luma(pix), _mean_luma(resized)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        dims = [self.decode(p) for p in batch["payload"]]
        out = batch[["media_id", "kind", "n_bytes"]].copy()
        out["width"] = np.asarray([d[0] for d in dims], dtype=np.int32)
        out["height"] = np.asarray([d[1] for d in dims], dtype=np.int32)
        out["mean_luma"] = np.asarray([d[2] for d in dims], dtype=np.float64)
        out["resized_w"], out["resized_h"] = self.target
        out["resized_mean_luma"] = np.asarray(
            [d[3] for d in dims], dtype=np.float64)
        return out


class DecodeAudioStage:
    """Actor-pool audio decode: REAL for WAV PCM (stdlib wave + numpy —
    true sample rate / duration / RMS). Compressed audio raises at the
    codec call site unless ``fake=True``."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def decode(self, payload: bytes) -> tuple:
        if payload.startswith(b"RIFF"):
            with wave.open(io.BytesIO(payload), "rb") as wv:
                sr = wv.getframerate()
                n = wv.getnframes()
                width = wv.getsampwidth()
                raw = wv.readframes(n)
            if width == 2:
                pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                rms = round(float(np.sqrt((pcm ** 2).mean()) / 32768.0), 6)
            else:
                rms = float("nan")
            return sr, n, round(n / sr, 6), rms
        if self.fake:
            h = hashlib.blake2b(payload, digest_size=8).digest()
            return 8000, len(payload), round(len(payload) / 8000, 6), \
                round(h[0] / 255.0, 6)
        raise NotImplementedError(
            "compressed audio decode requires ffmpeg — not in this "
            "container; WAV PCM decodes natively, or fake=True")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [self.decode(p) for p in batch["payload"]]
        out = batch[["media_id", "kind", "n_bytes"]].copy()
        out["sample_rate"] = np.asarray([f[0] for f in feats], dtype=np.int32)
        out["n_samples"] = np.asarray([f[1] for f in feats], dtype=np.int64)
        out["duration_sec"] = np.asarray([f[2] for f in feats],
                                         dtype=np.float64)
        out["rms"] = np.asarray([f[3] for f in feats], dtype=np.float64)
        return out


class FrameSampleStage:
    """Video frame sampling: REAL for the concatenated-PPM container —
    parses every frame, keeps every Nth, computes true per-frame mean
    luma + a pixel-content hash. Real codecs (MP4 etc.) raise at the
    ffmpeg call site unless ``fake=True``."""

    def __init__(self, every_n: int = 10, fake: bool = False):
        self.every_n = every_n
        self.fake = fake

    def _frames(self, payload: bytes):
        pos = 0
        while pos < len(payload) and payload[pos:pos + 2] == b"P6":
            w, h, pix, consumed = decode_ppm(payload[pos:])
            yield pix
            pos += consumed

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, frames, lumas, feats = [], [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            if payload.startswith(b"P6"):
                for f, pix in enumerate(self._frames(payload)):
                    if f % self.every_n:
                        continue
                    ids.append(mid)
                    frames.append(f)
                    lumas.append(_mean_luma(pix))
                    feats.append(int.from_bytes(
                        hashlib.blake2b(pix.tobytes(),
                                        digest_size=8).digest(), "big"))
            elif self.fake:
                n_frames = max(1, len(payload) // 256)
                for f in range(0, n_frames, self.every_n):
                    ids.append(mid)
                    frames.append(f)
                    lumas.append(0.0)
                    feats.append(int.from_bytes(
                        hashlib.blake2b(payload[f * 256: (f + 1) * 256],
                                        digest_size=8).digest(), "big"))
            else:
                raise NotImplementedError(
                    "video frame extraction requires ffmpeg — not in this "
                    "container; PPM streams decode natively, or fake=True")
        return pd.DataFrame({
            "media_id": np.asarray(ids, dtype=np.int64),
            "frame": np.asarray(frames, dtype=np.int32),
            "mean_luma": np.asarray(lumas, dtype=np.float64),
            "feature_hash": np.asarray(feats, dtype=np.uint64),
        })
