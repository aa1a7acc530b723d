"""Dependency-free media codecs (pure numpy) for the multimodal path.

The container has no PIL/ffmpeg/torchaudio, but these three formats are
simple enough to parse directly, which makes the multimodal decode path a
REAL bytes→array kernel instead of a stub:

- **PPM (P6)** — uncompressed binary RGB: ``P6\\n<w> <h>\\n255\\n`` + raw
  ``h*w*3`` bytes.
- **BMP** (BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit uncompressed) —
  bottom-up rows padded to 4-byte boundaries.
- **WAV** (RIFF PCM 16-bit) — canonical 44-byte header + interleaved
  little-endian samples.

Encoders exist so tests can round-trip known arrays; decoders validate
magic/headers and raise ``MediaError`` on anything else. All array work is
vectorized numpy — these run inside Arrow-batched ``mapInPandas`` stages
(see :mod:`tsdat_spark.multimodal`), never per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np


class MediaError(ValueError):
    pass


# ----------------------------- PPM (P6) -----------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise MediaError(f"encode_ppm wants (h, w, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(blob: bytes) -> np.ndarray:
    if not blob.startswith(b"P6"):
        raise MediaError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace separated, then one
    # whitespace byte before the raster
    parts, idx, token = [], 2, b""
    while len(parts) < 3 and idx < len(blob):
        ch = blob[idx:idx + 1]
        idx += 1
        if ch.isspace():
            if token:
                parts.append(int(token))
                token = b""
        elif ch == b"#":  # comment to end of line
            while idx < len(blob) and blob[idx:idx + 1] != b"\n":
                idx += 1
        else:
            token += ch
    if len(parts) != 3:
        raise MediaError("truncated PPM header")
    w, h, maxval = parts
    if maxval != 255:
        raise MediaError(f"only maxval 255 supported, got {maxval}")
    raster = np.frombuffer(blob, dtype=np.uint8, count=h * w * 3, offset=idx)
    return raster.reshape(h, w, 3).copy()


# ------------------------------- BMP --------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (bottom-up, BGR)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise MediaError(f"encode_bmp wants (h, w, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) // 4 * 4
    data_size = row_size * h
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(blob: bytes) -> np.ndarray:
    if blob[:2] != b"BM":
        raise MediaError("not a BMP")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", blob, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", blob, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise MediaError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(blob, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    img = rows[:, :, ::-1]  # BGR -> RGB
    if bottom_up:
        img = img[::-1]
    return img.copy()


# ------------------------------- WAV ---------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D float in [-1, 1] (or int16) → RIFF PCM-16 mono WAV."""
    if samples.ndim != 1:
        raise MediaError("encode_wav wants a 1-D array")
    if samples.dtype != np.int16:
        samples = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
        samples = np.round(samples * 32767.0).astype(np.int16)
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """→ (float64 samples in [-1, 1], sample_rate)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise MediaError("not a RIFF/WAVE blob")
    idx = 12
    fmt = None
    while idx + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, idx)
        body = idx + 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", blob, body)
            if audio_fmt != 1 or bits != 16:
                raise MediaError(f"only PCM-16 supported (fmt={audio_fmt}, bits={bits})")
            fmt = (channels, rate)
        elif cid == b"data":
            if fmt is None:
                raise MediaError("data chunk before fmt chunk")
            channels, rate = fmt
            raw = np.frombuffer(blob, dtype="<i2", count=size // 2, offset=body)
            if channels > 1:
                raw = raw.reshape(-1, channels).mean(axis=1)
            return raw.astype(np.float64) / 32767.0, rate
        idx = body + size + (size & 1)
    raise MediaError("no data chunk")


# --------------------------- dispatch + features ---------------------------

def decode_media(blob: bytes, codec: str):
    """codec ∈ {image/ppm, image/bmp, audio/wav} → decoded array(s)."""
    if codec == "image/ppm":
        return decode_ppm(blob)
    if codec == "image/bmp":
        return decode_bmp(blob)
    if codec == "audio/wav":
        return decode_wav(blob)[0]
    raise MediaError(f"unsupported codec {codec!r}")


def image_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic image descriptor: per-channel mean/std (6) + 4×4
    block-mean grayscale grid (16), truncated/cycled to ``dim``."""
    f = img.astype(np.float64) / 255.0
    stats = np.concatenate([f.mean(axis=(0, 1)), f.std(axis=(0, 1))])
    gray = f.mean(axis=2)
    h, w = gray.shape
    gh, gw = max(h // 4, 1), max(w // 4, 1)
    grid = gray[: gh * 4, : gw * 4].reshape(4, gh, 4, gw).mean(axis=(1, 3)).ravel()
    return np.resize(np.concatenate([stats, grid]), dim)


def audio_features(samples: np.ndarray, dim: int = 16) -> np.ndarray:
    """RMS energy over ``dim`` equal-width chunks."""
    n = samples.size
    if n == 0:
        return np.zeros(dim)
    edges = np.linspace(0, n, dim + 1).astype(int)
    sq = np.concatenate([[0.0], np.cumsum(samples * samples)])
    counts = np.maximum(edges[1:] - edges[:-1], 1)
    return np.sqrt((sq[edges[1:]] - sq[edges[:-1]]) / counts)


def media_features(blob: bytes, codec: str, dim: int = 16) -> np.ndarray:
    if codec.startswith("image/"):
        return image_features(decode_media(blob, codec), dim)
    if codec.startswith("audio/"):
        return audio_features(decode_media(blob, codec), dim)
    raise MediaError(f"unsupported codec {codec!r}")
