"""PNG image I/O (reference: Misha/PNG.inl PNGReadColor/PNGWriteColor).

Reads any PNG as 8-bit RGB; writes 8-bit RGB. Uses PIL when available and a
pure zlib fallback for writing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:
    from PIL import Image

    _HAVE_PIL = True
except ImportError:  # pragma: no cover
    _HAVE_PIL = False


def read_png_rgb(path: str) -> np.ndarray:
    """Read a PNG as (H, W, 3) uint8 (forces 8-bit RGB like PNG.inl:10-79)."""
    if not _HAVE_PIL:
        raise RuntimeError("PNG reading requires PIL")
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def write_png_rgb(path: str, pixels: np.ndarray) -> None:
    """Write an (H, W, 3) array as 8-bit RGB PNG; float inputs are clamped
    to [0, 255] and truncated like the reference (OpticalFlow.cpp:112-123)."""
    pixels = np.asarray(pixels)
    if pixels.dtype != np.uint8:
        pixels = np.clip(pixels, 0, 255).astype(np.uint8)
    if _HAVE_PIL:
        Image.fromarray(pixels, "RGB").save(path)
        return
    h, w, _ = pixels.shape  # pragma: no cover - zlib fallback
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))
