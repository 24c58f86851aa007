"""Minimal dependency-free renderers: PNG (pure-python zlib encoder) for
waterfalls, ASCII PSD plots for terminals — replaces the Swing paint
paths for a headless TPU host."""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    c = tag + data
    return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))


def write_png_gray(path: str | Path, img: np.ndarray) -> None:
    """8-bit grayscale PNG writer (stdlib only)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    out = (b"\x89PNG\r\n\x1a\n"
           + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
           + _png_chunk(b"IDAT", zlib.compress(raw, 6))
           + _png_chunk(b"IEND", b""))
    Path(path).write_bytes(out)


def render_waterfall_png(path: str | Path, waterfall_buf: np.ndarray) -> None:
    write_png_gray(path, waterfall_buf)


def render_psd_ascii(psd: np.ndarray, width: int = 100, height: int = 20,
                     db_lo: float = -100.0, db_hi: float = 0.0) -> str:
    """Centered-spectrum ASCII plot (0 Hz mid-screen like fft.java)."""
    psd = np.asarray(psd)
    n = len(psd)
    psd_c = np.roll(psd, n // 2)
    step = max(n // width, 1)
    cols = [psd_c[i * step:(i + 1) * step].max()
            for i in range(min(width, n // step))]
    rows = []
    for r in range(height):
        thresh = db_hi - (r + 1) * (db_hi - db_lo) / height
        rows.append("".join("#" if c >= thresh else " " for c in cols))
    return "\n".join(rows)
