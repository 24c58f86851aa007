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


def render_phase_png(path: str | Path, points: np.ndarray,
                     i_trace: np.ndarray, q_trace: np.ndarray,
                     size: int = 256) -> None:
    """Phase-scope image: constellation dot cloud (top square) over the
    column-averaged I and Q time traces (bottom strip) — the headless
    analog of phase.java:43-121's paint."""
    img = np.zeros((size + size // 2, size), np.uint8)
    pts = np.asarray(points)
    px = np.clip(((pts[:, 0] + 1) * 0.5 * (size - 1)).astype(int), 0, size - 1)
    py = np.clip(((1 - pts[:, 1]) * 0.5 * (size - 1)).astype(int), 0, size - 1)
    img[py, px] = 255
    img[size // 2, :] = np.maximum(img[size // 2, :], 48)      # axes
    img[:size, size // 2] = np.maximum(img[:size, size // 2], 48)
    h2, y0 = size // 2, size
    for name, tr, shade in (("i", i_trace, 255), ("q", q_trace, 160)):
        tr = np.asarray(tr)
        xs = np.clip((np.arange(len(tr)) * size) // max(len(tr), 1),
                     0, size - 1)
        ys = np.clip(y0 + ((1 - tr) * 0.5 * (h2 - 1)).astype(int),
                     y0, y0 + h2 - 1)
        img[ys, xs] = shade
    img[y0 + h2 // 2, :] = np.maximum(img[y0 + h2 // 2, :], 48)
    write_png_gray(path, img)


def render_trace_ascii(trace: np.ndarray, width: int = 100,
                       height: int = 12) -> str:
    """ASCII line plot of a -1..1 trace (terminal phase-scope strip)."""
    tr = np.asarray(trace)
    step = max(len(tr) // width, 1)
    cols = [tr[i * step:(i + 1) * step].mean()
            for i in range(min(width, len(tr) // step))]
    rows = []
    for r in range(height):
        hi = 1.0 - 2.0 * r / height
        lo = 1.0 - 2.0 * (r + 1) / height
        rows.append("".join("*" if lo <= c < hi else
                            ("-" if lo <= 0 < hi else " ") for c in cols))
    return "\n".join(rows)
