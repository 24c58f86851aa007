"""Signal sources: file readers (raw S16LE / WAV) with the reference's
loop-at-EOF semantics (JavaAudio.java:252-256), and synthetic generators
(the TPU framework's equivalent of fir.java's noise/sine/NCO testbench
plus a full BPSK telemetry modulator for closed-loop decode tests).
"""

from __future__ import annotations

import struct
import wave
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from ..fec.ref_numpy import encode_fec40
from .convert import s16le_to_complex


class FileSource:
    """Streams complex64 IQ blocks from a raw S16LE, WAV, or FLAC file.

    ``loop=True`` rewinds at EOF like the reference's file sources. WAV
    files are parsed with the stdlib reader (16-bit PCM only). FLAC is
    decoded by the in-tree codec (io/flac.py, native fast path) — the
    analog of the reference's transparent jflac javax SPI ingestion
    (Makefile:9-10, JavaAudio.java:369-395).
    """

    def __init__(self, path: str | Path, rate: int = 96000, channels: int = 2,
                 i_corr: int = 0, q_corr: int = 0, loop: bool = False):
        self.path = Path(path)
        self.channels = channels
        self.rate = rate
        self.i_corr = i_corr
        self.q_corr = q_corr
        self.loop = loop
        if self.path.suffix.lower() == ".wav":
            with wave.open(str(self.path), "rb") as w:
                assert w.getsampwidth() == 2, "only 16-bit PCM WAV supported"
                self.channels = w.getnchannels()
                self.rate = w.getframerate()
                self._data = np.frombuffer(
                    w.readframes(w.getnframes()), dtype="<i2")
        elif self.path.suffix.lower() == ".flac":
            from .flac import read_flac
            samples, rate, bps = read_flac(self.path)
            self.channels = samples.shape[1]
            self.rate = rate
            shift = max(bps - 16, 0)     # normalize to 16-bit full scale
            self._data = (samples >> shift).astype(np.int16).reshape(-1)
        else:
            self._data = np.fromfile(self.path, dtype="<i2")

    def blocks(self, block_samples: int) -> Iterator[np.ndarray]:
        """Yield complex64 blocks of ``block_samples`` IQ samples."""
        vals_per_sample = self.channels
        n = block_samples * vals_per_sample
        pos = 0
        data = self._data
        while True:
            if pos + n > len(data):
                if not self.loop:
                    return
                pos = 0
            chunk = data[pos:pos + n]
            pos += n
            yield s16le_to_complex(chunk, self.channels, self.i_corr, self.q_corr)

    def raw_blocks(self, block_samples: int) -> Iterator[np.ndarray]:
        """Yield raw interleaved int16 blocks (no conversion) — the
        pre-conversion capture stream for device-side convert sessions
        and raw record taps (JavaAudio.java:261-265)."""
        n = block_samples * self.channels
        pos = 0
        data = self._data
        while True:
            if pos + n > len(data):
                if not self.loop:
                    return
                pos = 0
            yield data[pos:pos + n]
            pos += n

    def all(self) -> np.ndarray:
        return s16le_to_complex(self._data, self.channels, self.i_corr, self.q_corr)


def open_source(name: str, **kw) -> FileSource:
    """Open ``file:<path>`` source names (jsdr.java:256-265 CLI style)."""
    if name.startswith("file:"):
        name = name[5:]
    return FileSource(name, **kw)


def synth_sine(n: int, freq: float, rate: float, amplitude: float = 0.5,
               analytic: bool = True, phase0: float = 0.0) -> np.ndarray:
    """Complex tone (analytic) or real tone in I with Q=0 (like the
    sine4410 fixtures, which show mirrored +/- lines)."""
    t = np.arange(n, dtype=np.float64)
    ang = 2 * np.pi * freq * t / rate + phase0
    i = amplitude * np.cos(ang)
    q = amplitude * np.sin(ang) if analytic else np.zeros_like(i)
    return (i + 1j * q).astype(np.complex64)


def synth_noise(n: int, amplitude: float = 0.25,
                seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (amplitude * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
            ).astype(np.complex64)


def synth_bpsk_stream(payloads: np.ndarray, rate: int = 96000,
                      carrier_offset: float = 12000.0,
                      amplitude: float = 0.8,
                      preamble_bits: int = 600,
                      tail_bits: int = 16,
                      noise_rms: float = 0.0,
                      seed: int = 0,
                      phase0: float = 0.3) -> np.ndarray:
    """Modulate AO-40 frames as the FUNcube downlink would appear in an
    IQ capture: differential BPSK at 1200 bps (symbol 1 = no phase flip,
    matching the demodulator's decision di<0 at
    FUNcubeBPSKDemod.java:539-546), 1200 Hz baseband carrier, shifted to
    ``carrier_offset`` — i.e. an analytic tone at offset+1200 Hz, BPSK
    modulated, at the input rate.

    payloads: [F, 256] uint8. Returns complex64 [T].
    """
    payloads = np.atleast_2d(np.asarray(payloads, dtype=np.uint8))
    rng = np.random.default_rng(seed)
    sym = np.concatenate([
        rng.integers(0, 2, preamble_bits),
        np.concatenate([encode_fec40(p) for p in payloads]),
        rng.integers(0, 2, tail_bits),
    ]).astype(np.int8)
    # differential: d_k = d_{k-1} * (+1 if sym else -1)
    flips = np.where(sym > 0, 1, -1)
    d = np.cumprod(flips).astype(np.float64)
    sps = rate // 1200                      # input samples per bit
    m = np.repeat(d, sps)                   # ZOH pulse shaping
    t = np.arange(m.shape[0], dtype=np.float64)
    ang = 2 * np.pi * (carrier_offset + 1200.0) * t / rate + phase0
    sig = amplitude * m * np.exp(1j * ang)
    if noise_rms > 0:
        sig = sig + noise_rms * (rng.standard_normal(len(t)) +
                                 1j * rng.standard_normal(len(t)))
    return sig.astype(np.complex64)
