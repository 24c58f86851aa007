"""Batched FFT spectrum / PSD — the TPU replacement for fft.java.

The reference transforms each 0.1 s block with JTransforms and computes a
dBFS PSD plus the spectral maximum per block (fft.java:190-228). Here
blocks are batched [B, N] planar pairs (:mod:`jsdr_tpu.ops.cplx`), the
transform is the MXU matmul FFT (:mod:`jsdr_tpu.ops.mxu_fft` — no
complex HLO), and the whole thing is one fused XLA graph.

PSD convention (fft.java:197-207, after pysdr.org):
    psd = 10*log10((re^2 + im^2) * (2/N)^2)
Frequency convention for the argmax (fft.java:208-221): bin p maps to
+p*rate/N for p < N/2 and (p - N)*rate/N above.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .cplx import CF, as_cf
from .mxu_fft import fft_cf
from .windows import hamming

_EPS = 1e-30  # avoid log(0); reference happily takes -inf


def bin_to_hz(signed_bin: jnp.ndarray, rate: int, n: int) -> jnp.ndarray:
    """floor(signed_bin * rate / n) without int32 overflow.

    The naive ``signed * rate // n`` wraps for large transforms
    (n=192000 at 96 kS/s puts |bin*rate| ~ 2.4e9 past int32); reduce by
    gcd, then split the division: for a = q*n' + s (0 <= s < n'),
    floor(a*r'/n') = q*r' + floor(s*r'/n') — every product stays within
    int32 for any realistic rate/n pair. Keeps the reference's integer
    truncation convention (fft.java:215-220)."""
    import math
    g = math.gcd(int(rate), int(n))
    r, m = int(rate) // g, int(n) // g
    if m == 1:
        return signed_bin * r
    q = signed_bin // m
    s = signed_bin % m          # nonneg for positive m (floor semantics)
    return q * r + (s * r) // m


class SpectrumResult(NamedTuple):
    psd: jnp.ndarray       # [..., N] dBFS
    peak_freq: jnp.ndarray  # [...] Hz (signed)
    peak_db: jnp.ndarray    # [...]


def psd_dbfs(spec: CF) -> jnp.ndarray:
    """Planar spectrum -> dBFS PSD with the (2/N)^2 correction."""
    n = spec.shape[-1]
    cf = (2.0 / n) ** 2
    power = spec.abs2() * cf
    return 10.0 * jnp.log10(jnp.maximum(power, _EPS))


def spectrum_block(iq, rate: float, window: bool = True) -> SpectrumResult:
    """Windowed FFT + PSD + peak search over [..., N] blocks.

    ``iq``: CF pair (or host numpy complex, converted). ``window=False``
    reproduces the reference's quirk of computing but never applying the
    Hamming window (fft.java:71-73 vs :193).
    """
    iq = as_cf(iq)
    n = iq.shape[-1]
    x = iq * hamming(n) if window else iq
    spec = fft_cf(x)
    psd = psd_dbfs(spec)
    p = jnp.argmax(psd, axis=-1)
    peak_db = jnp.max(psd, axis=-1)     # == psd[argmax], gather-free
    signed = jnp.where(p < n // 2, p, p - n)
    # integer truncation parity with fft.java:215-220 (int arithmetic)
    peak_freq = bin_to_hz(signed, int(rate), n)
    return SpectrumResult(psd, peak_freq.astype(jnp.int32), peak_db)


def spectrum_wide(iq, n: int, rate: float, window: bool = True,
                  natural: bool = True,
                  interpret: bool | None = None) -> SpectrumResult:
    """Spectrum over contiguous [S, T] stream rows, n samples per block.

    Avoids the [S, T] -> [S*T/n, n] device reshape (an expensive TPU
    tile re-shuffle) by computing window+FFT+PSD inside one Pallas
    kernel that reads the wide rows directly
    (:func:`jsdr_tpu.ops.pallas_kernels.spectrum_fused`). Falls back to
    reshape + :func:`spectrum_block` when n doesn't fit the kernel
    (n % 128 != 0 or n1 > 512). Results have leading shape [S, T//n].

    ``natural=False`` keeps the PSD in the kernel's permuted layout
    [T//n, S, n1, 128] (natural bin = n1*k2 + k1), skipping one
    relayout — peaks are always in natural (signed-Hz) convention.
    """
    from .pallas_kernels import spectrum_fused, spectrum_natural_order

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    iq = as_cf(iq)
    s, t = iq.shape
    assert t % n == 0
    if n % 128 != 0 or n // 128 > 512:
        return spectrum_block(iq.reshape(s, t // n, n), rate=rate,
                              window=window)
    psd_perm, peak_db, p = spectrum_fused(iq, n, window=window,
                                          interpret=interpret,
                                          with_peaks=True)
    nblk, _, n1, n2 = psd_perm.shape
    k_nat = n1 * (p % n2) + p // n2
    signed = jnp.where(k_nat < n // 2, k_nat, k_nat - n)
    peak_freq = bin_to_hz(signed, int(rate), n).astype(jnp.int32)
    psd = spectrum_natural_order(psd_perm) if natural else psd_perm
    return SpectrumResult(psd, jnp.swapaxes(peak_freq, 0, 1),
                          jnp.swapaxes(peak_db, 0, 1))


@jax.jit
def waterfall_intensity(psd: jnp.ndarray) -> jnp.ndarray:
    """Map dBFS PSD lines to 0..255 intensity as the waterfall display does
    (waterfall.java:90-107: 255 - psd * -2.55, clamped)."""
    f = 255.0 - psd * -2.55
    return jnp.clip(f, 0.0, 255.0).astype(jnp.uint8)


def psd_with_maxima(res: SpectrumResult) -> jnp.ndarray:
    """Pack PSD lines in the reference's publish convention: the PSD
    followed by two trailing floats [peak_freq, peak_db]
    (fft.java:222-226, consumed by waterfall.java:28-36)."""
    extras = jnp.stack([res.peak_freq.astype(res.psd.dtype),
                        res.peak_db.astype(res.psd.dtype)], axis=-1)
    return jnp.concatenate([res.psd, extras], axis=-1)
