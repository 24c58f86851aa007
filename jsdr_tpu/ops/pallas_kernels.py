"""Pallas TPU kernels for the display/observability hot path.

``psd_waterfall``: fused |X|^2 -> dBFS -> max-decimate -> waterfall
intensity. The unfused pipeline (ops.spectrum.psd_dbfs + host-side
display reduction) makes four passes over the spectrum and ships the
full-resolution PSD to the host; this kernel reads the spectrum once in
VMEM and emits both the dB PSD and the 8-bit display line, so only
width-sized lines leave the device for rendering.

Every kernel has a pure-jnp reference implementation used as fallback
(and as the correctness oracle in tests; the kernel also runs under
``interpret=True`` on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import CF, as_cf

_EPS = 1e-30
_INTENSITY = -2.55  # waterfall.java:92: 255 - psd * -2.55


def _psd_waterfall_ref(re: jnp.ndarray, im: jnp.ndarray, width: int):
    """jnp reference: [B, N] spectrum halves -> (psd_db [B, N],
    line [B, width] uint8)."""
    n = re.shape[-1]
    cf = (2.0 / n) ** 2
    power = (re * re + im * im) * cf
    db = 10.0 * jnp.log10(jnp.maximum(power, _EPS))
    step = n // width
    dec = jnp.max(db.reshape(*db.shape[:-1], width, step), axis=-1)
    inten = jnp.clip(255.0 - dec * _INTENSITY, 0.0, 255.0).astype(jnp.uint8)
    # centered frequency order (0 Hz mid-screen, waterfall.java:96-106)
    line = jnp.roll(inten, width // 2, axis=-1)
    return db, line


def _psd_waterfall_kernel(re_ref, im_ref, db_ref, line_ref, *, width: int):
    from jax.experimental import pallas as pl  # noqa: F401

    n = re_ref.shape[-1]
    cf = (2.0 / n) ** 2
    re = re_ref[...]
    im = im_ref[...]
    power = (re * re + im * im) * cf
    db = 10.0 * jnp.log10(jnp.maximum(power, _EPS))
    db_ref[...] = db
    step = n // width
    dec = jnp.max(db.reshape(db.shape[0], width, step), axis=-1)
    inten = jnp.clip(255.0 - dec * _INTENSITY, 0.0, 255.0)
    # centered order without jnp.roll (concat of the two halves)
    half = width // 2
    line_ref[...] = jnp.concatenate(
        [inten[:, half:], inten[:, :half]], axis=-1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("width", "use_pallas", "interpret"))
def _psd_waterfall_jit(re, im, width, use_pallas, interpret):
    b, n = re.shape
    if not use_pallas:
        return _psd_waterfall_ref(re, im, width)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = 8  # rows per grid step (f32 sublane tile)
    grid = ((b + rows - 1) // rows,)
    kernel = functools.partial(_psd_waterfall_kernel, width=width)
    db, line_f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n), jnp.float32),
            jax.ShapeDtypeStruct((b, width), jnp.float32),
        ],
        interpret=interpret,
    )(re, im)
    return db, line_f.astype(jnp.uint8)


def psd_waterfall(spec, width: int = 960,
                  use_pallas: bool = True, interpret: bool = False):
    """[B, N] spectrum (CF pair or complex) -> (psd_db [B, N] f32,
    line [B, width] u8). ``width`` must divide N."""
    spec = as_cf(spec)
    assert spec.shape[-1] % width == 0, "width must divide the FFT size"
    return _psd_waterfall_jit(spec.re.astype(jnp.float32),
                              spec.im.astype(jnp.float32),
                              width, use_pallas, interpret)


# ---------------------------------------------------------------------------
# Fused wide-layout spectrum: window + matmul FFT + dBFS PSD in one kernel.
#
# The streaming pipeline keeps IQ as [S, T] (time contiguous per stream);
# the spectrum wants [S*T/n, n] blocks. On TPU that reshape is a (8, 128)
# tile re-shuffle that XLA lowers at ~1/8 of HBM bandwidth — measured
# 14 ms extra on the 61 M-sample bench step. This kernel reads the wide
# rows directly (each n-sample block is a contiguous lane run), does the
# whole two-stage Cooley-Tukey FFT (n = n1 x 128) on the MXU in VMEM,
# and writes dB PSD in natural frequency order. One HBM read, one write.
# ---------------------------------------------------------------------------

_SPEC_ROWS = 8  # streams per grid step (f32 sublane tile)


def _spectrum_fused_kernel(x_re, x_im, win, w1r, w1i, twr, twi, w2r, w2i,
                           psd_ref, *, n1: int, n2: int):
    import jax.lax as lax

    n = n1 * n2
    prec = lax.Precision.HIGHEST
    cf = np.float32((2.0 / n) ** 2)
    # lane -> (sublane, lane) split at the 128 boundary is a supported
    # Mosaic relayout; transpose+flatten back to natural frequency order
    # is NOT, so the PSD is emitted in [k1, k2] (permuted) order and
    # callers recover natural indices as n1*k2 + k1.
    a3r = (x_re[...] * win[...]).reshape(_SPEC_ROWS, n1, n2)
    a3i = (x_im[...] * win[...]).reshape(_SPEC_ROWS, n1, n2)
    for r in range(_SPEC_ROWS):
        ar = a3r[r]
        ai = a3i[r]
        # stage 1: B = W1 @ A   [n1, n1] @ [n1, n2]
        br = jnp.dot(w1r[...], ar, precision=prec,
                     preferred_element_type=jnp.float32) - \
            jnp.dot(w1i[...], ai, precision=prec,
                    preferred_element_type=jnp.float32)
        bi = jnp.dot(w1r[...], ai, precision=prec,
                     preferred_element_type=jnp.float32) + \
            jnp.dot(w1i[...], ar, precision=prec,
                    preferred_element_type=jnp.float32)
        # twiddle [k1, n2]
        cr = br * twr[...] - bi * twi[...]
        ci = br * twi[...] + bi * twr[...]
        # stage 2: D[k1, k2] = sum_n2 C[k1, n2] W2[k2, n2]
        dn = (((1,), (1,)), ((), ()))
        dr = lax.dot_general(cr, w2r[...], dn, precision=prec,
                             preferred_element_type=jnp.float32) - \
            lax.dot_general(ci, w2i[...], dn, precision=prec,
                            preferred_element_type=jnp.float32)
        di = lax.dot_general(cr, w2i[...], dn, precision=prec,
                             preferred_element_type=jnp.float32) + \
            lax.dot_general(ci, w2r[...], dn, precision=prec,
                            preferred_element_type=jnp.float32)
        power = (dr * dr + di * di) * cf
        psd_ref[0, r] = 10.0 * jnp.log10(jnp.maximum(power, _EPS))


@functools.partial(jax.jit,
                   static_argnames=("n", "window", "interpret"))
def _spectrum_fused_jit(re, im, n, window, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .mxu_fft import _dft_mats, _twiddles
    from .windows import hamming_np

    s, t = re.shape
    n2 = 128
    n1 = n // n2
    nblk = t // n
    w1r, w1i = _dft_mats(n1, -1.0)
    twr, twi = _twiddles(n1, n2, -1.0)
    w2r, w2i = _dft_mats(n2, -1.0)
    win = (hamming_np(n) if window else np.ones(n)).astype(np.float32)

    rows = _SPEC_ROWS
    pad_s = -s % rows
    if pad_s:
        zp = jnp.zeros((pad_s, t), re.dtype)
        re = jnp.concatenate([re, zp])
        im = jnp.concatenate([im, zp])
    sp = s + pad_s

    grid = (sp // rows, nblk)
    const = lambda z: pl.BlockSpec(z.shape, lambda i, j: (0,) * z.ndim,
                                   memory_space=pltpu.VMEM)
    consts = [jnp.asarray(win[None, :])] + [
        jnp.asarray(z) for z in (w1r, w1i, twr, twi, w2r, w2i)]
    kernel = functools.partial(_spectrum_fused_kernel, n1=n1, n2=n2)
    psd = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ] + [const(z) for z in consts],
        out_specs=pl.BlockSpec((1, rows, n1, n2), lambda i, j: (j, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, sp, n1, n2), jnp.float32),
        interpret=interpret,
    )(re, im, *consts)
    return psd[:, :s]   # [nblk, S, k1, k2] permuted order


def spectrum_fused(iq, n: int, window: bool = True,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused window+FFT+PSD over contiguous time rows.

    iq: CF (or complex) [S, T] with T % n == 0 and n % 128 == 0.
    Returns dB PSD as [T//n, S, n1, 128] in PERMUTED frequency order:
    element [..., k1, k2] is natural frequency bin n1*k2 + k1 (the raw
    two-stage Cooley-Tukey output order; Mosaic cannot flatten the
    digit-reversal in-kernel). Use :func:`spectrum_natural_order` or
    index arithmetic to recover natural bins — peak search and display
    decimation work directly on the permuted layout.
    """
    iq = as_cf(iq)
    s, t = iq.shape
    assert t % n == 0 and n % 128 == 0 and n // 128 <= 512
    return _spectrum_fused_jit(iq.re.astype(jnp.float32),
                               iq.im.astype(jnp.float32),
                               n, window, interpret)


def spectrum_natural_order(psd_perm: jnp.ndarray) -> jnp.ndarray:
    """[nblk, S, n1, n2] permuted PSD -> [S, nblk, n] natural order
    (one XLA transpose — use only on display/compat paths)."""
    nblk, s, n1, n2 = psd_perm.shape
    return jnp.transpose(psd_perm, (1, 0, 3, 2)).reshape(s, nblk, n1 * n2)
