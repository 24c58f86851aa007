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
