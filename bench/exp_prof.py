"""Experiment: sub-stage profile at 96k + spectrum kernel v2 prototype
(lane-concat batched stage-1 matmuls). Not shipped."""
import functools
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from jsdr_tpu.demod import bpsk as B
from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.ops.pallas_kernels import (mix_decimate, spectrum_fused,
                                         _SPEC_ROWS)
from jsdr_tpu.ops.spectrum import spectrum_wide
from jsdr_tpu.runtime.tpu import ensure_tpu_ready

def log(*a): print(*a, file=sys.stderr, flush=True)

def timeit(fn, *args, iters=10, tag="", samples=None):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    extra = f" ({samples/dt/1e6:.0f} MS/s)" if samples else ""
    log(f"{tag}: {dt*1000:.2f} ms{extra}")
    return dt


# ---- spectrum kernel v2: stage-1 batched over the 8 rows via lane concat
def _spec_v2_kernel(x_re, x_im, win, w1r, w1i, twr8, twi8, w2r, w2i,
                    psd_ref, *, n1: int, n2: int):
    n = n1 * n2
    prec = lax.Precision.HIGHEST
    cf = np.float32((2.0 / n) ** 2)
    R = _SPEC_ROWS
    a3r = (x_re[...] * win[...]).reshape(R, n1, n2)
    a3i = (x_im[...] * win[...]).reshape(R, n1, n2)
    # concat rows along lanes: [n1, R*n2]
    ar = jnp.concatenate([a3r[r] for r in range(R)], axis=1)
    ai = jnp.concatenate([a3i[r] for r in range(R)], axis=1)
    br = jnp.dot(w1r[...], ar, precision=prec,
                 preferred_element_type=jnp.float32) - \
        jnp.dot(w1i[...], ai, precision=prec,
                preferred_element_type=jnp.float32)
    bi = jnp.dot(w1r[...], ai, precision=prec,
                 preferred_element_type=jnp.float32) + \
        jnp.dot(w1i[...], ar, precision=prec,
                preferred_element_type=jnp.float32)
    # twiddle tiled [n1, R*n2] (host-precomputed)
    cr = br * twr8[...] - bi * twi8[...]
    ci = br * twi8[...] + bi * twr8[...]
    dn = (((1,), (1,)), ((), ()))
    for r in range(R):
        crr = cr[:, r * n2:(r + 1) * n2]
        cir = ci[:, r * n2:(r + 1) * n2]
        dr = lax.dot_general(crr, w2r[...], dn, precision=prec,
                             preferred_element_type=jnp.float32) - \
            lax.dot_general(cir, w2i[...], dn, precision=prec,
                            preferred_element_type=jnp.float32)
        di = lax.dot_general(crr, w2i[...], dn, precision=prec,
                             preferred_element_type=jnp.float32) + \
            lax.dot_general(cir, w2r[...], dn, precision=prec,
                            preferred_element_type=jnp.float32)
        power = (dr * dr + di * di) * cf
        psd_ref[0, r] = 10.0 * jnp.log10(jnp.maximum(power, 1e-30))


@functools.partial(jax.jit, static_argnames=("n", "window"))
def spec_v2(re, im, n, window=True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jsdr_tpu.ops.mxu_fft import _dft_mats, _twiddles
    from jsdr_tpu.ops.windows import hamming_np

    s, t = re.shape
    n2 = 128
    n1 = n // n2
    nblk = t // n
    w1r, w1i = _dft_mats(n1, -1.0)
    twr, twi = _twiddles(n1, n2, -1.0)
    w2r, w2i = _dft_mats(n2, -1.0)
    twr8 = np.tile(twr, (1, _SPEC_ROWS))
    twi8 = np.tile(twi, (1, _SPEC_ROWS))
    win = (hamming_np(n) if window else np.ones(n)).astype(np.float32)
    rows = _SPEC_ROWS
    assert s % rows == 0
    grid = (s // rows, nblk)
    const = lambda z: pl.BlockSpec(z.shape, lambda i, j: (0,) * z.ndim,
                                   memory_space=pltpu.VMEM)
    consts = [jnp.asarray(win[None, :])] + [
        jnp.asarray(z) for z in (w1r, w1i, twr8, twi8, w2r, w2i)]
    kernel = functools.partial(_spec_v2_kernel, n1=n1, n2=n2)
    psd = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[pl.BlockSpec((rows, n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)] * 2
        + [const(z) for z in consts],
        out_specs=pl.BlockSpec((1, rows, n1, n2), lambda i, j: (j, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, s, n1, n2), jnp.float32),
    )(re, im, *consts)
    return psd


def main():
    ensure_tpu_ready(attempts=1)
    log(f"device: {jax.devices()[0]}")
    rate, n_streams, t_len = 96_000, 64, 960_000
    fft_n = 9_600
    samples = n_streams * t_len
    cfg = B.BpskConfig(rate=rate, tuning=12_000.0)
    rng = np.random.default_rng(0)
    sig = (0.3 * (rng.standard_normal((n_streams, t_len))
                  + 1j * rng.standard_normal((n_streams, t_len)))
           ).astype(np.complex64)
    iq = jax.device_put(from_complex(sig))
    states = jax.device_put(B.bpsk_init_batch(cfg, n_streams))
    jax.block_until_ready((iq, states))

    # spectrum: kernel alone vs wide (kernel + argmax/peaks)
    f_kern = jax.jit(lambda r, i: spectrum_fused(CF(r, i), fft_n).sum())
    timeit(f_kern, iq.re, iq.im, tag="spectrum_fused kernel only",
           samples=samples)
    f_wide = jax.jit(lambda r, i: (lambda s: s.psd.sum() + s.peak_db.sum())(
        spectrum_wide(CF(r, i), fft_n, rate=float(rate), natural=False)))
    timeit(f_wide, iq.re, iq.im, tag="spectrum_wide (kernel+peaks)",
           samples=samples)
    f_v2 = jax.jit(lambda r, i: spec_v2(r, i, fft_n).sum())
    timeit(f_v2, iq.re, iq.im, tag="spectrum v2 kernel only",
           samples=samples)
    # v2 equality
    a = np.asarray(jax.jit(lambda r, i: spectrum_fused(CF(r, i), fft_n))(
        iq.re[:8, :fft_n * 4], iq.im[:8, :fft_n * 4]))
    b = np.asarray(spec_v2(iq.re[:8, :fft_n * 4], iq.im[:8, :fft_n * 4],
                           fft_n))
    log(f"v2 max |diff| = {np.abs(a - b).max():.3e}")

    # bpsk: front end alone / post alone / full
    taps = B.DS_FILTER.astype(np.float32)
    tunings = jnp.full((n_streams,), 12000, jnp.int32)

    @jax.jit
    def front(re, im, st):
        cos_pat, sin_pat = B._nco_pattern(st.tu_phase, tunings * B.NU_SCALE, rate)
        ds, tail = mix_decimate(CF(re, im), cos_pat, sin_pat, taps, 10,
                                st.ds_tail, gain=B.HOWARD_FUDGE_FACTOR)
        return ds.re.sum() + ds.im.sum() + tail.re.sum()
    timeit(front, iq.re, iq.im, states, tag="bpsk front (mix+decimate)",
           samples=samples)

    @jax.jit
    def front_ds(re, im, st):
        cos_pat, sin_pat = B._nco_pattern(st.tu_phase, tunings * B.NU_SCALE, rate)
        ds, tail = mix_decimate(CF(re, im), cos_pat, sin_pat, taps, 10,
                                st.ds_tail, gain=B.HOWARD_FUDGE_FACTOR)
        return ds, tail
    ds, _tail = jax.block_until_ready(front_ds(iq.re, iq.im, states))

    @jax.jit
    def post(dsr, dsi, st):
        p = functools.partial(B._bpsk_post, t_len=t_len, max_hits=4,
                              compat_scan=False)
        out, ns = jax.vmap(p)(CF(dsr, dsi), st, st.tu_phase, st.ds_tail,
                              st.fft_tuner)
        return (out.windows.astype(jnp.int32).sum() + out.n_bits.sum()
                + out.n_hits.sum())
    timeit(post, ds.re, ds.im, states, tag="bpsk post (vco+mf+timing+sync)",
           samples=samples)

    @jax.jit
    def full(re, im, st):
        out, ns = B.bpsk_block_batch(CF(re, im), cfg, st, None)
        return (out.windows.astype(jnp.int32).sum() + out.hit_corr.sum()
                + out.n_hits.sum() + out.n_bits.sum())
    timeit(full, iq.re, iq.im, states, tag="bpsk full chain",
           samples=samples)


if __name__ == "__main__":
    main()
