"""Round-3b: DMA/compute overlap + int16-native input experiments.

  par    read pattern with dimension_semantics=(parallel, arbitrary)
  i16    int16 planes read + in-kernel convert (half the input bytes)
  comp   compute-only floor: the FFT math on a VMEM-resident block
         (no streamed input) — what the spectrum costs with DMA removed
  spar   shipped spectrum math + parallel dimension semantics
"""
import functools
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jsdr_tpu.ops.cplx import CF
from jsdr_tpu.ops.pallas_kernels import _EPS, _SPEC_ROWS, _make_spec_dot
from jsdr_tpu.ops.mxu_fft import _dft_mats, _twiddles
from jsdr_tpu.ops.windows import hamming_np
from jsdr_tpu.runtime.tpu import ensure_tpu_ready

def log(*a): print(*a, file=sys.stderr, flush=True)

def timeit(fn, *args, iters=10, tag="", gb=None, samples=None):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    extra = f" ({gb/dt:.0f} GB/s)" if gb else ""
    if samples:
        extra += f" ({samples/dt/1e6:.0f} MS/s)"
    log(f"{tag}: {dt*1000:.2f} ms{extra}")
    return dt


def _sum_kernel(xr, xi, o):
    o[...] = (xr[:, :128].astype(jnp.float32)
              + xi[:, :128].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("rows", "span", "sem"))
def read_pat(re, im, rows, span, sem):
    s, t = re.shape
    grid = (s // rows, t // span)
    cp = (pltpu.CompilerParams(dimension_semantics=sem) if sem else None)
    o = pl.pallas_call(
        _sum_kernel, grid=grid,
        in_specs=[pl.BlockSpec((rows, span), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, 128), jnp.float32),
        compiler_params=cp,
    )(re, im)
    return o.sum()


def _spec_math(ar, ai, win, w1r, w1s1, w1s2, twr, twi, w2r, w2s1, w2s2,
               n1, n2, q):
    n = n1 * n2
    dot = _make_spec_dot("bf16x3")
    cf = np.float32((2.0 / n) ** 2)
    dn = (((1,), (1,)), ((), ()))
    t0 = dot(w1r, ar + ai)
    br = t0 - dot(w1s1, ai)
    bi = t0 + dot(w1s2, ar)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    t0 = dot(cr + ci, w2r, dn)
    dr = t0 - dot(ci, w2s1, dn)
    di = t0 + dot(cr, w2s2, dn)
    power = (dr * dr + di * di) * cf
    g = n1 // q
    dec = jnp.max(power.reshape(g, q, n2), axis=1)
    out = 10.0 * jnp.log10(jnp.maximum(dec, _EPS))
    col_max = jnp.max(power, axis=0)
    col_arg = jnp.argmax(power, axis=0).astype(jnp.int32)
    mx_raw = jnp.max(col_max)
    mx = 10.0 * jnp.log10(jnp.maximum(mx_raw, _EPS))
    lane = lax.broadcasted_iota(jnp.int32, (1, n2), 1)[0]
    cand = jnp.where(col_max == mx_raw, col_arg * n2 + lane,
                     jnp.int32(n1 * n2))
    return out, mx, jnp.min(cand)


def _mk_spec_kernel(n1, n2, q, streamed, i16):
    def kern(x_re, x_im, win, w1r, w1i, w1s1, w1s2, twr, twi,
             w2r, w2i, w2s1, w2s2, wf_ref, mx_ref, idx_ref):
        R = _SPEC_ROWS
        n = n1 * n2
        xr = x_re[...]
        xi = x_im[...]
        if i16:
            xr = xr.astype(jnp.float32) * np.float32(1 / 32767.0)
            xi = xi.astype(jnp.float32) * np.float32(1 / 32767.0)
        if not streamed:   # compute floor: block is resident, ignore j
            xr = jnp.broadcast_to(xr[:, :n], (R, n))
            xi = jnp.broadcast_to(xi[:, :n], (R, n))
        a3r = (xr * win[...]).reshape(R, n1, n2)
        a3i = (xi * win[...]).reshape(R, n1, n2)
        for r in range(R):
            out, mx, cand = _spec_math(
                a3r[r], a3i[r], win[...], w1r[...], w1s1[...], w1s2[...],
                twr[...], twi[...], w2r[...], w2s1[...], w2s2[...],
                n1, n2, q)
            wf_ref[0, r] = out
            mx_ref[0, r] = jnp.full((128,), mx, jnp.float32)
            idx_ref[0, r] = jnp.full((128,), cand, jnp.int32)
    return kern


@functools.partial(jax.jit, static_argnames=("n", "q", "sem", "streamed",
                                             "i16", "nblk_override"))
def spec_v(re, im, n, q, sem, streamed=True, i16=False, nblk_override=0):
    s, t = re.shape
    n2 = 128
    n1 = n // n2
    nblk = nblk_override or (t // n)
    w1r, w1i = _dft_mats(n1, -1.0)
    twr, twi = _twiddles(n1, n2, -1.0)
    w2r, w2i = _dft_mats(n2, -1.0)
    f64 = np.float64
    w1s1 = (w1r.astype(f64) + w1i.astype(f64)).astype(np.float32)
    w1s2 = (w1i.astype(f64) - w1r.astype(f64)).astype(np.float32)
    w2s1 = (w2r.astype(f64) + w2i.astype(f64)).astype(np.float32)
    w2s2 = (w2i.astype(f64) - w2r.astype(f64)).astype(np.float32)
    win = hamming_np(n).astype(np.float32)
    rows = _SPEC_ROWS
    const = lambda z: pl.BlockSpec(z.shape, lambda i, j: (0,) * z.ndim,
                                   memory_space=pltpu.VMEM)
    consts = [jnp.asarray(win[None, :])] + [
        jnp.asarray(z) for z in (w1r, w1i, w1s1, w1s2, twr, twi,
                                 w2r, w2i, w2s1, w2s2)]
    kernel = _mk_spec_kernel(n1, n2, q, streamed, i16)
    cp = (pltpu.CompilerParams(dimension_semantics=sem) if sem else None)
    if streamed:
        in_ix = lambda i, j: (i, j)
    else:
        in_ix = lambda i, j: (i, 0)
    wf, mx, idx = pl.pallas_call(
        kernel,
        grid=(s // rows, nblk),
        in_specs=[pl.BlockSpec((rows, n), in_ix,
                               memory_space=pltpu.VMEM)] * 2
        + [const(z) for z in consts],
        out_specs=[
            pl.BlockSpec((1, rows, n1 // q, n2), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk, s, n1 // q, n2), jnp.float32),
            jax.ShapeDtypeStruct((nblk, s, 128), jnp.float32),
            jax.ShapeDtypeStruct((nblk, s, 128), jnp.int32),
        ],
        compiler_params=cp,
    )(re, im, *consts)
    return wf.sum() + mx.sum() + idx.sum()


def main():
    ensure_tpu_ready(attempts=1)
    log(f"device: {jax.devices()[0]}")
    n_streams, t_len, fft_n = 64, 960_000, 9_600
    samples = n_streams * t_len
    gb = samples * 4 * 2 / 1e9
    rng = np.random.default_rng(0)
    re = jax.device_put(rng.standard_normal(
        (n_streams, t_len)).astype(np.float32))
    im = jax.device_put(rng.standard_normal(
        (n_streams, t_len)).astype(np.float32))
    re16 = jax.device_put((np.asarray(re) * 32767).astype(np.int16))
    im16 = jax.device_put((np.asarray(im) * 32767).astype(np.int16))
    jax.block_until_ready((re, im, re16, im16))

    P = pltpu.GridDimensionSemantics.PARALLEL if hasattr(
        pltpu.GridDimensionSemantics, "PARALLEL") else "parallel"
    A = "arbitrary"
    for sem, tag in [(None, "default"), (("parallel", "arbitrary"), "par/arb"),
                     (("parallel", "parallel"), "par/par")]:
        try:
            timeit(functools.partial(read_pat, rows=8, span=9600, sem=sem),
                   re, im, tag=f"read f32 {tag}", gb=gb)
        except Exception as e:
            log(f"read f32 {tag}: FAILED {repr(e)[:150]}")
    try:
        timeit(functools.partial(read_pat, rows=8, span=9600, sem=None),
               re16, im16, tag="read i16 default", gb=gb / 2)
    except Exception as e:
        log(f"read i16: FAILED {repr(e)[:300]}")

    for streamed, i16, sem, tag in [
            (True, False, None, "spec f32 default"),
            (True, False, ("parallel", "arbitrary"), "spec f32 par/arb"),
            (False, False, None, "spec COMPUTE floor"),
            (True, True, None, "spec i16 default"),
            (True, True, ("parallel", "arbitrary"), "spec i16 par/arb")]:
        r, i = (re16, im16) if i16 else (re, im)
        try:
            timeit(functools.partial(spec_v, n=fft_n, q=5, sem=sem,
                                     streamed=streamed, i16=i16),
                   r, i, tag=tag, samples=samples)
        except Exception as e:
            log(f"{tag}: FAILED {repr(e)[:300]}")


if __name__ == "__main__":
    main()
