"""Round-3: row-batched spectrum kernel variants.

v0: shipped kernel (per-row python loop: 6 dots x 8 rows per block)
v1: stage-2 batched across rows via the free [8,75,128]->[600,128]
    sublane-merge reshape; twiddle/power/log/peaks row-batched
v2: stage-1 ALSO batched via a rank-3 dot_general
    (W1[k1,j1] x A[r,j1,j2] -> [k1,r,j2])
"""
import functools
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.ops.pallas_kernels import (_EPS, _SPEC_ROWS, _make_spec_dot,
                                         spectrum_waterfall)
from jsdr_tpu.ops.mxu_fft import _dft_mats, _twiddles
from jsdr_tpu.ops.windows import hamming_np
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


def _v1_kernel(x_re, x_im, win, w1r, w1i, w1s1, w1s2, twr, twi,
               w2r, w2i, w2s1, w2s2, wf_ref, mx_ref, idx_ref, *,
               n1, n2, q, stage1_dg: bool):
    R = _SPEC_ROWS
    n = n1 * n2
    dot = _make_spec_dot("bf16x3")
    cf = np.float32((2.0 / n) ** 2)
    a3r = (x_re[...] * win[...]).reshape(R, n1, n2)
    a3i = (x_im[...] * win[...]).reshape(R, n1, n2)
    if stage1_dg:
        # one rank-3 contraction per product: [n1,n1] x [R,n1,n2]
        dg = (((1,), (1,)), ((), ()))
        t0 = dot(w1r[...], a3r + a3i, dg)       # [n1, R, n2]
        br = t0 - dot(w1s1[...], a3i, dg)
        bi = t0 + dot(w1s2[...], a3r, dg)
        # twiddle broadcast over the row dim
        cr = br * twr[...][:, None, :] - bi * twi[...][:, None, :]
        ci = br * twi[...][:, None, :] + bi * twr[...][:, None, :]
        # stage2 over lanes: [n1, R, n2] x [n2, n2]
        dg2 = (((2,), (1,)), ((), ()))
        t0 = dot(cr + ci, w2r[...], dg2)
        dr = t0 - dot(ci, w2s1[...], dg2)
        di = t0 + dot(cr, w2s2[...], dg2)       # [n1, R, n2]
        power = (dr * dr + di * di) * cf
        dec = jnp.max(power.reshape(n1 // q, q, R, n2), axis=1)  # [G,R,n2]
        db = 10.0 * jnp.log10(jnp.maximum(dec, _EPS))
        wf_ref[0] = jnp.swapaxes(db, 0, 1)       # [R, G, n2]
        col_max = jnp.max(power, axis=0)         # [R, n2]
        col_arg = jnp.argmax(power, axis=0).astype(jnp.int32)
        mx_raw = jnp.max(col_max, axis=1)        # [R]
        lane = lax.broadcasted_iota(jnp.int32, (R, n2), 1)
        cand = jnp.where(col_max == mx_raw[:, None], col_arg * n2 + lane,
                         jnp.int32(n1 * n2))
        mx_ref[0] = jnp.broadcast_to(
            (10.0 * jnp.log10(jnp.maximum(mx_raw, _EPS)))[:, None], (R, 128))
        idx_ref[0] = jnp.broadcast_to(jnp.min(cand, axis=1)[:, None],
                                      (R, 128))
        return
    # v1: stage1 per row, everything after batched
    brs, bis = [], []
    for r in range(R):
        t0 = dot(w1r[...], a3r[r] + a3i[r])
        brs.append(t0 - dot(w1s1[...], a3i[r]))
        bis.append(t0 + dot(w1s2[...], a3r[r]))
    br = jnp.stack(brs)                         # [R, n1, n2]
    bi = jnp.stack(bis)
    cr = br * twr[...][None] - bi * twi[...][None]
    ci = br * twi[...][None] + bi * twr[...][None]
    dg2 = (((2,), (1,)), ((), ()))
    t0 = dot(cr + ci, w2r[...], dg2)
    dr = t0 - dot(ci, w2s1[...], dg2)
    di = t0 + dot(cr, w2s2[...], dg2)           # [R, n1, n2]
    power = (dr * dr + di * di) * cf
    dec = jnp.max(power.reshape(R, n1 // q, q, n2), axis=2)
    wf_ref[0] = 10.0 * jnp.log10(jnp.maximum(dec, _EPS))
    col_max = jnp.max(power, axis=1)            # [R, n2]
    col_arg = jnp.argmax(power, axis=1).astype(jnp.int32)
    mx_raw = jnp.max(col_max, axis=1)           # [R]
    lane = lax.broadcasted_iota(jnp.int32, (R, n2), 1)
    cand = jnp.where(col_max == mx_raw[:, None], col_arg * n2 + lane,
                     jnp.int32(n1 * n2))
    mx_ref[0] = jnp.broadcast_to(
        (10.0 * jnp.log10(jnp.maximum(mx_raw, _EPS)))[:, None], (R, 128))
    idx_ref[0] = jnp.broadcast_to(jnp.min(cand, axis=1)[:, None], (R, 128))


@functools.partial(jax.jit, static_argnames=("n", "q", "stage1_dg"))
def spec_v(re, im, n, q, stage1_dg):
    s, t = re.shape
    n2 = 128
    n1 = n // n2
    nblk = t // n
    w1r, w1i = _dft_mats(n1, -1.0)
    twr, twi = _twiddles(n1, n2, -1.0)
    w2r, w2i = _dft_mats(n2, -1.0)
    w1s1 = (w1r.astype(np.float64) + w1i.astype(np.float64)).astype(np.float32)
    w1s2 = (w1i.astype(np.float64) - w1r.astype(np.float64)).astype(np.float32)
    w2s1 = (w2r.astype(np.float64) + w2i.astype(np.float64)).astype(np.float32)
    w2s2 = (w2i.astype(np.float64) - w2r.astype(np.float64)).astype(np.float32)
    win = hamming_np(n).astype(np.float32)
    rows = _SPEC_ROWS
    const = lambda z: pl.BlockSpec(z.shape, lambda i, j: (0,) * z.ndim,
                                   memory_space=pltpu.VMEM)
    consts = [jnp.asarray(win[None, :])] + [
        jnp.asarray(z) for z in (w1r, w1i, w1s1, w1s2, twr, twi,
                                 w2r, w2i, w2s1, w2s2)]
    kernel = functools.partial(_v1_kernel, n1=n1, n2=n2, q=q,
                               stage1_dg=stage1_dg)
    wf, mx, idx = pl.pallas_call(
        kernel,
        grid=(s // rows, nblk),
        in_specs=[pl.BlockSpec((rows, n), lambda i, j: (i, j),
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
    )(re, im, *consts)
    return wf, mx[:, :, 0], idx[:, :, 0]


def main():
    ensure_tpu_ready(attempts=1)
    log(f"device: {jax.devices()[0]}")
    rate, n_streams, t_len, fft_n = 96_000, 64, 960_000, 9_600
    samples = n_streams * t_len
    rng = np.random.default_rng(0)
    sig = (0.3 * (rng.standard_normal((n_streams, t_len))
                  + 1j * rng.standard_normal((n_streams, t_len)))
           ).astype(np.complex64)
    iq = jax.device_put(from_complex(sig))
    jax.block_until_ready(iq)

    f0 = jax.jit(lambda r, i: (lambda o: o[0].sum() + o[1].sum()
                               + o[2].sum())(
                                   spectrum_waterfall(CF(r, i), fft_n)))
    timeit(f0, iq.re, iq.im, tag="v0 shipped wf kernel", samples=samples)

    # correctness probe on a small slice
    small_r, small_i = iq.re[:8, :fft_n * 4], iq.im[:8, :fft_n * 4]
    wf0, mx0, idx0 = spectrum_waterfall(CF(small_r, small_i), fft_n)
    for name, dg in (("v1 stage2-batched", False), ("v2 rank3-dots", True)):
        try:
            wf, mx, idx = spec_v(small_r, small_i, fft_n, 5, dg)
            ok = (np.allclose(np.asarray(wf), np.asarray(wf0), atol=1e-5)
                  and np.array_equal(np.asarray(idx), np.asarray(idx0)))
            log(f"{name}: correct={ok}")
            f = jax.jit(lambda r, i, d=dg: (lambda o: o[0].sum()
                                            + o[1].sum() + o[2].sum())(
                                                spec_v(r, i, fft_n, 5, d)))
            timeit(f, iq.re, iq.im, tag=name, samples=samples)
        except Exception as e:
            log(f"{name}: FAILED {repr(e)[:200]}")


if __name__ == "__main__":
    main()
