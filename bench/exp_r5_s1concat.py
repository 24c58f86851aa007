"""Round-3c: 8-row lane-concat stage 1 on top of the v3 batched tail.

Shipped stage 1 runs 24 small dots per block (8 rows x 3 Karatsuba
passes of [75,75]@[75,128] — the Mosaic small-matmul wall). Here the 8
rows' [75, 128] lane-splits concatenate into ONE [75, 1024] operand, so
stage 1 is 3 dots of [75,75]@[75,1024] (8 MXU tiles wide per pass);
outputs de-concat into the scratch with aligned 128-lane slices.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.ops.mxu_fft import _dft_mats, _twiddles
from jsdr_tpu.ops.pallas_kernels import (_EPS, _SPEC_ROWS, _make_spec_dot,
                                         _spec_pad_rows, _spec_tail_batched,
                                         spectrum_waterfall)
from jsdr_tpu.ops.windows import hamming_np
from jsdr_tpu.runtime.tpu import ensure_tpu_ready


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=20, tag="", samples=None):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    extra = f" ({samples/dt/1e6:.0f} MS/s)" if samples else ""
    log(f"{tag}: {dt*1000:.2f} ms{extra}")
    return dt


def _mk(n1, n2, q, nblk_step):
    p_pad = _spec_pad_rows(n1, q)
    r = _SPEC_ROWS

    def kern(x_re, x_im, win, w1r, w1s1, w1s2, twr, twi,
             w2r, w2s1, w2s2, wf_ref, mx_ref, idx_ref, sbr, sbi):
        n = n1 * n2
        dot = _make_spec_dot("bf16x3")
        if p_pad != n1:
            sbr[:, n1:] = jnp.zeros((r, p_pad - n1, n2), jnp.float32)
            sbi[:, n1:] = jnp.zeros((r, p_pad - n1, n2), jnp.float32)
        for b in range(nblk_step):
            a3r = (x_re[:, b * n:(b + 1) * n] * win[...]).reshape(r, n1, n2)
            a3i = (x_im[:, b * n:(b + 1) * n] * win[...]).reshape(r, n1, n2)
            # 8-row lane-concat: [n1, R*n2]
            ar = jnp.concatenate([a3r[rr] for rr in range(r)], axis=1)
            ai = jnp.concatenate([a3i[rr] for rr in range(r)], axis=1)
            t0 = dot(w1r[...], ar + ai)
            br = t0 - dot(w1s1[...], ai)
            bi = t0 + dot(w1s2[...], ar)
            for rr in range(r):
                sbr[rr, :n1] = br[:, rr * n2:(rr + 1) * n2]
                sbi[rr, :n1] = bi[:, rr * n2:(rr + 1) * n2]
            wf, mx, idx = _spec_tail_batched(
                sbr[...], sbi[...], twr[...], twi[...], w2r[...], None,
                w2s1[...], w2s2[...], n1=n1, n2=n2, q=q,
                precision="bf16x3")
            wf_ref[b] = wf
            mx_ref[b] = jnp.broadcast_to(mx[:, None], (r, 128))
            idx_ref[b] = jnp.broadcast_to(idx[:, None], (r, 128))
    return kern, p_pad


@functools.partial(jax.jit, static_argnames=("n", "q", "nblk_step"))
def spec_s1c(re, im, n, q, nblk_step=4):
    s, t = re.shape
    n2 = 128
    n1 = n // n2
    nblk = t // n
    w1r, w1i = _dft_mats(n1, -1.0)
    twr_, twi_ = _twiddles(n1, n2, -1.0)
    w2r, w2i = _dft_mats(n2, -1.0)
    f64 = np.float64
    w1s1 = (w1r.astype(f64) + w1i.astype(f64)).astype(np.float32)
    w1s2 = (w1i.astype(f64) - w1r.astype(f64)).astype(np.float32)
    w2s1 = (w2r.astype(f64) + w2i.astype(f64)).astype(np.float32)
    w2s2 = (w2i.astype(f64) - w2r.astype(f64)).astype(np.float32)
    win = hamming_np(n).astype(np.float32)
    kernel, p_pad = _mk(n1, n2, q, nblk_step)
    twr = np.zeros((p_pad, n2), np.float32)
    twi = np.zeros((p_pad, n2), np.float32)
    twr[:n1], twi[:n1] = twr_, twi_
    rows = _SPEC_ROWS
    const = lambda z: pl.BlockSpec(z.shape, lambda i, j: (0,) * z.ndim,
                                   memory_space=pltpu.VMEM)
    consts = [jnp.asarray(win[None, :])] + [
        jnp.asarray(z) for z in (w1r, w1s1, w1s2, twr, twi,
                                 w2r, w2s1, w2s2)]
    wf, mx, idx = pl.pallas_call(
        kernel,
        grid=(s // rows, nblk // nblk_step),
        in_specs=[pl.BlockSpec((rows, n * nblk_step), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)] * 2
        + [const(z) for z in consts],
        out_specs=[
            pl.BlockSpec((nblk_step, rows, n1 // q, n2),
                         lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk_step, rows, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk_step, rows, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk, s, n1 // q, n2), jnp.float32),
            jax.ShapeDtypeStruct((nblk, s, 128), jnp.float32),
            jax.ShapeDtypeStruct((nblk, s, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, p_pad, n2), jnp.float32),
                        pltpu.VMEM((rows, p_pad, n2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(re, im, *consts)
    return wf, mx[:, :, 0], idx[:, :, 0]


def main():
    ensure_tpu_ready(attempts=2)
    log(f"device: {jax.devices()[0]}")
    n_streams, t_len, fft_n = 64, 960_000, 9_600
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
    timeit(f0, iq.re, iq.im, tag="v3 shipped", samples=samples)

    small_r, small_i = iq.re[:8, :fft_n * 4], iq.im[:8, :fft_n * 4]
    wf0, mx0, idx0 = spectrum_waterfall(CF(small_r, small_i), fft_n)
    wf0, mx0, idx0 = map(np.asarray, (wf0, mx0, idx0))

    for nbs in (4, 2):
        tag = f"s1concat blk{nbs}"
        try:
            wf, mx, idx = spec_s1c(small_r, small_i, fft_n, 5, nbs)
            dwf = float(np.max(np.abs(np.asarray(wf) - wf0)))
            dmx = float(np.max(np.abs(np.asarray(mx) - mx0)))
            okidx = float(np.mean(np.asarray(idx) == idx0))
            tag += f" dwf={dwf:.2e} dmx={dmx:.2e} idx={okidx:.2f}"
            f = jax.jit(lambda r, i, nb=nbs:
                        (lambda o: o[0].sum() + o[1].sum() + o[2].sum())(
                            spec_s1c(r, i, fft_n, 5, nb)))
            timeit(f, iq.re, iq.im, tag=tag, samples=samples)
        except Exception as e:  # noqa: BLE001
            log(f"{tag}: FAILED {repr(e)[:300]}")


if __name__ == "__main__":
    main()
