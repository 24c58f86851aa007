"""Round-3b: row-batched stage-2 via 8-aligned VMEM scratch.

Stage 1 must stay per-row (the [75,128] lane-split puts n1 in sublanes),
but its OUTPUT can be written into a [R, P, 128] scratch with P = n1
padded to a sublane multiple (75 -> 80).  [R, P, 128] -> [R*P, 128] is a
free leading-dim merge, so the twiddle, the three stage-2 Karatsuba
dots, |X|^2, the waterfall decimation, log10 and the peak search all run
ONCE per grid step on [R*P, 128] instead of 8x on [75, 128] — 3 MXU dots
of [640,128]@[128,128] instead of 24 of [75,128]@[128,128], and ~8x
fewer VPU instructions.  Scratch pad rows are zeroed once at step 0;
zero power can never win the peak search (power >= 0, first-occurrence
argmax scans real rows first).
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


def _mk_v3(n1, n2, q, nblk_step):
    P = -(-n1 // 8) * 8          # sublane-aligned stage-1 rows
    R = _SPEC_ROWS
    g = n1 // q

    def kern(x_re, x_im, win, w1r, w1s1, w1s2, twr, twi,
             w2r, w2s1, w2s2, wf_ref, mx_ref, idx_ref, sbr, sbi):
        n = n1 * n2
        dot = _make_spec_dot("bf16x3")
        cf = np.float32((2.0 / n) ** 2)
        if P != n1:
            # pad rows must be zero under ANY grid-iteration order
            # (parallel semantics may revisit) — zeroing the tiny pad
            # band every step is ~2 vector stores
            sbr[:, n1:] = jnp.zeros((R, P - n1, n2), jnp.float32)
            sbi[:, n1:] = jnp.zeros((R, P - n1, n2), jnp.float32)

        for b in range(nblk_step):
            ar3 = (x_re[:, b * n:(b + 1) * n] * win[...]).reshape(R, n1, n2)
            ai3 = (x_im[:, b * n:(b + 1) * n] * win[...]).reshape(R, n1, n2)
            for r in range(R):
                ar, ai = ar3[r], ai3[r]
                t0 = dot(w1r[...], ar + ai)
                sbr[r, :n1] = t0 - dot(w1s1[...], ai)
                sbi[r, :n1] = t0 + dot(w1s2[...], ar)
            brv = sbr[...]
            biv = sbi[...]
            # twiddle, padded with zeros beyond n1 (pad rows stay zero)
            cr = brv * twr[...][None] - biv * twi[...][None]
            ci = brv * twi[...][None] + biv * twr[...][None]
            dn = (((1,), (1,)), ((), ()))
            c2r = cr.reshape(R * P, n2)
            c2i = ci.reshape(R * P, n2)
            t0 = dot(c2r + c2i, w2r[...], dn)
            dr = t0 - dot(c2i, w2s1[...], dn)
            di = t0 + dot(c2r, w2s2[...], dn)
            power = ((dr * dr + di * di) * cf).reshape(R, P, n2)
            dec = jnp.max(power.reshape(R, P // q, q, n2), axis=2)
            wf_ref[b] = 10.0 * jnp.log10(jnp.maximum(dec[:, :g], _EPS))
            col_max = jnp.max(power, axis=1)                    # [R, n2]
            col_arg = jnp.argmax(power, axis=1).astype(jnp.int32)
            mx_raw = jnp.max(col_max, axis=1)                   # [R]
            lane = lax.broadcasted_iota(jnp.int32, (R, n2), 1)
            cand = jnp.where(col_max == mx_raw[:, None],
                             col_arg * n2 + lane, jnp.int32(n1 * n2))
            mx_ref[b] = jnp.broadcast_to(
                (10.0 * jnp.log10(jnp.maximum(mx_raw, _EPS)))[:, None],
                (R, 128))
            idx_ref[b] = jnp.broadcast_to(jnp.min(cand, axis=1)[:, None],
                                          (R, 128))
    return kern, P


@functools.partial(jax.jit, static_argnames=("n", "q", "nblk_step", "sem"))
def spec_v3(re, im, n, q, nblk_step=1, sem=None):
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
    kernel, P = _mk_v3(n1, n2, q, nblk_step)
    twr = np.zeros((P, n2), np.float32)
    twi = np.zeros((P, n2), np.float32)
    twr[:n1], twi[:n1] = twr_, twi_
    rows = _SPEC_ROWS
    const = lambda z: pl.BlockSpec(z.shape, lambda i, j: (0,) * z.ndim,
                                   memory_space=pltpu.VMEM)
    consts = [jnp.asarray(win[None, :])] + [
        jnp.asarray(z) for z in (w1r, w1s1, w1s2, twr, twi,
                                 w2r, w2s1, w2s2)]
    cp = (pltpu.CompilerParams(dimension_semantics=sem) if sem else None)
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
        scratch_shapes=[pltpu.VMEM((rows, P, n2), jnp.float32),
                        pltpu.VMEM((rows, P, n2), jnp.float32)],
        compiler_params=cp,
    )(re, im, *consts)
    return wf, mx[:, :, 0], idx[:, :, 0]


def main():
    ensure_tpu_ready(attempts=1)
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
    timeit(f0, iq.re, iq.im, tag="v0 shipped", samples=samples)

    small_r, small_i = iq.re[:8, :fft_n * 4], iq.im[:8, :fft_n * 4]
    wf0, mx0, idx0 = spectrum_waterfall(CF(small_r, small_i), fft_n)
    wf0, mx0, idx0 = map(np.asarray, (wf0, mx0, idx0))

    PA = ("parallel", "arbitrary")
    for nbs, sem in [(1, None), (1, PA), (4, None), (4, PA), (2, PA)]:
        tag = f"v3 blk{nbs} sem={sem and 'par/arb'}"
        try:
            wf, mx, idx = spec_v3(small_r, small_i, fft_n, 5, nbs, sem)
            okwf = np.allclose(np.asarray(wf), wf0, atol=1e-4)
            okmx = np.allclose(np.asarray(mx), mx0, atol=1e-4)
            okidx = np.array_equal(np.asarray(idx), idx0)
            tag += f" correct={okwf}/{okmx}/{okidx}"
            f = jax.jit(lambda r, i, nb=nbs, s=sem:
                        (lambda o: o[0].sum() + o[1].sum() + o[2].sum())(
                            spec_v3(r, i, fft_n, 5, nb, s)))
            timeit(f, iq.re, iq.im, tag=tag, samples=samples)
        except Exception as e:
            log(f"{tag}: FAILED {repr(e)[:300]}")


if __name__ == "__main__":
    main()
