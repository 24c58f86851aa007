"""Round-3b: spectrum-kernel time breakdown + restructure candidates.

Where does the waterfall-spectrum kernel's time go at the bench shape
(64 streams x 960k samples, n=9600)?  Variants:

  v0   shipped spectrum_waterfall (per-row loop, Karatsuba bf16x3)
  dma  DMA floor: read the same blocks, emit only a running sum
  vpu  compute floor: window + |x|^2 + reductions, NO matmuls
  nopk v0 without the fused peak search
  bf16 v0 with single-pass bf16 dots (4-product form, 8 passes)
  s1   stage-1 only (twiddle+stage-2 skipped)
  s2   stage-2 only (stage-1 skipped)
  blk4 v0 but 4 FFT blocks per grid step (merged-kernel geometry)
  kar4 4-product form under bf16x3 (12 passes, fewer VPU cast arrays)
  shcast Karatsuba bf16x3 with activation casts hoisted/shared
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


def _split3(a):
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    return ah, al


def _dot3_pre(asplit, bsplit, dn=None):
    """bf16x3 dot on PRE-SPLIT operands (share casts across dots)."""
    ah, al = asplit
    bh, bl = bsplit
    d = lax.Precision.DEFAULT
    if dn is None:
        f = lambda x, y: jnp.dot(x, y, precision=d,
                                 preferred_element_type=jnp.float32)
    else:
        f = lambda x, y: lax.dot_general(x, y, dn, precision=d,
                                         preferred_element_type=jnp.float32)
    return f(ah, bh) + f(ah, bl) + f(al, bh)


def _mk_kernel(mode):
    def kern(x_re, x_im, win, w1r, w1i, w1s1, w1s2, twr, twi,
             w2r, w2i, w2s1, w2s2, wf_ref, mx_ref, idx_ref, *,
             n1, n2, q, nblk_step):
        R = _SPEC_ROWS
        n = n1 * n2
        cf = np.float32((2.0 / n) ** 2)
        if mode == "dma":
            acc = jnp.zeros((R, 128), jnp.float32)
            for b in range(nblk_step):
                acc = acc + x_re[:, b * n:b * n + 128] \
                          + x_im[:, b * n:b * n + 128]
            wf_ref[...] = jnp.zeros_like(wf_ref)
            mx_ref[...] = jnp.broadcast_to(acc[None], mx_ref.shape)
            idx_ref[...] = jnp.zeros_like(idx_ref)
            return
        dot = _make_spec_dot("bf16" if mode == "bf16" else "bf16x3")
        for b in range(nblk_step):
            ar2 = (x_re[:, b * n:(b + 1) * n] * win[...]).reshape(R, n1, n2)
            ai2 = (x_im[:, b * n:(b + 1) * n] * win[...]).reshape(R, n1, n2)
            for r in range(R):
                ar, ai = ar2[r], ai2[r]
                dn = (((1,), (1,)), ((), ()))
                if mode == "vpu":
                    dr, di = ar, ai
                elif mode == "s1":
                    t0 = dot(w1r[...], ar + ai)
                    dr = t0 - dot(w1s1[...], ai)
                    di = t0 + dot(w1s2[...], ar)
                    dr = jnp.broadcast_to(dr[:, :n2], (n1, n2))
                    di = jnp.broadcast_to(di[:, :n2], (n1, n2))
                elif mode == "s2":
                    t0 = dot(ar + ai, w2r[...], dn)
                    dr = t0 - dot(ai, w2s1[...], dn)
                    di = t0 + dot(ar, w2s2[...], dn)
                elif mode in ("bf16", "kar4"):
                    # 4-product form (no Karatsuba pre-sums)
                    br = dot(w1r[...], ar) - dot(w1i[...], ai)
                    bi = dot(w1r[...], ai) + dot(w1i[...], ar)
                    cr = br * twr[...] - bi * twi[...]
                    ci = br * twi[...] + bi * twr[...]
                    dr = dot(cr, w2r[...], dn) - dot(ci, w2i[...], dn)
                    di = dot(cr, w2i[...], dn) + dot(ci, w2r[...], dn)
                elif mode == "shcast":
                    ars, ais = _split3(ar), _split3(ai)
                    sms = (ars[0] + ais[0], ars[1] + ais[1])
                    w1rs = (w1r[...], jnp.zeros_like(w1r[...]))
                    t0 = _dot3_pre(w1rs, sms)
                    # NB: (a+b) split as (ah+bh, al+bl) is NOT the bf16
                    # split of a+b, but error stays O(2^-16): each term
                    # is a valid f32 with small tail
                    br = t0 - _dot3_pre((w1s1[...], jnp.zeros_like(w1s1[...])), ais)
                    bi = t0 + _dot3_pre((w1s2[...], jnp.zeros_like(w1s2[...])), ars)
                    cr = br * twr[...] - bi * twi[...]
                    ci = br * twi[...] + bi * twr[...]
                    dn2 = dn
                    crs, cis = _split3(cr), _split3(ci)
                    sms2 = (crs[0] + cis[0], crs[1] + cis[1])
                    t0 = _dot3_pre(sms2, (w2r[...], jnp.zeros_like(w2r[...])), dn2)
                    dr = t0 - _dot3_pre(cis, (w2s1[...], jnp.zeros_like(w2s1[...])), dn2)
                    di = t0 + _dot3_pre(crs, (w2s2[...], jnp.zeros_like(w2s2[...])), dn2)
                else:  # v0 / nopk / blk4: shipped Karatsuba
                    t0 = dot(w1r[...], ar + ai)
                    br = t0 - dot(w1s1[...], ai)
                    bi = t0 + dot(w1s2[...], ar)
                    cr = br * twr[...] - bi * twi[...]
                    ci = br * twi[...] + bi * twr[...]
                    t0 = dot(cr + ci, w2r[...], dn)
                    dr = t0 - dot(ci, w2s1[...], dn)
                    di = t0 + dot(cr, w2s2[...], dn)
                power = (dr * dr + di * di) * cf
                g = n1 // q
                dec = jnp.max(power.reshape(g, q, n2), axis=1)
                out = 10.0 * jnp.log10(jnp.maximum(dec, _EPS))
                wf_ref[b, r] = out
                if mode == "nopk":
                    mx_ref[b, r] = jnp.full((128,), power[0, 0], jnp.float32)
                    idx_ref[b, r] = jnp.full((128,), 0, jnp.int32)
                else:
                    col_max = jnp.max(power, axis=0)
                    col_arg = jnp.argmax(power, axis=0).astype(jnp.int32)
                    mx_raw = jnp.max(col_max)
                    mx = 10.0 * jnp.log10(jnp.maximum(mx_raw, _EPS))
                    lane = lax.broadcasted_iota(jnp.int32, (1, n2), 1)[0]
                    cand = jnp.where(col_max == mx_raw, col_arg * n2 + lane,
                                     jnp.int32(n1 * n2))
                    mx_ref[b, r] = jnp.full((128,), mx, jnp.float32)
                    idx_ref[b, r] = jnp.full((128,), jnp.min(cand), jnp.int32)
    return kern


@functools.partial(jax.jit, static_argnames=("n", "q", "mode", "nblk_step"))
def spec_v(re, im, n, q, mode, nblk_step=1):
    s, t = re.shape
    n2 = 128
    n1 = n // n2
    nblk = t // n
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
    kernel = functools.partial(_mk_kernel(mode), n1=n1, n2=n2, q=q,
                               nblk_step=nblk_step)
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

    # correctness probe vs shipped on a small slice
    small_r, small_i = iq.re[:8, :fft_n * 4], iq.im[:8, :fft_n * 4]
    wf0, mx0, idx0 = spectrum_waterfall(CF(small_r, small_i), fft_n)
    wf0, mx0, idx0 = map(np.asarray, (wf0, mx0, idx0))

    for mode, nbs in [("dma", 1), ("vpu", 1), ("nopk", 1), ("bf16", 1),
                      ("s1", 1), ("s2", 1), ("v0", 4), ("kar4", 1),
                      ("shcast", 1)]:
        tag = f"{mode}/blk{nbs}"
        try:
            if mode in ("v0", "kar4", "shcast"):
                wf, mx, idx = spec_v(small_r, small_i, fft_n, 5, mode, 1)
                ok = (np.allclose(np.asarray(wf), wf0, atol=2e-2)
                      and np.mean(np.asarray(idx) == idx0) > 0.95)
                tag += f" correct={ok}"
            f = jax.jit(lambda r, i, m=mode, nb=nbs:
                        (lambda o: o[0].sum() + o[1].sum() + o[2].sum())(
                            spec_v(r, i, fft_n, 5, m, nb)))
            timeit(f, iq.re, iq.im, tag=tag, samples=samples)
        except Exception as e:
            log(f"{tag}: FAILED {repr(e)[:300]}")


if __name__ == "__main__":
    main()
