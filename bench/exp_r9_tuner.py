"""Round-5 dofft front-end attribution + attack. bench_dofft measured
the auto-tune step at 66.3 ms vs 8.3 ms manual at 128x4.8 s — the
tuner's own compute. Pieces (demod/fft_tuner.py) at [S=128, nb=48,
9600]:

- tuner_precompute: forward matmul FFT + |.| PSD + cumsum box-average +
  masked argmax (parallel over blocks)
- tuner_recurrence: 48-step lax.scan of 3 scalars per stream (vmapped)
- tuner_emit: per-block 204-bin dynamic slice -> zero-pad to 9600 ->
  inverse matmul FFT

Attack candidates:
- emit-matmul: the inverse FFT input is ALWAYS the slice placed at bins
  0..203, so the whole emit is one CONSTANT [204, 9600] iDFT matmul of
  the slice values — batched over all S*nb blocks on the MXU instead of
  S*nb full 9600-point iFFTs.
- box-avg via segment sums: replace the length-4801 cumsum with a
  two-level (coarse 50-block + fine) form if the cumsum dominates.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from jsdr_tpu.demod import fft_tuner as FT                  # noqa: E402
from jsdr_tpu.ops.cplx import CF                            # noqa: E402

S, NB = 128, 48
N = 9600
ITERS = 10


def timeit(label, fn, *args):
    """CHAINED loop + d2h barrier (lazy/eliding-backend-proof, see
    bench.py force_value): fn must return a scalar; iteration k
    perturbs args[0] by a value derived from iteration k-1."""

    @jax.jit
    def step(c, *a):
        a0 = a[0].at[(0,) * a[0].ndim].add(jnp.sin(c) * 1e-6)
        return fn(a0, *a[1:]).astype(jnp.float32) * 1e-9 + c + 1.0

    t0 = time.perf_counter()
    jax.block_until_ready(step(jnp.float32(0), *args))
    t_c = time.perf_counter() - t0
    c = jnp.float32(1)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        c = step(c, *args)
    np.asarray(c)                       # d2h barrier forces the chain
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:44s} {dt * 1e3:8.2f} ms  [compile {t_c:.1f}s]",
          flush=True)
    return dt


# emit as one constant iDFT matmul of the 204-bin slice ---------------------

def _idft_slice_mats():
    k = np.arange(2 * FT.SLICE_HALF)[:, None]              # bins 0..203
    t = np.arange(N)[None, :]
    ang = 2.0 * np.pi * (k * t % N) / N
    return (np.cos(ang).astype(np.float32) / N,
            np.sin(ang).astype(np.float32) / N)


_IDR, _IDI = _idft_slice_mats()


def tuner_emit_matmul(spec: CF, centres: jnp.ndarray) -> CF:
    """All-blocks emit: extract [.., 204] slices, ONE [K, 204] @
    [204, 9600] complex matmul (the iDFT of a spectrum that is zero
    outside bins 0..203), real part only (the Q-drop quirk)."""
    samples = spec.shape[-1]

    def slice1(spec1, centre):
        start = jnp.clip(centre - FT.SLICE_HALF, 0,
                         samples - 2 * FT.SLICE_HALF)
        return (lax.dynamic_slice(spec1.re, (start,), (2 * FT.SLICE_HALF,)),
                lax.dynamic_slice(spec1.im, (start,), (2 * FT.SLICE_HALF,)))

    sr, si = jax.vmap(slice1)(spec, centres)               # [nb, 204]
    dr = jnp.asarray(_IDR)
    di = jnp.asarray(_IDI)
    p = jax.lax.Precision.HIGHEST
    feed_re = (jnp.dot(sr, dr, precision=p)
               - jnp.dot(si, di, precision=p))             # [nb, 9600]
    return CF(feed_re, feed_re)


def main():
    print(f"device: {jax.devices()[0].device_kind}, shape [{S},{NB},{N}]")
    rng = np.random.default_rng(0)
    re = rng.standard_normal((S, NB, N)).astype(np.float32) * 0.3
    im = rng.standard_normal((S, NB, N)).astype(np.float32) * 0.3
    blocks = CF(jax.device_put(re), jax.device_put(im))
    th = jax.device_put(np.zeros((S, 1), bool))
    st0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (S, *np.shape(x))),
        FT.fft_tuner_init())

    def pre(b_re, b_im, th):
        spec, ave, bin_pos, max_bin, end = FT.tuner_precompute(
            CF(b_re, b_im), th)
        return (spec.re.sum() + spec.im.sum() + ave.sum()
                + bin_pos.sum() + max_bin.sum() + end.sum())

    timeit("precompute (FFT+PSD+boxavg+argmax)", pre,
           blocks.re, blocks.im, th)

    def pre_parts(b_re, b_im, th):
        from jsdr_tpu.ops.mxu_fft import fft_cf
        spec = fft_cf(CF(b_re, b_im))
        return spec.re.sum() + spec.im.sum()

    timeit("  forward FFT only", pre_parts, blocks.re, blocks.im, th)

    spec, ave, bin_pos, max_bin, end = jax.jit(
        lambda r, i, t: FT.tuner_precompute(CF(r, i), t))(
        blocks.re, blocks.im, th)
    end1 = end[:, 0]

    def rec(ave_, st, bin_pos, max_bin, end1):
        st2, centres = jax.vmap(FT.tuner_recurrence)(st, ave_, bin_pos,
                                                     max_bin, end1)
        return centres.sum() + st2.centre_bin.sum()

    timeit("recurrence (48-step scan x S)", rec, ave, st0, bin_pos,
           max_bin, end1)

    _, centres = jax.jit(jax.vmap(FT.tuner_recurrence))(
        st0, ave, bin_pos, max_bin, end1)

    def emit_ref(s_re, s_im, centres):
        f = jax.vmap(FT.tuner_emit)(CF(s_re, s_im), centres)
        return f.re.sum()

    def emit_mm(s_re, s_im, centres):
        f = jax.vmap(tuner_emit_matmul)(CF(s_re, s_im), centres)
        return f.re.sum()

    timeit("emit (per-block zero-pad + iFFT)", emit_ref,
           spec.re, spec.im, centres)
    timeit("emit (constant [204,9600] matmul)", emit_mm,
           spec.re, spec.im, centres)

    # numeric delta of the matmul emit vs the shipped emit
    f1 = jax.jit(lambda r, i, c: jax.vmap(FT.tuner_emit)(CF(r, i), c))(
        spec.re, spec.im, centres)
    f2 = jax.jit(lambda r, i, c: jax.vmap(tuner_emit_matmul)(CF(r, i), c))(
        spec.re, spec.im, centres)
    d = np.max(np.abs(np.asarray(f1.re) - np.asarray(f2.re)))
    scale = np.max(np.abs(np.asarray(f1.re)))
    print(f"emit delta: max|d| = {d:.3e} (scale {scale:.3e}, "
          f"rel {d / max(scale, 1e-30):.2e})", flush=True)


if __name__ == "__main__":
    main()
