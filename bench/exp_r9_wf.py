"""Round-5 attack on the merged kernel's VPU+DMA share (VERDICT r4 #3).

PERF.md attribution: wf kernel standalone ~4.1 ms of which MXU ~1.65 ms;
the ~2.5 ms remainder is VPU elementwise (window, twiddle, Karatsuba
splits, |X|^2, decimate/peak) plus the per-block strided input DMA.
Candidates, each measured here on the standalone waterfall kernel at the
bench shape (128 x 460800 at 96 k):

  window-off     bounds candidate (a) "fold the Hamming window into the
                 stage-1 weights": the window is NOT separable over the
                 (j1, j2) lane split, so folding is algebraically
                 impossible in the weights; measuring window=False bounds
                 the whole pass's cost from above.
  nblk_step 2/8  candidate (e): the strided-read floor is per-BLOCK
                 overhead (exp_r4_dma2: byte count doesn't matter), so
                 fewer/wider grid steps may lower it. VMEM at
                 nblk_step=8: 2 x 4.9 MB double-buffered input + 0.7 MB
                 scratch + 0.5 MB consts < 16 MB.
  rows 16        more streams per grid step: doubles the tail's M
                 ([16*P, 128] stage-2 dots) for MXU fill AND halves the
                 per-step count of every VPU pass.
  tail bf16      candidate (d): |X|^2 + decimation max in bf16 (~2^-8
                 relative -> <=0.04 dB on the line, below the display's
                 0.39 dB quantization); peak argmax may tie-break
                 differently — measured as a perf bound first.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from jsdr_tpu.ops.mxu_fft import _dft_mats, _twiddles
    from jsdr_tpu.ops.pallas_kernels import (_make_spec_dot, _spec_pad_rows,
                                             _EPS, wf_group_for)
    from jsdr_tpu.ops.windows import hamming_np
    from jsdr_tpu.runtime.tpu import ensure_tpu_ready

    ensure_tpu_ready(attempts=2)
    log(f"device: {jax.devices()[0]}")

    rate, s, t = 96_000, 128, 460_800
    n = rate // 10
    n2 = 128
    n1 = n // n2
    nblk = t // n
    q = wf_group_for(n)
    rng = np.random.default_rng(0)
    re = rng.standard_normal((s, t)).astype(np.float32) * 0.3
    im = rng.standard_normal((s, t)).astype(np.float32) * 0.3
    re_d = jax.device_put(re)
    im_d = jax.device_put(im)

    def build(rows, nblk_step, window=True, tail_bf16=False,
              precision="bf16x3"):
        w1r, w1i = _dft_mats(n1, -1.0)
        twr, twi = _twiddles(n1, n2, -1.0)
        w2r, w2i = _dft_mats(n2, -1.0)
        w1s1 = (w1r.astype(np.float64) + w1i.astype(np.float64)).astype(np.float32)
        w1s2 = (w1i.astype(np.float64) - w1r.astype(np.float64)).astype(np.float32)
        w2s1 = (w2r.astype(np.float64) + w2i.astype(np.float64)).astype(np.float32)
        w2s2 = (w2i.astype(np.float64) - w2r.astype(np.float64)).astype(np.float32)
        win = (hamming_np(n) if window else np.ones(n)).astype(np.float32)
        p_pad = _spec_pad_rows(n1, q)
        twr_p = np.zeros((p_pad, n2), np.float32)
        twi_p = np.zeros((p_pad, n2), np.float32)
        twr_p[:n1], twi_p[:n1] = twr, twi
        n1_out = n1 // q
        dot = _make_spec_dot(precision)
        cf = np.float32((2.0 / n) ** 2)

        def tail(brv, biv, twr, twi, w2r, w2i, w2s1, w2s2):
            import jax.lax as lax
            r_rows, p_p, _ = brv.shape
            dn = (((1,), (1,)), ((), ()))
            cr = brv * twr[None] - biv * twi[None]
            ci = brv * twi[None] + biv * twr[None]
            c2r = cr.reshape(r_rows * p_p, n2)
            c2i = ci.reshape(r_rows * p_p, n2)
            if precision == "bf16x3":
                t0 = dot(c2r + c2i, w2r, dn)
                dr = t0 - dot(c2i, w2s1, dn)
                di = t0 + dot(c2r, w2s2, dn)
            else:
                dr = dot(c2r, w2r, dn) - dot(c2i, w2i, dn)
                di = dot(c2r, w2i, dn) + dot(c2i, w2r, dn)
            if tail_bf16:
                drb = dr.astype(jnp.bfloat16)
                dib = di.astype(jnp.bfloat16)
                power = ((drb * drb + dib * dib).astype(jnp.float32)
                         * cf).reshape(r_rows, p_p, n2)
            else:
                power = ((dr * dr + di * di) * cf).reshape(r_rows, p_p, n2)
            g = n1 // q
            dec = jnp.max(power.reshape(r_rows, p_p // q, q, n2), axis=2)
            wf = 10.0 * jnp.log10(jnp.maximum(dec[:, :g], _EPS))
            col_max = jnp.max(power, axis=1)
            col_arg = jnp.argmax(power, axis=1).astype(jnp.int32)
            mx_raw = jnp.max(col_max, axis=1)
            lane = lax.broadcasted_iota(jnp.int32, (r_rows, n2), 1)
            cand = jnp.where(col_max == mx_raw[:, None],
                             col_arg * n2 + lane, jnp.int32(n1 * n2))
            mx = 10.0 * jnp.log10(jnp.maximum(mx_raw, _EPS))
            return wf, mx, jnp.min(cand, axis=1)

        def kernel(x_re, x_im, win_r, w1r_r, w1i_r, w1s1_r, w1s2_r,
                   twr_r, twi_r, w2r_r, w2i_r, w2s1_r, w2s2_r,
                   wf_ref, mx_ref, idx_ref, sbr, sbi):
            if p_pad != n1:
                sbr[:, n1:] = jnp.zeros((rows, p_pad - n1, n2), jnp.float32)
                sbi[:, n1:] = jnp.zeros((rows, p_pad - n1, n2), jnp.float32)
            for b in range(nblk_step):
                xr = x_re[:, b * n:(b + 1) * n]
                xi = x_im[:, b * n:(b + 1) * n]
                if window:
                    xr = xr * win_r[...]
                    xi = xi * win_r[...]
                a3r = xr.reshape(rows, n1, n2)
                a3i = xi.reshape(rows, n1, n2)
                ar = jnp.concatenate([a3r[r] for r in range(rows)], axis=1)
                ai = jnp.concatenate([a3i[r] for r in range(rows)], axis=1)
                if precision == "bf16x3":
                    t0 = dot(w1r_r[...], ar + ai)
                    br = t0 - dot(w1s1_r[...], ai)
                    bi = t0 + dot(w1s2_r[...], ar)
                else:
                    br = dot(w1r_r[...], ar) - dot(w1i_r[...], ai)
                    bi = dot(w1r_r[...], ai) + dot(w1i_r[...], ar)
                for r in range(rows):
                    sbr[r, :n1] = br[:, r * n2:(r + 1) * n2]
                    sbi[r, :n1] = bi[:, r * n2:(r + 1) * n2]
                wf, mx, idx = tail(sbr[...], sbi[...], twr_r[...],
                                   twi_r[...], w2r_r[...], w2i_r[...],
                                   w2s1_r[...], w2s2_r[...])
                wf_ref[b] = wf
                mx_ref[b] = jnp.broadcast_to(mx[:, None], (rows, 128))
                idx_ref[b] = jnp.broadcast_to(idx[:, None], (rows, 128))

        consts = [jnp.asarray(win[None, :])] + [
            jnp.asarray(z) for z in (w1r, w1i, w1s1, w1s2, twr_p, twi_p,
                                     w2r, w2i, w2s1, w2s2)]
        const = lambda z: pl.BlockSpec(z.shape, lambda i, j: (0,) * z.ndim,
                                       memory_space=pltpu.VMEM)

        @jax.jit
        def run(re, im):
            return pl.pallas_call(
                kernel,
                grid=(s // rows, nblk // nblk_step),
                in_specs=[
                    pl.BlockSpec((rows, n * nblk_step), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows, n * nblk_step), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                ] + [const(z) for z in consts],
                out_specs=[
                    pl.BlockSpec((nblk_step, rows, n1 // q, n2),
                                 lambda i, j: (j, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nblk_step, rows, 128),
                                 lambda i, j: (j, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nblk_step, rows, 128),
                                 lambda i, j: (j, i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((nblk, s, n1 // q, n2), jnp.float32),
                    jax.ShapeDtypeStruct((nblk, s, 128), jnp.float32),
                    jax.ShapeDtypeStruct((nblk, s, 128), jnp.int32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((rows, p_pad, n2), jnp.float32),
                    pltpu.VMEM((rows, p_pad, n2), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )(re, im, *consts)

        return run

    def timeit(label, run):
        try:
            wf, mx, idx = jax.block_until_ready(run(re_d, im_d))
        except Exception as e:  # noqa: BLE001
            log(f"{label:36s} FAILED: {repr(e)[:140]}")
            return None, None
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(re_d, im_d)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        log(f"{label:36s} {dt * 1e3:7.2f} ms  ({s * t / dt / 1e9:5.1f} GS/s)")
        return dt, (np.asarray(out[0]), np.asarray(out[1]),
                    np.asarray(out[2]))

    base_dt, base_out = timeit("base rows=8 nblk=4", build(8, 4))
    timeit("window=False (bounds the win pass)", build(8, 4, window=False))
    timeit("nblk_step=2", build(8, 2))
    timeit("nblk_step=8", build(8, 8))
    timeit("rows=16 nblk=2", build(16, 2))
    dt16, out16 = timeit("rows=16 nblk=4", build(16, 4))
    dtb, outb = timeit("tail bf16 power", build(8, 4, tail_bf16=True))
    if base_out is not None and out16 is not None:
        log(f"rows=16 bit-identical to base: "
            f"{all(np.array_equal(a, b) for a, b in zip(base_out, out16))}")
    if base_out is not None and outb is not None:
        dwf = np.max(np.abs(base_out[0] - outb[0]))
        didx = np.mean(base_out[2] != outb[2])
        log(f"tail-bf16 max |d wf dB| = {dwf:.4f}, argmax flips = "
            f"{didx * 100:.3f}%")


if __name__ == "__main__":
    main()
