"""Round-3b: stage-1 restructures on top of the v3 scratch-batched tail.

  v4: host-presplit weights + batched activation bf16 splits (the dots
      consume pre-split bf16 slices; per-row work = 3 MXU passes + adds)
  v5: 4-product stage-1 on the lane-concat X=[ar|ai] [75,256] — 2 dots
      of double width per row instead of 3, one split array instead of 3
  v6: v5 with 4 FFT blocks lane-concatenated: X=[75, 1024] per row, one
      pair of [75,75]@[75,1024] dot-triples per row per GRID STEP; the
      whole tail (twiddle/stage-2/power/dec/peak) runs block-batched on
      a [R, P, 512] scratch
"""
import functools
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.ops.pallas_kernels import (_EPS, _SPEC_ROWS,
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


def _host_split(w):
    wh = w.astype(np.float32).astype(jnp.bfloat16)
    wl = (w.astype(np.float32) - np.asarray(wh).astype(np.float32)
          ).astype(jnp.bfloat16)
    return jnp.asarray(wh), jnp.asarray(wl)


def _split_act(x):
    """f32 -> (bf16 hi, bf16 lo) with lo = bf16(x - f32(hi))."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return xh, xl


def _dot3(ah, al, bh, bl, dn=None):
    d = lax.Precision.DEFAULT
    if dn is None:
        f = lambda x, y: jnp.dot(x, y, precision=d,
                                 preferred_element_type=jnp.float32)
    else:
        f = lambda x, y: lax.dot_general(x, y, dn, precision=d,
                                         preferred_element_type=jnp.float32)
    return f(ah, bh) + f(ah, bl) + f(al, bh)


def _tail(power, wf_ref, mx_ref, idx_ref, b, n1, n2, q, P, R):
    """power [R, P, n2] -> waterfall line + peak for block slot b."""
    dec = jnp.max(power.reshape(R, P // q, q, n2), axis=2)
    wf_ref[b] = 10.0 * jnp.log10(jnp.maximum(dec[:, :n1 // q], _EPS))
    col_max = jnp.max(power, axis=1)
    col_arg = jnp.argmax(power, axis=1).astype(jnp.int32)
    mx_raw = jnp.max(col_max, axis=1)
    lane = lax.broadcasted_iota(jnp.int32, (R, n2), 1)
    cand = jnp.where(col_max == mx_raw[:, None],
                     col_arg * n2 + lane, jnp.int32(n1 * n2))
    mx_ref[b] = jnp.broadcast_to(
        (10.0 * jnp.log10(jnp.maximum(mx_raw, _EPS)))[:, None], (R, 128))
    idx_ref[b] = jnp.broadcast_to(jnp.min(cand, axis=1)[:, None], (R, 128))


def _mk_v5(n1, n2, q, nblk_step, wide):
    P = -(-n1 // 8) * 8
    R = _SPEC_ROWS
    W = nblk_step if wide else 1     # blocks per stage-1 dot

    def kern(x_re, x_im, win, w1rh, w1rl, w1ih, w1il, twr, twi,
             w2rh, w2rl, w2s1h, w2s1l, w2s2h, w2s2l,
             wf_ref, mx_ref, idx_ref, sbr, sbi):
        n = n1 * n2
        cf = np.float32((2.0 / n) ** 2)
        if P != n1:
            sbr[:, n1:] = jnp.zeros((R, P - n1, W * n2), jnp.float32)
            sbi[:, n1:] = jnp.zeros((R, P - n1, W * n2), jnp.float32)
        for b0 in range(0, nblk_step, W):
            # windowed planes, lane-split at the 128 boundary (free)
            vr = (x_re[:, b0 * n:(b0 + W) * n]
                  * win[...]).reshape(R, W * n1, n2)
            vi = (x_im[:, b0 * n:(b0 + W) * n]
                  * win[...]).reshape(R, W * n1, n2)
            # lane-concat the W blocks, then X = [Ar | Ai]: [R, n1, 2W*n2]
            ar = jnp.concatenate([vr[:, k * n1:(k + 1) * n1, :]
                                  for k in range(W)], axis=2)
            ai = jnp.concatenate([vi[:, k * n1:(k + 1) * n1, :]
                                  for k in range(W)], axis=2)
            x = jnp.concatenate([ar, ai], axis=2)      # [R, n1, 2W*n2]
            xh, xl = _split_act(x)
            wn = W * n2
            for r in range(R):
                p1 = _dot3(w1rh[...], w1rl[...], xh[r], xl[r])
                p2 = _dot3(w1ih[...], w1il[...], xh[r], xl[r])
                # br = Wr@Ar - Wi@Ai ; bi = Wr@Ai + Wi@Ar
                sbr[r, :n1] = p1[:, :wn] - p2[:, wn:]
                sbi[r, :n1] = p1[:, wn:] + p2[:, :wn]
            brv = sbr[...]
            biv = sbi[...]
            cr = brv * twr[...][None] - biv * twi[...][None]
            ci = brv * twi[...][None] + biv * twr[...][None]
            dn = (((1,), (1,)), ((), ()))
            for k in range(W):
                c2r = cr[:, :, k * n2:(k + 1) * n2].reshape(R * P, n2)
                c2i = ci[:, :, k * n2:(k + 1) * n2].reshape(R * P, n2)
                sh, sl = _split_act(c2r + c2i)
                crh, crl = _split_act(c2r)
                cih, cil = _split_act(c2i)
                t0 = _dot3(sh, sl, w2rh[...], w2rl[...], dn)
                dr = t0 - _dot3(cih, cil, w2s1h[...], w2s1l[...], dn)
                di = t0 + _dot3(crh, crl, w2s2h[...], w2s2l[...], dn)
                power = ((dr * dr + di * di) * cf).reshape(R, P, n2)
                _tail(power, wf_ref, mx_ref, idx_ref, b0 + k,
                      n1, n2, q, P, R)
    return kern, P, W


@functools.partial(jax.jit, static_argnames=("n", "q", "nblk_step", "wide",
                                             "sem"))
def spec_v5(re, im, n, q, nblk_step=1, wide=False, sem=None):
    s, t = re.shape
    n2 = 128
    n1 = n // n2
    nblk = t // n
    w1r, w1i = _dft_mats(n1, -1.0)
    twr_, twi_ = _twiddles(n1, n2, -1.0)
    w2r, w2i = _dft_mats(n2, -1.0)
    f64 = np.float64
    w2s1 = (w2r.astype(f64) + w2i.astype(f64)).astype(np.float32)
    w2s2 = (w2i.astype(f64) - w2r.astype(f64)).astype(np.float32)
    kernel, P, W = _mk_v5(n1, n2, q, nblk_step, wide)
    win = np.tile(hamming_np(n).astype(np.float32), W)
    twr = np.zeros((P, n2), np.float32)
    twi = np.zeros((P, n2), np.float32)
    twr[:n1], twi[:n1] = twr_, twi_
    twr = np.tile(twr, (1, W))
    twi = np.tile(twi, (1, W))
    rows = _SPEC_ROWS
    const = lambda z: pl.BlockSpec(z.shape, lambda i, j: (0,) * z.ndim,
                                   memory_space=pltpu.VMEM)
    consts = ([jnp.asarray(win[None, :])]
              + list(_host_split(w1r)) + list(_host_split(w1i))
              + [jnp.asarray(twr), jnp.asarray(twi)]
              + list(_host_split(w2r)) + list(_host_split(w2s1))
              + list(_host_split(w2s2)))
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
        scratch_shapes=[pltpu.VMEM((rows, P, W * n2), jnp.float32),
                        pltpu.VMEM((rows, P, W * n2), jnp.float32)],
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
    import os
    only = os.environ.get("ONLY", "")
    cases = [(1, False, None), (4, False, None),
             (4, True, None), (4, True, PA), (2, True, PA)]
    if only:
        cases = [cases[int(k)] for k in only.split(",")]
    for nbs, wide, sem in cases:
        tag = f"v5 blk{nbs} wide={wide} sem={sem and 'par/arb'}"
        try:
            wf, mx, idx = spec_v5(small_r, small_i, fft_n, 5, nbs, wide, sem)
            dwf = float(np.max(np.abs(np.asarray(wf) - wf0)))
            dmx = float(np.max(np.abs(np.asarray(mx) - mx0)))
            okidx = float(np.mean(np.asarray(idx) == idx0))
            tag += f" dwf={dwf:.2e} dmx={dmx:.2e} idx={okidx:.2f}"
            f = jax.jit(lambda r, i, nb=nbs, w=wide, s=sem:
                        (lambda o: o[0].sum() + o[1].sum() + o[2].sum())(
                            spec_v5(r, i, fft_n, 5, nb, w, s)))
            timeit(f, iq.re, iq.im, tag=tag, samples=samples)
        except Exception as e:
            log(f"{tag}: FAILED {repr(e)[:300]}")


if __name__ == "__main__":
    main()
