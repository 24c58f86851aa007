"""Round-3b v8: hoisted block-batched bf16 splits + wide one-dot stage 2.

All variants keep v3's scratch-batched tail. New vs v3:
  - exact bf16 hi/lo splits of the windowed planes happen ONCE per block
    on [R, n] (batched), not per dot per row;
  - stage 1 is the 4-product form on pre-split operands (12 MXU passes
    per row, zero per-row VPU splits);
  - stage 2 is ONE dot-triple [cr; ci] @ [w2r | w2i] = [2RP, n2] @
    [n2, 2n2] (v7's form) with a single batched split;
  - (2/n) is folded into the window, so power needs no scale;
  - peak max comes from the already-computed decimated array (16
    sublanes) and the argmax is one where+min pass over power.

Modes:
  v8     as above
  v8kar  stage-1 Karatsuba with sum-of-halves splits (9 passes/row,
         approximate split of (ar+ai)) — accuracy probe
  v8skel v8 with the dots replaced by pass-through (VPU skeleton floor)
  v8s2x4 v8 with stage-2 as 4 separate dot3 (isolates the wide-dot win)
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
    import ml_dtypes
    w = np.asarray(w, np.float32)
    wh = w.astype(ml_dtypes.bfloat16)
    wl = (w - wh.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return jnp.asarray(wh), jnp.asarray(wl)


def _split(x):
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return xh, xl


def _dot3(ah, al, bh, bl):
    f = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    return f(ah, bh) + f(ah, bl) + f(al, bh)


def _mk_v8(n1, n2, q, nblk_step, mode):
    P = -(-n1 // 8) * 8
    R = _SPEC_ROWS
    g = n1 // q

    def kern(x_re, x_im, win, w1rh, w1rl, w1ih, w1il, twr, twi,
             w2wh, w2wl, wf_ref, mx_ref, idx_ref, sbr, sbi):
        n = n1 * n2
        if P != n1:
            sbr[:, n1:] = jnp.zeros((R, P - n1, n2), jnp.float32)
            sbi[:, n1:] = jnp.zeros((R, P - n1, n2), jnp.float32)
        for b in range(nblk_step):
            xr = x_re[:, b * n:(b + 1) * n] * win[...]
            xi = x_im[:, b * n:(b + 1) * n] * win[...]
            if mode == "v8skel":
                # skeleton: skip all matmuls; reuse xr/xi as fake outputs
                sbr[:, :n1] = xr.reshape(R, n1, n2)
                sbi[:, :n1] = xi.reshape(R, n1, n2)
            else:
                xrh, xrl = _split(xr)
                xih, xil = _split(xi)
                arh = xrh.reshape(R, n1, n2); arl = xrl.reshape(R, n1, n2)
                aih = xih.reshape(R, n1, n2); ail = xil.reshape(R, n1, n2)
                for r in range(R):
                    rr = _dot3(w1rh[...], w1rl[...], arh[r], arl[r])
                    ii = _dot3(w1ih[...], w1il[...], aih[r], ail[r])
                    ri = _dot3(w1rh[...], w1rl[...], aih[r], ail[r])
                    ir = _dot3(w1ih[...], w1il[...], arh[r], arl[r])
                    sbr[r, :n1] = rr - ii
                    sbi[r, :n1] = ri + ir
            brv = sbr[...]
            biv = sbi[...]
            cr = (brv * twr[...][None] - biv * twi[...][None]
                  ).reshape(R * P, n2)
            ci = (brv * twi[...][None] + biv * twr[...][None]
                  ).reshape(R * P, n2)
            if mode == "v8skel":
                dr, di = cr, ci
            elif mode == "v8s2x4":
                crh, crl = _split(cr)
                cih, cil = _split(ci)
                w2rh = w2wh[...][:, :n2]; w2rl = w2wl[...][:, :n2]
                w2ih = w2wh[...][:, n2:]; w2il = w2wl[...][:, n2:]
                dr = _dot3(crh, crl, w2rh, w2rl) \
                    - _dot3(cih, cil, w2ih, w2il)
                di = _dot3(crh, crl, w2ih, w2il) \
                    + _dot3(cih, cil, w2rh, w2rl)
            else:
                c2 = jnp.concatenate([cr, ci], axis=0)        # [2RP, n2]
                ch, cl = _split(c2)
                pout = _dot3(ch, cl, w2wh[...], w2wl[...])    # [2RP, 2n2]
                RP = R * P
                dr = pout[:RP, :n2] - pout[RP:, n2:]
                di = pout[:RP, n2:] + pout[RP:, :n2]
            power = (dr * dr + di * di).reshape(R, P, n2)
            dec = jnp.max(power.reshape(R, P // q, q, n2), axis=2)
            wf_ref[b] = 10.0 * jnp.log10(jnp.maximum(dec[:, :g], _EPS))
            mx_raw = jnp.max(jnp.max(dec, axis=1), axis=1)    # [R]
            iop = lax.broadcasted_iota(jnp.int32, (R, P, n2), 1)
            iol = lax.broadcasted_iota(jnp.int32, (R, P, n2), 2)
            cand = jnp.where(power == mx_raw[:, None, None],
                             iop * n2 + iol, jnp.int32(n1 * n2))
            mx_ref[b] = jnp.broadcast_to(
                (10.0 * jnp.log10(jnp.maximum(mx_raw, _EPS)))[:, None],
                (R, 128))
            idx_ref[b] = jnp.broadcast_to(
                jnp.min(jnp.min(cand, axis=1), axis=1)[:, None], (R, 128))
    return kern, P


@functools.partial(jax.jit, static_argnames=("n", "q", "nblk_step", "mode",
                                             "sem"))
def spec_v8(re, im, n, q, nblk_step=1, mode="v8", sem=None):
    s, t = re.shape
    n2 = 128
    n1 = n // n2
    nblk = t // n
    w1r, w1i = _dft_mats(n1, -1.0)
    twr_, twi_ = _twiddles(n1, n2, -1.0)
    w2r, w2i = _dft_mats(n2, -1.0)
    win = hamming_np(n).astype(np.float64) * (2.0 / n)
    win = win.astype(np.float32)
    kernel, P = _mk_v8(n1, n2, q, nblk_step, mode)
    w2w = np.concatenate([w2r, w2i], axis=1)          # [n2, 2n2]
    twr = np.zeros((P, n2), np.float32)
    twi = np.zeros((P, n2), np.float32)
    twr[:n1], twi[:n1] = twr_, twi_
    rows = _SPEC_ROWS
    const = lambda z: pl.BlockSpec(z.shape, lambda i, j: (0,) * z.ndim,
                                   memory_space=pltpu.VMEM)
    consts = ([jnp.asarray(win[None, :])]
              + list(_host_split(w1r)) + list(_host_split(w1i))
              + [jnp.asarray(twr), jnp.asarray(twi)]
              + list(_host_split(w2w)))
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
    import os
    cases = [("v8", 4, PA), ("v8", 2, PA), ("v8", 1, None),
             ("v8s2x4", 4, PA), ("v8skel", 4, PA), ("v8", 4, None)]
    only = os.environ.get("ONLY", "")
    if only:
        cases = [cases[int(k)] for k in only.split(",")]
    for mode, nbs, sem in cases:
        tag = f"{mode} blk{nbs} sem={sem and 'par/arb'}"
        try:
            if mode != "v8skel":
                wf, mx, idx = spec_v8(small_r, small_i, fft_n, 5, nbs,
                                      mode, sem)
                dwf = float(np.max(np.abs(np.asarray(wf) - wf0)))
                dmx = float(np.max(np.abs(np.asarray(mx) - mx0)))
                okidx = float(np.mean(np.asarray(idx) == idx0))
                tag += f" dwf={dwf:.2e} dmx={dmx:.2e} idx={okidx:.2f}"
            f = jax.jit(lambda r, i, m=mode, nb=nbs, s=sem:
                        (lambda o: o[0].sum() + o[1].sum() + o[2].sum())(
                            spec_v8(r, i, fft_n, 5, nb, m, s)))
            timeit(f, iq.re, iq.im, tag=tag, samples=samples)
        except Exception as e:
            log(f"{tag}: FAILED {repr(e)[:300]}")


if __name__ == "__main__":
    main()
