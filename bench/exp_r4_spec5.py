"""Round-3b v7: sublane-stacked 4-product dots.

Stage 1 per row: ONE dot-triple [w1r; w1i](padded) @ [Ar | Ai] —
[2P, n1] @ [n1, 2*n2] — produces all four real products in one pass set
(3 bf16 passes).  Stage 2 per block: ONE dot-triple [cr; ci] @
[w2r | w2i] — [2*R*P, n2] @ [n2, 2*n2] (w2 is symmetric, so plain dot).
MXU ops per 8-row block: 8*3 + 3 = 27 (shipped kernel: 144).
All splits/twiddle/power/dec/peak batched (v3 scratch layout).
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


def _split_act(x):
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return xh, xl


def _dot3(ah, al, bh, bl):
    d = lax.Precision.DEFAULT
    f = lambda x, y: jnp.dot(x, y, precision=d,
                             preferred_element_type=jnp.float32)
    return f(ah, bh) + f(ah, bl) + f(al, bh)


def _mk_v7(n1, n2, q, nblk_step):
    P = -(-n1 // 8) * 8
    R = _SPEC_ROWS

    def kern(x_re, x_im, win, w1sh, w1sl, twr, twi, w2wh, w2wl,
             wf_ref, mx_ref, idx_ref, sbr, sbi):
        n = n1 * n2
        cf = np.float32((2.0 / n) ** 2)
        if P != n1:
            sbr[:, n1:] = jnp.zeros((R, P - n1, n2), jnp.float32)
            sbi[:, n1:] = jnp.zeros((R, P - n1, n2), jnp.float32)
        for b in range(nblk_step):
            vr = (x_re[:, b * n:(b + 1) * n] * win[...]).reshape(R, n1, n2)
            vi = (x_im[:, b * n:(b + 1) * n] * win[...]).reshape(R, n1, n2)
            x = jnp.concatenate([vr, vi], axis=2)      # [R, n1, 2n2]
            xh, xl = _split_act(x)
            for r in range(R):
                out = _dot3(w1sh[...], w1sl[...], xh[r], xl[r])  # [2P, 2n2]
                p1 = out[:P]
                p2 = out[P:]
                sbr[r, :n1] = p1[:n1, :n2] - p2[:n1, n2:]
                sbi[r, :n1] = p1[:n1, n2:] + p2[:n1, :n2]
            brv = sbr[...]
            biv = sbi[...]
            cr = brv * twr[...][None] - biv * twi[...][None]
            ci = brv * twi[...][None] + biv * twr[...][None]
            cst = jnp.concatenate([cr.reshape(R * P, n2),
                                   ci.reshape(R * P, n2)], axis=0)
            csh, csl = _split_act(cst)
            pout = _dot3(csh, csl, w2wh[...], w2wl[...])  # [2RP, 2n2]
            top = pout[:R * P]
            bot = pout[R * P:]
            dr = top[:, :n2] - bot[:, n2:]
            di = top[:, n2:] + bot[:, :n2]
            power = ((dr * dr + di * di) * cf).reshape(R, P, n2)
            dec = jnp.max(power.reshape(R, P // q, q, n2), axis=2)
            wf_ref[b] = 10.0 * jnp.log10(jnp.maximum(dec[:, :n1 // q], _EPS))
            col_max = jnp.max(power, axis=1)
            col_arg = jnp.argmax(power, axis=1).astype(jnp.int32)
            mx_raw = jnp.max(col_max, axis=1)
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
def spec_v7(re, im, n, q, nblk_step=1, sem=None):
    s, t = re.shape
    n2 = 128
    n1 = n // n2
    nblk = t // n
    w1r, w1i = _dft_mats(n1, -1.0)
    twr_, twi_ = _twiddles(n1, n2, -1.0)
    w2r, w2i = _dft_mats(n2, -1.0)
    win = hamming_np(n).astype(np.float32)
    kernel, P = _mk_v7(n1, n2, q, nblk_step)
    # stacked stage-1 weights [2P, n1]: rows 0:n1 = w1r, P:P+n1 = w1i
    w1s = np.zeros((2 * P, n1), np.float32)
    w1s[:n1] = w1r
    w1s[P:P + n1] = w1i
    # wide stage-2 weights [n2, 2n2] = [w2r | w2i] (both symmetric)
    w2w = np.concatenate([w2r, w2i], axis=1)
    twr = np.zeros((P, n2), np.float32)
    twi = np.zeros((P, n2), np.float32)
    twr[:n1], twi[:n1] = twr_, twi_
    rows = _SPEC_ROWS
    const = lambda z: pl.BlockSpec(z.shape, lambda i, j: (0,) * z.ndim,
                                   memory_space=pltpu.VMEM)
    consts = ([jnp.asarray(win[None, :])]
              + list(_host_split(w1s))
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
    for nbs, sem in [(1, None), (4, None), (4, PA), (2, None)]:
        tag = f"v7 blk{nbs} sem={sem and 'par/arb'}"
        try:
            wf, mx, idx = spec_v7(small_r, small_i, fft_n, 5, nbs, sem)
            dwf = float(np.max(np.abs(np.asarray(wf) - wf0)))
            dmx = float(np.max(np.abs(np.asarray(mx) - mx0)))
            okidx = float(np.mean(np.asarray(idx) == idx0))
            tag += f" dwf={dwf:.2e} dmx={dmx:.2e} idx={okidx:.2f}"
            f = jax.jit(lambda r, i, nb=nbs, s=sem:
                        (lambda o: o[0].sum() + o[1].sum() + o[2].sum())(
                            spec_v7(r, i, fft_n, 5, nb, s)))
            timeit(f, iq.re, iq.im, tag=tag, samples=samples)
        except Exception as e:
            log(f"{tag}: FAILED {repr(e)[:300]}")


if __name__ == "__main__":
    main()
