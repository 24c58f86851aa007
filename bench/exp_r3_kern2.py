"""Round-3: attribute kernel-internal costs on TPU.

1. spectrum_waterfall after the log-free rework
2. mix_decimate precision sweep (bf16 1-pass vs bf16x3 3-pass): is the
   front-end kernel MXU-pass-bound?
3. mix_decimate_mf (fused) same sweep
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from jsdr_tpu.demod import bpsk as B
from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.ops.pallas_kernels import (mix_decimate, mix_decimate_mf,
                                         spectrum_fused, spectrum_waterfall)
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
    states = jax.device_put(
        B.bpsk_init_batch(B.BpskConfig(rate=rate), n_streams))
    jax.block_until_ready((iq, states))

    f_wf = jax.jit(lambda r, i: (lambda o: o[0].sum() + o[1].sum()
                                 + o[2].sum())(
                                     spectrum_waterfall(CF(r, i), fft_n)))
    timeit(f_wf, iq.re, iq.im, tag="spectrum_waterfall (log-free)",
           samples=samples)
    for prec in ("bf16x3", "bf16"):
        f_p = jax.jit(lambda r, i, p=prec: (lambda o: o[0].sum()
                                            + o[1].sum() + o[2].sum())(
            spectrum_waterfall(CF(r, i), fft_n, precision=p)))
        timeit(f_p, iq.re, iq.im,
               tag=f"spectrum_waterfall precision={prec}", samples=samples)

    taps = B.DS_FILTER.astype(np.float32)
    tunings = jnp.full((n_streams,), 12000, jnp.int32)
    vcoc, vcos = B._vco_pattern(jnp.zeros(n_streams, jnp.int32))
    mft = CF(jnp.zeros((n_streams, 64)), jnp.zeros((n_streams, 64)))

    for prec in ("bf16x3", "bf16"):
        @jax.jit
        def front(re, im, st, p=prec):
            cos_pat, sin_pat = B._nco_pattern(st.tu_phase, tunings * B.NU_SCALE, rate)
            ds, tail = mix_decimate(CF(re, im), cos_pat, sin_pat, taps, 10,
                                    st.ds_tail, gain=B.HOWARD_FUDGE_FACTOR,
                                    precision=p)
            return ds.re.sum() + ds.im.sum() + tail.re.sum()
        timeit(front, iq.re, iq.im, states,
               tag=f"mix_decimate precision={prec}", samples=samples)

        @jax.jit
        def front_mf(re, im, st, p=prec):
            cos_pat, sin_pat = B._nco_pattern(st.tu_phase, tunings * B.NU_SCALE, rate)
            mf, tail, mtail = mix_decimate_mf(
                CF(re, im), cos_pat, sin_pat, taps, 10, st.ds_tail,
                vcoc, vcos, B.DM_FILTER.astype(np.float32), mft,
                gain=B.HOWARD_FUDGE_FACTOR, precision=p)
            return mf.re.sum() + mf.im.sum() + tail.re.sum() + mtail.re.sum()
        timeit(front_mf, iq.re, iq.im, states,
               tag=f"mix_decimate_mf precision={prec}", samples=samples)


if __name__ == "__main__":
    main()
