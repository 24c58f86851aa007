"""A/B of the batched timing-recovery implementation inside the honest
chained merged step at the round-4 bench shape: the VMEM Pallas kernel
(default) vs the XLA associative-scan form (standalone measurements at
128x5s put them at 2.18 vs 2.04 ms incl dispatch — is the in-step
difference real?). Run once per variant in a fresh process:
    python bench/exp_r8_timing.py 1   # Pallas kernel
    python bench/exp_r8_timing.py 0   # XLA form
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.demod import bpsk as B
    from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_block_batch_spectrum,
                                     bpsk_init_batch)
    from jsdr_tpu.io.sources import synth_bpsk_stream
    from jsdr_tpu.ops.cplx import CF, from_complex
    from jsdr_tpu.runtime.tpu import ensure_tpu_ready

    B.TIMING_PALLAS = sys.argv[1] == "1" if len(sys.argv) > 1 else True
    ensure_tpu_ready(attempts=2)
    rate, n_streams, t_len = 96_000, 128, 460_800
    cfg = BpskConfig(rate=rate, tuning=12_000.0)
    rng = np.random.default_rng(3)
    base = synth_bpsk_stream(rng.integers(0, 256, (1, 256), dtype=np.uint8),
                             rate=rate, preamble_bits=400, noise_rms=0.3)
    reps = int(np.ceil(n_streams * t_len / len(base)))
    sig = np.tile(base, reps)[: n_streams * t_len].reshape(n_streams, t_len)
    iq = jax.block_until_ready(jax.device_put(from_complex(sig)))
    states = jax.block_until_ready(
        jax.device_put(bpsk_init_batch(cfg, n_streams)))
    k = 10

    @jax.jit
    def chained(iq_re, iq_im, st0):
        def body(_, c):
            acc, re_buf, st = c
            spec, out, st = bpsk_block_batch_spectrum(
                CF(re_buf, iq_im), cfg, st)
            f = (spec.wf.sum() + spec.peak_db.sum() + spec.peak_freq.sum()
                 + out.windows.astype(jnp.int32).sum() + out.hit_corr.sum()
                 + out.n_hits.sum() + out.n_bits.sum()).astype(jnp.float32)
            re_buf = jax.lax.dynamic_update_slice(
                re_buf, (f * 1e-12)[None, None], (0, 0))
            return acc + f, re_buf, st
        return jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), iq_re, st0))

    jax.block_until_ready(chained(iq.re, iq.im, states))
    m, stc = 3, states
    t0 = time.time()
    for _ in range(m):
        acc, _, stc = chained(iq.re, iq.im, stc)
    jax.block_until_ready(stc)
    dt = (time.time() - t0) / (m * k)
    log(f"TIMING_PALLAS={B.TIMING_PALLAS}: {dt*1000:.2f} ms/step "
        f"-> {n_streams*t_len/dt/1e6:.0f} MS/s honest")


if __name__ == "__main__":
    main()
