"""Chained-dispatch block-size sweep: with k steps fused into one jit
(bench.py steady-state), the ~1 ms/dispatch tunnel cost amortizes k-fold,
so the block-size sweet spot may move BELOW 64x10 s — device time scales
superlinearly in block length (PERF.md "Dispatch scaling": larger tail
arrays lose locality), and chaining removes the overhead that used to
penalize small blocks."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_block_batch_spectrum,
                                     bpsk_init_batch)
    from jsdr_tpu.io.sources import synth_bpsk_stream
    from jsdr_tpu.ops.cplx import from_complex
    from jsdr_tpu.runtime.tpu import ensure_tpu_ready

    log(f"device: {jax.devices()[0]}")
    ensure_tpu_ready(attempts=1)
    rate = 96_000
    cfg = BpskConfig(rate=rate, tuning=12_000.0)
    rng = np.random.default_rng(0)
    base = synth_bpsk_stream(
        rng.integers(0, 256, (2, 256), dtype=np.uint8),
        rate=rate, preamble_bits=400, noise_rms=0.3)

    for n_streams, t_len in ((128, 240_000), (256, 240_000),
                             (256, 96_000), (512, 240_000),
                             (256, 480_000), (128, 480_000)):
        reps = int(np.ceil(n_streams * t_len / len(base)))
        sig = np.tile(base, reps)[: n_streams * t_len]
        sig = sig.reshape(n_streams, t_len)
        iq = jax.block_until_ready(jax.device_put(from_complex(sig)))
        states = jax.block_until_ready(
            jax.device_put(bpsk_init_batch(cfg, n_streams)))
        k = 10

        @jax.jit
        def chained(iq, states):
            def body(_, carry):
                acc, st = carry
                spec, out, st = bpsk_block_batch_spectrum(iq, cfg, st)
                forced = (spec.wf.sum() + spec.peak_db.sum()
                          + spec.peak_freq.sum()
                          + out.windows.astype(jnp.int32).sum()
                          + out.hit_corr.sum() + out.n_hits.sum()
                          + out.n_bits.sum())
                return acc + forced.astype(jnp.float32), st
            return jax.lax.fori_loop(0, k, body,
                                     (jnp.float32(0.0), states))

        t0 = time.time()
        jax.block_until_ready(chained(iq, states))
        t_c = time.time() - t0
        m, stc = 3, states
        t0 = time.time()
        for _ in range(m):
            acc, stc = chained(iq, stc)
        jax.block_until_ready(stc)
        dt = (time.time() - t0) / (m * k)
        samples = n_streams * t_len
        log(f"{n_streams} x {t_len/rate:.1f}s chained: {dt*1000:.2f} ms/step "
            f"-> {samples/dt/1e6:.0f} MS/s (compile+first {t_c:.1f}s)")


if __name__ == "__main__":
    main()
