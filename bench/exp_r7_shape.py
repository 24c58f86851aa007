"""Honest (hoist-proof) shape sweep of the merged one-pass step.

Round 3's block-size sweep (exp_r6_chain*.py) timed a chained fori_loop
with CONSTANT input, which let XLA hoist the state-free spectrum kernel
out of the loop on staged shapes (proven in exp_r7_hoist.py) — its
"128x5s is 1.75x faster than 64x10s" conclusion was mostly artifact.
This sweep uses the anti-hoist carried-buffer form on MERGED-eligible
lengths (t % 38400 == 0) to find the real optimum.
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(rate, n_streams, t_len):
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_block_batch_spectrum,
                                     bpsk_init_batch)
    from jsdr_tpu.io.sources import synth_bpsk_stream
    from jsdr_tpu.ops.cplx import CF, from_complex

    cfg = BpskConfig(rate=rate, tuning=12_000.0)
    rng = np.random.default_rng(3)
    base = synth_bpsk_stream(
        rng.integers(0, 256, (1, 256), dtype=np.uint8),
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
    samples = n_streams * t_len
    merged = t_len % 38400 == 0
    log(f"{rate//1000}k {n_streams} x {t_len} ({t_len/rate:.2f}s, "
        f"{'MERGED' if merged else 'staged'}): {dt*1000:.2f} ms/step "
        f"-> {samples/dt/1e6:.0f} MS/s honest")


def main():
    import jax
    from jsdr_tpu.runtime.tpu import ensure_tpu_ready
    log(f"device: {jax.devices()[0]}")
    ensure_tpu_ready(attempts=2)
    import os
    shapes = os.environ.get("JSDR_SHAPES", "")
    if shapes:
        for spec in shapes.split(";"):
            r, s, t = (int(v) for v in spec.split(","))
            run(r, s, t)
        return
    for rate, s, t in ((96_000, 64, 460_800), (96_000, 128, 230_400),
                       (96_000, 256, 230_400), (96_000, 64, 960_000),
                       (96_000, 128, 460_800),
                       (192_000, 256, 460_800), (192_000, 128, 460_800),
                       (192_000, 256, 230_400)):
        run(rate, s, t)


if __name__ == "__main__":
    main()
