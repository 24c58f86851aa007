"""Merged kernel vs staged fallback at the short-block optimum.

The exp_r6 sweeps landed on t_len=480000, which is NOT a multiple of
the merged kernel's grid chunk (sf_geometry: 38400 at 96k m=10 AND at
192k m=20), so bpsk_block_batch_spectrum silently took the staged
two-read path at the new bench shapes — and still won. This measures
merged-eligible lengths bracketing the optimum to see if the one-read
kernel adds more on top."""

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
    from jsdr_tpu.ops.cplx import from_complex

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
    def chained(iq, states):
        def body(_, carry):
            acc, st = carry
            spec, out, st = bpsk_block_batch_spectrum(iq, cfg, st)
            forced = (spec.wf.sum() + spec.peak_db.sum()
                      + out.windows.astype(jnp.int32).sum()
                      + out.hit_corr.sum() + out.n_hits.sum()
                      + out.n_bits.sum())
            return acc + forced.astype(jnp.float32), st
        return jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), states))

    jax.block_until_ready(chained(iq, states))
    m, stc = 3, states
    t0 = time.time()
    for _ in range(m):
        acc, stc = chained(iq, stc)
    jax.block_until_ready(stc)
    dt = (time.time() - t0) / (m * k)
    samples = n_streams * t_len
    merged = t_len % 38400 == 0
    log(f"{rate//1000}k {n_streams} x {t_len} ({t_len/rate:.2f}s, "
        f"{'MERGED' if merged else 'staged'}): {dt*1000:.2f} ms/step "
        f"-> {samples/dt/1e6:.0f} MS/s")


def main():
    import jax
    from jsdr_tpu.runtime.tpu import ensure_tpu_ready
    log(f"device: {jax.devices()[0]}")
    ensure_tpu_ready(attempts=1)
    for rate, s, t in ((96_000, 128, 460_800), (96_000, 128, 499_200),
                       (96_000, 128, 480_000),
                       (192_000, 256, 460_800), (192_000, 256, 499_200)):
        run(rate, s, t)


if __name__ == "__main__":
    main()
