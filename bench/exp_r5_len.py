"""Round-3c: dispatch-length scaling of the merged step.

The ~1 ms per-dispatch overhead of this environment's tunneled backend
is 12% of a 64x10s step. Longer dispatches (same 64 streams, more
seconds per step) amortize it; stream-count scaling was already
measured counterproductive (128x10s: 15.6 ms). This measures 10/20/40 s.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_block_batch_spectrum,
                                 bpsk_init_batch)
from jsdr_tpu.io.sources import synth_bpsk_stream
from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.runtime.tpu import ensure_tpu_ready


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(secs, n_streams=64, rate=96_000, iters=20):
    t_len = rate * secs
    samples = n_streams * t_len
    cfg = BpskConfig(rate=rate, tuning=12_000.0)
    rng = np.random.default_rng(0)
    base = synth_bpsk_stream(
        rng.integers(0, 256, (2, 256), dtype=np.uint8),
        rate=rate, preamble_bits=400, noise_rms=0.3)
    reps = int(np.ceil(samples / len(base)))
    sig = np.tile(base, reps)[:samples].reshape(n_streams, t_len)
    iq = jax.device_put(from_complex(sig))
    states = jax.device_put(bpsk_init_batch(cfg, n_streams))
    jax.block_until_ready((iq, states))

    @jax.jit
    def step(re, im, st):
        spec, out, ns = bpsk_block_batch_spectrum(CF(re, im), cfg, st, None)
        forced = (spec.wf.sum() + spec.peak_db.sum()
                  + out.windows.astype(jnp.int32).sum() + out.n_hits.sum())
        return forced, out.n_hits.sum(), ns

    out = jax.block_until_ready(step(iq.re, iq.im, states))
    st = states
    t0 = time.time()
    for _ in range(iters):
        out = step(iq.re, iq.im, st)
        st = out[-1]
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    log(f"64x{secs}s: {dt*1000:.2f} ms/step ({samples/dt/1e6:.0f} MS/s) "
        f"hits={int(out[1])}")
    del iq, states, st, out


def main():
    ensure_tpu_ready(attempts=2)
    log(f"device: {jax.devices()[0]}")
    for secs in (10, 20, 40):
        run(secs)


if __name__ == "__main__":
    main()
