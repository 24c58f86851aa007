"""Round-3c: merged-step timing at both hardware rates after the
scratch-batched spectrum tail + sf_geometry 192k VMEM fit."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_block_batch,
                                 bpsk_block_batch_spectrum, bpsk_init_batch)
from jsdr_tpu.io.sources import synth_bpsk_stream
from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.ops.pallas_kernels import spectrum_waterfall
from jsdr_tpu.runtime.tpu import ensure_tpu_ready


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_rate(rate, n_streams=64, secs=10, iters=20):
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
    def merged(re, im, st):
        spec, out, ns = bpsk_block_batch_spectrum(CF(re, im), cfg, st, None)
        forced = (spec.wf.sum() + spec.peak_db.sum()
                  + spec.peak_freq.sum().astype(jnp.float32)
                  + out.windows.astype(jnp.int32).sum()
                  + out.n_hits.sum()).astype(jnp.float32)
        return forced, out.n_hits.sum(), ns

    @jax.jit
    def staged(re, im, st):
        wf, mx, idx = spectrum_waterfall(CF(re, im), rate // 10)
        out, ns = bpsk_block_batch(CF(re, im), cfg, st, None)
        forced = (wf.sum() + mx.sum() + idx.sum()
                  + out.windows.astype(jnp.int32).sum()
                  + out.n_hits.sum()).astype(jnp.float32)
        return forced, out.n_hits.sum(), ns

    for tag, step in (("merged", merged), ("staged", staged)):
        try:
            out = jax.block_until_ready(step(iq.re, iq.im, states))
        except Exception as e:  # noqa: BLE001 — report compile failures
            log(f"{rate//1000}k {tag}: FAILED {repr(e)[:300]}")
            continue
        st = states
        t0 = time.time()
        for _ in range(iters):
            out = step(iq.re, iq.im, st)
            st = out[-1]
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        log(f"{rate//1000}k {tag}: {dt*1000:.2f} ms/step "
            f"({samples/dt/1e6:.0f} MS/s) hits={int(out[1])}")


def main():
    ensure_tpu_ready(attempts=2)
    log(f"device: {jax.devices()[0]}")
    run_rate(96_000)
    run_rate(192_000)


if __name__ == "__main__":
    main()
