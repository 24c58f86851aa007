"""Round-3 experiment: the re-worked bench step — waterfall-mode
spectrum (no full-PSD HBM write) + fused front end (VCO+MF in-kernel).
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from jsdr_tpu.demod.bpsk import BpskConfig, bpsk_block_batch, bpsk_init_batch
from jsdr_tpu.io.sources import synth_bpsk_stream
from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.ops.pallas_kernels import spectrum_waterfall
from jsdr_tpu.ops.spectrum import spectrum_wide
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
    cfg = BpskConfig(rate=rate, tuning=12_000.0)
    rng = np.random.default_rng(0)
    base = synth_bpsk_stream(
        rng.integers(0, 256, (2, 256), dtype=np.uint8),
        rate=rate, preamble_bits=400, noise_rms=0.3)
    reps = int(np.ceil(n_streams * t_len / len(base)))
    sig = np.tile(base, reps)[: n_streams * t_len].reshape(n_streams, t_len)
    iq = jax.device_put(from_complex(sig))
    states = jax.device_put(bpsk_init_batch(cfg, n_streams))
    jax.block_until_ready((iq, states))

    # new chain alone (fused mf)
    @jax.jit
    def chain(re, im, st):
        out, ns = bpsk_block_batch(CF(re, im), cfg, st, None)
        return (out.windows.astype(jnp.int32).sum() + out.hit_corr.sum()
                + out.n_hits.sum() + out.n_bits.sum(), out.n_hits.sum())
    r = jax.block_until_ready(chain(iq.re, iq.im, states))
    log(f"chain hits={int(r[1])}")
    timeit(chain, iq.re, iq.im, states, tag="bpsk chain (fused mf)",
           samples=samples)

    # new spectrum alone
    f_wf = jax.jit(lambda r, i: (lambda o: o[0].sum() + o[1].sum()
                                 + o[2].sum())(
                                     spectrum_waterfall(CF(r, i), fft_n)))
    timeit(f_wf, iq.re, iq.im, tag="spectrum_waterfall", samples=samples)

    # full new step
    @jax.jit
    def step(re, im, st):
        wf, mx, idx = spectrum_waterfall(CF(re, im), fft_n)
        out, ns = bpsk_block_batch(CF(re, im), cfg, st, None)
        forced = (wf.sum() + mx.sum() + idx.sum()
                  + out.windows.astype(jnp.int32).sum()
                  + out.hit_corr.sum() + out.n_hits.sum() + out.n_bits.sum())
        return forced, out.n_hits.sum(), ns
    r = jax.block_until_ready(step(iq.re, iq.im, states))
    log(f"step hits={int(r[1])}")
    iters, st = 20, states
    t0 = time.time()
    for _ in range(iters):
        out = step(iq.re, iq.im, st)
        st = out[2]
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    log(f"NEW FULL STEP: {dt*1000:.2f} ms ({samples/dt/1e6:.0f} MS/s)")

    # old full step for comparison
    @jax.jit
    def step_old(re, im, st):
        spec = spectrum_wide(CF(re, im), fft_n, rate=float(rate),
                             window=True, natural=False)
        out, ns = bpsk_block_batch(CF(re, im), cfg, st, None,
                                   use_pallas=True)
        forced = (spec.psd.sum() + spec.peak_db.sum()
                  + out.windows.astype(jnp.int32).sum()
                  + out.hit_corr.sum() + out.n_hits.sum() + out.n_bits.sum())
        return forced, out.n_hits.sum(), ns
    timeit(step_old, iq.re, iq.im, states, tag="old full step (psd out)",
           samples=samples)


if __name__ == "__main__":
    main()
