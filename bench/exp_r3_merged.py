"""Round-3: merged spectrum+front-end step vs staged, on TPU, same run."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_block_batch,
                                 bpsk_block_batch_spectrum, bpsk_init_batch)
from jsdr_tpu.io.sources import synth_bpsk_stream
from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.ops.pallas_kernels import spectrum_waterfall
from jsdr_tpu.runtime.tpu import ensure_tpu_ready

def log(*a): print(*a, file=sys.stderr, flush=True)

def bench_chain(tag, step, iq, states, samples, iters=20):
    r = jax.block_until_ready(step(iq.re, iq.im, states))
    st = states
    t0 = time.time()
    for _ in range(iters):
        out = step(iq.re, iq.im, st)
        st = out[-1]
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    log(f"{tag}: {dt*1000:.2f} ms/step ({samples/dt/1e6:.0f} MS/s) "
        f"hits={int(out[-2])}")
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

    @jax.jit
    def staged(re, im, st):
        wf, mx, idx = spectrum_waterfall(CF(re, im), fft_n)
        out, ns = bpsk_block_batch(CF(re, im), cfg, st, None)
        forced = (wf.sum() + mx.sum() + idx.sum()
                  + out.windows.astype(jnp.int32).sum()
                  + out.hit_corr.sum() + out.n_hits.sum() + out.n_bits.sum())
        return forced, out.n_hits.sum(), ns

    @jax.jit
    def merged(re, im, st):
        spec, out, ns = bpsk_block_batch_spectrum(CF(re, im), cfg, st)
        forced = (spec.wf.sum() + spec.peak_db.sum()
                  + spec.peak_freq.sum()
                  + out.windows.astype(jnp.int32).sum()
                  + out.hit_corr.sum() + out.n_hits.sum() + out.n_bits.sum())
        return forced, out.n_hits.sum(), ns

    bench_chain("staged (wf spectrum + chain)", staged, iq, states, samples)
    bench_chain("merged (one input read)", merged, iq, states, samples)

    # dispatch-size scaling of the merged step
    for s_big, t_big in ((128, 960_000),):
        reps2 = int(np.ceil(s_big * t_big / len(base)))
        sig2 = np.tile(base, reps2)[: s_big * t_big].reshape(s_big, t_big)
        iq2 = jax.device_put(from_complex(sig2))
        st2 = jax.device_put(bpsk_init_batch(cfg, s_big))
        jax.block_until_ready((iq2, st2))
        bench_chain(f"merged {s_big}x{t_big//96000}s", merged, iq2, st2,
                    s_big * t_big, iters=10)


if __name__ == "__main__":
    main()
