"""Round-3: characterize the ~2.2 ms fixed per-dispatch overhead of the
tunneled TPU backend.

1. dependent chain of trivial ops -> per-step floor
2. one dependent chain of 256 MB copies vs TWO interleaved independent
   chains: does dispatch overhead overlap device compute?
3. same for the real telemetry step (two independent stream batches)
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from jsdr_tpu.demod.bpsk import BpskConfig, bpsk_block_batch, bpsk_init_batch
from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.ops.spectrum import spectrum_wide
from jsdr_tpu.runtime.tpu import ensure_tpu_ready

def log(*a): print(*a, file=sys.stderr, flush=True)


def main():
    ensure_tpu_ready(attempts=1)
    log(f"device: {jax.devices()[0]}")

    # 1. trivial dependent chain
    x = jax.device_put(jnp.zeros((8, 128), jnp.float32))
    f = jax.jit(lambda a: a + 1.0)
    x = jax.block_until_ready(f(x))
    t0 = time.time()
    y = x
    for _ in range(50):
        y = f(y)
    jax.block_until_ready(y)
    log(f"tiny dependent chain: {(time.time()-t0)/50*1000:.2f} ms/step")

    # independent tiny ops
    t0 = time.time()
    outs = [f(x) for _ in range(50)]
    jax.block_until_ready(outs)
    log(f"tiny independent x50: {(time.time()-t0)/50*1000:.2f} ms/step")

    # 2. copy chains
    big = jax.device_put(jnp.ones((64, 1024, 1024), jnp.float32))  # 256 MB
    g = jax.jit(lambda a: a * 1.0000001)
    a = jax.block_until_ready(g(big))
    t0 = time.time()
    y = a
    for _ in range(20):
        y = g(y)
    jax.block_until_ready(y)
    one = time.time() - t0
    log(f"copy 256MB dependent x20: {one/20*1000:.2f} ms/step")
    b = jax.block_until_ready(g(a))
    t0 = time.time()
    ya, yb = a, b
    for _ in range(10):
        ya = g(ya)
        yb = g(yb)
    jax.block_until_ready((ya, yb))
    two = time.time() - t0
    log(f"copy 256MB two interleaved chains x10 each: "
        f"{two/20*1000:.2f} ms/step ({one/two:.2f}x)")

    # 3. real telemetry step, one vs two interleaved batches
    rate, n_streams, t_len, fft_n = 96_000, 64, 960_000, 9_600
    samples = n_streams * t_len
    cfg = BpskConfig(rate=rate, tuning=12_000.0)
    rng = np.random.default_rng(0)
    sig = (0.2 * (rng.standard_normal((n_streams, t_len))
                  + 1j * rng.standard_normal((n_streams, t_len)))
           ).astype(np.complex64)
    iq = jax.device_put(from_complex(sig))
    st1 = jax.device_put(bpsk_init_batch(cfg, n_streams))
    st2 = jax.device_put(bpsk_init_batch(cfg, n_streams))
    jax.block_until_ready((iq, st1, st2))

    @jax.jit
    def step(re, im, st):
        spec = spectrum_wide(CF(re, im), fft_n, rate=float(rate),
                             window=True, natural=False)
        out, ns = bpsk_block_batch(CF(re, im), cfg, st, None)
        forced = (spec.psd.sum() + spec.peak_db.sum()
                  + out.windows.astype(jnp.int32).sum()
                  + out.hit_corr.sum() + out.n_hits.sum() + out.n_bits.sum())
        return forced, ns

    jax.block_until_ready(step(iq.re, iq.im, st1))
    t0 = time.time()
    s = st1
    for _ in range(20):
        out = step(iq.re, iq.im, s)
        s = out[1]
    jax.block_until_ready(out)
    one = time.time() - t0
    log(f"step single chain x20: {one/20*1000:.2f} ms/step "
        f"({20*samples/one/1e6:.0f} MS/s)")

    t0 = time.time()
    sa, sb = st1, st2
    for _ in range(10):
        oa = step(iq.re, iq.im, sa)
        ob = step(iq.re, iq.im, sb)
        sa, sb = oa[1], ob[1]
    jax.block_until_ready((oa, ob))
    two = time.time() - t0
    log(f"step two interleaved chains x10 each: {two/20*1000:.2f} ms/step "
        f"({20*samples/two/1e6:.0f} MS/s, {one/two:.2f}x)")


if __name__ == "__main__":
    main()
