"""Is the chained-step headline real? The staged path's spectrum kernel
depends ONLY on the loop-invariant input batch, so XLA's while-loop
invariant code motion can hoist it OUT of the fori_loop — the chained
number then excludes the display-spectrum work entirely (the merged
kernel carries ds_tail state and cannot hoist, which would explain
staged-chained 4.0 ms vs merged-chained 6.35 ms at the same shape).

Measures three forms at 128 x 480000 (the bench shape):
  dispatch   one step per dispatch (honest, + ~1 ms tunnel cost)
  chained    10 steps in one jit, CONSTANT input (the round-3 bench form)
  anti-hoist 10 steps in one jit, the input is loop-CARRIED and one
             element is overwritten with a state-derived value each
             iteration (in-place dynamic-update-slice on the carried
             buffer — no extra HBM pass), so no op is loop-invariant
If chained << anti-hoist ~= dispatch - 1 ms, the hoist is proven and
bench.py must switch to the anti-hoist form.
"""

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
    from jsdr_tpu.ops.cplx import CF, from_complex
    from jsdr_tpu.runtime.tpu import ensure_tpu_ready

    ensure_tpu_ready(attempts=2)
    log(f"device: {jax.devices()[0]}")

    for rate, n_streams, t_len in ((96_000, 128, 480_000),
                                   (96_000, 128, 460_800)):
        cfg = BpskConfig(rate=rate, tuning=12_000.0)
        rng = np.random.default_rng(0)
        base = synth_bpsk_stream(
            rng.integers(0, 256, (2, 256), dtype=np.uint8),
            rate=rate, preamble_bits=400, noise_rms=0.3)
        reps = int(np.ceil(n_streams * t_len / len(base)))
        sig = np.tile(base, reps)[: n_streams * t_len].reshape(
            n_streams, t_len)
        iq = jax.block_until_ready(jax.device_put(from_complex(sig)))
        states = jax.block_until_ready(
            jax.device_put(bpsk_init_batch(cfg, n_streams)))
        samples = n_streams * t_len
        merged = t_len % 38400 == 0

        def forced_of(spec, out):
            return (spec.wf.sum() + spec.peak_db.sum()
                    + spec.peak_freq.sum()
                    + out.windows.astype(jnp.int32).sum()
                    + out.hit_corr.sum() + out.n_hits.sum()
                    + out.n_bits.sum())

        @jax.jit
        def step(iq_re, iq_im, st):
            spec, out, ns = bpsk_block_batch_spectrum(CF(iq_re, iq_im),
                                                      cfg, st)
            return forced_of(spec, out), ns

        jax.block_until_ready(step(iq.re, iq.im, states))
        iters, st = 10, states
        t0 = time.time()
        for _ in range(iters):
            out = step(iq.re, iq.im, st)
            st = out[1]
        jax.block_until_ready(out)
        dt_d = (time.time() - t0) / iters

        k = 10

        @jax.jit
        def chained(iq_re, iq_im, st0):
            def body(_, c):
                acc, st = c
                spec, out, st = bpsk_block_batch_spectrum(
                    CF(iq_re, iq_im), cfg, st)
                return acc + forced_of(spec, out).astype(jnp.float32), st
            return jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), st0))

        jax.block_until_ready(chained(iq.re, iq.im, states))
        m, stc = 3, states
        t0 = time.time()
        for _ in range(m):
            acc, stc = chained(iq.re, iq.im, stc)
        jax.block_until_ready(stc)
        dt_c = (time.time() - t0) / (m * k)

        @jax.jit
        def antihoist(iq_re, iq_im, st0):
            def body(_, c):
                acc, re_buf, st = c
                spec, out, st = bpsk_block_batch_spectrum(
                    CF(re_buf, iq_im), cfg, st)
                f = forced_of(spec, out).astype(jnp.float32)
                # overwrite ONE sample with a state-derived value:
                # in-place on the carried buffer, nothing is invariant
                re_buf = jax.lax.dynamic_update_slice(
                    re_buf, (f * 1e-12)[None, None], (0, 0))
                return acc + f, re_buf, st
            return jax.lax.fori_loop(
                0, k, body, (jnp.float32(0.0), iq_re, st0))

        jax.block_until_ready(antihoist(iq.re, iq.im, states))
        m, stc = 3, states
        t0 = time.time()
        for _ in range(m):
            acc, _, stc = antihoist(iq.re, iq.im, stc)
        jax.block_until_ready(stc)
        dt_a = (time.time() - t0) / (m * k)

        log(f"{rate//1000}k {n_streams}x{t_len} "
            f"({'MERGED' if merged else 'staged'}): "
            f"dispatch {dt_d*1000:.2f} ms | chained-const {dt_c*1000:.2f}"
            f" | chained-antihoist {dt_a*1000:.2f} "
            f"-> honest {samples/dt_a/1e6:.0f} MS/s")


if __name__ == "__main__":
    main()
