"""compat_scan cost on the TPU backend: the per-sample lax.scan timing
recovery (fp-order parity mode, demod/bpsk.py::_timing_scan) vs the
default parallel path, small shape (64 x 1 s). Result feeds the
RuntimeWarning in bpsk_block_batch and PERF.md."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_block_batch,
                                     bpsk_init_batch)
    from jsdr_tpu.io.sources import synth_bpsk_stream
    from jsdr_tpu.ops.cplx import from_complex
    from jsdr_tpu.runtime.tpu import ensure_tpu_ready

    ensure_tpu_ready(attempts=2)
    log(f"device: {jax.devices()[0]}")
    rate, n_streams, t_len = 96_000, 64, 96_000
    rng = np.random.default_rng(0)
    base = synth_bpsk_stream(rng.integers(0, 256, (1, 256), dtype=np.uint8),
                             rate=rate, preamble_bits=400, noise_rms=0.3)
    reps = int(np.ceil(n_streams * t_len / len(base)))
    sig = np.tile(base, reps)[: n_streams * t_len].reshape(n_streams, t_len)
    iq = jax.block_until_ready(jax.device_put(from_complex(sig)))

    res = {}
    for compat in (False, True):
        import warnings
        cfg = BpskConfig(rate=rate, tuning=12_000.0, compat_scan=compat)
        states = jax.block_until_ready(
            jax.device_put(bpsk_init_batch(cfg, n_streams)))

        @jax.jit
        def step(re, im, st):
            from jsdr_tpu.ops.cplx import CF
            out, ns = bpsk_block_batch(CF(re, im), cfg, st)
            return (out.windows.astype(jnp.int32).sum() + out.n_bits.sum()
                    + out.n_hits.sum()), ns

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            t0 = time.time()
            jax.block_until_ready(step(iq.re, iq.im, states))
            tc = time.time() - t0
            iters = 3 if compat else 10
            st = states
            t0 = time.time()
            for _ in range(iters):
                out = step(iq.re, iq.im, st)
                st = out[1]
            jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        res[compat] = dt
        log(f"compat_scan={compat}: {dt*1000:.2f} ms/step "
            f"({n_streams*t_len/dt/1e6:.0f} MS/s; compile {tc:.0f}s)")
    log(f"ratio: compat_scan is {res[True]/res[False]:.1f}x slower on "
        f"this backend at 64x1s")


if __name__ == "__main__":
    main()
