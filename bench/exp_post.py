"""Experiment: post-stage component profile (vco / mf / timing / compact /
sync) on TPU. Not shipped."""
import functools
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from jsdr_tpu.demod import bpsk as B
from jsdr_tpu.ops.cplx import CF
from jsdr_tpu.ops.fir import fir_apply_streaming
from jsdr_tpu.runtime.tpu import ensure_tpu_ready

def log(*a): print(*a, file=sys.stderr, flush=True)

def timeit(fn, *args, iters=20, tag=""):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    log(f"{tag}: {dt*1000:.2f} ms")
    return r


def main():
    ensure_tpu_ready(attempts=1)
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    S, K = 64, 96000          # decimated domain at 64 x 10 s, 96k
    cfg = B.BpskConfig(rate=96000, tuning=12000.0)
    states = B.bpsk_init_batch(cfg, S)
    ds = CF(jnp.asarray(rng.standard_normal((S, K)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((S, K)).astype(np.float32)))
    taps = jnp.asarray(B.DM_FILTER.astype(np.float32))

    vco = jax.jit(jax.vmap(lambda d, st: B._vco_mix(d, st.vco_idx)))
    bb, _ = timeit(vco, ds, states, tag="vco mix")

    mf_fn = jax.jit(jax.vmap(lambda x, st: fir_apply_streaming(
        x, taps, st.mf_tail)))
    mf, _ = timeit(mf_fn, bb, states, tag="matched filter (65-tap)")

    tim = jax.jit(jax.vmap(lambda x, st: B._timing_parallel(x, st.timing)))
    valid, bit, di, e2, _ = timeit(tim, mf, states, tag="timing_parallel")

    mb = 2 * (K // 8) + 2
    comp = jax.jit(jax.vmap(lambda v, bt: B._compact_bits(v, bt, mb)))
    bits, n_bits = timeit(comp, valid, bit, tag="compact (current)")

    sync = jax.jit(jax.vmap(functools.partial(
        B.soft_frames_from_bits, max_hits=4)))
    timeit(sync, bits, n_bits, states.ring, tag="sync+extract")

    post = jax.jit(jax.vmap(functools.partial(
        B._bpsk_post, t_len=960000, max_hits=4, compat_scan=False)))
    timeit(post, ds, states, states.tu_phase, states.ds_tail,
           states.fft_tuner, tag="post (all fused)")


if __name__ == "__main__":
    main()
