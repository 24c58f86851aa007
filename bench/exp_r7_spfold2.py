"""Micro-profile of the sp-sharded tail's gathered terms at sp=4 sizes
(64 streams, N=10 s per rank): which of compact-sort / w2-build /
sync-slice / extract grows, to target the windowed-assembly fix."""

import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=20, tag=""):
    import jax
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    log(f"{tag}: {dt*1000:.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.demod import bpsk as B
    from jsdr_tpu.parallel.sharded import _sync_correlate_slice
    from jsdr_tpu.runtime.tpu import ensure_tpu_ready

    ensure_tpu_ready(attempts=2)
    log(f"device: {jax.devices()[0]}")
    n_streams, g = 64, 12000
    rng = np.random.default_rng(0)
    max_hits = 4
    for sp in (1, 4):
        n2 = 2 * g * sp
        max_bits = n2 + 2
        valid = jnp.asarray(rng.random((n_streams, n2)) < 0.25)
        bit = jnp.asarray(rng.random((n_streams, n2)) < 0.5)
        q_per = -(-max_bits // (80 * sp))
        w_len = B.FEC_BITS - 1 + max_bits
        pad_cols = max(-(-w_len // 80), sp * q_per + 65)
        log(f"--- sp={sp}: n2={n2} q_per={q_per} w_len={w_len}")

        @jax.jit
        def compact(valid, bit):
            bits, n_bits = jax.vmap(
                partial(B._compact_bits, max_bits=max_bits))(valid, bit)
            return bits.astype(jnp.int32).sum() + n_bits.sum()

        timeit(compact, valid, bit, tag=f"sp={sp} compact(sort)")

        bits = jnp.asarray(
            rng.integers(-1, 2, (n_streams, max_bits)), jnp.int8)
        n_bits = jnp.full((n_streams,), max_bits - 2, jnp.int32)
        ring = jnp.zeros((n_streams, B.FEC_BITS - 1), jnp.int8)

        @jax.jit
        def syncslice(bits, n_bits, ring):
            def one(bits1, n_bits1, ring1):
                w = jnp.concatenate([ring1, bits1])
                wp = jnp.pad(w, (0, 80 * pad_cols - w_len))
                corr = _sync_correlate_slice(wp, jnp.int32(0), q_per)
                return corr.sum()
            return jax.vmap(one)(bits, n_bits, ring).sum()

        timeit(syncslice, bits, n_bits, ring, tag=f"sp={sp} sync slice")

        @jax.jit
        def extract(bits, n_bits, ring):
            def one(bits1, n_bits1, ring1):
                w = jnp.concatenate([ring1, bits1])
                r_rows = -(-w_len // 128)
                w2 = jnp.pad(w.astype(jnp.float32),
                             (0, r_rows * 128 - w_len)).reshape(r_rows, 128)
                starts = jnp.concatenate([
                    jnp.zeros((max_hits,), jnp.int32),
                    n_bits1[None].astype(jnp.int32)])
                ext = B._extract_rows(w2, starts, B.FEC_BITS)
                return ext.sum()
            return jax.vmap(one)(bits, n_bits, ring).sum()

        timeit(extract, bits, n_bits, ring, tag=f"sp={sp} w2+extract")

        @jax.jit
        def firstk(bits):
            hits = bits[:, :80 * q_per] > 0
            return jax.vmap(
                partial(B._first_k_indices, k=max_hits))(hits).sum()

        timeit(firstk, bits, tag=f"sp={sp} first_k")


if __name__ == "__main__":
    main()
