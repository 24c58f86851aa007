"""Weak-scaling simulation of the round-4 sp-SHARDED decode tail.

With one real chip, rank-k's per-chip work at sp=k is constructed
directly: the front end, VCO+MF and timing recovery all run on the
rank's OWN N samples (identical to sp=1 by design); the only terms that
grow with sp are (a) the compaction sort over the all_gathered decision
planes (sp*N-worth of bits), (b) the window/ring extraction one-hot
matmul over the sp-times-longer compacted buffer, and (c) O(kB)
collectives (unmeasurable with one chip, negligible payload). The sync
correlation itself is position-sharded 1/sp so its per-rank cost is
flat. This measures the growing terms at sp in {1, 2, 4} against the
full single-device step to bound the weak-scaling efficiency.
"""

import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=20):
    import jax
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.demod import bpsk as B
    from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_block_batch,
                                     bpsk_init_batch)
    from jsdr_tpu.io.sources import synth_bpsk_stream
    from jsdr_tpu.ops.cplx import from_complex
    from jsdr_tpu.parallel.sharded import _sync_correlate_slice
    from jsdr_tpu.runtime.tpu import ensure_tpu_ready

    ensure_tpu_ready(attempts=2)
    log(f"device: {jax.devices()[0]}")
    rate, n_streams, t_len = 96_000, 64, 960_000          # N = 10 s
    g = t_len // 10 // B.SAMPLES_PER_BIT                  # decimated groups
    rng = np.random.default_rng(0)
    base = synth_bpsk_stream(rng.integers(0, 256, (1, 256), dtype=np.uint8),
                             rate=rate, preamble_bits=400, noise_rms=0.3)
    reps = int(np.ceil(n_streams * t_len / len(base)))
    sig = np.tile(base, reps)[: n_streams * t_len].reshape(n_streams, t_len)
    iq = jax.block_until_ready(jax.device_put(from_complex(sig)))
    cfg = BpskConfig(rate=rate, tuning=12_000.0)
    states = jax.block_until_ready(
        jax.device_put(bpsk_init_batch(cfg, n_streams)))

    @jax.jit
    def step(re, im, st):
        from jsdr_tpu.ops.cplx import CF
        out, ns = bpsk_block_batch(CF(re, im), cfg, st)
        return (out.windows.astype(jnp.int32).sum() + out.n_bits.sum()
                + out.n_hits.sum())

    t_base = timeit(step, iq.re, iq.im, states)
    log(f"sp=1 baseline: full telemetry step on N=10s x {n_streams}: "
        f"{t_base*1000:.2f} ms")

    max_hits = 4
    for sp in (1, 2, 4):
        # the round-4 assembly: each rank compacts LOCALLY (that sort is
        # part of the base step), gathers the compacted i8 segments and
        # PLACES them (parallel/sharded._place_segments) — the per-chip
        # terms that grow with sp are the placement, the sync-slice
        # buffer and the extraction buffer
        from jsdr_tpu.parallel.sharded import _place_segments
        mb_loc = 2 * g + 2
        max_bits = 2 * g * sp + 2
        bits_g = jnp.asarray(
            rng.integers(-1, 2, (sp, n_streams, mb_loc)), jnp.int8)
        n_g = jnp.full((sp, n_streams), mb_loc - 2, jnp.int32)
        q_per = -(-max_bits // (80 * sp))  # per-rank candidate slice
        w_len = B.FEC_BITS - 1 + max_bits
        pad_cols = max(-(-w_len // 80), sp * q_per + 65)

        @jax.jit
        def grown(bits_g, n_g):
            bits = _place_segments(bits_g, n_g, max_bits)
            n_bits = jnp.sum(n_g, axis=0)

            def search1(bits1, n_bits1, ring1):
                w = jnp.concatenate([ring1, bits1])
                wp = jnp.pad(w, (0, 80 * pad_cols - w_len))
                corr = _sync_correlate_slice(wp, jnp.int32(0), q_per)
                j_g = jnp.arange(80 * q_per, dtype=jnp.int32)
                hits = (corr >= B.SYNC_THRESHOLD) & (j_g < n_bits1)
                idx = B._first_k_indices(hits, max_hits)
                ok = idx >= 0
                r_rows = -(-w_len // 128)
                w2 = jnp.pad(w.astype(jnp.float32),
                             (0, r_rows * 128 - w_len)).reshape(r_rows, 128)
                starts = jnp.concatenate([
                    jnp.clip(jnp.where(ok, idx, 0), 0, w_len - B.FEC_BITS),
                    n_bits1[None].astype(jnp.int32)])
                ext = B._extract_rows(w2, starts, B.FEC_BITS)
                return ext.sum() + corr.sum()

            ring = jnp.zeros((n_streams, B.FEC_BITS - 1), jnp.int8)
            return jax.vmap(search1)(bits, n_bits, ring).sum()

        t_grow = timeit(grown, bits_g, n_g)
        # per-chip(sp) = base step (front+tail on own N, with its own
        # sp=1-sized compact+sync) - sp=1 grown + sp-sized grown
        if sp == 1:
            t_g1 = t_grow
            continue
        per_chip = t_base - t_g1 + t_grow
        log(f"sp={sp}: gathered compact+sync/extract {t_grow*1000:.2f} ms "
            f"(vs {t_g1*1000:.2f} at sp=1) -> per-chip "
            f"{per_chip*1000:.2f} ms, weak-scaling eff "
            f"{t_base/per_chip*100:.0f}%")


if __name__ == "__main__":
    main()
