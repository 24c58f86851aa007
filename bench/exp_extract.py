"""Experiment: window extraction via one-hot row matmul + small fine
roll, vs full-buffer log-shift rolls. Not shipped."""
import functools
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from jsdr_tpu.demod import bpsk as B
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


def _extract_rows(w2, starts, out_len: int):
    """w2: [R, 128] row-major view of the buffer; starts: [H] traced.
    Returns [H, out_len] = buf[start:start+out_len] per start, via a
    one-hot row-select matmul (exact in bf16 for +-1/0 buffers) and a
    log-shift fine roll of only rows_out*128 elements."""
    r_rows = w2.shape[0]
    rows_out = -(-out_len // 128) + 1
    q = starts // 128                                     # [H]
    rr = starts % 128
    i = jnp.arange(rows_out, dtype=jnp.int32)
    j = jnp.arange(r_rows, dtype=jnp.int32)
    onehot = (j[None, None, :] == (q[:, None] + i[None, :])[:, :, None])
    sel = jnp.dot(onehot.reshape(-1, r_rows).astype(jnp.bfloat16),
                  w2.astype(jnp.bfloat16),
                  precision=lax.Precision.DEFAULT,
                  preferred_element_type=jnp.float32)     # [H*rows_out, 128]
    flat = sel.reshape(starts.shape[0], rows_out * 128)
    # fine roll left by r (< 128): 7 conditional shifts on the small array
    for k in range(7):
        s = 1 << k
        rolled = jnp.concatenate([flat[:, s:], flat[:, :s]], axis=1)
        flat = jnp.where(((rr >> k) & 1 == 1)[:, None], rolled, flat)
    return flat[:, :out_len]


def soft_frames_v2(bits, n_bits, ring, max_hits: int):
    w = jnp.concatenate([ring, bits])
    corr = B.sync_correlate(w)
    j = jnp.arange(corr.shape[0])
    hits = (corr >= B.SYNC_THRESHOLD) & (j < n_bits)
    hit_idx = B._first_k_indices(hits, max_hits)
    hit_ok = hit_idx >= 0
    w_len = w.shape[0]

    r_rows = -(-w_len // 128)
    w2 = jnp.pad(w.astype(jnp.float32), (0, r_rows * 128 - w_len)
                 ).reshape(r_rows, 128)
    starts = jnp.concatenate([
        jnp.clip(jnp.where(hit_ok, hit_idx, 0), 0, w_len - B.FEC_BITS),
        n_bits[None].astype(jnp.int32)])
    ext = _extract_rows(w2, starts, B.FEC_BITS)
    wins = ext[:max_hits]
    windows = jnp.where(wins == 1.0, jnp.uint8(0xC0), jnp.uint8(0x40))
    windows = jnp.where(hit_ok[:, None], windows, jnp.uint8(0x40))
    hit_corr = jnp.where(hit_ok, corr[jnp.where(hit_ok, hit_idx, 0)], 0)
    n_hits = jnp.sum(hit_ok.astype(jnp.int32))
    new_ring = ext[max_hits, :B.FEC_BITS - 1].astype(jnp.int8)
    return windows, hit_corr, n_hits, new_ring


def main():
    ensure_tpu_ready(attempts=1)
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    S, K = 64, 96000
    cfg = B.BpskConfig(rate=96000, tuning=12000.0)
    states = B.bpsk_init_batch(cfg, S)
    mb = 2 * (K // 8) + 2
    bits = jnp.asarray(rng.integers(-1, 2, size=(S, mb)).astype(np.int8))
    n_bits = jnp.asarray(
        rng.integers(mb // 2, mb - 2, size=(S,)).astype(np.int32))
    ring = jnp.asarray(
        rng.integers(-1, 2, size=(S, B.FEC_BITS - 1)).astype(np.int8))

    f1 = jax.jit(jax.vmap(functools.partial(
        B.soft_frames_from_bits, max_hits=4)))
    f2 = jax.jit(jax.vmap(functools.partial(soft_frames_v2, max_hits=4)))
    r1 = timeit(f1, bits, n_bits, ring, tag="sync+extract v1 (rolls)")
    r2 = timeit(f2, bits, n_bits, ring, tag="sync+extract v2 (onehot rows)")
    for a, b, name in zip(r1, r2, ("windows", "corr", "nhits", "ring")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    log("sync+extract exact match")


if __name__ == "__main__":
    main()
