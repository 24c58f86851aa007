"""Experiment: vco broadcast vs gather; sync correlation as banded bf16
MXU matmul vs 65 shifted lane-slices; extract cost. Not shipped."""
import functools
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from jsdr_tpu.demod import bpsk as B
from jsdr_tpu.ops.cplx import CF
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


def vco_mix_v2(ds: CF, vco_idx):
    """Table index (vco_idx + t) % 8 is 128-periodic in t -> ONE gather of
    128 entries broadcast across the block, no [K] gather."""
    k = ds.shape[-1]
    p = (vco_idx + jnp.arange(128, dtype=jnp.int32)) % 8
    c = jnp.asarray(B._VCO_COS)[p]
    s = jnp.asarray(B._VCO_SIN)[p]
    kp = -(-k // 128) * 128
    rr = jnp.pad(ds.re, (0, kp - k)).reshape(-1, 128)
    ii = jnp.pad(ds.im, (0, kp - k)).reshape(-1, 128)
    out = CF((rr * c).reshape(kp)[:k], (ii * s).reshape(kp)[:k])
    return out, (vco_idx + k) % 8


_SYNC_TAPMAT = None

def _sync_tapmat():
    global _SYNC_TAPMAT
    if _SYNC_TAPMAT is None:
        j = np.arange(192)[:, None]
        o = np.arange(128)[None, :]
        d = j - o
        ok = (d >= 0) & (d < 65)
        _SYNC_TAPMAT = np.where(
            ok, B._SYNC.astype(np.float32)[np.where(ok, d, 0)], 0.0
        ).astype(np.float32)
    return _SYNC_TAPMAT


def sync_correlate_v2(window_buf):
    """corr as ONE banded bf16 MXU matmul (inputs are +-1/0: exact)."""
    max_bits = window_buf.shape[-1] - (B.FEC_BITS - 1)
    length = window_buf.shape[-1]
    u = -(-length // 80)
    w = jnp.pad(window_buf.astype(jnp.float32), (0, 80 * u - length))
    wt = w.reshape(u, 80).T                        # [80, U]
    n_q = -(-max_bits // 80)
    k_tiles = -(-n_q // 128)
    need = 128 * k_tiles + 64
    wtp = jnp.pad(wt, ((0, 0), (0, max(0, need - u))))
    parts = [wtp[:, 128 * k: 128 * k + 192] for k in range(k_tiles)]
    wall = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)
    tm = jnp.asarray(_sync_tapmat(), jnp.bfloat16)
    y = jnp.dot(wall, tm, precision=lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)   # [80*K, 128]
    acc = jnp.moveaxis(y.reshape(k_tiles, 80, 128), 1, 0
                       ).reshape(80, k_tiles * 128)[:, :n_q]
    return acc.T.reshape(-1)[:max_bits].astype(jnp.int32)


def main():
    ensure_tpu_ready(attempts=1)
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    S, K = 64, 96000
    cfg = B.BpskConfig(rate=96000, tuning=12000.0)
    states = B.bpsk_init_batch(cfg, S)
    ds = CF(jnp.asarray(rng.standard_normal((S, K)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((S, K)).astype(np.float32)))

    vco1 = jax.jit(jax.vmap(lambda d, st: B._vco_mix(d, st.vco_idx)))
    vco2 = jax.jit(jax.vmap(lambda d, st: vco_mix_v2(d, st.vco_idx)))
    r1 = timeit(vco1, ds, states, tag="vco v1 (gather)")
    r2 = timeit(vco2, ds, states, tag="vco v2 (broadcast)")
    np.testing.assert_array_equal(np.asarray(r1[0].re), np.asarray(r2[0].re))
    np.testing.assert_array_equal(np.asarray(r1[0].im), np.asarray(r2[0].im))
    np.testing.assert_array_equal(np.asarray(r1[1]), np.asarray(r2[1]))
    log("vco exact match")

    mb = 2 * (K // 8) + 2
    bits = jnp.asarray(
        rng.integers(-1, 2, size=(S, mb)).astype(np.int8))
    n_bits = jnp.full((S,), mb - 2, jnp.int32)
    w = jnp.concatenate([states.ring, bits], axis=-1)

    s1 = jax.jit(jax.vmap(B.sync_correlate))
    s2 = jax.jit(jax.vmap(sync_correlate_v2))
    c1 = timeit(s1, w, tag="sync corr v1 (65 slices)")
    c2 = timeit(s2, w, tag="sync corr v2 (bf16 matmul)")
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    log("sync corr exact match")

    full1 = jax.jit(jax.vmap(functools.partial(
        B.soft_frames_from_bits, max_hits=4)))
    timeit(full1, bits, n_bits, states.ring, tag="sync+extract (current)")


if __name__ == "__main__":
    main()
