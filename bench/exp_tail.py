"""Experiment: decimated-tail optimizations (EMA layout, last-valid fill,
compaction sort). Times current vs candidate on the TPU. Not shipped."""
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


# ---- candidate 1: EMA trajectory, lane-efficient transposed layout ----
def ema_traj_v2(b, a: float, init, chunk: int = 128):
    """Same as B._const_ema_trajectory but computed in [C, P, L] layout so
    the G axis rides the 128 lanes (P=8 rides sublanes) — full MXU/VPU
    tiles even under vmap. Returns [G, P]."""
    g, p = b.shape
    l = min(chunk, max(8, 1 << (g - 1).bit_length())) if g < chunk else chunk
    c = -(-g // l)
    bp = jnp.pad(b, ((0, c * l - g), (0, 0))).reshape(c, l, p)
    bt = jnp.transpose(bp, (0, 2, 1))                      # [C, P, L]
    k = np.arange(l)
    # tri[j, l_out] = a^(l_out - j) for j <= l_out
    tri_t = np.where(k[:, None] <= k[None, :],
                     np.power(a, np.maximum(k[None, :] - k[:, None], 0)),
                     0.0).astype(np.float32)
    local = jnp.einsum("cpj,jl->cpl", bt, jnp.asarray(tri_t),
                       precision=lax.Precision.HIGHEST)    # [C, P, L]
    local_end = local[:, :, -1]                            # [C, P]
    cc = np.arange(c)
    dec_l = float(a) ** l
    inter = np.where(cc[:, None] > cc[None, :],
                     np.power(dec_l, np.maximum(cc[:, None] - 1 - cc[None, :],
                                                0)),
                     0.0).astype(np.float32)
    carry_b = jnp.einsum("cd,dp->cp", jnp.asarray(inter), local_end,
                         precision=lax.Precision.HIGHEST)  # [C, P]
    carries = (jnp.asarray(np.power(dec_l, cc).astype(np.float32))[:, None]
               * init[None, :] + carry_b)                  # [C, P]
    pw = jnp.asarray(np.power(a, k + 1).astype(np.float32))
    traj = pw[None, None, :] * carries[:, :, None] + local  # [C, P, L]
    return jnp.transpose(traj, (0, 2, 1)).reshape(c * l, p)[:g]


# ---- candidate 2: two-level last-valid fill ----
def last_valid_prev_v2(vals, on, init, l: int = 256):
    """Exclusive last-valid fill via within-chunk log-shift (log2 L
    passes over [C, L]) + tiny cross-chunk pass, instead of log2 N
    full-array passes."""
    n = on.shape[0]
    c = -(-n // l)
    pad = c * l - n
    onp = jnp.pad(on, (0, pad))
    y = [jnp.pad(jnp.where(on, v, jnp.zeros((), v.dtype)), (0, pad))
         .reshape(c, l) for v in vals]
    filled = onp.reshape(c, l)
    s = 1
    while s < l:
        shifted_f = jnp.pad(filled[:, :-s], ((0, 0), (s, 0)))
        y = [jnp.where(filled, v,
                       jnp.pad(v[:, :-s], ((0, 0), (s, 0)))) for v in y]
        filled = filled | shifted_f
        s *= 2
    # cross-chunk: last inclusive value of each chunk, filled across chunks
    ends = [v[:, -1] for v in y]                       # [C]
    fend = filled[:, -1]
    s = 1
    while s < c:
        ends = [jnp.where(fend, v, jnp.pad(v[:-s], (s, 0))) for v in ends]
        fend = fend | jnp.pad(fend[:-s], (s, 0))
        s *= 2
    # carry into chunk k = filled end of chunk k-1 (init before that)
    carry = [jnp.concatenate([jnp.full((1,), i0, v.dtype),
                              jnp.where(fend[:-1], v[:-1], i0)])
             for v, i0 in zip(ends, init)]             # [C]
    y = [jnp.where(filled, v, cv[:, None]) for v, cv in zip(y, carry)]
    # exclusive shift by one (global); after the carry substitution every
    # position already holds the correct inclusive value (init where no
    # prior valid exists anywhere), so no further masking is needed
    flat = [v.reshape(-1)[:n] for v in y]
    prev = [jnp.concatenate([jnp.full((1,), i0, v.dtype), v[:-1]])
            for v, i0 in zip(flat, init)]
    fin = [jnp.where(fend[-1], e[-1], i0) for e, i0 in zip(ends, init)]
    return prev, fin


# ---- candidate 3: packed single-operand compaction sort ----
def compact_bits_v2(valid, bit, max_bits: int):
    """Pack (invalid, position, bit) into one unique int32 code; one
    non-stable single-operand sort replaces the stable two-operand one."""
    n = valid.shape[0]
    assert n < (1 << 28)
    pos = jnp.arange(n, dtype=jnp.int32)
    code = (jnp.where(valid, 0, 1 << 30)
            + (pos << 2)
            + jnp.where(valid, jnp.where(bit, 2, 0), 1))
    scode = lax.sort(code, dimension=0, is_stable=False)
    pm = (scode & 3) - 1                        # 2->+1, 0->-1, 1->0
    if n >= max_bits:
        out = pm[:max_bits]
    else:
        out = jnp.pad(pm, (0, max_bits - n))
    n_bits = jnp.minimum(jnp.sum(valid.astype(jnp.int32)), max_bits)
    return out.astype(jnp.int8), n_bits


def main():
    ensure_tpu_ready(attempts=1)
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    S, G = 64, 12000
    P = 8
    n_slots = 2 * G + 2

    # --- EMA ---
    b = jnp.asarray(rng.standard_normal((S, G, P)).astype(np.float32)**2)
    init = jnp.asarray(rng.standard_normal((S, P)).astype(np.float32)**2)
    a = 1.0 - B.BIT_SMOOTH1
    f1 = jax.jit(jax.vmap(lambda bb, ii: B._const_ema_trajectory(bb, a, ii)))
    f2 = jax.jit(jax.vmap(lambda bb, ii: ema_traj_v2(bb, a, ii)))
    r1 = timeit(f1, b, init, tag="ema v1 (current)")
    r2 = timeit(f2, b, init, tag="ema v2 (lane layout)")
    err = np.abs(np.asarray(r1) - np.asarray(r2)).max()
    rel = err / max(1e-9, np.abs(np.asarray(r1)).max())
    log(f"ema max |diff| = {err:.3e} (rel {rel:.3e})")

    # --- last-valid ---
    on = jnp.asarray(rng.random((S, n_slots)) < 0.5)
    vi = jnp.asarray(rng.standard_normal((S, n_slots)).astype(np.float32))
    vq = jnp.asarray(rng.standard_normal((S, n_slots)).astype(np.float32))
    i0 = jnp.asarray(rng.standard_normal((S, 2)).astype(np.float32))
    g1 = jax.jit(jax.vmap(lambda o, a_, b_, z: B._last_valid_prev(
        (a_, b_), o, (z[0], z[1]))))
    g2 = jax.jit(jax.vmap(lambda o, a_, b_, z: last_valid_prev_v2(
        (a_, b_), o, (z[0], z[1]))))
    p1 = timeit(g1, on, vi, vq, i0, tag="last_valid v1 (current)")
    p2 = timeit(g2, on, vi, vq, i0, tag="last_valid v2 (two-level)")
    for x1, x2 in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=0)
    log("last_valid exact match")

    # --- compaction ---
    valid = jnp.asarray(rng.random((S, n_slots)) < 0.55)
    bit = jnp.asarray(rng.random((S, n_slots)) < 0.5)
    mb = n_slots
    h1 = jax.jit(jax.vmap(lambda v, bt: B._compact_bits(v, bt, mb)))
    h2 = jax.jit(jax.vmap(lambda v, bt: compact_bits_v2(v, bt, mb)))
    c1 = timeit(h1, valid, bit, tag="compact v1 (stable 2-op sort)")
    c2 = timeit(h2, valid, bit, tag="compact v2 (packed 1-op sort)")
    np.testing.assert_array_equal(np.asarray(c1[0]), np.asarray(c2[0]))
    np.testing.assert_array_equal(np.asarray(c1[1]), np.asarray(c2[1]))
    log("compact exact match")


if __name__ == "__main__":
    main()
