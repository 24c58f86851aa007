"""Round-5 FEC attack, part 3: the post-bitmat decode profile at batch
256 is ~61 ms = Viterbi-side ~34 (deint 3 + METRICS ~20 + ACS 3 +
traceback 8) + RS-interior ~17 (BM fori_loop + omega/Forney gathers) +
re-encode 5. Candidates:

- metrics-packed: branch metrics gather m0[s] and m1[s] separately
  today (4 gathers of [B, 2566] from 256-entry tables). Pack both
  metrics into ONE int32 table (m0+OFF)<<16 | (m1+OFF) and gather once,
  then unpack with shifts — halves the gathered elements.
- metrics-mxu: a 256-entry lookup is a [16]x[16] bilinear form:
  s = 16*hi + lo, m[s] = onehot(hi) @ M @ onehot(lo)^T. For a symbol
  vector: one [K, 16] @ [16, 16] MXU dot + a 16-lane masked reduce.
- bm-unrolled: Berlekamp-Massey as a PYTHON-unrolled 32-step loop
  instead of lax.fori_loop (tiny per-step tensors, loop overhead may
  dominate).
- traceback-gather-free: the per-step dec_t[state] gather replaced by
  a 64-lane select (state one-hot masked reduce).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from jsdr_tpu.fec import encode as jenc                    # noqa: E402
from jsdr_tpu.fec import rs as jrs                         # noqa: E402
from jsdr_tpu.fec import viterbi as V                      # noqa: E402
from jsdr_tpu.fec.decoder import (deinterleave, descramble_demux,  # noqa: E402
                                  fec_decode)
from jsdr_tpu.fec.ref_numpy import encode_fec40, symbols_to_soft  # noqa: E402
from jsdr_tpu.fec.tables import A0, NN, NROOTS             # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = 10


def timeit(label, fn, x):
    """CHAINED timing loop ending in a d2h read: iteration k's input
    perturbation depends on iteration k-1's full result, so the final
    value read provably forces every iteration — this backend was
    caught both eliding repeats and returning early from
    block_until_ready (see bench.py force_value)."""

    @jax.jit
    def step(v, c):
        v = v.at[0, 0].set(((v[0, 0].astype(jnp.int32) + c) % 256
                            ).astype(jnp.uint8))
        r = fn(v)
        s = sum(jnp.asarray(leaf).astype(jnp.float32).sum()
                for leaf in jax.tree.leaves(r))
        return (s.astype(jnp.int32) & 0xFF) + c + 1

    t0 = time.perf_counter()
    jax.block_until_ready(step(x, jnp.int32(0)))
    t_c = time.perf_counter() - t0
    c = jnp.int32(1)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        c = step(x, c)
    np.asarray(c)                       # d2h barrier forces the chain
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:46s} {dt * 1e3:8.2f} ms  ({BATCH / dt:7.0f} frames/s)"
          f"  [compile {t_c:.1f}s]", flush=True)
    return dt


# ---- metrics variants ------------------------------------------------------

_OFF = 1 << 14      # METTAB entries are small negatives; offset to >=0
_PACKED = ((V._METTAB[0] + _OFF).astype(np.int64) * (1 << 16)
           + (V._METTAB[1] + _OFF)).astype(np.int32)        # [256]


def branch_metrics_packed(symbols):
    s = symbols.astype(jnp.int32).reshape(-1, 2)
    p = jnp.asarray(_PACKED)[s]                             # [T, 2]
    m0 = (p >> 16) - _OFF
    m1 = (p & 0xFFFF) - _OFF
    a0, b0 = m0[:, 0], m0[:, 1]
    a1, b1 = m1[:, 0], m1[:, 1]
    return jnp.stack([a0 + b0, a0 + b1, a1 + b0, a1 + b1], axis=-1)


_M0_SQ = V._METTAB[0].reshape(16, 16).astype(np.float32)    # [hi, lo]
_M1_SQ = V._METTAB[1].reshape(16, 16).astype(np.float32)


def branch_metrics_mxu(symbols):
    s = symbols.astype(jnp.int32)
    hi = s >> 4
    lo = s & 15
    oh_hi = (hi[:, None] == jnp.arange(16)).astype(jnp.float32)  # [T2, 16]
    row0 = jnp.dot(oh_hi, jnp.asarray(_M0_SQ),
                   preferred_element_type=jnp.float32)      # [T2, 16]
    row1 = jnp.dot(oh_hi, jnp.asarray(_M1_SQ),
                   preferred_element_type=jnp.float32)
    oh_lo = (lo[:, None] == jnp.arange(16))
    m0 = jnp.sum(jnp.where(oh_lo, row0, 0.0), axis=-1).astype(jnp.int32)
    m1 = jnp.sum(jnp.where(oh_lo, row1, 0.0), axis=-1).astype(jnp.int32)
    m0 = m0.reshape(-1, 2)
    m1 = m1.reshape(-1, 2)
    return jnp.stack([m0[:, 0] + m0[:, 1], m0[:, 0] + m1[:, 1],
                      m1[:, 0] + m0[:, 1], m1[:, 0] + m1[:, 1]], axis=-1)


# ---- BM unrolled -----------------------------------------------------------

def bm_unrolled(s_log):
    lam = jnp.zeros(NROOTS + 1, jnp.int32).at[0].set(1)
    b = jnp.full(NROOTS + 1, A0, jnp.int32).at[0].set(0)
    el = jnp.int32(0)
    idx = jnp.arange(NROOTS + 1)
    for r in range(1, NROOTS + 1):
        s_idx = jnp.clip(r - 1 - idx, 0, NROOTS - 1)
        terms = jrs._gfmul_log(jrs._index(lam), s_log[s_idx])
        terms = jnp.where(idx < r, terms, 0)
        discr = lax.reduce(terms, jnp.int32(0), lax.bitwise_xor, (0,))
        discr_log = jrs._index(discr)
        no_update = discr_log == A0
        xb = jnp.concatenate([jnp.full((1,), A0, jnp.int32), b[:-1]])
        t = lam ^ jrs._gfmul_log(jnp.full_like(xb, discr_log), xb)
        grow = (2 * el) <= (r - 1)
        new_el = jnp.where(no_update, el, jnp.where(grow, r - el, el))
        b_shift = jnp.concatenate([jnp.full((1,), A0, jnp.int32), b[:-1]])
        b_scaled = jnp.where(lam == 0, A0,
                             (jrs._index(lam) - discr_log + NN) % 255)
        b = jnp.where(no_update, b_shift,
                      jnp.where(grow, b_scaled, b_shift))
        lam = jnp.where(no_update, lam, t)
        el = new_el
    return lam


def decode_rs_bm_unrolled(data, s):
    clean = ~jnp.any(s != 0)
    s_log = jrs._index(s)
    lam = bm_unrolled(s_log)
    err, count, fail = jrs._chien_forney(lam, s_log)
    corrected = (data.astype(jnp.int32) ^ err).astype(jnp.uint8)
    n_err = jnp.where(clean, 0, jnp.where(fail, -1, count))
    corrected = jnp.where(clean | fail, data.astype(jnp.uint8), corrected)
    return corrected, n_err


# ---- traceback gather-free -------------------------------------------------

def traceback_select(decisions):
    lanes = jnp.arange(64, dtype=jnp.int32)

    def step(state, dec_t):
        dec = jnp.sum(jnp.where(lanes == state, dec_t, False).astype(
            jnp.int32)) > 0
        ns = (state >> 1) | jnp.where(dec, jnp.int32(0x20), jnp.int32(0))
        return ns, dec.astype(jnp.uint8)

    _, bits = lax.scan(step, jnp.int32(0), decisions[V.K_FLUSH:],
                       reverse=True)
    return bits


def main():
    print(f"device: {jax.devices()[0].device_kind}, batch={BATCH}")
    rng = np.random.default_rng(1)
    payloads = rng.integers(0, 256, (BATCH, 256), dtype=np.uint8)
    raws = np.stack([symbols_to_soft(encode_fec40(p)) for p in payloads])
    for r in raws:
        r[rng.choice(5200, 120, replace=False)] ^= 0x80
    x = jax.device_put(jnp.asarray(raws, jnp.uint8))

    # equality first
    sym = jax.jit(deinterleave)(x)
    m_ref = np.asarray(jax.jit(jax.vmap(V.branch_metrics))(sym))
    m_pk = np.asarray(jax.jit(jax.vmap(branch_metrics_packed))(sym))
    m_mx = np.asarray(jax.jit(jax.vmap(branch_metrics_mxu))(sym))
    assert np.array_equal(m_ref, m_pk), "packed metrics mismatch"
    assert np.array_equal(m_ref, m_mx), "mxu metrics mismatch"

    timeit("full fec_decode (shipped, post-bitmat)",
           lambda v: fec_decode(v).rc, x)
    timeit("metrics (shipped 2-table gather)",
           lambda v: jax.vmap(V.branch_metrics)(deinterleave(v)), x)
    timeit("metrics (packed 1-gather)",
           lambda v: jax.vmap(branch_metrics_packed)(deinterleave(v)), x)
    timeit("metrics (one-hot MXU)",
           lambda v: jax.vmap(branch_metrics_mxu)(deinterleave(v)), x)

    def to_bits(v, mets_fn, tb_fn):
        def one(s):
            return tb_fn(V._acs_scan(mets_fn(s)))
        return jax.vmap(one)(deinterleave(v))

    timeit("to-bits (shipped)",
           lambda v: to_bits(v, V.branch_metrics, V._traceback), x)
    timeit("to-bits (packed metrics)",
           lambda v: to_bits(v, branch_metrics_packed, V._traceback), x)
    timeit("to-bits (packed + select traceback)",
           lambda v: to_bits(v, branch_metrics_packed, traceback_select), x)

    def rs_stage(v, dec):
        bits = to_bits(v, V.branch_metrics, V._traceback)
        rsb = descramble_demux(V.bits_to_bytes(bits))
        s = jrs.syndromes(rsb)
        _, nerr = jax.vmap(jax.vmap(dec))(rsb, s)
        return nerr

    def dec_shipped(d, s):
        return jrs.decode_rs_codeword(d)

    timeit("to-RS (shipped BM fori)", lambda v: rs_stage(v, dec_shipped), x)
    timeit("to-RS (BM python-unrolled)",
           lambda v: rs_stage(v, decode_rs_bm_unrolled), x)

    # correctness of BM-unrolled on the full pipeline
    bits = jax.jit(lambda v: to_bits(v, V.branch_metrics, V._traceback))(x)
    rsb = jax.jit(descramble_demux)(V.bits_to_bytes(bits))
    s = jax.jit(jrs.syndromes)(rsb)
    c1, n1 = jax.jit(jax.vmap(jax.vmap(dec_shipped)))(rsb, s)
    c2, n2 = jax.jit(jax.vmap(jax.vmap(decode_rs_bm_unrolled)))(rsb, s)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(np.asarray(n1), np.asarray(n2))
    print("BM-unrolled bit-exact: OK")


if __name__ == "__main__":
    main()
