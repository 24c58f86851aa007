"""Batched soft-decision Viterbi decoder (k=7, r=1/2) for AO-40 frames.

TPU-native re-design of the scalar decoder at FECDecoder.java:203-278:
the 64-state add-compare-select is one vectorized butterfly per bit step
inside ``lax.scan`` (64-wide VPU ops), decisions are stored as a
[NBITS, 64] bool tensor, and the chain-back is a second (reverse) scan.
Batching over frames is a plain ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .tables import CPOLYA, CPOLYB, METTAB, NBITS, SYMS

K_FLUSH = 6
_N_STATES = 64

# Symbol pairs for the two halves of each ACS butterfly:
#  - even new state 2j comes from old states j (emits SYMS[2j]) and j+32
#  - odd  new state 2j+1 swaps the branch symbols (FECDecoder.java:229-247)
# Host-side numpy constants: converted with jnp.asarray at trace time so
# they are baked into the executable (no eager device arrays at import,
# which the axon TPU backend cannot read back during tracing).
_SYM_A = np.asarray(SYMS[0:64:2], dtype=np.int32)   # [32]
_SYM_B = np.asarray(SYMS[1:64:2], dtype=np.int32)   # [32]
_METTAB = np.asarray(METTAB, dtype=np.int32)        # [2, 256]

_INIT_METRIC = -999999


# The 256-entry METTAB lookup as a [16] x [16] bilinear form on the
# symbol's nibbles (s = 16*hi + lo): a table gather of [.., 5132]
# elements lowers to a slow dynamic-gather on TPU (measured 22.8 ms of
# the batch-256 decode), while one-hot(hi) @ TABLE + a 16-lane masked
# reduce runs on the MXU/VPU in 3.1 ms — bit-exact (bench/exp_r9_fec3).
# The dots use HIGHEST precision: 28 of the 512 METTAB values (e.g.
# -341) are NOT bf16-representable, so a default single-bf16-pass dot
# would silently corrupt metrics for symbols that hit those entries.
_M0_SQ = _METTAB[0].reshape(16, 16).astype(np.float32)    # [hi, lo]
_M1_SQ = _METTAB[1].reshape(16, 16).astype(np.float32)


def _mettab_lookup(s: jnp.ndarray):
    """[..., K] int32 symbols -> (m0, m1) int32 metric values."""
    oh_hi = (
        (s >> 4)[..., None] == jnp.arange(16)).astype(jnp.float32)
    p = jax.lax.Precision.HIGHEST
    row0 = jnp.dot(oh_hi, jnp.asarray(_M0_SQ), precision=p,
                   preferred_element_type=jnp.float32)
    row1 = jnp.dot(oh_hi, jnp.asarray(_M1_SQ), precision=p,
                   preferred_element_type=jnp.float32)
    oh_lo = (s & 15)[..., None] == jnp.arange(16)
    m0 = jnp.sum(jnp.where(oh_lo, row0, 0.0), axis=-1).astype(jnp.int32)
    m1 = jnp.sum(jnp.where(oh_lo, row1, 0.0), axis=-1).astype(jnp.int32)
    return m0, m1


def branch_metrics(symbols: jnp.ndarray) -> jnp.ndarray:
    """Per-step branch metrics for the 4 symbol-pair hypotheses.

    symbols: [2*NBITS] soft bytes (uint8 view of the demodulator's
    0xc0/0x40 convention). Returns [NBITS, 4] int32 where column i is the
    metric of hypothesis pair i = (bitA<<1 | bitB) (FECDecoder.java:219-225).
    """
    s = symbols.astype(jnp.int32).reshape(-1, 2)
    m0, m1 = _mettab_lookup(s)
    a0, b0 = m0[:, 0], m0[:, 1]
    a1, b1 = m1[:, 0], m1[:, 1]
    return jnp.stack([a0 + b0, a0 + b1, a1 + b0, a1 + b1], axis=-1)


# Static 0/1 masks replacing the per-step met_t[_SYM_A/_SYM_B] gathers
# (a 4-entry-table gather inside every scan step — the same TPU-gather
# tax as everywhere else in this module): b = sum_k mask_k * met_t[k]
# with met_t[k] a STATIC scalar slice, exact integer arithmetic.
_SA_MASK = np.stack([( _SYM_A == k) for k in range(4)]).astype(np.int32)
_SB_MASK = np.stack([( _SYM_B == k) for k in range(4)]).astype(np.int32)


def _acs_scan(mets: jnp.ndarray) -> jnp.ndarray:
    """Run the forward add-compare-select over all bit steps.

    mets: [NBITS, 4]. Returns decisions [NBITS, 64] bool.
    """
    sa = jnp.asarray(_SA_MASK)
    sb = jnp.asarray(_SB_MASK)

    def step(cmetric, met_t):
        m = [met_t[..., k, None] for k in range(4)]   # static slices
        b1 = sum(sa[k] * m[k] for k in range(4))      # [32] shift-in-0
        b2 = sum(sb[k] * m[k] for k in range(4))      # [32] shift-in-1
        lo = cmetric[:32]
        hi = cmetric[32:]
        even_a = lo + b1
        even_b = hi + b2
        odd_a = lo + b2
        odd_b = hi + b1
        dec_even = even_b > even_a
        dec_odd = odd_b > odd_a
        even = jnp.maximum(even_a, even_b)
        odd = jnp.maximum(odd_a, odd_b)
        nmetric = jnp.stack([even, odd], axis=-1).reshape(-1)
        decisions = jnp.stack([dec_even, dec_odd], axis=-1).reshape(-1)
        return nmetric, decisions

    init = jnp.full((_N_STATES,), _INIT_METRIC, dtype=jnp.int32).at[0].set(0)
    # unroll: with the gathers gone the scan-step overhead shows —
    # round 5 measured to-bits 8.0 -> 6.9 ms at batch 256 with unroll=8
    # (the same sweep was a no-op while gathers dominated)
    _, decisions = lax.scan(step, init, mets, unroll=8)
    return decisions


def _traceback(decisions: jnp.ndarray) -> jnp.ndarray:
    """Chain back from state 0 (FECDecoder.java:264-277).

    decisions: [NBITS, 64] bool. Returns decoded bits [NBITS - K_FLUSH].

    The per-step 1-of-64 ``dec_t[state]`` read is a 64-lane one-hot
    select + reduce rather than a dynamic gather: even this tiny gather
    is slow inside a TPU scan (round 5 measured the whole
    metrics+ACS+traceback stage at 14.6 ms with the gather vs 9.0 ms
    with the select at batch 256, bench/exp_r9_fec3.py) — bit-exact,
    exactly one lane matches.
    """
    lanes = jnp.arange(_N_STATES, dtype=jnp.int32)

    def step(state, dec_t):
        dec = jnp.sum(jnp.where(lanes == state, dec_t, False)
                      .astype(jnp.int32)) > 0
        new_state = (state >> 1) | jnp.where(dec, jnp.int32(0x20),
                                             jnp.int32(0))
        return new_state, dec.astype(jnp.uint8)

    _, bits_rev = lax.scan(step, jnp.int32(0), decisions[K_FLUSH:],
                           reverse=True, unroll=8)
    return bits_rev


def viterbi27_bits(symbols: jnp.ndarray) -> jnp.ndarray:
    """Decode one frame of 2*NBITS soft symbols to NBITS-6 = 2560 bits."""
    mets = branch_metrics(symbols)
    decisions = _acs_scan(mets)
    return _traceback(decisions)


def bits_to_bytes(bits: jnp.ndarray) -> jnp.ndarray:
    """Pack MSB-first bits (multiple of 8) into uint8 bytes."""
    b = bits.reshape(*bits.shape[:-1], -1, 8).astype(jnp.uint8)
    weights = (1 << jnp.arange(7, -1, -1)).astype(jnp.uint8)
    return (b * weights).sum(axis=-1).astype(jnp.uint8)


@jax.jit
def viterbi27(symbols: jnp.ndarray) -> jnp.ndarray:
    """Batched Viterbi decode: [..., 2*NBITS] soft bytes -> [..., 320] bytes."""
    fn = viterbi27_bits
    for _ in range(symbols.ndim - 1):
        fn = jax.vmap(fn)
    return bits_to_bytes(fn(symbols))
