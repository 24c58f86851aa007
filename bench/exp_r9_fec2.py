"""Round-5 FEC-tail attack, part 2: the exp_r9_fec attribution showed
the cost is NOT the Viterbi scans (ACS 3 ms + traceback 8 ms at batch
256) but the GATHER-heavy stages: RS decode (+85 ms), re-encode verify
(+39 ms) and deinterleave+metrics (+23 ms). All three have MXU-shaped
replacements because GF(256) arithmetic with CONSTANTS is linear over
GF(2):

- deinterleave is a fixed [65, 80] row/column transpose — no gather;
- syndromes S_i = XOR_j data_j * a^P[i,j] are GF(2)-linear in the data
  bits: one [B, 2040] @ [2040, 256] 0/1 matmul (exact in bf16) + mod 2;
- the Chien sweep evaluates lambda at 255 CONSTANT points — GF(2)-linear
  in lambda's 264 bits: [B, 264] @ [264, 2040];
- the whole AO-40 encoder is AFFINE over GF(2): e(p) = A@p_bits ^ e(0)
  with A = [2048, 5200] built from 2048 reference encodes (one-time);
  the re-encode verify becomes one matmul.

This file measures each replacement against the shipped stage (bit-exact
equality asserted) and the full decode with all of them applied.
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
from jsdr_tpu.fec.tables import (A0, ALPHA_TO, FCR, INDEX_OF, IPRIM, KK,  # noqa: E402
                                 NN, NROOTS, RSPAD)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = 10
_AL = np.asarray(ALPHA_TO, np.int32)
_IX = np.asarray(INDEX_OF, np.int32)


def timeit(label, fn, x):
    step = jax.jit(lambda v, i: fn(
        v.at[0, 0].set(((v[0, 0].astype(jnp.int32) + i) % 256
                        ).astype(jnp.uint8))))
    t0 = time.perf_counter()
    jax.block_until_ready(step(x, jnp.int32(0)))
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(ITERS):
        r = step(x, jnp.int32(i + 1))
    # d2h value barrier: block_until_ready alone was caught returning
    # early on this backend (see bench.py force_value)
    np.asarray(jax.tree.leaves(r)[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:44s} {dt * 1e3:8.2f} ms  ({BATCH / dt:7.0f} frames/s)"
          f"  [compile {t_c:.1f}s]", flush=True)
    return dt


# ---- bit helpers -----------------------------------------------------------

def bytes_to_bits(x):
    """[..., N] uint8/int32 -> [..., 8N] f32 bits, LSB-first per byte."""
    b = (x[..., None].astype(jnp.int32) >> jnp.arange(8)) & 1
    return b.reshape(*x.shape[:-1], -1).astype(jnp.float32)


def bits_to_bytes_lsb(bits):
    """[..., 8N] int bits -> [..., N] int32 bytes (LSB-first)."""
    b = bits.reshape(*bits.shape[:-1], -1, 8).astype(jnp.int32)
    return (b << jnp.arange(8)).sum(-1)


def bitmat(x_bits, m_np):
    """0/1 matmul, exact in one bf16 MXU pass, reduced mod 2."""
    r = lax.dot_general(
        x_bits.astype(jnp.bfloat16), jnp.asarray(m_np, jnp.bfloat16),
        (((x_bits.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return r.astype(jnp.int32) & 1


def gf_constmul_bits(consts):
    """[out..., in...]? -> bit matrix for y = XOR_j gfmul(x_j, c_j->i).

    consts: [J, I] int (nonzero) meaning output i accumulates
    gfmul(x_j, consts[j, i]). Returns [8J, 8I] uint8: block (j, i) is
    the GF(2) matrix of multiplication by consts[j, i]."""
    J, I = consts.shape
    blog = _IX[1 << np.arange(8)]                          # [8]
    lc = _IX[consts]                                       # [J, I]
    prod = _AL[(blog[:, None, None] + lc[None]) % 255]     # [8, J, I]
    prod = np.where(consts[None] == 0, 0, prod)
    bits = (prod[..., None] >> np.arange(8)) & 1           # [8, J, I, 8]
    return bits.transpose(1, 0, 2, 3).reshape(8 * J, 8 * I).astype(np.uint8)


# ---- replacements ----------------------------------------------------------

def deinterleave_t(raw):
    """Transpose form of the 80x65 de-interleave (FECDecoder.java:707-723)."""
    x = raw.reshape(*raw.shape[:-1], 65, 80)
    x = jnp.swapaxes(x[..., 1:], -1, -2)
    return x.reshape(*raw.shape[:-1], -1)[..., : 2 * V.NBITS]


_M_SYND = gf_constmul_bits(_AL[jrs._SYND_POW.T])           # [2040, 256]
_CH_PTS = _AL[(np.arange(1, NN + 1)[:, None]
               * np.arange(NROOTS + 1)[None, :]).T % 255]  # [33, 255]
_M_CHIEN = gf_constmul_bits(_CH_PTS)                       # [264, 2040]


def syndromes_mxu(data):
    s_bits = bitmat(bytes_to_bits(data), _M_SYND)
    return bits_to_bytes_lsb(s_bits)


def chien_mxu(lam):
    q_bits = bitmat(bytes_to_bits(lam), _M_CHIEN)
    return bits_to_bytes_lsb(q_bits)                       # [.., 255] evals


def decode_rs_codeword_mxu(data, s):
    """jrs.decode_rs_codeword with precomputed syndromes + MXU Chien."""
    clean = ~jnp.any(s != 0)
    s_log = jrs._index(s)
    lam = jrs._berlekamp_massey(s_log)
    lam_log = jrs._index(lam)
    j_idx = jnp.arange(NROOTS + 1)
    deg_lambda = jnp.max(jnp.where(lam_log != A0, j_idx, 0))
    q = chien_mxu(lam)
    is_root = q == 0
    count = jnp.sum(is_root.astype(jnp.int32))
    fail = count != deg_lambda
    (root_pos,) = jnp.nonzero(is_root, size=NROOTS, fill_value=-1)
    valid = root_pos >= 0
    roots = jnp.where(valid, root_pos + 1, 0).astype(jnp.int32)
    locs = (IPRIM - 1 + (roots - 1) * IPRIM) % 255
    i_o = jnp.arange(NROOTS)[:, None]
    j_o = jnp.arange(NROOTS + 1)[None, :]
    terms = jrs._gfmul_log(s_log[jnp.clip(i_o - j_o, 0, NROOTS - 1)], lam_log)
    terms = jnp.where(j_o <= i_o, terms, 0)
    omega = lax.reduce(terms, jnp.int32(0), lax.bitwise_xor, (1,))
    omega_log = jrs._index(omega)
    r = roots[:, None]
    num_t = jrs._gfmul_log(omega_log[None, :],
                           (jnp.arange(NROOTS)[None, :] * r) % 255)
    num1 = lax.reduce(num_t, jnp.int32(0), lax.bitwise_xor, (1,))
    num2 = jrs._alpha((roots * (FCR - 1) + NN) % 255)
    d_j = jnp.arange(0, NROOTS, 2)[None, :]
    den_t = jrs._gfmul_log(lam_log[None, 1::2][:, : d_j.shape[1]],
                           (d_j * r) % 255)
    den = lax.reduce(den_t, jnp.int32(0), lax.bitwise_xor, (1,))
    den_fail = jnp.any(valid & (den == 0))
    mag_log = (jrs._index(num1) + jrs._index(num2) + NN - jrs._index(den)) % 255
    mag = jnp.where(valid & (num1 != 0) & (den != 0), jrs._alpha(mag_log), 0)
    err = jnp.zeros(NN, jnp.int32)
    err = err.at[jnp.where(valid, locs, NN)].set(mag, mode="drop")
    corrected = (data.astype(jnp.int32) ^ err).astype(jnp.uint8)
    fail = fail | den_fail
    n_err = jnp.where(clean, 0, jnp.where(fail, -1, count))
    corrected = jnp.where(clean | fail, data.astype(jnp.uint8), corrected)
    return corrected, n_err


# ---- affine encoder --------------------------------------------------------

_ENC_CACHE = {}


def encoder_affine():
    """(A [2048, 5200] uint8, e0 [5200] uint8): e(p) = p_bits @ A ^ e0."""
    if "A" not in _ENC_CACHE:
        t0 = time.perf_counter()
        e0 = encode_fec40(np.zeros(256, np.uint8)).astype(np.uint8)
        cols = np.empty((2048, 5200), np.uint8)
        p = np.zeros(256, np.uint8)
        for j in range(256):
            for b in range(8):
                p[j] = 1 << b
                cols[j * 8 + b] = encode_fec40(p) ^ e0
                p[j] = 0
        _ENC_CACHE["A"] = cols
        _ENC_CACHE["e0"] = e0
        print(f"encoder affine matrix built in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    return _ENC_CACHE["A"], _ENC_CACHE["e0"]


def encode_mxu(payload):
    A, e0 = encoder_affine()
    r = lax.dot_general(
        bytes_to_bits(payload).astype(jnp.bfloat16),
        jnp.asarray(A, jnp.bfloat16),
        (((payload.ndim - 1 + 1 - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return ((r.astype(jnp.int32) & 1) ^ jnp.asarray(e0, jnp.int32)
            ).astype(jnp.uint8)


# ---- full decode with everything applied -----------------------------------

def fec_decode_mxu(raw):
    symbols = deinterleave_t(raw)
    bits = jax.vmap(V.viterbi27_bits)(symbols)
    vitdec = V.bits_to_bytes(bits)
    rsblocks = descramble_demux(vitdec)
    s = syndromes_mxu(rsblocks)
    corrected, nerr = jax.vmap(jax.vmap(decode_rs_codeword_mxu))(rsblocks, s)
    ok = jnp.all(nerr >= 0, axis=-1)
    payload = jnp.swapaxes(corrected[..., RSPAD:KK], -1, -2
                           ).reshape(raw.shape[0], -1)
    payload = jnp.where(ok[:, None], payload, 0).astype(jnp.uint8)
    reenc = encode_mxu(payload)
    errors = jnp.sum((reenc != (raw >> 7)).astype(jnp.int32), axis=-1)
    return payload, ok, jnp.where(ok, errors, -1)


def main():
    print(f"device: {jax.devices()[0].device_kind}, batch={BATCH}")
    rng = np.random.default_rng(1)
    payloads = rng.integers(0, 256, (BATCH, 256), dtype=np.uint8)
    raws = np.stack([symbols_to_soft(encode_fec40(p)) for p in payloads])
    for r in raws:
        r[rng.choice(5200, 120, replace=False)] ^= 0x80
    x = jax.device_put(jnp.asarray(raws, jnp.uint8))

    # equality checks (CPU-fast shapes first)
    r0 = np.asarray(jax.jit(deinterleave)(x))
    r1 = np.asarray(jax.jit(deinterleave_t)(x))
    assert np.array_equal(r0, r1), "deinterleave transpose mismatch"

    cw = jax.jit(lambda v: descramble_demux(V.bits_to_bytes(
        jax.vmap(V.viterbi27_bits)(deinterleave(v)))))(x)
    s_ref = np.asarray(jax.jit(jrs.syndromes)(cw))
    s_mxu = np.asarray(jax.jit(syndromes_mxu)(cw))
    assert np.array_equal(s_ref, s_mxu), "syndromes mismatch"

    ref_res = jax.block_until_ready(fec_decode(x))
    p2, ok2, rc2 = jax.block_until_ready(jax.jit(fec_decode_mxu)(x))
    assert np.array_equal(np.asarray(ref_res.payload), np.asarray(p2))
    assert np.array_equal(np.asarray(ref_res.ok), np.asarray(ok2))
    assert np.array_equal(np.asarray(ref_res.rc), np.asarray(rc2))
    print("bit-exact vs shipped decoder: OK", flush=True)

    timeit("full fec_decode (shipped)", lambda v: fec_decode(v).rc, x)
    timeit("deinterleave (gather, shipped)",
           lambda v: deinterleave(v).astype(jnp.int32).sum(-1), x)
    timeit("deinterleave (transpose)",
           lambda v: deinterleave_t(v).astype(jnp.int32).sum(-1), x)

    def stage_rs(v, dec):
        bits = jax.vmap(V.viterbi27_bits)(deinterleave_t(v))
        rsb = descramble_demux(V.bits_to_bytes(bits))
        _, nerr = dec(rsb)
        return nerr

    timeit("to-RS (shipped RS)",
           lambda v: stage_rs(v, lambda b: jax.vmap(
               jax.vmap(jrs.decode_rs_codeword))(b)), x)
    timeit("to-RS (MXU synd+chien)",
           lambda v: stage_rs(v, lambda b: jax.vmap(jax.vmap(
               decode_rs_codeword_mxu))(b, syndromes_mxu(b))), x)
    timeit("re-encode (shipped)", lambda v: jax.vmap(jenc.encode_frame)(
        v[:, :256].astype(jnp.uint8)).sum(-1), x)
    timeit("re-encode (affine MXU)",
           lambda v: encode_mxu(v[:, :256].astype(jnp.uint8)).sum(-1), x)
    timeit("FULL fec_decode (MXU everything)",
           lambda v: fec_decode_mxu(v)[2], x)


if __name__ == "__main__":
    main()
