"""JAX batched FEC kernels must match the numpy oracle bit-for-bit."""

import jax.numpy as jnp
import numpy as np

from jsdr_tpu.fec import ref_numpy as ref
from jsdr_tpu.fec import viterbi as jvit
from jsdr_tpu.fec import rs as jrs
from jsdr_tpu.fec import encode as jenc
from jsdr_tpu.fec import decoder as jdec
from jsdr_tpu.fec.tables import SYMPBLOCK


def _frames(rng, n):
    payloads = rng.integers(0, 256, (n, 256), dtype=np.uint8)
    softs = np.stack([
        ref.symbols_to_soft(ref.encode_fec40(p)) for p in payloads
    ])
    return payloads, softs


def test_jax_encoder_matches_numpy(rng):
    payloads = rng.integers(0, 256, (3, 256), dtype=np.uint8)
    got = np.asarray(jenc.encode_fec40(jnp.asarray(payloads)))
    want = np.stack([ref.encode_fec40(p) for p in payloads])
    assert np.array_equal(got, want)


def test_affine_encoder_matches_scan_encoder(rng):
    """The one-bit-matmul encoder (re-encode verify fast path,
    encode.py:_encoder_affine_np) must equal the scan/scatter encoder
    bit-for-bit — including the all-zeros and all-ones edge payloads."""
    payloads = np.concatenate([
        rng.integers(0, 256, (3, 256), dtype=np.uint8),
        np.zeros((1, 256), np.uint8), np.full((1, 256), 255, np.uint8)])
    got = np.asarray(jenc.encode_frame_affine(jnp.asarray(payloads)))
    want = np.asarray(jenc.encode_fec40(jnp.asarray(payloads)))
    assert np.array_equal(got, want)


def test_jax_viterbi_matches_numpy(rng):
    payloads, softs = _frames(rng, 2)
    syms = np.stack([ref.deinterleave(s) for s in softs])
    # add soft noise so the metric path is exercised beyond hard values
    syms = np.clip(syms.astype(np.int64) + rng.integers(-40, 41, syms.shape), 0, 255
                   ).astype(np.uint8)
    got = np.asarray(jvit.viterbi27(jnp.asarray(syms)))
    want = np.stack([ref.viterbi27(s) for s in syms])
    assert np.array_equal(got, want)


def test_branch_metrics_exhaustive_all_symbols():
    """The MXU nibble-bilinear METTAB lookup (viterbi._mettab_lookup)
    must be exact for ALL 256 soft-symbol values: 28 of the 512 table
    entries are not bf16-representable, so a default-precision dot
    would corrupt exactly the entries a small fixture never hits."""
    s = np.arange(256, dtype=np.uint8)
    pairs = np.stack([np.repeat(s, 256), np.tile(s, 256)],
                     axis=-1).reshape(-1)                  # all (a, b)
    got = np.asarray(jvit.branch_metrics(jnp.asarray(pairs)))
    m = np.asarray(jvit._METTAB, np.int64)
    a, b = pairs.reshape(-1, 2)[:, 0], pairs.reshape(-1, 2)[:, 1]
    want = np.stack([m[0][a] + m[0][b], m[0][a] + m[1][b],
                     m[1][a] + m[0][b], m[1][a] + m[1][b]], axis=-1)
    assert np.array_equal(got, want)


def test_rs_nibble_lookups_exhaustive():
    """The GF log/antilog 256-entry lookups run as nibble-bilinear MXU
    forms (rs._lookup256); every input value 0..255 must map exactly
    (all table entries are 8-bit, so the single-bf16-pass dot is exact
    — this test pins that reasoning)."""
    x = jnp.arange(256, dtype=jnp.int32)
    assert np.array_equal(np.asarray(jrs._alpha(x)), jrs._ALPHA_NP)
    assert np.array_equal(np.asarray(jrs._index(x)), jrs._INDEX_NP)


def test_jax_rs_matches_numpy(rng):
    payload = rng.integers(0, 256, 256, dtype=np.uint8)
    cw = ref.descramble_demux(ref.viterbi27(
        ref.deinterleave(ref.symbols_to_soft(ref.encode_fec40(payload)))))
    cases = [cw[0].copy(), cw[1].copy()]
    for nerr in (1, 8, 16, 17):
        bad = cw[0].copy()
        pos = 95 + rng.choice(160, nerr, replace=False)
        bad[pos] ^= rng.integers(1, 256, nerr).astype(np.uint8)
        cases.append(bad)
    batch = np.stack(cases)
    got_cw, got_n = jrs.decode_rs(jnp.asarray(batch))
    for i, case in enumerate(cases):
        want_cw, want_n = ref.decode_rs_8(case)
        assert int(got_n[i]) == want_n, f"case {i}"
        if want_n >= 0:
            assert np.array_equal(np.asarray(got_cw[i]), want_cw), f"case {i}"


def test_full_decode_parity(rng):
    payloads, softs = _frames(rng, 2)
    bad = softs.copy()
    flips = rng.choice(SYMPBLOCK, 100, replace=False)
    bad[0, flips] ^= 0x80
    noise = rng.integers(0, 256, (1, SYMPBLOCK), dtype=np.uint8)
    batch = np.concatenate([bad, noise])
    res = jdec.fec_decode(jnp.asarray(batch))
    for i in range(3):
        want_payload, want_rc = ref.fec_decode(batch[i])
        assert int(res.rc[i]) == want_rc, f"frame {i}"
        if want_rc >= 0:
            assert bool(res.ok[i])
            assert np.array_equal(np.asarray(res.payload[i]), want_payload)
        else:
            assert not bool(res.ok[i])
    assert int(res.rc[0]) == 100
    assert int(res.rc[1]) == 0
