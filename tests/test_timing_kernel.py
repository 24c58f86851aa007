"""VMEM-resident timing-recovery kernel vs the XLA parallel oracle.

The kernel (ops/timing_kernel.py) must reproduce demod.bpsk.
_timing_parallel's decisions and carried state: selection arithmetic is
identical; the EMA trajectory composes chunk carries in a different fp
order, so energy values are compared to tolerance while decisions
(valid/bit/peak schedule) must match exactly on generic inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jsdr_tpu.demod import bpsk as B
from jsdr_tpu.ops.cplx import CF
from jsdr_tpu.ops.timing_kernel import timing_recover_batch


def _rand_states(rng, s):
    cfg = B.BpskConfig(rate=96000)
    st = B.bpsk_init_batch(cfg, s)
    tm = st.timing
    # non-trivial carried state: mid-decay EMAs, scheduled peaks,
    # a previous symbol
    return B.TimingState(
        e_ema=(rng.random((s, 8)).astype(np.float32) * 2e4),
        pos=tm.pos,
        peak=rng.integers(0, 8, s).astype(np.int32),
        new_peak=rng.integers(0, 8, s).astype(np.int32),
        e_out=(rng.random(s).astype(np.float32) * 100),
        last_iq=rng.standard_normal((s, 2)).astype(np.float32) * 50,
    )


@pytest.mark.parametrize("s,t_ds", [(3, 4800), (8, 9600), (5, 2048 * 8)])
def test_timing_kernel_matches_parallel(rng, s, t_ds):
    tm = _rand_states(rng, s)
    # a BPSK-looking signal: strong alternating symbols + noise, so the
    # energy gate and the peak schedule both flip realistically
    mfr = (rng.standard_normal((s, t_ds)) * 30
           + 150 * np.sign(rng.standard_normal((s, t_ds // 8)))
           .repeat(8, axis=1)).astype(np.float32)
    mfi = (rng.standard_normal((s, t_ds)) * 30).astype(np.float32)
    mf = CF(jnp.asarray(mfr), jnp.asarray(mfi))

    v0, b0, di0, e20, ts0 = jax.vmap(B._timing_parallel)(mf, tm)
    (v1, b1, ema1, pk1, npk1, eo1, liq1) = timing_recover_batch(
        mf.re, mf.im, tm.e_ema, tm.peak, tm.new_peak, tm.e_out,
        tm.last_iq, smooth1=B.BIT_SMOOTH1, smooth2=B.BIT_SMOOTH2,
        gate=B.ENERGY_GATE, interpret=True)

    assert np.array_equal(np.asarray(v0), np.asarray(v1))
    # bit only matters where valid (invalid slots carry arbitrary signs
    # of near-zero differentials)
    vm = np.asarray(v0)
    assert np.array_equal(np.asarray(b0)[vm], np.asarray(b1)[vm])
    assert np.array_equal(np.asarray(ts0.peak), np.asarray(pk1))
    assert np.array_equal(np.asarray(ts0.new_peak), np.asarray(npk1))
    np.testing.assert_allclose(np.asarray(ts0.e_ema), np.asarray(ema1),
                               rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(ts0.e_out), np.asarray(eo1),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(ts0.last_iq), np.asarray(liq1),
                               rtol=1e-6, atol=1e-4)


def test_timing_kernel_chained_blocks(rng):
    """Two chained kernel blocks must equal one double-length call
    (the carried state is the whole contract)."""
    s, t_ds = 4, 4800
    tm = _rand_states(rng, s)
    mfr = (rng.standard_normal((s, 2 * t_ds)) * 30
           + 140 * np.sign(rng.standard_normal((s, 2 * t_ds // 8)))
           .repeat(8, axis=1)).astype(np.float32)
    mfi = (rng.standard_normal((s, 2 * t_ds)) * 30).astype(np.float32)

    kw = dict(smooth1=B.BIT_SMOOTH1, smooth2=B.BIT_SMOOTH2,
              gate=B.ENERGY_GATE, interpret=True)
    va, ba, ema_a, pk_a, npk_a, eo_a, liq_a = timing_recover_batch(
        mfr[:, :t_ds], mfi[:, :t_ds], tm.e_ema, tm.peak, tm.new_peak,
        tm.e_out, tm.last_iq, **kw)
    vb, bb, ema_b, pk_b, npk_b, eo_b, liq_b = timing_recover_batch(
        mfr[:, t_ds:], mfi[:, t_ds:], ema_a, pk_a, npk_a, eo_a, liq_a,
        **kw)
    vf, bf, ema_f, pk_f, npk_f, eo_f, liq_f = timing_recover_batch(
        mfr, mfi, tm.e_ema, tm.peak, tm.new_peak, tm.e_out, tm.last_iq,
        **kw)

    got_v = np.concatenate([np.asarray(va), np.asarray(vb)], axis=1)
    assert np.array_equal(got_v, np.asarray(vf))
    vm = got_v
    got_b = np.concatenate([np.asarray(ba), np.asarray(bb)], axis=1)
    assert np.array_equal(got_b[vm], np.asarray(bf)[vm])
    assert np.array_equal(np.asarray(pk_b), np.asarray(pk_f))
    np.testing.assert_allclose(np.asarray(ema_b), np.asarray(ema_f),
                               rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(eo_b), np.asarray(eo_f),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(liq_b), np.asarray(liq_f),
                               rtol=1e-6, atol=1e-4)


def test_batched_chain_kernel_path_decodes(rng):
    """End-to-end: bpsk_block_batch with use_pallas=True (kernel timing
    path, interpret on CPU) must decode the same frames as the XLA
    path."""
    from jsdr_tpu.fec.decoder import fec_decode
    from jsdr_tpu.io.sources import synth_bpsk_stream

    payloads = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=96000, preamble_bits=200,
                            noise_rms=0.25)
    n = len(sig) + (-len(sig)) % 96000
    iq = np.zeros((2, n), np.complex64)
    iq[0, :len(sig)] = sig
    iq[1, :len(sig)] = sig[::-1]
    cfg = B.BpskConfig(rate=96000, tuning=12000.0)

    outs = {}
    for up in (False, True):
        st = B.bpsk_init_batch(cfg, 2)
        decoded, windows = 0, []
        for b in range(n // 96000):
            out, st = B.bpsk_block_batch(iq[:, b * 96000:(b + 1) * 96000],
                                         cfg, st, use_pallas=up)
            nh = int(out.n_hits[0])
            if nh:
                res = fec_decode(out.windows[0, :nh])
                for i in range(nh):
                    if bool(res.ok[i]) and np.array_equal(
                            np.asarray(res.payload[i]), payloads[0]):
                        decoded += 1
        outs[up] = (decoded, np.asarray(st.counters))
    assert outs[True][0] == outs[False][0] == 1
    assert np.array_equal(outs[True][1], outs[False][1])
