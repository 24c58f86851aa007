"""End-to-end telemetry: synthetic FUNcube downlink -> tuner -> decimate ->
VCO/matched filter -> timing scan -> sync search -> AO-40 FEC decode."""

import jax.numpy as jnp
import numpy as np
import pytest

from jsdr_tpu.demod.bpsk import BpskConfig, bpsk_init, bpsk_block
from jsdr_tpu.fec.decoder import fec_decode
from jsdr_tpu.io.sources import synth_bpsk_stream
from jsdr_tpu.ops.cplx import CF


def _run_stream(sig, payloads, cfg, block):
    sig = np.concatenate([sig, np.zeros((-len(sig)) % block, np.complex64)])
    st = bpsk_init(cfg)
    good = 0
    total_hits = 0
    for b in range(len(sig) // block):
        out, st = bpsk_block(jnp.asarray(sig[b * block:(b + 1) * block]), cfg, st)
        nh = int(out.n_hits)
        total_hits += nh
        if nh:
            res = fec_decode(out.windows[:nh])
            for i in range(nh):
                if bool(res.ok[i]) and any(
                        np.array_equal(np.asarray(res.payload[i]), p)
                        for p in payloads):
                    good += 1
    return good, total_hits, st


def test_clean_stream_decodes_all_frames(rng):
    payloads = rng.integers(0, 256, (2, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=96000, carrier_offset=12000.0)
    cfg = BpskConfig(rate=96000, tuning=12000.0)
    good, hits, st = _run_stream(sig, payloads, cfg, 96000)
    assert good == 2
    counters = np.asarray(st.counters)
    assert counters[1] == counters[0] // 10          # decimation ratio
    # one bit per 80 input samples while signal is present (energy-gated,
    # so the zero-pad tail emits nothing)
    assert counters[2] == pytest.approx(len(sig) // 80, abs=30)


def test_noisy_stream_decodes(rng):
    payloads = rng.integers(0, 256, (2, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=96000, noise_rms=0.5, seed=3)
    cfg = BpskConfig(rate=96000, tuning=12000.0)
    good, _, _ = _run_stream(sig, payloads, cfg, 96000)
    assert good == 2


def test_block_size_invariance(rng):
    """Chained state must make block size irrelevant to the decode result."""
    payloads = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=96000, preamble_bits=200)
    cfg = BpskConfig(rate=96000, tuning=12000.0)
    g1, _, _ = _run_stream(sig, payloads, cfg, 96000)
    g2, _, _ = _run_stream(sig, payloads, cfg, 48000)
    g3, _, _ = _run_stream(sig, payloads, cfg, 240000)
    assert g1 == g2 == g3 == 1


def test_tenth_hz_tuning_traced_no_recompile(rng):
    """Round-4: tunings that are multiples of 0.1 Hz ride the exact
    0.1 Hz-unit integer-numerator path — traced data, decode works, and
    retuning to another 0.1 Hz multiple does NOT recompile (round 3
    pushed any fractional tuning onto a per-tuning-set recompiling
    static path). Sub-0.1 Hz values still warn and recompile."""
    import warnings
    from jsdr_tpu.demod.bpsk import (_bpsk_block_batched, bpsk_block_batch,
                                     bpsk_init_batch, pattern_mix_ok,
                                     tunings_to_nu)

    assert tunings_to_nu([12000.5]) is not None
    assert tunings_to_nu([12000.05]) is None
    assert not pattern_mix_ok([12000.5], 96000)   # general path

    payloads = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=96000, carrier_offset=12000.5,
                            preamble_bits=200)
    n = len(sig) + (-len(sig)) % 96000
    iq = np.zeros((1, n), np.complex64)
    iq[0, :len(sig)] = sig
    cfg = BpskConfig(rate=96000)
    states = bpsk_init_batch(cfg, 1)
    good = 0
    with warnings.catch_warnings():
        warnings.simplefilter("error")       # traced path must NOT warn
        for b in range(n // 96000):
            out, states = bpsk_block_batch(
                iq[:, b * 96000:(b + 1) * 96000], cfg, states,
                np.asarray([12000.5]))
            nh = int(out.n_hits[0])
            if nh:
                res = fec_decode(out.windows[0, :nh])
                good += sum(bool(res.ok[i]) and np.array_equal(
                    np.asarray(res.payload[i]), payloads[0])
                    for i in range(nh))
    assert good == 1
    n_compiles = _bpsk_block_batched._cache_size()
    bpsk_block_batch(iq[:, :96000], cfg, bpsk_init_batch(cfg, 1),
                     np.asarray([11999.9]))
    assert _bpsk_block_batched._cache_size() == n_compiles
    # sub-0.1 Hz: the legacy static path, with its recompile warning
    with pytest.warns(RuntimeWarning, match="0.1 Hz"):
        bpsk_block_batch(iq[:, :96000], cfg, bpsk_init_batch(cfg, 1),
                         np.asarray([12000.05]))


def test_wrong_tuning_no_decode(rng):
    """Tuned 3 kHz off, the decimation filter rejects the signal."""
    payloads = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=96000, preamble_bits=200)
    cfg = BpskConfig(rate=96000, tuning=21000.0)
    good, _, _ = _run_stream(sig, payloads, cfg, 96000)
    assert good == 0


def test_per_stream_tunings_one_call(rng):
    """Two streams with INDEPENDENT tunings (12 kHz and 9 kHz) decode in
    ONE bpsk_block_batch call — the analog of N FUNcubeBPSKDemod tabs
    each with its own FUNcube<n>-bpsk-tuning (jsdr.java:479-484,
    FUNcubeBPSKDemod.java:195-196) — and retuning does NOT recompile."""
    from jsdr_tpu.demod.bpsk import (_bpsk_block_batched, bpsk_block_batch,
                                     bpsk_init_batch)

    payloads = rng.integers(0, 256, (2, 256), dtype=np.uint8)
    sig_a = synth_bpsk_stream(payloads[:1], rate=96000,
                              carrier_offset=12000.0, preamble_bits=200)
    sig_b = synth_bpsk_stream(payloads[1:], rate=96000,
                              carrier_offset=9000.0, preamble_bits=200)
    n = max(len(sig_a), len(sig_b))
    n += (-n) % 96000
    iq = np.zeros((2, n), np.complex64)
    iq[0, :len(sig_a)] = sig_a
    iq[1, :len(sig_b)] = sig_b

    cfg = BpskConfig(rate=96000)
    states = bpsk_init_batch(cfg, 2)
    tunings = np.asarray([12000, 9000])
    good = [0, 0]
    block = 96000
    for b in range(n // block):
        out, states = bpsk_block_batch(iq[:, b * block:(b + 1) * block],
                                       cfg, states, tunings)
        for s in range(2):
            nh = int(out.n_hits[s])
            if not nh:
                continue
            res = fec_decode(out.windows[s, :nh])
            for i in range(nh):
                if bool(res.ok[i]) and np.array_equal(
                        np.asarray(res.payload[i]), payloads[s]):
                    good[s] += 1
    assert good == [1, 1]
    n_compiles = _bpsk_block_batched._cache_size()
    # retune both streams: same compilation must be reused (traced data)
    bpsk_block_batch(iq[:, :block], cfg, bpsk_init_batch(cfg, 2),
                     np.asarray([9000, 12000]))
    assert _bpsk_block_batched._cache_size() == n_compiles


def test_general_mix_path_decodes(rng):
    """A tuning whose NCO ramp is NOT 128-lane periodic (1200 Hz at
    96 kS/s) takes the exact-numerator general path and still decodes."""
    from jsdr_tpu.demod.bpsk import pattern_mix_ok

    assert not pattern_mix_ok([1200], 96000)
    payloads = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=96000, carrier_offset=1200.0,
                            preamble_bits=200)
    cfg = BpskConfig(rate=96000, tuning=1200.0)
    good, _, _ = _run_stream(sig, payloads, cfg, 96000)
    assert good == 1


def test_compat_scan_warns_on_accelerator(rng, monkeypatch):
    """compat_scan=True on a non-CPU backend is a measured ~19x cliff
    (bench/exp_r7_compat.py): the dispatcher must warn so the parity
    knob is never flipped on TPU by accident."""
    import warnings
    import jax
    from jsdr_tpu.demod.bpsk import bpsk_block_batch, bpsk_init_batch

    class _FakeDev:
        platform = "tpu"

    real_devices = jax.devices

    def fake_devices(*a, **kw):
        return [_FakeDev()] if not a and not kw else real_devices(*a, **kw)

    monkeypatch.setattr(jax, "devices", fake_devices)
    cfg = BpskConfig(rate=96000, tuning=12000.0, compat_scan=True)
    iq = np.zeros((1, 9600), np.complex64)
    with pytest.warns(RuntimeWarning, match="compat_scan"):
        bpsk_block_batch(iq, cfg, bpsk_init_batch(cfg, 1),
                         use_pallas=False)
    monkeypatch.undo()
    # no warning without compat_scan
    cfg2 = BpskConfig(rate=96000, tuning=12000.0)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        bpsk_block_batch(iq, cfg2, bpsk_init_batch(cfg2, 1),
                         use_pallas=False)


def test_parallel_timing_equals_scan(rng):
    """The associative-scan timing recovery must produce bit-for-bit the
    same stream as the per-sample scan (compat mode)."""
    payloads = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=96000, noise_rms=0.4, seed=8)
    block = 96000
    sig = np.concatenate([sig, np.zeros((-len(sig)) % block, np.complex64)])
    cfg_a = BpskConfig(rate=96000, tuning=12000.0, compat_scan=True)
    cfg_b = BpskConfig(rate=96000, tuning=12000.0, compat_scan=False)
    st_a, st_b = bpsk_init(cfg_a), bpsk_init(cfg_b)
    for b in range(len(sig) // block):
        blk = jnp.asarray(sig[b * block:(b + 1) * block])
        oa, st_a = bpsk_block(blk, cfg_a, st_a)
        ob, st_b = bpsk_block(blk, cfg_b, st_b)
        na, nb = int(oa.n_bits), int(ob.n_bits)
        assert na == nb
        assert np.array_equal(np.asarray(oa.bits)[:na], np.asarray(ob.bits)[:nb])
        assert int(oa.n_hits) == int(ob.n_hits)
    assert int(st_a.timing.peak) == int(st_b.timing.peak)
    assert int(st_a.timing.new_peak) == int(st_b.timing.new_peak)


def test_mixed_dofft_batch_one_call(rng):
    """Stream 0 manually tuned at 12 kHz and stream 1 FFT-auto-tuned (to
    an 11.9 kHz carrier it was never told about) decode in ONE batched
    call — per-instance FUNcube<n>-bpsk-dofft (FUNcubeBPSKDemod.java:
    97-99, jsdr.java:479-484). Toggling flag VALUES must not recompile
    within the mixed class."""
    from jsdr_tpu.demod.bpsk import (_bpsk_block_batched, bpsk_block_batch,
                                     bpsk_init_batch)

    # the dofft stream reuses test_fft_tune_full_chain_decodes' known-
    # good signal (the reference's box-average auto-tuner is sloppy by
    # design — FUNcubeBPSKDemod.java:433-451 — and some payload draws
    # land it ~300 Hz off, past the differential demod's tolerance; that
    # marginality is the tuner's, not the batching's)
    pay_b = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    pay_a = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    payloads = np.concatenate([pay_a, pay_b])
    sig_a = synth_bpsk_stream(payloads[:1], rate=96000,
                              carrier_offset=12000.0, preamble_bits=400)
    sig_b = synth_bpsk_stream(payloads[1:], rate=96000,
                              carrier_offset=11900.0, preamble_bits=400,
                              seed=2)
    n = max(len(sig_a), len(sig_b))
    n += (-n) % 96000
    iq = np.zeros((2, n), np.complex64)
    iq[0, :len(sig_a)] = sig_a
    iq[1, :len(sig_b)] = sig_b

    cfg = BpskConfig(rate=96000)
    states = bpsk_init_batch(cfg, 2)
    dofft = [False, True]
    good = [0, 0]
    block = 96000
    for b in range(n // block):
        out, states = bpsk_block_batch(iq[:, b * block:(b + 1) * block],
                                       cfg, states, np.asarray([12000, 0]),
                                       dofft=dofft)
        for s in range(2):
            nh = int(out.n_hits[s])
            if not nh:
                continue
            res = fec_decode(out.windows[s, :nh])
            for i in range(nh):
                if bool(res.ok[i]) and np.array_equal(
                        np.asarray(res.payload[i]), payloads[s]):
                    good[s] += 1
    assert good == [1, 1]
    # the auto stream locked near the carrier; the manual stream's
    # fft-tuner state never advanced
    assert int(states.fft_tuner.centre_bin[1]) == pytest.approx(1310, abs=15)
    assert int(states.fft_tuner.centre_bin[0]) == 0
    n_compiles = _bpsk_block_batched._cache_size()
    bpsk_block_batch(iq[:, :block], cfg, bpsk_init_batch(cfg, 2),
                     np.asarray([9000, 0]), dofft=[True, False],
                     track_high=[False, True])
    assert _bpsk_block_batched._cache_size() == n_compiles


def test_fuse_mf_chain_decodes(rng):
    """The opt-in fused VCO+matched-filter front end (BpskConfig.fuse_mf,
    one Pallas kernel for mix+decimate+VCO+MF) must decode the same
    frames as the default staged chain (fp-reassociation differences
    stay inside the decode margins)."""
    from jsdr_tpu.demod.bpsk import bpsk_block_batch, bpsk_init_batch

    payloads = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=96000, preamble_bits=200)
    n = len(sig) + (-len(sig)) % 96000
    iq = np.zeros((1, n), np.complex64)
    iq[0, :len(sig)] = sig

    cfg = BpskConfig(rate=96000, tuning=12000.0, fuse_mf=True)
    st = bpsk_init_batch(cfg, 1)
    good = 0
    for b in range(n // 96000):
        # use_pallas=True on CPU runs the kernels under interpret
        out, st = bpsk_block_batch(iq[:, b * 96000:(b + 1) * 96000], cfg,
                                   st, use_pallas=True)
        nh = int(out.n_hits[0])
        if nh:
            res = fec_decode(out.windows[0, :nh])
            good += sum(bool(res.ok[i]) and np.array_equal(
                np.asarray(res.payload[i]), payloads[0]) for i in range(nh))
    assert good == 1


def test_merged_spectrum_step_matches_staged(rng):
    """bpsk_block_batch_spectrum (one-input-read merged kernel) must
    reproduce the staged spectrum_waterfall + bpsk_block_batch pair:
    identical waterfall lines, peaks, decode outputs, and carried
    state."""
    import jax
    from jsdr_tpu.demod.bpsk import (bpsk_block_batch,
                                     bpsk_block_batch_spectrum,
                                     bpsk_init_batch)
    from jsdr_tpu.ops.pallas_kernels import spectrum_waterfall

    payloads = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=96000, preamble_bits=200,
                            noise_rms=0.2)
    block = 96000 * 2
    n = len(sig) + (-len(sig)) % block
    iq = np.zeros((2, n), np.complex64)
    iq[0, :len(sig)] = sig
    iq[1, :len(sig)] = sig[::-1]
    cfg = BpskConfig(rate=96000, tuning=12000.0)

    for use_pallas in (False, True):      # fallback path / merged kernel
        st_m = bpsk_init_batch(cfg, 2)
        st_s = bpsk_init_batch(cfg, 2)
        decoded = 0
        for b in range(n // block):
            blk = iq[:, b * block:(b + 1) * block]
            spec, out_m, st_m = bpsk_block_batch_spectrum(
                blk, cfg, st_m, use_pallas=use_pallas)
            wf_s, mx_s, idx_s = spectrum_waterfall(
                blk, 9600, interpret=True)
            out_s, st_s = bpsk_block_batch(blk, cfg, st_s,
                                           use_pallas=use_pallas)
            assert np.array_equal(np.asarray(spec.wf), np.asarray(wf_s))
            assert np.array_equal(np.asarray(spec.peak_db),
                                  np.asarray(mx_s).swapaxes(0, 1))
            assert np.array_equal(np.asarray(out_m.n_bits),
                                  np.asarray(out_s.n_bits))
            assert np.array_equal(np.asarray(out_m.windows),
                                  np.asarray(out_s.windows))
            nh = int(out_m.n_hits[0])
            if nh:
                res = fec_decode(out_m.windows[0, :nh])
                decoded += int(res.ok.sum())
        assert decoded == 1
        assert np.array_equal(np.asarray(st_m.counters),
                              np.asarray(st_s.counters))
        assert np.array_equal(np.asarray(st_m.ring), np.asarray(st_s.ring))


def test_merged_spectrum_step_192k(rng):
    """The merged kernel's 192 kS/s geometry (m=20: 2 FFT blocks / 3
    sub-chunks of 640 per grid step, sf_geometry) must be eligible and
    match the staged pair — one 1 s block, decode-path counters and
    waterfall lines compared."""
    from jsdr_tpu.demod.bpsk import (bpsk_block_batch,
                                     bpsk_block_batch_spectrum,
                                     bpsk_init_batch)
    from jsdr_tpu.ops.pallas_kernels import sf_geometry, spectrum_waterfall

    assert sf_geometry(19200, 20) == (2, 640)
    assert sf_geometry(9600, 10) == (4, 1280)
    rate = 192000
    payloads = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=rate, preamble_bits=200,
                            noise_rms=0.2)[:rate]
    iq = np.zeros((1, rate), np.complex64)
    iq[0, :len(sig)] = sig
    cfg = BpskConfig(rate=rate, tuning=12000.0)
    st_m = bpsk_init_batch(cfg, 1)
    st_s = bpsk_init_batch(cfg, 1)
    spec, out_m, st_m = bpsk_block_batch_spectrum(iq, cfg, st_m,
                                                  use_pallas=True)
    wf_s, mx_s, idx_s = spectrum_waterfall(iq, rate // 10, interpret=True)
    out_s, st_s = bpsk_block_batch(iq, cfg, st_s, use_pallas=True)
    assert np.array_equal(np.asarray(spec.wf), np.asarray(wf_s))
    assert np.array_equal(np.asarray(spec.peak_db),
                          np.asarray(mx_s).swapaxes(0, 1))
    assert np.array_equal(np.asarray(out_m.n_bits), np.asarray(out_s.n_bits))
    assert np.array_equal(np.asarray(out_m.windows),
                          np.asarray(out_s.windows))
    assert np.array_equal(np.asarray(st_m.counters), np.asarray(st_s.counters))


def test_chained_fori_loop_steps_equal_iterated(rng):
    """bench.py's steady-state measurement runs k dependent steps inside
    ONE jit via lax.fori_loop in the HOIST-PROOF form: the input's real
    plane rides the loop carry and one sample is overwritten with a
    state-derived value each iteration, so even state-free ops (the
    display spectrum) cannot be moved out of the loop by XLA's
    while-loop invariant code motion. (The loop-carried demod state
    alone is NOT enough: LICM hoisted the whole spectrum kernel of the
    round-3 constant-input form — values were identical, timing was
    not; measured in bench/exp_r7_hoist.py.) Guard the value contract:
    the chained form must produce bit-identical final state and forced
    sums vs k python-iterated steps applying the same perturbation."""
    import jax
    from jsdr_tpu.demod.bpsk import (bpsk_block_batch_spectrum,
                                     bpsk_init_batch)

    payloads = rng.integers(0, 256, (2, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads[:1], rate=96000, preamble_bits=200,
                            noise_rms=0.2)
    block = 96000 * 2
    n = block
    iq = np.zeros((2, n), np.complex64)
    iq[0] = sig[:n]
    iq[1] = sig[len(sig) - n:]
    cfg = BpskConfig(rate=96000, tuning=12000.0)

    def forced_of(spec, out):
        return (spec.wf.sum() + spec.peak_db.sum() + spec.peak_freq.sum()
                + out.windows.astype(jnp.int32).sum() + out.hit_corr.sum()
                + out.n_hits.sum() + out.n_bits.sum()).astype(jnp.float32)

    k = 3

    @jax.jit
    def chained(iq_re, iq_im, states):
        def body(_, carry):
            acc, re_buf, st = carry
            spec, out, st = bpsk_block_batch_spectrum(
                CF(re_buf, iq_im), cfg, st)
            f = forced_of(spec, out)
            re_buf = jax.lax.dynamic_update_slice(
                re_buf, (f * 1e-12)[None, None], (0, 0))
            return acc + f, re_buf, st
        return jax.lax.fori_loop(0, k, body,
                                 (jnp.float32(0.0), iq_re, states))

    @jax.jit
    def one(iq_re, iq_im, states):
        spec, out, st = bpsk_block_batch_spectrum(CF(iq_re, iq_im), cfg,
                                                  states)
        f = forced_of(spec, out)
        re2 = jax.lax.dynamic_update_slice(
            iq_re, (f * 1e-12)[None, None], (0, 0))
        return f, re2, st

    from jsdr_tpu.ops.cplx import from_complex
    iq_cf = from_complex(iq)
    acc_c, re_c, st_c = chained(iq_cf.re, iq_cf.im, bpsk_init_batch(cfg, 2))
    acc_i, st_i = jnp.float32(0.0), bpsk_init_batch(cfg, 2)
    re_i = iq_cf.re
    for _ in range(k):
        f, re_i, st_i = one(re_i, iq_cf.im, st_i)
        acc_i = acc_i + f
    for a, b in zip(jax.tree.leaves(st_c), jax.tree.leaves(st_i)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(np.asarray(re_c), np.asarray(re_i))
    assert np.asarray(acc_c) == pytest.approx(np.asarray(acc_i), rel=1e-6)
    # the state must actually advance across iterations
    assert int(np.asarray(st_c.counters)[:, 0].sum()) == 2 * k * n
