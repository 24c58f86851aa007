"""DSP ops: FIR design/application parity, decimator alignment, NCO,
spectrum formulas vs the reference's math."""

import jax.numpy as jnp
import numpy as np
import pytest

from jsdr_tpu.ops import fir, nco, spectrum, windows


def test_bandpass_weights_match_reference_formula():
    """demod.java:341-370 windowed-sinc + symmetric Hamming."""
    rate, flo, fhi, ntaps = 96000.0, 500.0, 1500.0, 21
    got = np.asarray(fir.bandpass_weights(ntaps, flo, fhi, rate))
    ordr = ntaps - 1
    want = np.zeros(ntaps)
    for n in range(ntaps):
        if n == ordr // 2:
            want[n] = 2 * (fhi - flo) / rate
        else:
            m = n - ordr // 2
            want[n] = (np.sin(2 * np.pi * fhi / rate * m) / (np.pi * m)
                       - np.sin(2 * np.pi * flo / rate * m) / (np.pi * m))
        want[n] *= 0.54 - 0.46 * np.cos(2 * np.pi * n / ordr)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_allpass_weights():
    w = np.asarray(fir.bandpass_weights(21, None, None, 96000.0))
    assert w[10] == 1.0 and np.count_nonzero(w) == 1


def test_fir_streaming_equals_whole_block(rng):
    x = rng.normal(size=257).astype(np.float32)
    taps = fir.bandpass_weights(21, 500, 1500, 44100)
    y_all = np.asarray(fir.fir_apply(jnp.asarray(x), taps))
    y1, tail = fir.fir_apply_streaming(jnp.asarray(x[:100]), taps,
                                       jnp.zeros(20, jnp.float32))
    y2, _ = fir.fir_apply_streaming(jnp.asarray(x[100:]), taps, tail)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)]), y_all, atol=1e-5)


def test_fir_fft_matches_direct(rng):
    from jsdr_tpu.ops.cplx import to_complex
    x = (rng.normal(size=1000) + 1j * rng.normal(size=1000)).astype(np.complex64)
    taps = fir.bandpass_weights(27, 0, 4800, 96000)
    a = np.asarray(fir.fir_apply(jnp.asarray(x), taps))
    b = to_complex(fir.fir_apply_fft(x, taps))
    np.testing.assert_allclose(a, b, atol=1e-4)
    # real input stays real
    xr = rng.normal(size=512).astype(np.float32)
    ar = np.asarray(fir.fir_apply(jnp.asarray(xr), taps))
    br = np.asarray(fir.fir_apply_fft(xr, taps))
    np.testing.assert_allclose(ar, br, atol=1e-4)


def test_polyphase_decimate_matches_reference_loop(rng):
    """Reference decimator semantics (FUNcubeBPSKDemod.java:470-492):
    output k at input instant (k+1)*m-1, causal 27-tap dot."""
    m, nt = 10, 27
    x = (rng.normal(size=(2, 100)) + 1j * rng.normal(size=(2, 100))
         ).astype(np.complex64)
    taps = np.asarray(fir.bandpass_weights(nt, 0, 4800, 96000))
    got, tail = fir.polyphase_decimate(jnp.asarray(x), jnp.asarray(taps), m,
                                       gain=2.0)
    xp = np.concatenate([np.zeros((2, nt - 1), np.complex64), x], axis=1)
    want = np.zeros((2, 10), np.complex64)
    for k in range(10):
        t = (k + 1) * m - 1 + (nt - 1)
        for a in range(nt):
            want[:, k] += xp[:, t - a] * taps[a]
    np.testing.assert_allclose(np.asarray(got), 2.0 * want, atol=1e-4)
    # streaming tail continues the stream exactly
    got2, _ = fir.polyphase_decimate(jnp.asarray(x), jnp.asarray(taps), m,
                                     tail=jnp.asarray(tail), gain=2.0)
    xp2 = np.concatenate([x[:, -nt + 1:], x], axis=1)
    want2 = np.zeros((2, 10), np.complex64)
    for k in range(10):
        t = (k + 1) * m - 1 + (nt - 1)
        for a in range(nt):
            want2[:, k] += xp2[:, t - a] * taps[a]
    np.testing.assert_allclose(np.asarray(got2), 2.0 * want2, atol=1e-4)


def test_psd_formula_matches_reference():
    """fft.java:197-207: psd = 10*log10((re^2+im^2)*(2/N)^2)."""
    n = 256
    x = np.asarray(
        [np.exp(2j * np.pi * 32 * t / n) for t in range(n)], dtype=np.complex64)
    res = spectrum.spectrum_block(jnp.asarray(x)[None], rate=9600.0,
                                  window=False)
    psd = np.asarray(res.psd[0])
    # full-scale complex tone: |X[32]| = N, psd = 10*log10((N*2/N)^2) ~ 6.02
    assert abs(psd[32] - 20 * np.log10(2.0)) < 1e-3
    assert int(res.peak_freq[0]) == 32 * 9600 // 256


def test_spectrum_negative_freq_mapping():
    n = 256
    x = np.asarray(
        [np.exp(-2j * np.pi * 32 * t / n) for t in range(n)], dtype=np.complex64)
    res = spectrum.spectrum_block(jnp.asarray(x)[None], rate=9600.0,
                                  window=False)
    assert int(res.peak_freq[0]) == (224 - 256) * 9600 // 256  # negative


def test_hamming_window_convention():
    w = np.asarray(windows.hamming(256))
    assert abs(w[0] - 0.08) < 1e-6          # 0.54 - 0.46
    # reference convention: period N (not N-1), fft.java:72-73
    assert abs(w[128] - 1.0) < 1e-6


def test_quantized_nco_table():
    ph = jnp.asarray(np.linspace(0, 2 * np.pi, 100, endpoint=False))
    c, s = nco.quantized_cos_sin(ph)
    idx = (np.linspace(0, 2 * np.pi, 100, endpoint=False) * 256 / (2 * np.pi)
           ).astype(int) % 256
    np.testing.assert_allclose(np.asarray(c), np.cos(idx * 2 * np.pi / 256),
                               atol=1e-6)


def test_pallas_psd_waterfall_matches_reference(rng):
    from jsdr_tpu.ops.pallas_kernels import psd_waterfall
    spec = (rng.standard_normal((16, 1920)) +
            1j * rng.standard_normal((16, 1920))).astype(np.complex64) * 40
    db_p, line_p = psd_waterfall(jnp.asarray(spec), width=960,
                                 use_pallas=True, interpret=True)
    db_r, line_r = psd_waterfall(jnp.asarray(spec), width=960,
                                 use_pallas=False)
    np.testing.assert_allclose(np.asarray(db_p), np.asarray(db_r), atol=1e-4)
    assert np.array_equal(np.asarray(line_p), np.asarray(line_r))


def test_spectrum_fused_matches_block():
    """The fused Pallas wide-layout spectrum equals reshape+spectrum_block."""
    import numpy as np
    from jsdr_tpu.ops.cplx import from_complex
    from jsdr_tpu.ops.spectrum import spectrum_block, spectrum_wide

    rng = np.random.default_rng(3)
    s, t, n = 3, 2 * 1280, 1280   # n1 = 10, n2 = 128
    sig = (rng.standard_normal((s, t))
           + 1j * rng.standard_normal((s, t))).astype(np.complex64)
    cf = from_complex(sig)
    ref = spectrum_block(cf.reshape(s, t // n, n), rate=9600.0, window=True)
    got = spectrum_wide(cf, n, rate=9600.0, window=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got.psd), np.asarray(ref.psd),
                               rtol=0, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(got.peak_freq),
                                  np.asarray(ref.peak_freq))


def test_mix_decimate_fused_matches_reference(rng):
    """The fused Pallas mix+decimate kernel (interpret mode) equals the
    pattern-tiled mix + polyphase_decimate oracle, including the carried
    mixed-domain tail, across chunk-aligned, ragged, and multi-chunk T."""
    import jax
    from jsdr_tpu.ops.cplx import CF
    from jsdr_tpu.ops.pallas_kernels import _mix_decimate_ref, mix_decimate

    m, nt = 10, 27
    taps = np.random.default_rng(7).standard_normal(nt).astype(np.float32)
    ang = (np.arange(128) % 8) * (2 * np.pi / 8)
    for s, t in [(1, 12800), (3, 25600), (2, 640), (2, 48000)]:
        x = CF(jnp.asarray(rng.normal(size=(s, t)).astype(np.float32)),
               jnp.asarray(rng.normal(size=(s, t)).astype(np.float32)))
        cos_pat = jnp.asarray(np.tile(np.cos(ang).astype(np.float32),
                                      (s, 1)))
        sin_pat = jnp.asarray(np.tile(np.sin(ang).astype(np.float32),
                                      (s, 1)))
        tail = CF(jnp.asarray(rng.normal(size=(s, nt - 1)).astype(np.float32)),
                  jnp.asarray(rng.normal(size=(s, nt - 1)).astype(np.float32)))
        ref, rt = _mix_decimate_ref(x, cos_pat, sin_pat, taps, m, tail, 3.0)
        got, gt = mix_decimate(x, cos_pat, sin_pat, taps, m, tail, 3.0,
                               use_pallas=True, interpret=True,
                               precision="highest")
        np.testing.assert_allclose(np.asarray(got.re), np.asarray(ref.re),
                                   rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.im), np.asarray(ref.im),
                                   rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gt.re), np.asarray(rt.re),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gt.im), np.asarray(rt.im),
                                   atol=1e-5)
        # default bf16x3 FIR matmul: bounded hi/lo-split error only
        got3, gt3 = mix_decimate(x, cos_pat, sin_pat, taps, m, tail, 3.0,
                                 use_pallas=True, interpret=True)
        scale = float(np.abs(np.asarray(ref.re)).max())
        np.testing.assert_allclose(np.asarray(got3.re), np.asarray(ref.re),
                                   rtol=0, atol=5e-4 * scale)
        np.testing.assert_allclose(np.asarray(got3.im), np.asarray(ref.im),
                                   rtol=0, atol=5e-4 * scale)
        # the carried tail is copied, not matmul'd: stays exact-ish
        np.testing.assert_allclose(np.asarray(gt3.re), np.asarray(rt.re),
                                   atol=1e-5)


def test_nco_pattern_matches_full_mix(rng):
    """The 128-lane periodic NCO pattern tiles to exactly the per-sample
    quantized-table ramp (FUNcubeBPSKDemod.java:381-397), per stream."""
    from jsdr_tpu.demod.bpsk import (NU_SCALE, _nco_pattern,
                                     _tuner_full_mix, _nco_advance,
                                     pattern_mix_ok)
    from jsdr_tpu.ops.cplx import CF

    rate, t = 96000, 9600
    tunings = np.asarray([12000, 21000, 0], np.int32)
    assert pattern_mix_ok(tunings, rate)
    x = CF(jnp.asarray(rng.normal(size=(3, t)).astype(np.float32)),
           jnp.asarray(rng.normal(size=(3, t)).astype(np.float32)))
    nu0 = jnp.zeros(3, jnp.float32)
    tu = jnp.asarray(tunings * NU_SCALE)     # traced 0.1 Hz units
    want, nu_want = _tuner_full_mix(x, nu0, tu, rate)
    cos_pat, sin_pat = _nco_pattern(nu0, tu, rate)
    reps = t // 128
    got_re = (np.asarray(x.re).reshape(3, reps, 128)
              * np.asarray(cos_pat)[:, None, :])
    got_im = (np.asarray(x.im).reshape(3, reps, 128)
              * np.asarray(sin_pat)[:, None, :])
    np.testing.assert_array_equal(got_re.reshape(3, -1), np.asarray(want.re))
    np.testing.assert_array_equal(got_im.reshape(3, -1), np.asarray(want.im))
    nu_got = _nco_advance(nu0, tu, rate, t)
    np.testing.assert_array_equal(np.asarray(nu_got), np.asarray(nu_want))


def test_nco_numerators_exact():
    """Exact int32 numerator ramp == the int64 ground truth for long
    spans and awkward tunings (incl. the non-128-periodic 1200 Hz)."""
    from jsdr_tpu.demod.bpsk import nco_numerators

    rate, n = 96000, 1 << 19
    for tu, start in ((12000, 1), (1200, 1), (191999 % rate, -1945),
                      (7, 1), (95999, -345678)):
        got = np.asarray(nco_numerators(
            jnp.asarray(np.int32(12345)), jnp.asarray(np.int32(tu)),
            n, rate, start=start))
        i = np.arange(n, dtype=np.int64)
        want = (12345 + (start + i) * tu) % rate
        np.testing.assert_array_equal(got, want.astype(np.int32))


def test_static_fractional_tuner_mix(rng):
    """The legacy static-tuning path handles fractional Hz tunings."""
    from jsdr_tpu.demod.bpsk import _tuner_mix
    from jsdr_tpu.ops.cplx import CF

    rate, t = 96000, 1024
    x = CF(jnp.asarray(rng.normal(size=t).astype(np.float32)),
           jnp.asarray(rng.normal(size=t).astype(np.float32)))
    mixed, nu = _tuner_mix(x, jnp.asarray(np.float32(0.0)), 12000.5, rate)
    # phase numerator after t samples = (t * 12000.5) mod rate, stored
    # in NU_SCALE (0.1 Hz) units like every other path
    from jsdr_tpu.demod.bpsk import NU_SCALE
    np.testing.assert_allclose(float(nu), ((t * 12000.5) % rate) * NU_SCALE,
                               atol=5.0)
    assert not np.allclose(np.asarray(mixed.re), np.asarray(x.re))


def test_peak_freq_no_int32_overflow():
    """bin->Hz on a LARGE transform: the naive signed*rate//n wraps int32
    (n=192000 at 96k puts bin*rate at -2.37e9) and reported +10024 Hz for
    a -12345 Hz tone. Regression for ops.spectrum.bin_to_hz."""
    from jsdr_tpu.io.sources import synth_sine
    from jsdr_tpu.ops.spectrum import spectrum_block
    n, rate = 192000, 96000.0
    tone = synth_sine(n, -12345.0, rate, amplitude=0.5)
    res = spectrum_block(jnp.asarray(tone[None]), rate=rate, window=True)
    assert int(res.peak_freq[0]) == -12345
    # and the positive image of the truncation convention still holds
    tone = synth_sine(n, 23456.0, rate, amplitude=0.5)
    res = spectrum_block(jnp.asarray(tone[None]), rate=rate, window=True)
    assert int(res.peak_freq[0]) == 23456


def test_mix_decimate_mf_fused_matches_reference(rng):
    """The fully fused front end (tuner mix + decimating FIR + VCO mix +
    matched filter in one kernel) must match the staged reference
    pipeline to fp-reassociation tolerance, including both carried
    tails, on chunk-ragged lengths."""
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.demod.bpsk import (DM_FILTER, DS_FILTER,
                                     HOWARD_FUDGE_FACTOR, _vco_mix,
                                     _vco_pattern)
    from jsdr_tpu.ops.cplx import CF, from_complex
    from jsdr_tpu.ops.fir import fir_apply_streaming
    from jsdr_tpu.ops.pallas_kernels import mix_decimate, mix_decimate_mf

    s, t, m = 3, 12800 * 2 + 640, 10
    sig = (0.3 * (rng.standard_normal((s, t))
                  + 1j * rng.standard_normal((s, t)))).astype(np.complex64)
    x = from_complex(sig)
    ones = jnp.ones((s, 128), jnp.float32)
    tail = CF(jnp.asarray(rng.standard_normal((s, 26)), jnp.float32),
              jnp.asarray(rng.standard_normal((s, 26)), jnp.float32))
    mft = CF(jnp.asarray(rng.standard_normal((s, 64)), jnp.float32),
             jnp.asarray(rng.standard_normal((s, 64)), jnp.float32))
    vco_idx = jnp.asarray([0, 3, 6], jnp.int32)
    vcoc, vcos = _vco_pattern(vco_idx)
    taps = DS_FILTER.astype(np.float32)

    ds, tail_ref = mix_decimate(x, ones, ones, taps, m, tail,
                                gain=HOWARD_FUDGE_FACTOR, use_pallas=False)

    def stage(ds1, vi1, mft1):
        bb, _ = _vco_mix(ds1, vi1)
        return fir_apply_streaming(
            bb, jnp.asarray(DM_FILTER.astype(np.float32)), mft1,
            precision="bf16x3")

    mf_ref, mft_ref = jax.vmap(stage)(ds, vco_idx, mft)

    mf, tail_k, mft_k = mix_decimate_mf(
        x, ones, ones, taps, m, tail, vcoc, vcos,
        DM_FILTER.astype(np.float32), mft, gain=HOWARD_FUDGE_FACTOR,
        use_pallas=True, interpret=True)
    scale = float(np.abs(np.asarray(mf_ref.re)).max())
    np.testing.assert_allclose(np.asarray(mf.re), np.asarray(mf_ref.re),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(mf.im), np.asarray(mf_ref.im),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(tail_k.re),
                               np.asarray(tail_ref.re), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mft_k.re), np.asarray(mft_ref.re),
                               atol=2e-5 * scale)
    # CPU fallback path is the staged pipeline exactly
    mf_f, _tf, _mf = mix_decimate_mf(
        x, ones, ones, taps, m, tail, vcoc, vcos,
        DM_FILTER.astype(np.float32), mft, gain=HOWARD_FUDGE_FACTOR,
        use_pallas=False)
    assert np.array_equal(np.asarray(mf_f.re), np.asarray(mf_ref.re))


def test_spectrum_waterfall_matches_decimated_psd(rng):
    """The waterfall-mode spectrum kernel must equal the full-PSD kernel
    max-decimated in NATURAL bin order, with identical peaks."""
    from jsdr_tpu.ops.cplx import from_complex
    from jsdr_tpu.ops.pallas_kernels import (spectrum_fused,
                                             spectrum_natural_order,
                                             spectrum_waterfall,
                                             waterfall_natural_order,
                                             wf_group_for)

    n = 9600
    sig = (0.3 * (rng.standard_normal((8, n * 3))
                  + 1j * rng.standard_normal((8, n * 3)))).astype(np.complex64)
    iq = from_complex(sig)
    psd, mx, idx = spectrum_fused(iq, n, with_peaks=True, interpret=True)
    wf, mx2, idx2 = spectrum_waterfall(iq, n, interpret=True)
    assert np.array_equal(np.asarray(mx), np.asarray(mx2))
    assert np.array_equal(np.asarray(idx), np.asarray(idx2))
    q = wf_group_for(n)
    assert q == 5 and wf.shape == (3, 8, 15, 128)
    nat = np.asarray(spectrum_natural_order(psd))     # [S, nblk, n]
    ref = nat.reshape(8, 3, n // q, q).max(axis=-1)
    got = np.asarray(waterfall_natural_order(wf))
    # bit-equality on every backend: both modes run the SAME scratch-
    # batched kernel (full-PSD mode is decimation group q=1), so the
    # decimation identities (natural-order grouping, max-then-log ==
    # log-then-max) apply to one expression graph, not two.
    assert np.array_equal(got, ref)
    assert wf_group_for(19200) == 10                  # 192 kS/s FFT size
