"""AM/FM demodulation (demod.java parity) and the FFT auto-tune front-end."""

import jax.numpy as jnp
import numpy as np
import pytest

from jsdr_tpu.demod.am_fm import (
    AmFmConfig, AmFmState, Mode, audio_to_s16_stereo, demod_block,
)
from jsdr_tpu.demod.bpsk import BpskConfig, bpsk_init, bpsk_block
from jsdr_tpu.demod.fft_tuner import fft_tuner_blocks, fft_tuner_init
from jsdr_tpu.fec.decoder import fec_decode
from jsdr_tpu.io.sources import synth_bpsk_stream, synth_sine


def test_am_demod_recovers_envelope():
    rate = 96000
    n = rate
    t = np.arange(n) / rate
    mod = 1.0 + 0.5 * np.sin(2 * np.pi * 1000 * t)     # 1 kHz AM
    carrier = np.exp(2j * np.pi * 5000 * t)
    iq = (0.4 * mod * carrier).astype(np.complex64)
    cfg = AmFmConfig(rate=rate, mode=int(Mode.AM))
    audio, mx, avg, _ = demod_block(jnp.asarray(iq), cfg, AmFmState.init(cfg))
    audio = np.asarray(audio)
    spec = np.abs(np.fft.rfft(audio))
    assert np.argmax(spec[100:]) + 100 == 1000          # 1 kHz dominates
    assert abs(float(avg) - 0.4) < 0.01                 # carrier mean


def test_fm_demod_recovers_tone():
    rate = 96000
    n = rate
    t = np.arange(n) / rate
    dev = 4000.0
    phase = 2 * np.pi * np.cumsum(dev * np.sin(2 * np.pi * 800 * t)) / rate
    iq = (0.5 * np.exp(1j * phase)).astype(np.complex64)
    cfg = AmFmConfig(rate=rate, mode=int(Mode.NFM))
    audio, mx, avg, _ = demod_block(jnp.asarray(iq), cfg, AmFmState.init(cfg))
    spec = np.abs(np.fft.rfft(np.asarray(audio)))
    assert np.argmax(spec[100:]) + 100 == 800


def test_fm_state_chains_blocks():
    rate = 96000
    iq = synth_sine(rate, 2000.0, rate, amplitude=0.5)
    cfg = AmFmConfig(rate=rate, mode=int(Mode.NFM))
    st = AmFmState.init(cfg)
    a1, _, _, st = demod_block(jnp.asarray(iq[:48000]), cfg, st)
    a2, _, _, st = demod_block(jnp.asarray(iq[48000:]), cfg, st)
    whole, _, _, _ = demod_block(jnp.asarray(iq), cfg, AmFmState.init(cfg))
    got = np.concatenate([np.asarray(a1), np.asarray(a2)])
    np.testing.assert_allclose(got, np.asarray(whole), atol=1e-5)


def test_fir_select_plus_downshift():
    """Band-pass select a tone then shift it down by flo (demod.java path)."""
    rate = 96000
    iq = (synth_sine(rate, 10000.0, rate, amplitude=0.4)
          + synth_sine(rate, 30000.0, rate, amplitude=0.4))
    cfg = AmFmConfig(rate=rate, mode=int(Mode.RAW), dofir=True, dodwn=True,
                     flo=8000, fhi=12000)
    audio, _, _, _ = demod_block(jnp.asarray(iq), cfg, AmFmState.init(cfg))
    spec = np.abs(np.fft.fft(np.asarray(audio)))
    peak = np.argmax(spec[:rate // 2])
    assert abs(peak - 2000) < 20    # 10 kHz tone shifted down by 8 kHz


def test_s16_stereo_output():
    out = np.asarray(audio_to_s16_stereo(jnp.asarray([0.5, -0.25])))
    assert out.shape == (4,)
    assert out[0] == out[1] and out[2] == out[3]
    assert out[0] == int(0.5 * 32767)


def test_fft_tuner_tracks_peak():
    rate = 96000
    samples = rate // 10
    iq = synth_sine(samples * 10, 13100.0, rate, amplitude=0.6)
    blocks = jnp.asarray(np.asarray(iq).reshape(10, samples))
    feed, centres, st = fft_tuner_blocks(blocks, fft_tuner_init())
    # a pure tone makes the 100-bin box average a flat plateau; the
    # first-max rule (mirroring Java's strict >) picks its left edge:
    # binPos = 1310-49, centreBin = binPos+1 (FUNcubeBPSKDemod.java:439-451)
    assert int(centres[-1]) == 1262
    assert np.array_equal(np.asarray(feed.re), np.asarray(feed.im))  # Q-drop


def test_fft_tune_full_chain_decodes(rng):
    payloads = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=96000, carrier_offset=11900.0,
                            preamble_bits=400, seed=2)
    block = 96000
    sig = np.concatenate([sig, np.zeros((-len(sig)) % block, np.complex64)])
    cfg = BpskConfig(rate=96000, dofft=True)
    st = bpsk_init(cfg)
    good = 0
    for b in range(len(sig) // block):
        out, st = bpsk_block(jnp.asarray(sig[b * block:(b + 1) * block]),
                             cfg, st)
        nh = int(out.n_hits)
        if nh:
            res = fec_decode(out.windows[:nh])
            good += sum(
                bool(res.ok[i]) and np.array_equal(
                    np.asarray(res.payload[i]), payloads[0])
                for i in range(nh))
    assert good == 1
    assert int(st.fft_tuner.centre_bin) == pytest.approx(1310, abs=15)


def test_fft_tune_full_chain_decodes_192k(rng):
    """The auto-tune front end at the FCD V2 rate (192 kS/s, m=20,
    19200-sample FFT blocks — the other tuner geometry: same 10 Hz bin
    spacing, twice the block length and decimation)."""
    payloads = rng.integers(0, 256, (1, 256), dtype=np.uint8)
    sig = synth_bpsk_stream(payloads, rate=192000, carrier_offset=11900.0,
                            preamble_bits=400, seed=3)
    block = 192000
    sig = np.concatenate([sig, np.zeros((-len(sig)) % block, np.complex64)])
    cfg = BpskConfig(rate=192000, dofft=True)
    st = bpsk_init(cfg)
    good = 0
    for b in range(len(sig) // block):
        out, st = bpsk_block(jnp.asarray(sig[b * block:(b + 1) * block]),
                             cfg, st)
        nh = int(out.n_hits)
        if nh:
            res = fec_decode(out.windows[:nh])
            good += sum(
                bool(res.ok[i]) and np.array_equal(
                    np.asarray(res.payload[i]), payloads[0])
                for i in range(nh))
    assert good == 1
    assert int(st.fft_tuner.centre_bin) == pytest.approx(1310, abs=15)
