"""Multi-chip sharding on the 8-device CPU mesh: the sharded telemetry
step must match the single-device chain exactly (shard-count invariance),
carry state across segments (frames straddling two step calls decode),
and support per-stream tunings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_init, bpsk_init_batch,
                                 bpsk_block, bpsk_block_batch)
from jsdr_tpu.fec.decoder import fec_decode
from jsdr_tpu.io.sources import synth_bpsk_stream, synth_noise
from jsdr_tpu.parallel import make_mesh, sharded_telemetry_step, sharded_spectrum


@pytest.fixture(scope="module")
def streams(  ):
    rng = np.random.default_rng(11)
    payloads = rng.integers(0, 256, (2, 256), dtype=np.uint8)
    t_len = 96000 * 6
    s0 = synth_bpsk_stream(payloads[:1], rate=96000, preamble_bits=200, seed=1)
    s1 = synth_bpsk_stream(payloads[1:], rate=96000, preamble_bits=300, seed=2)

    def fit(x):
        out = np.zeros(t_len, np.complex64)
        out[:min(len(x), t_len)] = x[:t_len]
        return out

    arr = np.stack([fit(s0), fit(s1),
                    synth_noise(t_len, 0.3, 3),
                    synth_noise(t_len, 0.3, 4)])
    return arr, payloads


def _put(mesh, arr):
    return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, P("dp", "sp")))


def test_sharded_matches_single_device(streams):
    arr, payloads = streams
    mesh = make_mesh(dp=2, sp=4)
    cfg = BpskConfig(rate=96000, tuning=12000.0)
    step = sharded_telemetry_step(mesh, rate=96000)
    states = bpsk_init_batch(cfg, 4)
    out, new_states = jax.block_until_ready(step(_put(mesh, arr), states))

    # single-device reference for stream 0 and 1
    for s in range(2):
        st = bpsk_init(cfg)
        ref, st = bpsk_block(jnp.asarray(arr[s]), cfg, st)
        assert int(out.n_bits[s]) == int(ref.n_bits)
        assert int(out.n_hits[s]) == int(ref.n_hits) == 1
        assert int(out.hit_corr[s, 0]) == int(ref.hit_corr[0]) == 65
        assert np.array_equal(np.asarray(out.windows[s, 0]),
                              np.asarray(ref.windows[0]))
        # carried state matches the single-device chain
        assert int(new_states.timing.peak[s]) == int(st.timing.peak)
        assert float(new_states.tu_phase[s]) == float(st.tu_phase)
        assert np.array_equal(np.asarray(new_states.ring[s]),
                              np.asarray(st.ring))
        assert np.array_equal(np.asarray(new_states.counters[s]),
                              np.asarray(st.counters))
    res = fec_decode(out.windows)
    for s in range(2):
        assert bool(res.ok[s, 0])
        assert np.array_equal(np.asarray(res.payload[s, 0]), payloads[s])


def test_sharded_state_chains_across_segments(streams):
    """A frame that STRADDLES two consecutive sharded step calls decodes:
    the carried BpskState (mixed-domain tail, VCO index, matched-filter
    tail, timing, 5199-bit ring) spans the boundary exactly like the
    reference's rolling window (FUNcubeBPSKDemod.java:503, 553-554)."""
    arr, payloads = streams
    t_len = arr.shape[-1]
    half = t_len // 2                       # 3 s: frame 0 ends ~4.5 s
    mesh = make_mesh(dp=2, sp=4)
    cfg = BpskConfig(rate=96000, tuning=12000.0)
    step = sharded_telemetry_step(mesh, rate=96000)

    states = bpsk_init_batch(cfg, 4)
    out1, states = step(_put(mesh, arr[:, :half]), states)
    out2, states = jax.block_until_ready(step(_put(mesh, arr[:, half:]),
                                              states))
    assert int(out1.n_hits[0]) == 0         # frame not complete yet
    assert int(out2.n_hits[0]) == 1         # found after the boundary
    res = fec_decode(out2.windows[:2])
    assert bool(res.ok[0, 0])
    assert np.array_equal(np.asarray(res.payload[0, 0]), payloads[0])

    # bit-exact vs the chained single-device batch over the same split
    st = bpsk_init_batch(cfg, 4)
    ref1, st = bpsk_block_batch(arr[:, :half], cfg, st)
    ref2, st = bpsk_block_batch(arr[:, half:], cfg, st)
    for o, r in ((out1, ref1), (out2, ref2)):
        assert np.array_equal(np.asarray(o.n_bits), np.asarray(r.n_bits))
        assert np.array_equal(np.asarray(o.n_hits), np.asarray(r.n_hits))
        assert np.array_equal(np.asarray(o.windows), np.asarray(r.windows))
    assert np.array_equal(np.asarray(states.counters), np.asarray(st.counters))


def test_sharded_per_stream_tunings(streams):
    """Independent per-stream tunings in the sharded step: stream 1's
    signal shifted to a 9 kHz offset decodes alongside stream 0 at
    12 kHz in one step call."""
    arr, payloads = streams
    t_len = arr.shape[-1]
    t = np.arange(1, t_len + 1, dtype=np.float64)
    shift = np.exp(-2j * np.pi * 3000.0 * t / 96000.0)   # 12 kHz -> 9 kHz
    arr2 = arr.copy()
    arr2[1] = (arr[1] * shift).astype(np.complex64)
    mesh = make_mesh(dp=2, sp=4)
    cfg = BpskConfig(rate=96000)
    step = sharded_telemetry_step(mesh, rate=96000)
    out, _ = jax.block_until_ready(
        step(_put(mesh, arr2), bpsk_init_batch(cfg, 4),
             tunings=[12000, 9000, 12000, 12000]))
    assert int(out.n_hits[0]) == 1 and int(out.n_hits[1]) == 1
    res = fec_decode(out.windows[:2])
    assert bool(res.ok[0, 0]) and bool(res.ok[1, 0])
    assert np.array_equal(np.asarray(res.payload[1, 0]), payloads[1])


def test_mesh_shape_invariance(streams):
    """dp x sp factorization must not change results."""
    arr, _ = streams
    cfg = BpskConfig(rate=96000, tuning=12000.0)
    results = []
    for dp, sp in [(4, 2), (2, 4), (1, 8)]:
        mesh = make_mesh(dp=dp, sp=sp)
        step = sharded_telemetry_step(mesh, rate=96000)
        out, _ = jax.block_until_ready(
            step(_put(mesh, arr[:4]), bpsk_init_batch(cfg, 4)))
        results.append((np.asarray(out.windows), np.asarray(out.n_hits),
                        np.asarray(out.n_bits)))
    for w, h, b in results[1:]:
        assert np.array_equal(w, results[0][0])
        assert np.array_equal(h, results[0][1])
        assert np.array_equal(b, results[0][2])


def test_sharded_spectrum(streams):
    arr, _ = streams
    mesh = make_mesh(dp=4, sp=2)
    fn = sharded_spectrum(mesh, rate=96000.0)
    blocks = jax.device_put(jnp.asarray(arr.reshape(-1, 9600)[:64]),
                            NamedSharding(mesh, P(("dp", "sp"), None)))
    res = jax.block_until_ready(fn(blocks))
    assert res.psd.shape == (64, 9600)
    # stream 0 carries BPSK spread around 13.2 kHz; the peak wanders
    # within the +-1200 Hz main lobe
    assert abs(int(res.peak_freq[0]) - 13200) < 1300


def test_sharded_dofft_matches_single_device():
    """Per-stream FFT auto-tune in the SHARDED step (dofft — the
    doBufferFFT front end, FUNcubeBPSKDemod.java:406-464): a mixed
    manual/auto batch sharded dp x sp must equal the single-device mixed
    batch bit-exactly across two chained segments (the tuner EMA state
    relays across sp ranks and carries across segments), and the
    auto-tuned stream must decode a carrier it was never told about."""
    rng = np.random.default_rng(21)
    payloads = rng.integers(0, 256, (2, 256), dtype=np.uint8)
    sig_a = synth_bpsk_stream(payloads[:1], rate=96000,
                              carrier_offset=12000.0, preamble_bits=400)
    sig_b = synth_bpsk_stream(payloads[1:], rate=96000,
                              carrier_offset=11900.0, preamble_bits=400,
                              seed=2)
    seg = 307_200                     # 3.2 s; t_loc = 8 whole 0.1s blocks
    t_len = 2 * seg
    arr = np.zeros((2, t_len), np.complex64)
    arr[0, :len(sig_a)] = sig_a[:t_len]
    arr[1, :len(sig_b)] = sig_b[:t_len]

    mesh = make_mesh(dp=2, sp=4)
    cfg = BpskConfig(rate=96000)
    step = sharded_telemetry_step(mesh, rate=96000)
    tunings = np.asarray([12000, 0])
    dofft = [False, True]

    states = bpsk_init_batch(cfg, 2)
    ref_states = bpsk_init_batch(cfg, 2)
    good = [0, 0]
    for b in range(2):
        blk = arr[:, b * seg:(b + 1) * seg]
        out, states = step(_put(mesh, blk), states, tunings, dofft=dofft)
        ref, ref_states = bpsk_block_batch(blk, cfg, ref_states, tunings,
                                           dofft=dofft)
        assert np.array_equal(np.asarray(out.n_bits), np.asarray(ref.n_bits))
        assert np.array_equal(np.asarray(out.bits), np.asarray(ref.bits))
        assert np.array_equal(np.asarray(out.n_hits), np.asarray(ref.n_hits))
        assert np.array_equal(np.asarray(out.windows),
                              np.asarray(ref.windows))
        for s in range(2):
            nh = int(out.n_hits[s])
            if nh:
                res = fec_decode(out.windows[s, :nh])
                good[s] += sum(
                    bool(res.ok[i]) and np.array_equal(
                        np.asarray(res.payload[i]), payloads[s])
                    for i in range(nh))
    assert good == [1, 1]
    # tuner state matches the single-device chain exactly (sp relay +
    # cross-segment carry) — auto stream locked, manual stream untouched
    assert np.array_equal(np.asarray(states.fft_tuner.centre_bin),
                          np.asarray(ref_states.fft_tuner.centre_bin))
    assert int(states.fft_tuner.centre_bin[1]) > 1000
    assert int(states.fft_tuner.centre_bin[0]) == 0


def test_sharded_randomized_property_matches_single_device():
    """Randomized sharded-vs-single-device property check beyond the
    fixed fixtures: random segment lengths, random 0.1 Hz-multiple
    tunings (incl. a fractional and a pass-through 0), frames at random
    offsets in noise — every segment's bits/hits/windows and the final
    carried state must match the single-device chain bit-for-bit."""
    rng = np.random.default_rng(77)
    rate = 96000
    mesh = make_mesh(dp=2, sp=4)
    cfg = BpskConfig(rate=rate)
    step = sharded_telemetry_step(mesh, rate=rate)
    for trial in range(2):
        # segment length: random multiple of sp*80 in [1.0s, 2.2s]
        seg = int(rng.integers(96000, 212000)) // 320 * 320
        n_seg = 3
        tunings = np.asarray(
            [12000, float(rng.integers(80000, 140000)) / 10.0, 0.0, 9000])
        payloads = rng.integers(0, 256, (2, 256), dtype=np.uint8)
        arr = (0.25 * (rng.standard_normal((4, n_seg * seg))
                       + 1j * rng.standard_normal((4, n_seg * seg)))
               ).astype(np.complex64)
        off = int(rng.integers(0, seg // 2))
        s0 = synth_bpsk_stream(payloads[:1], rate=rate, preamble_bits=100,
                               carrier_offset=12000.0, seed=trial)
        s1 = synth_bpsk_stream(payloads[1:], rate=rate, preamble_bits=150,
                               carrier_offset=tunings[1], seed=trial + 9)
        arr[0, off:off + len(s0)] += s0[:n_seg * seg - off]
        arr[3, :len(s1)] += s1[:n_seg * seg]

        st_s = bpsk_init_batch(cfg, 4)
        st_r = bpsk_init_batch(cfg, 4)
        for b in range(n_seg):
            blk = arr[:, b * seg:(b + 1) * seg]
            # re-map stream 3's 9000 tuning to the fractional value to
            # exercise the general (non-128-periodic) sharded mix too
            tun = np.asarray([12000.0, tunings[1], 0.0, 9000.0])
            out, st_s = step(_put(mesh, blk), st_s, tun)
            ref, st_r = bpsk_block_batch(blk, cfg, st_r, tun)
            for f in ("n_bits", "bits", "n_hits", "windows", "hit_corr"):
                assert np.array_equal(np.asarray(getattr(out, f)),
                                      np.asarray(getattr(ref, f))), (trial,
                                                                     b, f)
        # discrete state must be exact; continuous tails may differ by
        # ulps on CPU, where XLA's dot blocking depends on operand
        # shape (the per-shard conv operands are 1/sp the width of the
        # single-device ones) — on TPU the fixed 128-tile MXU blocking
        # makes them bit-identical (fixed-fixture tests assert that)
        for f in ("ring", "counters", "vco_idx", "tu_phase"):
            assert np.array_equal(np.asarray(getattr(st_s, f)),
                                  np.asarray(getattr(st_r, f))), (trial, f)
        # (e_out's sharded suffix-weighted composition is documented as
        # fp-reassociated — observed ~4e-5 relative on this fixture)
        for a, b_ in zip(jax.tree.leaves(st_s), jax.tree.leaves(st_r)):
            np.testing.assert_allclose(np.asarray(a, np.float64),
                                       np.asarray(b_, np.float64),
                                       rtol=2e-4, atol=1e-6)


def test_sharded_shape_validation():
    """Off-contract [S, T] shapes fail with an actionable ValueError at
    the sharded_telemetry_step API boundary — not a trace-time assert
    (VERDICT r4 #6) — and valid_block_samples produces passing shapes."""
    from jsdr_tpu.parallel.sharded import valid_block_samples

    mesh = make_mesh(dp=2, sp=4)
    cfg = BpskConfig(rate=96000)
    step = sharded_telemetry_step(mesh, rate=96000)
    sts = bpsk_init_batch(cfg, 4)
    with pytest.raises(ValueError, match="multiple of dp"):
        step(np.zeros((3, 96000), np.complex64), bpsk_init_batch(cfg, 3))
    with pytest.raises(ValueError, match="split over sp"):
        step(np.zeros((4, 96002), np.complex64), sts)
    with pytest.raises(ValueError, match="whole decimated bit groups"):
        step(np.zeros((4, 96032), np.complex64), sts)
    with pytest.raises(ValueError, match=">= 2 bit groups"):
        step(np.zeros((4, 4 * 80), np.complex64), sts)
    with pytest.raises(ValueError, match="whole 0.1 s blocks"):
        step(np.zeros((4, 4 * 2400), np.complex64), sts,
             dofft=[True] * 4)
    # every error names a valid example shape
    try:
        step(np.zeros((4, 96032), np.complex64), sts)
    except ValueError as e:
        assert "e.g. T=96000" in str(e)
    assert valid_block_samples(96000, 4) == 96000
    assert valid_block_samples(96000, 4, dofft=True) == 4 * 19200
    assert valid_block_samples(192000, 4) == 192000
    # and the suggested dofft shape actually runs
    out, _ = jax.block_until_ready(
        step(np.zeros((4, valid_block_samples(96000, 4, dofft=True)),
                      np.complex64), sts, dofft=[True] * 4))
    assert int(np.asarray(out.n_hits).sum()) == 0


def test_place_segments_matches_concatenation():
    """The sort-free global-bit-stream assembly (_place_segments) must
    equal concatenating each rank's valid prefix, for random counts
    including empty and full segments."""
    from jsdr_tpu.parallel.sharded import _place_segments

    rng = np.random.default_rng(33)
    n_sp, s_loc, mb_loc = 4, 5, 258
    max_bits = n_sp * (mb_loc - 2) + 2
    n_g = rng.integers(0, mb_loc - 1, (n_sp, s_loc)).astype(np.int32)
    n_g[0, 0] = 0                      # empty first segment
    n_g[:, 1] = mb_loc - 2             # all segments full
    n_g[:, 2] = 0                      # no bits at all
    bits_g = np.zeros((n_sp, s_loc, mb_loc), np.int8)
    for j in range(n_sp):
        for s in range(s_loc):
            bits_g[j, s, :n_g[j, s]] = rng.choice([-1, 1], n_g[j, s])
    got = np.asarray(jax.jit(lambda b, n: _place_segments(b, n, max_bits))(
        jnp.asarray(bits_g), jnp.asarray(n_g)))
    for s in range(s_loc):
        ref = np.concatenate([bits_g[j, s, :n_g[j, s]]
                              for j in range(n_sp)])
        ref = np.pad(ref, (0, max_bits - len(ref)))
        assert np.array_equal(got[s], ref), s


def test_sharded_compat_scan_matches_single_device(streams):
    """compat_scan=True (the per-sample fp-parity mode) keeps the
    replicated decode tail under sharding and still matches the
    single-device compat chain exactly."""
    arr, payloads = streams
    t_len = 96000 * 2
    arr2 = arr[:, :t_len]
    mesh = make_mesh(dp=2, sp=4)
    cfg = BpskConfig(rate=96000, tuning=12000.0, compat_scan=True)
    step = sharded_telemetry_step(mesh, rate=96000, compat_scan=True)
    out, _ = jax.block_until_ready(
        step(_put(mesh, arr2), bpsk_init_batch(cfg, 4)))
    ref, _ = bpsk_block_batch(arr2, cfg, bpsk_init_batch(cfg, 4))
    assert np.array_equal(np.asarray(out.n_bits), np.asarray(ref.n_bits))
    assert np.array_equal(np.asarray(out.bits), np.asarray(ref.bits))


def test_sharded_checkpoint_resume_mid_stream(streams, tmp_path):
    """Checkpoint/resume at scale: a dp x sp session checkpoints its
    sharded BpskState MID-STREAM (while a frame is still in flight),
    reloads, and the resumed run decodes the straddling frame with
    outputs bit-identical to the uninterrupted run."""
    from jsdr_tpu.runtime import load_state, save_state

    arr, payloads = streams
    t_len = arr.shape[-1]
    half = t_len // 2                  # frame 0 completes after ~4.5 s
    mesh = make_mesh(dp=2, sp=4)
    cfg = BpskConfig(rate=96000, tuning=12000.0)
    step = sharded_telemetry_step(mesh, rate=96000)

    states = bpsk_init_batch(cfg, 4)
    out1, states = step(_put(mesh, arr[:, :half]), states)
    assert int(out1.n_hits[0]) == 0    # frame still in flight
    save_state(tmp_path / "ckpt.npz", jax.device_get(states))

    # fresh process analog: reload into host numpy, resume
    restored = load_state(tmp_path / "ckpt.npz", bpsk_init_batch(cfg, 4))
    out2r, states_r = jax.block_until_ready(
        step(_put(mesh, arr[:, half:]), restored))
    out2, states_c = jax.block_until_ready(
        step(_put(mesh, arr[:, half:]), states))
    for field in ("windows", "n_hits", "n_bits", "bits", "hit_corr"):
        assert np.array_equal(np.asarray(getattr(out2r, field)),
                              np.asarray(getattr(out2, field))), field
    assert int(out2r.n_hits[0]) == 1   # the straddling frame decoded
    res = fec_decode(out2r.windows[:1])
    assert bool(res.ok[0, 0])
    assert np.array_equal(np.asarray(res.payload[0, 0]), payloads[0])
    for a, b in zip(jax.tree.leaves(states_r), jax.tree.leaves(states_c)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Tensor-parallel FFT (intra-op sharding of ONE large transform)
# ---------------------------------------------------------------------------


def _shard_rows_time(mesh, x):
    """Place [B, N] complex on the mesh: rows over dp, time over sp."""
    from jsdr_tpu.ops.cplx import CF
    sh = NamedSharding(mesh, P("dp", "sp"))
    re = jax.device_put(np.ascontiguousarray(x.real, np.float32), sh)
    im = jax.device_put(np.ascontiguousarray(x.imag, np.float32), sh)
    return CF(re, im)


def test_tp_fft_matches_numpy():
    from jsdr_tpu.parallel.tp import tp_fft
    rng = np.random.default_rng(5)
    n = 4096
    x = (rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))
         ).astype(np.complex64)
    mesh = make_mesh(dp=2, sp=4)
    y = tp_fft(mesh, n)(_shard_rows_time(mesh, x))
    got = np.asarray(y.re) + 1j * np.asarray(y.im)
    ref = np.fft.fft(x)
    np.testing.assert_allclose(got, ref, atol=n * 2e-6)


def test_tp_fft_mesh_shape_invariance():
    """The same transform sharded 2 ways (and unsharded) agrees —
    the TP decomposition is an implementation detail, not semantics."""
    from jsdr_tpu.ops.mxu_fft import fft_cf
    from jsdr_tpu.ops.cplx import from_complex, to_complex
    from jsdr_tpu.parallel.tp import tp_fft
    rng = np.random.default_rng(6)
    n = 2048
    x = (rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n))
         ).astype(np.complex64)
    outs = []
    for dp, sp in ((1, 8), (4, 2)):
        mesh = make_mesh(dp=dp, sp=sp)
        y = tp_fft(mesh, n)(_shard_rows_time(mesh, x))
        outs.append(np.asarray(y.re) + 1j * np.asarray(y.im))
    single = to_complex(jax.jit(fft_cf)(from_complex(x)))
    np.testing.assert_allclose(outs[0], outs[1], atol=n * 1e-6)
    np.testing.assert_allclose(outs[0], single, atol=n * 2e-6)


def test_tp_spectrum_matches_spectrum_block():
    """One giant windowed PSD sharded over the mesh == the single-device
    spectrum (fft.java formula), peaks included."""
    from jsdr_tpu.ops.spectrum import spectrum_block
    from jsdr_tpu.io.sources import synth_sine
    from jsdr_tpu.parallel.tp import tp_spectrum
    n = 96000 * 2                              # a 2 s single transform
    rate = 96000.0
    # tone + noise: every bin carries real power, so the dB comparison is
    # meaningful everywhere (a pure tone's off-peak bins are numerical
    # noise at -200 dBFS where different matmul orders legitimately differ)
    tones = np.stack([synth_sine(n, f, rate, amplitude=0.5)
                      + synth_noise(n, 0.01, seed=int(abs(f)))
                      for f in (4410.0, -12345.0)])
    mesh = make_mesh(dp=2, sp=4)
    db, freq, peak_db = tp_spectrum(mesh, n, rate)(
        _shard_rows_time(mesh, tones))
    ref = spectrum_block(jnp.asarray(tones), rate=rate, window=True)
    np.testing.assert_allclose(np.asarray(db), np.asarray(ref.psd),
                               atol=0.15)   # deep-null bins are
    # cancellation-limited; 0.1 dB there is numerical, not semantic
    assert list(np.asarray(freq)) == list(np.asarray(ref.peak_freq))
    assert np.asarray(freq)[0] == 4410 and np.asarray(freq)[1] == -12345
    np.testing.assert_allclose(np.asarray(peak_db),
                               np.asarray(ref.peak_db), atol=1e-3)


# ---------------------------------------------------------------------------
# Pipeline parallelism (stages on separate device groups)
# ---------------------------------------------------------------------------


def _seq_reference(arr, cfg, block):
    st = bpsk_init_batch(cfg, arr.shape[0])
    seq = []
    for b in range(arr.shape[1] // block):
        o, st = bpsk_block_batch(arr[:, b * block:(b + 1) * block], cfg, st)
        seq.append(o)
    return seq, st


@pytest.mark.parametrize("n_stages,dp", [(2, 1), (2, 2), (3, 1), (3, 2)])
def test_pipelined_telemetry_matches_sequential(streams, n_stages, dp):
    """The n-stage pipeline (front end / decode tail / optional FEC,
    GPipe microbatching over blocks) composed with dp over streams must
    reproduce the sequential chain exactly, shifted by the (n_stages-1)
    block pipeline latency, on a pp x dp device mesh; the FEC stage must
    decode the known payloads in-pipeline."""
    from jsdr_tpu.parallel.pipeline import (make_pp_mesh, pipeline_flush,
                                            pipeline_init,
                                            pipelined_telemetry)
    arr, payloads = streams
    S, T = arr.shape
    block = 96000
    n_mb = T // block
    blocks = arr.reshape(S, n_mb, block).swapaxes(0, 1)   # [n_mb, S, block]
    lat = n_stages - 1

    mesh = make_pp_mesh(n_stages, dp)
    cfg = BpskConfig(rate=96000, tuning=12000.0)
    run = pipelined_telemetry(mesh, rate=96000)
    carry = pipeline_init(cfg, S, block, n_stages)
    out, carry = run(blocks, carry)
    last, carry = pipeline_flush(run, carry, S, block)

    seq, st = _seq_reference(arr, cfg, block)

    assert not np.any(np.asarray(out.valid)[:lat])     # prime ticks empty
    assert np.all(np.asarray(out.telem.n_hits)[:lat] == 0)
    pipe = [jax.tree.map(lambda x: np.asarray(x[t]), out)
            for t in range(lat, n_mb)] \
        + [jax.tree.map(lambda x: np.asarray(x[t]), last)
           for t in range(lat)]
    assert all(bool(p.valid) for p in pipe)
    for got, ref in zip(pipe, seq):
        assert np.array_equal(got.telem.n_bits, np.asarray(ref.n_bits))
        assert np.array_equal(got.telem.n_hits, np.asarray(ref.n_hits))
        assert np.array_equal(got.telem.windows, np.asarray(ref.windows))
        assert np.array_equal(got.telem.hit_corr, np.asarray(ref.hit_corr))

    # the tail rank's carried decode state has consumed every block
    final_st = jax.tree.map(lambda x: np.asarray(x[1]), carry[1])
    assert np.array_equal(final_st.counters, np.asarray(st.counters))
    assert np.array_equal(final_st.ring, np.asarray(st.ring))

    # and the extracted frames decode to the known payloads
    total_hits = sum(int(h) for o in pipe for h in o.telem.n_hits)
    assert total_hits == 2
    for s_i in range(2):
        hits = [(o, int(o.telem.n_hits[s_i])) for o in pipe
                if o.telem.n_hits[s_i]]
        o, nh = hits[0]
        if n_stages == 3:
            # FEC ran IN-pipeline on stage 2
            assert bool(o.fec_ok[s_i, 0])
            assert np.array_equal(o.fec_payload[s_i, 0], payloads[s_i])
        res = fec_decode(jnp.asarray(o.telem.windows[s_i, :nh]))
        assert bool(res.ok[0])
        assert np.array_equal(np.asarray(res.payload[0]), payloads[s_i])


def test_pipelined_dofft_matches_sequential():
    """Per-stream FFT auto-tune in the PIPELINE's stage 0: a mixed
    manual/auto batch must reproduce the sequential mixed batch exactly
    (shifted by the pipeline latency) and decode the auto-tuned
    carrier; the tuner EMA state advances on stage 0 only and bubbles
    must not advance it."""
    from jsdr_tpu.parallel.pipeline import (make_pp_mesh, pipeline_flush,
                                            pipeline_init,
                                            pipelined_telemetry)
    rng = np.random.default_rng(22)
    payloads = rng.integers(0, 256, (2, 256), dtype=np.uint8)
    sig_a = synth_bpsk_stream(payloads[:1], rate=96000,
                              carrier_offset=12000.0, preamble_bits=400)
    sig_b = synth_bpsk_stream(payloads[1:], rate=96000,
                              carrier_offset=11900.0, preamble_bits=400,
                              seed=2)
    block = 96000
    n_mb = 6
    t_len = n_mb * block
    arr = np.zeros((2, t_len), np.complex64)
    arr[0, :len(sig_a)] = sig_a[:t_len]
    arr[1, :len(sig_b)] = sig_b[:t_len]
    blocks = arr.reshape(2, n_mb, block).swapaxes(0, 1)
    tunings = np.asarray([12000, 0])
    dofft = [False, True]

    mesh = make_pp_mesh(2, 1)
    cfg = BpskConfig(rate=96000)
    run = pipelined_telemetry(mesh, rate=96000)
    carry = pipeline_init(cfg, 2, block, 2)
    out, carry = run(blocks, carry, tunings, dofft=dofft)
    last, carry = pipeline_flush(run, carry, 2, block, tunings,
                                 dofft=dofft)

    st = bpsk_init_batch(cfg, 2)
    seq = []
    for b in range(n_mb):
        o, st = bpsk_block_batch(arr[:, b * block:(b + 1) * block], cfg,
                                 st, tunings, dofft=dofft)
        seq.append(o)
    pipe = [jax.tree.map(lambda x: np.asarray(x[t]), out)
            for t in range(1, n_mb)] \
        + [jax.tree.map(lambda x: np.asarray(x[0]), last)]
    good = [0, 0]
    for got, ref in zip(pipe, seq):
        assert np.array_equal(got.telem.n_bits, np.asarray(ref.n_bits))
        assert np.array_equal(got.telem.windows, np.asarray(ref.windows))
        for s_i in range(2):
            nh = int(got.telem.n_hits[s_i])
            if nh:
                res = fec_decode(jnp.asarray(got.telem.windows[s_i, :nh]))
                good[s_i] += sum(
                    bool(res.ok[i]) and np.array_equal(
                        np.asarray(res.payload[i]), payloads[s_i])
                    for i in range(nh))
    assert good == [1, 1]
    # stage 0 carries the tuner state: auto stream locked, manual
    # untouched, and it matches the sequential chain
    front_st = jax.tree.map(lambda x: np.asarray(x[0]), carry[1])
    assert np.array_equal(front_st.fft_tuner.centre_bin,
                          np.asarray(st.fft_tuner.centre_bin))
    assert int(front_st.fft_tuner.centre_bin[1]) > 1000


def test_pipeline_flush_is_a_bubble_mid_stream(streams):
    """Draining the pipeline mid-stream (bubble ticks) must not advance
    any stage state: resuming with the remaining blocks yields outputs
    bit-identical to an uninterrupted run."""
    from jsdr_tpu.parallel.pipeline import (make_pp_mesh, pipeline_flush,
                                            pipeline_init,
                                            pipelined_telemetry)
    arr, payloads = streams
    S, T = arr.shape
    block = 96000
    n_mb = T // block
    blocks = arr.reshape(S, n_mb, block).swapaxes(0, 1)

    mesh = make_pp_mesh(2, 1)
    cfg = BpskConfig(rate=96000, tuning=12000.0)
    run = pipelined_telemetry(mesh, rate=96000)

    carry = pipeline_init(cfg, S, block, 2)
    out_a, carry = run(blocks[:3], carry)
    drained, carry = pipeline_flush(run, carry, S, block)  # mid-stream!
    out_b, carry = run(blocks[3:], carry)
    last, carry = pipeline_flush(run, carry, S, block)

    seq, _ = _seq_reference(arr, cfg, block)
    got = ([jax.tree.map(lambda x: np.asarray(x[t]), out_a)
            for t in range(1, 3)]
           + [jax.tree.map(lambda x: np.asarray(x[0]), drained)]
           + [jax.tree.map(lambda x: np.asarray(x[t]), out_b)
              for t in range(1, n_mb - 3)]
           + [jax.tree.map(lambda x: np.asarray(x[0]), last)])
    assert len(got) == n_mb
    for g, ref in zip(got, seq):
        assert bool(g.valid)
        assert np.array_equal(g.telem.n_bits, np.asarray(ref.n_bits))
        assert np.array_equal(g.telem.windows, np.asarray(ref.windows))


@pytest.fixture(scope="module")
def streams_192k():
    """FCD V2 rate (192 kS/s, decim m=20 — jsdr.java:271-277): the other
    halo geometry (ntaps-1=26 < m=20*? — the banded window spans change
    with m, so the m=20 math must be exercised under shard_map too)."""
    rng = np.random.default_rng(12)
    payloads = rng.integers(0, 256, (2, 256), dtype=np.uint8)
    t_len = 192000 * 6
    s0 = synth_bpsk_stream(payloads[:1], rate=192000, preamble_bits=200,
                           seed=5)
    s1 = synth_bpsk_stream(payloads[1:], rate=192000, preamble_bits=300,
                           seed=6)

    def fit(x):
        out = np.zeros(t_len, np.complex64)
        out[:min(len(x), t_len)] = x[:t_len]
        return out

    return np.stack([fit(s0), fit(s1)]), payloads


def test_sharded_192k_matches_single_device(streams_192k):
    """dp x sp sharded step at 192 kS/s (m=20) must equal the
    single-device chain bit-exactly and decode the frames."""
    arr, payloads = streams_192k
    mesh = make_mesh(dp=2, sp=4)
    cfg = BpskConfig(rate=192000, tuning=12000.0)
    step = sharded_telemetry_step(mesh, rate=192000)
    states = bpsk_init_batch(cfg, 2)
    out, new_states = jax.block_until_ready(step(_put(mesh, arr), states))

    for s in range(2):
        st = bpsk_init(cfg)
        ref, st = bpsk_block(jnp.asarray(arr[s]), cfg, st)
        assert int(out.n_bits[s]) == int(ref.n_bits)
        assert int(out.n_hits[s]) == int(ref.n_hits) == 1
        assert np.array_equal(np.asarray(out.windows[s, 0]),
                              np.asarray(ref.windows[0]))
        assert np.array_equal(np.asarray(new_states.ring[s]),
                              np.asarray(st.ring))
    res = fec_decode(out.windows)
    for s in range(2):
        assert bool(res.ok[s, 0])
        assert np.array_equal(np.asarray(res.payload[s, 0]), payloads[s])


def test_pipelined_192k_matches_sequential(streams_192k):
    """3-stage pipeline at 192 kS/s (m=20 front-end geometry) with
    in-pipeline FEC."""
    from jsdr_tpu.parallel.pipeline import (make_pp_mesh, pipeline_flush,
                                            pipeline_init,
                                            pipelined_telemetry)
    arr, payloads = streams_192k
    S, T = arr.shape
    block = 192000
    n_mb = T // block
    blocks = arr.reshape(S, n_mb, block).swapaxes(0, 1)

    mesh = make_pp_mesh(3, 1)
    cfg = BpskConfig(rate=192000, tuning=12000.0)
    run = pipelined_telemetry(mesh, rate=192000)
    carry = pipeline_init(cfg, S, block, 3)
    out, carry = run(blocks, carry)
    last, carry = pipeline_flush(run, carry, S, block)

    seq, st = _seq_reference(arr, cfg, block)
    pipe = [jax.tree.map(lambda x: np.asarray(x[t]), out)
            for t in range(2, n_mb)] \
        + [jax.tree.map(lambda x: np.asarray(x[t]), last) for t in range(2)]
    for got, ref in zip(pipe, seq):
        assert np.array_equal(got.telem.n_bits, np.asarray(ref.n_bits))
        assert np.array_equal(got.telem.windows, np.asarray(ref.windows))
    oks = sum(int(p.fec_ok.sum()) for p in pipe)
    assert oks == 2
    for s_i in range(2):
        for p in pipe:
            if p.fec_ok[s_i].any():
                assert np.array_equal(p.fec_payload[s_i, 0], payloads[s_i])
