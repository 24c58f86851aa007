"""Benchmark: IQ Msamples/s/chip through the FFT+FIR+BPSK telemetry chain.

Measures the flagship pipeline on one chip: batched spectrum (windowed
matmul FFT + PSD -> display-decimated waterfall lines + exact peak
search, fft.java + waterfall.java analog) plus the full FUNcube
telemetry front end (tuner mix -> 27-tap decimating FIR -> VCO + 65-tap
matched filter -> parallel timing recovery -> stride-80 sync correlation
-> soft-window extraction) over a batch of independent streams. The
spectrum and the front end run as ONE merged Pallas kernel reading the
full-rate input from HBM once (bpsk_block_batch_spectrum); the spectrum
emits what the display consumes — natural-order max-decimated dB lines
(identical to decimating the full PSD; ops.pallas_kernels.
spectrum_waterfall docstring) and the exact full-resolution peak — the
full-PSD mode stays available for the fft-psd parity path.

Methodology: the input batch is uploaded once and stays device-resident;
the timed step consumes it end-to-end with every output forced (sums of
all result tensors), i.e. this is chip throughput — the metric's
"Msamples/s/chip". Two timings are reported: per-dispatch (one tunnel
round-trip per step — this environment's tunneled backend adds a
measured ~1.0 ms fixed dispatch cost per step, PERF.md) and
steady-state (10 steps chained in one jit via lax.fori_loop). The
chained loop must defeat XLA's while-loop invariant code motion: with a
CONSTANT device-resident input, any op that depends only on the input
(the whole display-spectrum kernel — it carries no state) is hoisted
out of the loop and runs ONCE for k steps, inflating throughput ~1.65x
(measured, bench/exp_r7_hoist.py; round 3's 15.1 GS/s headline was
this artifact). The input buffer is therefore loop-CARRIED and one
sample is overwritten with a state-derived value each iteration (an
in-place dynamic-update-slice — no extra HBM pass), so every op
executes every iteration, exactly as with streamed fresh input. The
loop-carried demod state keeps the telemetry chain live, and every
output tensor is reduced into the carry (no DCE). The steady-state
number is the headline: it is the device's sustained throughput, which
a production host co-located with the TPU sees. The one-time
host->device transfer happens over the development tunnel (~tens of
MB/s) and is reported separately on stderr; production ingest DMAs
into HBM directly.

Baseline: the reference is a real-time desktop app designed for at most
192 kS/s (FCD V2, jsdr.java:271-277) on one CPU — no published numbers
exist (BASELINE.md), so vs_baseline = Msps / 0.192.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def force_value(x) -> float:
    """Timing barrier that provably includes device execution: a scalar
    d2h read. Round 5 caught this environment's tunneled backend
    returning from ``jax.block_until_ready`` BEFORE execution completed
    (a 137-GFLOP matmul "finished" in 0.1 ms through that barrier while
    a value read measured ~27 ms) — silently inflating any
    block_until_ready-based timing. A value transfer cannot complete
    before the producing computation; it costs one tunnel round-trip,
    amortized over each timing loop's iterations."""
    return float(np.asarray(x).reshape(-1)[0])


def bench_fec(log):
    """Timed batched AO-40 fec_decode (deinterleave -> Viterbi -> RS x2 ->
    re-encode + error count), the decode tail that runs per detected
    frame (FECDecoder.java:703-852 work unit). Chain budget: one frame
    per stream per ~4.33 s (5200 symbols at 1200 bps), i.e. 0.23
    frames/s/stream — the frames/s here is how many concurrent streams'
    decode tails one chip absorbs."""
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.fec.decoder import fec_decode
    from jsdr_tpu.fec.ref_numpy import encode_fec40, symbols_to_soft

    rng = np.random.default_rng(1)
    base_payloads = rng.integers(0, 256, (64, 256), dtype=np.uint8)
    base = np.stack([symbols_to_soft(encode_fec40(p))
                     for p in base_payloads])
    for batch in (64, 256, 1024):
        raws = np.tile(base, (batch // 64, 1))
        for r in raws:   # ~2.3% channel symbol errors: real ACS/BM work
            r[rng.choice(5200, 120, replace=False)] ^= 0x80
        x = jax.device_put(jnp.asarray(raws, dtype=jnp.uint8))
        t0 = time.time()
        res = jax.block_until_ready(fec_decode(x))
        ok = int(res.ok.sum())
        t_compile = time.time() - t0
        iters = 10

        # CHAIN the iterations: each step's input perturbation depends on
        # the previous step's result, so the final d2h barrier provably
        # forces every iteration (a lazy/eliding backend cannot skip any
        # — see force_value and the bench_demod elision note), and no
        # two dispatches are identical (the carry strictly grows).
        @jax.jit
        def step(x, c):
            x = x.at[0, 0].set(
                ((x[0, 0].astype(jnp.int32) + c) % 256).astype(jnp.uint8))
            r = fec_decode(x)
            return r.ok.sum(), r.rc.sum() + c

        jax.block_until_ready(step(x, jnp.int32(0)))
        c = jnp.int32(1)
        t0 = time.time()
        for _ in range(iters):
            res = step(x, c)
            c = res[1]
        force_value(c)                  # d2h barrier forces the chain
        dt = (time.time() - t0) / iters
        log(f"fec_decode batch={batch}: {dt*1000:.1f} ms -> "
            f"{batch/dt:.0f} frames/s ({ok}/{batch} ok, 120 chan errs each; "
            f"compile+first {t_compile:.1f}s) -> headroom ~"
            f"{batch/dt/0.231:.0f} realtime streams/chip")


def bench_ingest(log):
    """Ingest-path comparison: raw int16 upload + on-device planar convert
    (io/convert_device.s16_to_cf — EXACTLY what the streaming Session's
    raw-mode h2d stage runs, runtime/executor.py Session.run) vs
    host-side convert + planar float32 upload. Device convert halves the
    transferred bytes and moves the scale/DC loop onto the VPU."""
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.io.convert import s16le_to_complex
    from jsdr_tpu.io.convert_device import s16_to_cf
    from jsdr_tpu.ops.cplx import from_complex

    rng = np.random.default_rng(2)
    n = 4_800_000                       # 50 s at 96k: 19.2 MB of S16LE
    s16 = rng.integers(-32768, 32768, 2 * n, dtype=np.int16)
    ic, qc = jnp.int32(3), jnp.int32(-5)

    dev = jax.block_until_ready(               # warm both paths
        s16_to_cf(jax.device_put(s16), ic, qc))
    host_ref = s16le_to_complex(s16, 2, 3, -5)
    import numpy as _np
    assert _np.array_equal(_np.asarray(dev.re), host_ref.real), \
        "device convert mismatch on TPU"
    log(f"ingest (Session raw-mode h2d path): device convert verified on "
        f"{jax.devices()[0].platform} backend")

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = s16_to_cf(jax.device_put(s16), ic, qc)
        force_value(out.re[-1])         # per-iter d2h barrier: the
        # iterations are independent uploads, so each must be forced
    dt_dev = (time.time() - t0) / iters
    t0 = time.time()
    for _ in range(iters):
        host = s16le_to_complex(s16, 2, 3, -5)
        out = jax.device_put(from_complex(host))
        force_value(out.re[-1])
    dt_host = (time.time() - t0) / iters
    mb = s16.nbytes / 1e6
    log(f"ingest {n/1e6:.1f}M samples ({mb:.0f} MB raw): "
        f"int16 upload + device convert {dt_dev*1000:.0f} ms "
        f"({n/dt_dev/1e6:.1f} MS/s) vs host convert + float upload "
        f"{dt_host*1000:.0f} ms ({n/dt_host/1e6:.1f} MS/s) "
        f"-> device path {dt_host/dt_dev:.2f}x")


def bench_192k(log):
    """Full chain at the FCD V2 rate (192 kS/s, decim=20 —
    jsdr.java:271-277): the second hardware configuration the reference
    supports. Same methodology as the headline number."""
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.demod.bpsk import BpskConfig, bpsk_block_batch_spectrum, \
        bpsk_init_batch
    from jsdr_tpu.io.sources import synth_bpsk_stream
    from jsdr_tpu.ops.cplx import CF, from_complex

    # 256 streams x 2.4 s: merged-kernel-eligible (t_len % 38400 == 0 at
    # m=20 too) near the measured shape optimum; >=64 streams are needed
    # to fill the VPU sublanes (32x5s measured 1117 MS/s vs 10099 at
    # 64x10s). The hoist-proof chained form (see main) is the headline.
    rate, n_streams, t_len = 192_000, 256, 460_800      # 2.4 s per stream
    cfg = BpskConfig(rate=rate, tuning=12_000.0)
    rng = np.random.default_rng(3)
    base = synth_bpsk_stream(
        rng.integers(0, 256, (1, 256), dtype=np.uint8),
        rate=rate, preamble_bits=400, noise_rms=0.3)
    reps = int(np.ceil(n_streams * t_len / len(base)))
    sig = np.tile(base, reps)[: n_streams * t_len].reshape(n_streams, t_len)
    iq = jax.block_until_ready(jax.device_put(from_complex(sig)))
    states = jax.block_until_ready(
        jax.device_put(bpsk_init_batch(cfg, n_streams)))

    # decode-liveness proof FIRST: a 4.33 s frame is 833k samples at
    # 192 k, so the timed loops' per-stream 2.4 s periodic window can
    # never contain one — hits=0 in the timed loops is EXPECTED there
    # (round 3's nonzero "hits" at this rate were seam correlations of
    # the wrapped window, not decodes). Chain the merged step over a
    # CONTINUOUS 3x2.4 s slice of the signal and require a sync hit.
    live_st = jax.device_put(bpsk_init_batch(cfg, 1))
    cont = np.tile(base, int(np.ceil(3 * t_len / len(base))))[:3 * t_len]
    hits_live = 0
    for seg in range(3):
        _, lo, live_st = bpsk_block_batch_spectrum(
            from_complex(cont[None, seg * t_len:(seg + 1) * t_len]),
            cfg, live_st)
        hits_live += int(jax.block_until_ready(lo.n_hits)[0])
    assert hits_live >= 1, "192k merged chain failed to decode"
    log(f"192 kS/s decode liveness: {hits_live} sync hit(s) over a "
        f"continuous 7.2 s chained merged-step stream")

    @jax.jit
    def step(iq, states):
        spec, out, new_states = bpsk_block_batch_spectrum(iq, cfg, states)
        forced = (spec.wf.sum() + spec.peak_db.sum()
                  + out.windows.astype(jnp.int32).sum()
                  + out.hit_corr.sum() + out.n_hits.sum() + out.n_bits.sum())
        return forced, out.n_hits.sum(), new_states

    res = jax.block_until_ready(step(iq, states))
    iters, st = 10, states
    t0 = time.time()
    for _ in range(iters):
        out = step(iq, st)
        st = out[2]
    force_value(out[0])                 # d2h barrier (see force_value)
    dt = (time.time() - t0) / iters
    msps = n_streams * t_len / dt / 1e6
    log(f"192 kS/s (FCD V2, decim=20) chain: {msps:.0f} MS/s/chip "
        f"({dt*1000:.1f} ms/step, hits={int(res[1])}) "
        f"-> {msps/0.192:.0f}x the reference V2 real-time rate")

    k_chain = 10

    @jax.jit
    def chained(iq_re, iq_im, states):
        # hoist-proof carried-buffer form (see main's chained docstring)
        def body(_, carry):
            acc, re_buf, st = carry
            spec, out, st = bpsk_block_batch_spectrum(
                CF(re_buf, iq_im), cfg, st)
            forced = (spec.wf.sum() + spec.peak_db.sum()
                      + spec.peak_freq.sum()
                      + out.windows.astype(jnp.int32).sum()
                      + out.hit_corr.sum() + out.n_hits.sum()
                      + out.n_bits.sum()).astype(jnp.float32)
            re_buf = jax.lax.dynamic_update_slice(
                re_buf, (forced * 1e-12)[None, None], (0, 0))
            return acc + forced, re_buf, st
        return jax.lax.fori_loop(
            0, k_chain, body, (jnp.float32(0.0), iq_re, states))

    jax.block_until_ready(chained(iq.re, iq.im, states))
    m, stc = 2, states
    t0 = time.time()
    for _ in range(m):
        acc, _, stc = chained(iq.re, iq.im, stc)
    force_value(acc)                    # d2h barrier (see force_value)
    dt_c = (time.time() - t0) / (m * k_chain)
    msps_c = n_streams * t_len / dt_c / 1e6
    hits_c = int(np.asarray(stc.counters)[:, 3].sum())
    log(f"192 kS/s steady-state ({m}x{k_chain} chained steps, "
        f"hoist-proof): {dt_c*1000:.2f} ms/step -> {msps_c:.0f} MS/s/chip "
        f"sustained (cumulative hits={hits_c}; 0 expected — the periodic "
        f"2.4 s window cannot contain a 4.33 s frame, see the liveness "
        f"line above)")


def bench_dofft(log):
    """FFT auto-tune (dofft) front end ON THE CHIP (VERDICT r4 #5):
    decode liveness for a carrier the chain was never told about
    (doBufferFFT at speed, FUNcubeBPSKDemod.java:406-464), then the
    step cost of the staged two-read fallback the dofft path forces
    (the merged kernel declares dofft ineligible, demod/bpsk.py) vs the
    manual merged path at the same bench shape."""
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_block_batch,
                                     bpsk_block_batch_spectrum,
                                     bpsk_init_batch)
    from jsdr_tpu.io.sources import synth_bpsk_stream
    from jsdr_tpu.ops.cplx import from_complex

    rate, n_streams, t_len = 96_000, 128, 460_800   # the headline shape
    rng = np.random.default_rng(5)
    base = synth_bpsk_stream(
        rng.integers(0, 256, (1, 256), dtype=np.uint8), rate=rate,
        carrier_offset=11_900.0, preamble_bits=400, noise_rms=0.3)

    # decode liveness: two chained continuous segments, ONE auto-tuned
    # stream, no tuning given — the tuner must find the 11.9 kHz+1.2 kHz
    # carrier itself and the chain must produce a sync hit
    cfg_d = BpskConfig(rate=rate, dofft=True)
    cont = np.tile(base, int(np.ceil(2 * t_len / len(base))))[: 2 * t_len]
    live_st = jax.device_put(bpsk_init_batch(cfg_d, 1))
    hits_live = 0
    for seg in range(2):
        lo, live_st = bpsk_block_batch(
            from_complex(cont[None, seg * t_len:(seg + 1) * t_len]),
            cfg_d, live_st)
        hits_live += int(jax.block_until_ready(lo.n_hits)[0])
    centre = int(np.asarray(live_st.fft_tuner.centre_bin)[0])
    assert hits_live >= 1, f"dofft chain failed to decode (centre={centre})"
    assert abs(centre - 1310) < 30, centre
    log(f"dofft decode liveness: {hits_live} sync hit(s), tuner locked "
        f"centre_bin={centre} (carrier bin 1310) over a continuous "
        f"9.6 s auto-tuned stream")

    reps = int(np.ceil(n_streams * t_len / len(base)))
    sig = np.tile(base, reps)[: n_streams * t_len].reshape(n_streams, t_len)
    iq = jax.block_until_ready(jax.device_put(from_complex(sig)))

    def timed(cfg):
        @jax.jit
        def step(iq, states):
            spec, out, st = bpsk_block_batch_spectrum(iq, cfg, states)
            forced = (spec.wf.sum() + spec.peak_db.sum()
                      + spec.peak_freq.sum()
                      + out.windows.astype(jnp.int32).sum()
                      + out.hit_corr.sum() + out.n_hits.sum()
                      + out.n_bits.sum())
            return forced, st

        st = jax.device_put(bpsk_init_batch(cfg, n_streams))
        jax.block_until_ready(step(iq, st))
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            out = step(iq, st)
            st = out[1]
        force_value(out[0])             # d2h barrier (see force_value)
        return (time.time() - t0) / iters

    dt_d = timed(cfg_d)
    dt_m = timed(BpskConfig(rate=rate, tuning=12_000.0))
    msps_d = n_streams * t_len / dt_d / 1e6
    log(f"dofft (staged two-read fallback): {dt_d*1000:.2f} ms/step -> "
        f"{msps_d:.0f} MS/s/chip at {n_streams}x4.8s vs manual merged "
        f"{dt_m*1000:.2f} ms/step ({dt_d/dt_m:.2f}x — the auto-tuner's "
        f"per-0.1s forward FFT + gather-free slice/iDFT-matmul emit + "
        f"EMA recurrence plus the extra HBM input read)")


def bench_live_soak(log):
    """60 s PACED live session — the production loop end-to-end: raw
    int16 chunks delivered at real time (PacedSource deadline pacing,
    JavaAudio.java:231-233 semantics), device-side convert (the raw-mode
    h2d path), full telemetry chain, batched readbacks (sync_every=8),
    frame decode via the pub/sub drain. Reports wall/realtime ratio,
    busy fraction (margin), dropped blocks, and decoded frames — the
    proof that the production Session sustains real time with margin."""
    import jax
    from jsdr_tpu.demod.bpsk import BpskConfig
    from jsdr_tpu.io.convert import complex_to_s16le
    from jsdr_tpu.io.live import PacedSource
    from jsdr_tpu.io.sources import synth_bpsk_stream
    from jsdr_tpu.runtime.executor import Session, TelemetryStage

    rate, secs = 96_000, 60
    rng = np.random.default_rng(7)
    base = synth_bpsk_stream(
        rng.integers(0, 256, (1, 256), dtype=np.uint8),
        rate=rate, preamble_bits=600, noise_rms=0.25)
    reps = int(np.ceil(secs * rate / len(base)))
    sig = np.tile(base, reps)[: secs * rate]
    raw = np.frombuffer(complex_to_s16le(sig), "<i2")
    chunks = [raw[i * 2 * rate:(i + 1) * 2 * rate] for i in range(secs)]
    expect_frames = secs * rate // len(base)

    def make(source):
        cfg = BpskConfig(rate=rate, max_hits_per_block=2)
        stage = TelemetryStage(cfg, tunings=[12000.0], sync_every=8)
        sess = Session(source=source, block_samples=rate)
        frames = []
        sess.pubsub.listen(lambda t, v: frames.append(v)
                           if t == "telemetry-frame" else None)
        return sess, stage, frames

    # warm the compile cache so the soak measures steady state
    sess_w, stage_w, _ = make(iter(chunks[:2]))
    sess_w.run([stage_w])

    sess, stage, frames = make(PacedSource(iter(chunks), rate))
    t0 = time.time()
    n = sess.run([stage])
    wall = time.time() - t0
    rep = sess.timers.report()
    busy = sum(v["wall_s"] for v in rep.values())
    ok = sum(1 for f in frames if f.get("ok"))
    drops = sum(sess.dropped_blocks.values())
    log(f"live soak: {secs} s paced raw-mode session, {n} blocks in "
        f"{wall:.1f} s wall (x{secs/wall:.3f} realtime), busy "
        f"{busy:.1f} s ({busy/wall*100:.0f}% -> {1-busy/wall:.0%} idle "
        f"margin), drops={drops}, frames decoded={ok}/{expect_frames}")


def bench_demod(log):
    """Broadcast-audio demod at full rate (demod.java:398-483 work unit):
    21-tap complex band-pass FIR + NCO down-shift + quadrature
    discriminator + AGC, WFM mode, batched over streams — the
    reference's configs 2-3 (AM/NFM/WFM to speaker audio)."""
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.demod.am_fm import AmFmConfig, AmFmState, Mode, demod_block
    from jsdr_tpu.ops.cplx import CF, from_complex

    rate, n_streams, t_len = 96_000, 64, 960_000      # 10 s per stream
    cfg = AmFmConfig(rate=rate, mode=int(Mode.WFM), dofir=True,
                     dodwn=True, doagc=True, flo=-20_000, fhi=20_000)
    rng = np.random.default_rng(4)
    sig = (0.3 * (rng.standard_normal((n_streams, t_len))
                  + 1j * rng.standard_normal((n_streams, t_len)))
           ).astype(np.complex64)
    iq = jax.block_until_ready(jax.device_put(from_complex(sig)))
    st0 = AmFmState.init(cfg)
    states = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x),
                                  (n_streams, *np.shape(x))).copy(), st0)
    states = jax.block_until_ready(jax.device_put(states))

    # the WFM carried state hits an exact FIXED POINT on repeated
    # identical input (delta = n*phi mod 2pi lands on 0 for these
    # shapes), which lets repeat executions be deduplicated/elided
    # somewhere in the stack (observed reading as low as 0.05 ms/step —
    # physically impossible); feed a per-iteration counter into one
    # input sample so every dispatch is genuinely distinct
    @jax.jit
    def step(re, im, st, i):
        re = jax.lax.dynamic_update_slice(
            re, (i.astype(jnp.float32) * 1e-9)[None, None], (0, 0))
        f = lambda iq1, st1: demod_block(iq1, cfg, st1)
        audio, mx, avg, ns = jax.vmap(f)(CF(re, im), st)
        return audio.sum() + mx.sum(), ns

    res = jax.block_until_ready(step(iq.re, iq.im, states, jnp.int32(0)))
    iters, st = 10, states
    t0 = time.time()
    for i in range(iters):
        out = step(iq.re, iq.im, st, jnp.int32(i + 1))
        st = out[1]
    force_value(out[0])                 # d2h barrier (see force_value)
    dt = (time.time() - t0) / iters
    msps = n_streams * t_len / dt / 1e6
    log(f"WFM demod (FIR+downshift+discriminator+AGC): {msps:.0f} MS/s/chip "
        f"({dt*1000:.1f} ms/step) -> ~{msps/0.096:.0f} realtime 96k "
        f"broadcast channels/chip")


def main():
    import jax
    import jax.numpy as jnp
    from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_block_batch_spectrum,
                                     bpsk_init_batch)
    from jsdr_tpu.io.sources import synth_bpsk_stream
    from jsdr_tpu.ops.cplx import CF, from_complex
    from jsdr_tpu.runtime.tpu import ensure_tpu_ready

    dev = jax.devices()[0]
    log(f"device: {dev}")
    ensure_tpu_ready(attempts=1)

    # 128 streams x 4.8 s: merged-kernel-eligible (t_len % 38400 == 0 —
    # sf_geometry) and at the measured shape optimum. The honest chained
    # sweep (bench/exp_r7_hoist.py + exp_r7_shape.py) shows the merged
    # one-HBM-pass kernel beats the staged two-read path once the
    # hoisting artifact is removed; shorter blocks than the round-2
    # 64x10s shape still win, just by ~10%, not the artifact's 75%.
    n_streams = 128
    t_len = 460_800                      # 4.8 s per stream at 96 kS/s
    rate = 96_000
    fft_n = 9_600                        # 0.1 s spectrum blocks (compat cadence)
    cfg = BpskConfig(rate=rate, tuning=12_000.0)

    rng = np.random.default_rng(0)
    base = synth_bpsk_stream(
        rng.integers(0, 256, (2, 256), dtype=np.uint8),
        rate=rate, preamble_bits=400, noise_rms=0.3)
    reps = int(np.ceil(n_streams * t_len / len(base)))
    sig = np.tile(base, reps)[: n_streams * t_len].reshape(n_streams, t_len)

    t0 = time.time()
    iq = jax.block_until_ready(jax.device_put(from_complex(sig)))
    states = jax.block_until_ready(
        jax.device_put(bpsk_init_batch(cfg, n_streams)))
    up = time.time() - t0
    nbytes = sig.nbytes
    log(f"one-time upload: {nbytes/1e6:.0f} MB in {up:.1f}s "
        f"({nbytes/up/1e6:.0f} MB/s tunnel)")

    @jax.jit
    def step(iq, states):
        # merged spectrum+front-end Pallas kernel: one HBM read of the
        # input for both; waterfall lines + exact peaks out
        spec, out, new_states = bpsk_block_batch_spectrum(iq, cfg, states)
        # force every output tensor (no DCE of the windows/sync path)
        forced = (spec.wf.sum() + spec.peak_db.sum()
                  + spec.peak_freq.sum()
                  + out.windows.astype(jnp.int32).sum()
                  + out.hit_corr.sum() + out.n_hits.sum() + out.n_bits.sum())
        return forced, out.n_hits.sum(), out.n_bits.sum(), new_states

    log("compiling + first run...")
    t0 = time.time()
    res = jax.block_until_ready(step(iq, states))
    log(f"compile+first run: {time.time()-t0:.1f}s; "
        f"bits={int(res[2])} hits={int(res[1])}")

    iters = 20
    st = states
    t0 = time.time()
    for _ in range(iters):
        out = step(iq, st)
        st = out[3]
    force_value(out[0])                 # d2h barrier (see force_value)
    total = time.time() - t0
    per_step = total / iters
    samples = n_streams * t_len
    msps = samples / per_step / 1e6
    log(f"{iters} steps in {total:.3f}s -> {per_step*1000:.1f} ms/step "
        f"for {samples/1e6:.1f}M samples (one dispatch per step)")
    log(f"end-to-end incl. one-time upload amortized over {iters} steps: "
        f"{samples*iters/(total+up)/1e6:.1f} MS/s")

    # Steady-state: k dependent steps inside ONE jit (lax.fori_loop),
    # HOIST-PROOF: the input's real plane rides the loop carry and one
    # sample is overwritten with a state-derived value each iteration
    # (in-place on the carried buffer), so the state-free spectrum
    # kernel cannot be moved out of the loop (see module docstring and
    # bench/exp_r7_hoist.py); the demod state advances every iteration
    # and every output reduces into the f32 carry (no DCE). This removes
    # the tunnel's ~1.0 ms fixed per-dispatch cost (PERF.md "dispatch
    # overhead") and is what a production host co-located with the chip
    # sustains on streamed input.
    try:
        k_chain = 10

        @jax.jit
        def chained(iq_re, iq_im, states):
            def body(_, carry):
                acc, re_buf, st = carry
                spec, out, st = bpsk_block_batch_spectrum(
                    CF(re_buf, iq_im), cfg, st)
                forced = (spec.wf.sum() + spec.peak_db.sum()
                          + spec.peak_freq.sum()
                          + out.windows.astype(jnp.int32).sum()
                          + out.hit_corr.sum() + out.n_hits.sum()
                          + out.n_bits.sum()).astype(jnp.float32)
                re_buf = jax.lax.dynamic_update_slice(
                    re_buf, (forced * 1e-12)[None, None], (0, 0))
                return acc + forced, re_buf, st
            return jax.lax.fori_loop(
                0, k_chain, body, (jnp.float32(0.0), iq_re, states))

        t0 = time.time()
        jax.block_until_ready(chained(iq.re, iq.im, states))
        log(f"chained-step compile+first run: {time.time()-t0:.1f}s")
        m, stc = 3, states
        t0 = time.time()
        for _ in range(m):
            acc, _, stc = chained(iq.re, iq.im, stc)
        force_value(acc)                # d2h barrier (see force_value)
        dt_chain = (time.time() - t0) / (m * k_chain)
        msps_chain = samples / dt_chain / 1e6
        hits_chain = int(np.asarray(stc.counters)[:, 3].sum())
        log(f"steady-state ({m}x{k_chain} chained steps, one dispatch "
            f"per {k_chain}, hoist-proof): {dt_chain*1000:.2f} ms/step "
            f"-> {msps_chain:.0f} MS/s/chip sustained "
            f"(cumulative hits={hits_chain})")
        if msps_chain > msps:
            msps = msps_chain
    except Exception as e:  # noqa: BLE001
        log(f"chained-step measurement failed (per-dispatch headline "
            f"stands): {repr(e)[:160]}")

    # the secondary diagnostics must not take down the headline metric
    for extra in (bench_fec, bench_ingest, bench_192k, bench_dofft,
                  bench_demod, bench_live_soak):
        try:
            extra(log)
        except Exception as e:  # noqa: BLE001
            log(f"{extra.__name__} failed (headline unaffected): "
                f"{repr(e)[:160]}")

    print(json.dumps({
        "metric": "IQ Msamples/s/chip through FFT+FIR+BPSK chain",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 0.192, 1),
    }))


if __name__ == "__main__":
    # The tunneled TPU backend occasionally comes up poisoned (every
    # compile/readback fails UNIMPLEMENTED) and cannot be recovered
    # in-process — re-exec a fresh process, which re-claims the device.
    import os
    attempt = int(os.environ.get("JSDR_BENCH_ATTEMPT", "0"))
    try:
        main()
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001
        log(f"bench attempt {attempt} failed: {repr(e)[:140]}")
        if attempt >= 5:
            raise
        time.sleep(20)
        os.environ["JSDR_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
