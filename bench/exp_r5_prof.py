"""Round-3c: merged-step attribution after the scratch-batched tail.

Times, at the 64x10s bench shape on the chip:
  kernel   spectrum_front_fused alone (merged Pallas kernel, forced)
  tail     _bpsk_post alone on a precomputed decimated stream
  step     full bpsk_block_batch_spectrum
  wf       standalone spectrum_waterfall (for reference)
  front    standalone mix_decimate (front end alone)
step - kernel = the serialized tail cost; compare against tail
standalone to see what XLA's scheduling hides.
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jsdr_tpu.demod import bpsk as B
from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_block_batch_spectrum,
                                 bpsk_init_batch)
from jsdr_tpu.io.sources import synth_bpsk_stream
from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.ops.pallas_kernels import (mix_decimate, spectrum_front_fused,
                                         spectrum_waterfall)
from jsdr_tpu.runtime.tpu import ensure_tpu_ready


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=20, tag="", samples=None):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    extra = f" ({samples/dt/1e6:.0f} MS/s)" if samples else ""
    log(f"{tag}: {dt*1000:.2f} ms{extra}")
    return dt


def main():
    ensure_tpu_ready(attempts=2)
    log(f"device: {jax.devices()[0]}")
    import os
    rate, fft_n = 96_000, 9_600
    n_streams = int(os.environ.get("JSDR_PROF_S", "64"))
    t_len = int(os.environ.get("JSDR_PROF_T", "960000"))
    log(f"shape: {n_streams} x {t_len/rate:.1f}s")
    m = rate // B.DOWN_SAMPLE_RATE
    samples = n_streams * t_len
    cfg = BpskConfig(rate=rate, tuning=12_000.0)
    rng = np.random.default_rng(0)
    base = synth_bpsk_stream(
        rng.integers(0, 256, (2, 256), dtype=np.uint8),
        rate=rate, preamble_bits=400, noise_rms=0.3)
    reps = int(np.ceil(samples / len(base)))
    sig = np.tile(base, reps)[:samples].reshape(n_streams, t_len)
    iq = jax.device_put(from_complex(sig))
    states = jax.device_put(bpsk_init_batch(cfg, n_streams))
    jax.block_until_ready((iq, states))
    tunings = np.full(n_streams, 12_000, np.int32)

    taps = B.DS_FILTER.astype(np.float32)

    @jax.jit
    def kernel_only(re, im, st):
        cos_pat, sin_pat = B._nco_pattern(st.tu_phase, tunings * B.NU_SCALE, rate)
        wf, mx, idx, ds, tl = spectrum_front_fused(
            CF(re, im), fft_n, cos_pat, sin_pat, taps, m, st.ds_tail,
            gain=B.HOWARD_FUDGE_FACTOR)
        return (wf.sum() + mx.sum() + idx.sum() + ds.re.sum() + ds.im.sum()
                + tl.re.sum())

    @jax.jit
    def front_only(re, im, st):
        cos_pat, sin_pat = B._nco_pattern(st.tu_phase, tunings * B.NU_SCALE, rate)
        ds, tl = mix_decimate(CF(re, im), cos_pat, sin_pat, taps, m,
                              st.ds_tail, gain=B.HOWARD_FUDGE_FACTOR)
        return ds.re.sum() + ds.im.sum() + tl.re.sum()

    # precompute the decimated stream for the tail-only measurement
    cos_pat, sin_pat = B._nco_pattern(states.tu_phase, tunings * B.NU_SCALE, rate)
    ds, _ = mix_decimate(CF(iq.re, iq.im), cos_pat, sin_pat, taps, m,
                         states.ds_tail, gain=B.HOWARD_FUDGE_FACTOR)
    ds = jax.block_until_ready(ds)
    tu_phase = B._nco_advance(states.tu_phase, tunings * B.NU_SCALE, rate, t_len)

    @jax.jit
    def tail_only(dsr, dsi, st, tup):
        post = partial(B._bpsk_post, t_len=t_len,
                       max_hits=cfg.max_hits_per_block, compat_scan=False)
        out, ns = jax.vmap(post)(CF(dsr, dsi), st, tup, st.ds_tail,
                                 st.fft_tuner)
        return (out.windows.astype(jnp.int32).sum() + out.n_hits.sum()
                + out.n_bits.sum())

    @jax.jit
    def vco_mf_only(dsr, dsi, st):
        from jsdr_tpu.ops.fir import fir_apply_streaming

        def one(ds1, st1):
            bb, vco_idx = B._vco_mix(ds1, st1.vco_idx)
            mf, mf_tail = fir_apply_streaming(
                bb, jnp.asarray(B.DM_FILTER.astype(np.float32)),
                st1.mf_tail, precision="bf16x3")
            return mf, vco_idx, mf_tail

        mf, vi, mt = jax.vmap(one)(CF(dsr, dsi), st)
        return mf.re.sum() + mf.im.sum() + vi.sum()

    # precompute the matched-filter output for the post-mf measurement
    def one_mf(ds1, st1):
        from jsdr_tpu.ops.fir import fir_apply_streaming
        bb, vco_idx = B._vco_mix(ds1, st1.vco_idx)
        mf, mf_tail = fir_apply_streaming(
            bb, jnp.asarray(B.DM_FILTER.astype(np.float32)),
            st1.mf_tail, precision="bf16x3")
        return mf, vco_idx, mf_tail

    mf_pre, vco_pre, mft_pre = jax.block_until_ready(
        jax.jit(lambda r, i, st: jax.vmap(one_mf)(CF(r, i), st))(
            ds.re, ds.im, states))

    @jax.jit
    def post_mf_only(mfr, mfi, st, tup, vi, mt):
        post = partial(B._bpsk_post_mf, t_len=t_len,
                       max_hits=cfg.max_hits_per_block, compat_scan=False)
        out, ns = jax.vmap(post)(CF(mfr, mfi), st, tup, st.ds_tail, mt, vi,
                                 st.fft_tuner)
        return (out.windows.astype(jnp.int32).sum() + out.n_hits.sum()
                + out.n_bits.sum())

    @jax.jit
    def timing_only(mfr, mfi, st):
        v, bit, di, e2, ts = jax.vmap(B._timing_parallel)(
            CF(mfr, mfi), st.timing)
        return (v.sum() + bit.sum() + di.sum() + e2.sum()
                + ts.e_out.sum())

    t_ds = t_len // m
    max_bits = 2 * (t_ds // B.SAMPLES_PER_BIT) + 2
    vpre, bpre = jax.block_until_ready(jax.jit(
        lambda r, i, st: jax.vmap(B._timing_parallel)(CF(r, i),
                                                      st.timing)[:2])(
        mf_pre.re, mf_pre.im, states))

    @jax.jit
    def compact_only(v, bit):
        bits, n_bits = jax.vmap(partial(B._compact_bits,
                                        max_bits=max_bits))(v, bit)
        return bits.astype(jnp.int32).sum() + n_bits.sum()

    bits_pre, nb_pre = jax.block_until_ready(jax.jit(
        lambda v, b: jax.vmap(partial(B._compact_bits,
                                      max_bits=max_bits))(v, b))(
        vpre, bpre))

    @jax.jit
    def sync_only(bits, n_bits, st):
        w, hc, nh, ring = jax.vmap(
            partial(B.soft_frames_from_bits,
                    max_hits=cfg.max_hits_per_block))(
            bits, n_bits, st.ring)
        return w.astype(jnp.int32).sum() + hc.sum() + nh.sum()

    @jax.jit
    def full_step(re, im, st):
        spec, out, ns = bpsk_block_batch_spectrum(CF(re, im), cfg, st, None)
        return (spec.wf.sum() + spec.peak_db.sum()
                + out.windows.astype(jnp.int32).sum() + out.n_hits.sum())

    @jax.jit
    def wf_only(re, im):
        wf, mx, idx = spectrum_waterfall(CF(re, im), fft_n)
        return wf.sum() + mx.sum() + idx.sum()

    timeit(wf_only, iq.re, iq.im, tag="wf standalone", samples=samples)
    timeit(front_only, iq.re, iq.im, states, tag="front standalone",
           samples=samples)
    from jsdr_tpu.ops.pallas_kernels import sf_geometry
    sf_blocks, _ = sf_geometry(fft_n, m)
    if t_len % (sf_blocks * fft_n) == 0:
        timeit(kernel_only, iq.re, iq.im, states, tag="merged kernel only",
               samples=samples)
    else:
        log("merged kernel: shape ineligible (t_len % "
            f"{sf_blocks * fft_n} != 0), skipped")
    timeit(tail_only, ds.re, ds.im, states, tu_phase, tag="tail standalone",
           samples=samples)
    timeit(vco_mf_only, ds.re, ds.im, states, tag="tail: vco+mf only",
           samples=samples)
    timeit(post_mf_only, mf_pre.re, mf_pre.im, states, tu_phase, vco_pre,
           mft_pre, tag="tail: post-mf (timing/sync/extract)",
           samples=samples)
    timeit(timing_only, mf_pre.re, mf_pre.im, states,
           tag="tail: timing recovery only", samples=samples)

    from jsdr_tpu.ops.timing_kernel import timing_recover_batch

    @jax.jit
    def timing_kernel_only(mfr, mfi, st):
        tm = st.timing
        v, bt, ema, pk, npk, eo, liq = timing_recover_batch(
            mfr, mfi, tm.e_ema, tm.peak, tm.new_peak, tm.e_out,
            tm.last_iq, smooth1=B.BIT_SMOOTH1, smooth2=B.BIT_SMOOTH2,
            gate=B.ENERGY_GATE)
        return (v.sum() + bt.sum() + ema.sum() + pk.sum() + eo.sum()
                + liq.sum())

    timeit(timing_kernel_only, mf_pre.re, mf_pre.im, states,
           tag="tail: timing KERNEL only", samples=samples)
    timeit(compact_only, vpre, bpre, tag="tail: bit compaction only",
           samples=samples)
    timeit(sync_only, bits_pre, nb_pre, states,
           tag="tail: sync+extract only", samples=samples)
    timeit(full_step, iq.re, iq.im, states, tag="full merged step",
           samples=samples)


if __name__ == "__main__":
    main()
