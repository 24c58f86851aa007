"""Round-3 experiment: measured achievable HBM bandwidth + stage profile.

1. HBM bandwidth ceiling: big f32 copy (read+write) and a reduce-only
   read at several sizes — the 'achievable bandwidth' denominator for
   the PERF.md roofline section.
2. Stage re-profile of the bench step at 64x10s.
"""
import functools
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from jsdr_tpu.demod import bpsk as B
from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.ops.pallas_kernels import mix_decimate, spectrum_fused
from jsdr_tpu.ops.spectrum import spectrum_wide
from jsdr_tpu.runtime.tpu import ensure_tpu_ready

def log(*a): print(*a, file=sys.stderr, flush=True)

def timeit(fn, *args, iters=10, tag="", samples=None, bytes_moved=None):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    extra = f" ({samples/dt/1e6:.0f} MS/s)" if samples else ""
    if bytes_moved:
        extra += f" ({bytes_moved/dt/1e9:.0f} GB/s)"
    log(f"{tag}: {dt*1000:.2f} ms{extra}")
    return dt


def main():
    ensure_tpu_ready(attempts=1)
    log(f"device: {jax.devices()[0]}")

    # --- HBM bandwidth ceiling ---
    for mb in (128, 512, 1024):
        n = mb * 1024 * 1024 // 4
        x = jax.device_put(jnp.arange(n, dtype=jnp.float32).reshape(-1, 1024))
        jax.block_until_ready(x)
        cp = jax.jit(lambda a: a * 1.0000001)
        timeit(cp, x, tag=f"copy {mb} MB (r+w)", bytes_moved=2 * n * 4)
        rd = jax.jit(lambda a: a.sum())
        timeit(rd, x, tag=f"reduce {mb} MB (read)", bytes_moved=n * 4)

    # --- stage profile (bench shapes) ---
    rate, n_streams, t_len = 96_000, 64, 960_000
    fft_n = 9_600
    samples = n_streams * t_len
    cfg = B.BpskConfig(rate=rate, tuning=12_000.0)
    rng = np.random.default_rng(0)
    sig = (0.3 * (rng.standard_normal((n_streams, t_len))
                  + 1j * rng.standard_normal((n_streams, t_len)))
           ).astype(np.complex64)
    iq = jax.device_put(from_complex(sig))
    states = jax.device_put(B.bpsk_init_batch(cfg, n_streams))
    jax.block_until_ready((iq, states))

    f_wide = jax.jit(lambda r, i: (lambda s: s.psd.sum() + s.peak_db.sum())(
        spectrum_wide(CF(r, i), fft_n, rate=float(rate), natural=False)))
    timeit(f_wide, iq.re, iq.im, tag="spectrum_wide (kernel+peaks)",
           samples=samples)

    taps = B.DS_FILTER.astype(np.float32)
    tunings = jnp.full((n_streams,), 12000, jnp.int32)

    @jax.jit
    def front_ds(re, im, st):
        cos_pat, sin_pat = B._nco_pattern(st.tu_phase, tunings * B.NU_SCALE, rate)
        ds, tail = mix_decimate(CF(re, im), cos_pat, sin_pat, taps, 10,
                                st.ds_tail, gain=B.HOWARD_FUDGE_FACTOR)
        return ds, tail
    timeit(lambda r, i, s: (lambda o: o[0].re.sum() + o[0].im.sum())(
        front_ds(r, i, s)), iq.re, iq.im, states,
        tag="front (mix+decimate)", samples=samples)
    ds, _tail = jax.block_until_ready(front_ds(iq.re, iq.im, states))

    # decimated-domain sub-stages
    from jsdr_tpu.ops.fir import fir_apply_streaming

    @jax.jit
    def vco_mf(dsr, dsi, st):
        def one(ds1, st1):
            bb, vco_idx = B._vco_mix(ds1, st1.vco_idx)
            mf, mf_tail = fir_apply_streaming(
                bb, jnp.asarray(B.DM_FILTER.astype(np.float32)), st1.mf_tail,
                precision="bf16x3")
            return mf
        mf = jax.vmap(one)(CF(dsr, dsi), st)
        return mf.re.sum() + mf.im.sum()
    timeit(vco_mf, ds.re, ds.im, states, tag="vco+mf", samples=samples)

    @jax.jit
    def mf_only(dsr, dsi, st):
        def one(ds1, st1):
            mf, mf_tail = fir_apply_streaming(
                ds1, jnp.asarray(B.DM_FILTER.astype(np.float32)), st1.mf_tail,
                precision="bf16x3")
            return mf
        mf = jax.vmap(one)(CF(dsr, dsi), st)
        return mf.re.sum() + mf.im.sum()
    timeit(mf_only, ds.re, ds.im, states, tag="mf only", samples=samples)

    @jax.jit
    def get_mf(dsr, dsi, st):
        def one(ds1, st1):
            bb, vco_idx = B._vco_mix(ds1, st1.vco_idx)
            mf, mf_tail = fir_apply_streaming(
                bb, jnp.asarray(B.DM_FILTER.astype(np.float32)), st1.mf_tail,
                precision="bf16x3")
            return mf
        return jax.vmap(one)(CF(dsr, dsi), st)
    mf = jax.block_until_ready(get_mf(ds.re, ds.im, states))

    @jax.jit
    def timing(mfr, mfi, st):
        def one(mf1, st1):
            valid, bit, di, e2, ts = B._timing_parallel(CF(mf1, mfi[0]*0 + mf1*0 + mf1), st1.timing)  # placeholder
            return valid
        # real: per-stream
        v, b, di, e2, ts = jax.vmap(
            lambda m_r, m_i, t: B._timing_parallel(CF(m_r, m_i), t))(
                mfr, mfi, st.timing)
        return v.sum() + b.sum()
    timeit(timing, mf.re, mf.im, states, tag="timing recovery",
           samples=samples)

    @jax.jit
    def get_vb(mfr, mfi, st):
        v, b, di, e2, ts = jax.vmap(
            lambda m_r, m_i, t: B._timing_parallel(CF(m_r, m_i), t))(
                mfr, mfi, st.timing)
        return v, b
    v, b = jax.block_until_ready(get_vb(mf.re, mf.im, states))
    max_bits = 2 * (ds.re.shape[-1] // 8) + 2

    @jax.jit
    def compact(v, b):
        bits, n_bits = jax.vmap(
            lambda v1, b1: B._compact_bits(v1, b1, max_bits))(v, b)
        return bits.astype(jnp.int32).sum() + n_bits.sum()
    timeit(compact, v, b, tag="bit compaction", samples=samples)

    @jax.jit
    def get_bits(v, b):
        return jax.vmap(lambda v1, b1: B._compact_bits(v1, b1, max_bits))(v, b)
    bits, n_bits = jax.block_until_ready(get_bits(v, b))

    @jax.jit
    def sync_extract(bits, n_bits, st):
        w, hc, nh, ring = jax.vmap(
            lambda b1, n1, r1: B.soft_frames_from_bits(b1, n1, r1, 4))(
                bits, n_bits, st.ring)
        return w.astype(jnp.int32).sum() + hc.sum() + nh.sum()
    timeit(sync_extract, bits, n_bits, states, tag="sync+extract",
           samples=samples)

    @jax.jit
    def full(re, im, st):
        out, ns = B.bpsk_block_batch(CF(re, im), cfg, st, None)
        return (out.windows.astype(jnp.int32).sum() + out.hit_corr.sum()
                + out.n_hits.sum() + out.n_bits.sum())
    timeit(full, iq.re, iq.im, states, tag="bpsk full chain",
           samples=samples)

    @jax.jit
    def step(re, im, st):
        spec = spectrum_wide(CF(re, im), fft_n, rate=float(rate),
                             window=True, natural=False)
        out, ns = B.bpsk_block_batch(CF(re, im), cfg, st, None)
        return (spec.psd.sum() + spec.peak_db.sum()
                + out.windows.astype(jnp.int32).sum()
                + out.hit_corr.sum() + out.n_hits.sum() + out.n_bits.sum())
    timeit(step, iq.re, iq.im, states, tag="FULL STEP (bench)",
           samples=samples)


if __name__ == "__main__":
    main()
