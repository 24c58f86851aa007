"""Round-3: on-chip measurements for PERF.md.

1. sp-fold tradeoff (VERDICT #9): front-end time vs decimated-tail time
   at segment lengths N, 2N, 4N — the tail is recomputed by every sp
   rank in the sp-fold design, so per-chip weak-scaled step time is
   front(N) + tail(sp*N); the table gives the measured efficiency and
   the crossover where PP (tail on its own device group) wins.
2. Session async overlap (VERDICT #6): wall time of a 20-block live
   session with sync_every=1 (drain every block) vs sync_every=8.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

from jsdr_tpu.demod import bpsk as B
from jsdr_tpu.ops.cplx import CF, from_complex
from jsdr_tpu.ops.pallas_kernels import mix_decimate
from jsdr_tpu.runtime.tpu import ensure_tpu_ready

def log(*a): print(*a, file=sys.stderr, flush=True)

def timeit(fn, *args, iters=10, tag=""):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    log(f"{tag}: {dt*1000:.2f} ms")
    return dt


def main():
    ensure_tpu_ready(attempts=1)
    log(f"device: {jax.devices()[0]}")
    rate, n_streams = 96_000, 64
    n1 = 960_000                          # 10 s per stream = one sp shard
    cfg = B.BpskConfig(rate=rate, tuning=12_000.0)
    rng = np.random.default_rng(0)
    taps = B.DS_FILTER.astype(np.float32)
    tunings = jnp.full((n_streams,), 12000, jnp.int32)

    # --- 1. sp-fold table -------------------------------------------------
    sig = (0.3 * (rng.standard_normal((n_streams, 4 * n1))
                  + 1j * rng.standard_normal((n_streams, 4 * n1)))
           ).astype(np.complex64)
    iq4 = jax.device_put(from_complex(sig))
    states = jax.device_put(B.bpsk_init_batch(cfg, n_streams))
    jax.block_until_ready((iq4, states))

    @partial(jax.jit, static_argnames=("t",))
    def front(re, im, st, t):
        cos_pat, sin_pat = B._nco_pattern(st.tu_phase, tunings * B.NU_SCALE, rate)
        ds, tail = mix_decimate(CF(re[:, :t], im[:, :t]), cos_pat, sin_pat,
                                taps, 10, st.ds_tail,
                                gain=B.HOWARD_FUDGE_FACTOR)
        return ds.re.sum() + ds.im.sum() + tail.re.sum()

    @partial(jax.jit, static_argnames=("t",))
    def front_ds(re, im, st, t):
        cos_pat, sin_pat = B._nco_pattern(st.tu_phase, tunings * B.NU_SCALE, rate)
        return mix_decimate(CF(re[:, :t], im[:, :t]), cos_pat, sin_pat,
                            taps, 10, st.ds_tail,
                            gain=B.HOWARD_FUDGE_FACTOR)[0]

    @partial(jax.jit, static_argnames=("t_len",))
    def tail_only(dsr, dsi, st, t_len):
        post = partial(B._bpsk_post, t_len=t_len, max_hits=4,
                       compat_scan=False)
        out, ns = jax.vmap(post)(CF(dsr, dsi), st, st.tu_phase, st.ds_tail,
                                 st.fft_tuner)
        return (out.windows.astype(jnp.int32).sum() + out.n_hits.sum()
                + out.n_bits.sum())

    t_front = {}
    t_tail = {}
    for k in (1, 2, 4):
        t = k * n1
        t_front[k] = timeit(front, iq4.re, iq4.im, states, t,
                            tag=f"front({k}N) [{t//96000}s x {n_streams}]")
        ds = jax.block_until_ready(front_ds(iq4.re, iq4.im, states, t))
        t_tail[k] = timeit(tail_only, ds.re, ds.im, states, t,
                           tag=f"tail({k}N)")
        del ds
    log("--- sp-fold weak scaling (per-chip: front(N) + tail(sp*N)) ---")
    base = t_front[1] + t_tail[1]
    for sp in (1, 2, 4):
        per_chip = t_front[1] + t_tail[sp]
        eff = base / per_chip
        log(f"sp={sp}: per-chip step {per_chip*1000:.2f} ms, "
            f"weak-scaling efficiency {eff*100:.0f}% "
            f"(tail share {t_tail[sp]/per_chip*100:.0f}%)")
    log(f"PP alternative: per-chip max(front(N), tail(N)) = "
        f"{max(t_front[1], t_tail[1])*1000:.2f} ms")

    # --- 2. Session async overlap ----------------------------------------
    from jsdr_tpu.runtime.executor import Session, TelemetryStage
    from jsdr_tpu.io.sources import synth_bpsk_stream

    payload = np.arange(256, dtype=np.uint8)[None]
    s1 = synth_bpsk_stream(payload, rate=rate, preamble_bits=300)
    blocks20 = np.tile(s1, 3)[: 20 * rate]

    for sync_every in (1, 8):
        stage = TelemetryStage(cfg, tunings=[12000.0],
                               sync_every=sync_every)
        sess = Session(source=iter([blocks20]), block_samples=rate)
        t0 = time.time()
        n = sess.run([stage])
        wall = time.time() - t0
        log(f"Session 20x1s blocks, sync_every={sync_every}: "
            f"{wall:.2f}s wall ({n} blocks, "
            f"{n*rate/wall/1e6:.1f} MS/s live)")

    # --- 3. raw-mode session with DEVICE convert on the TPU backend ---
    from jsdr_tpu.io.convert import complex_to_s16le
    frames = []
    raw20 = np.frombuffer(complex_to_s16le(blocks20[: 10 * rate]), "<i2")
    stage = TelemetryStage(cfg, tunings=[12000.0], sync_every=4)
    sess = Session(source=iter([raw20]), block_samples=rate,
                   i_corr=2, q_corr=-5)
    sess.pubsub.listen(lambda t, v: frames.append(v)
                       if t == "telemetry-frame" else None)
    t0 = time.time()
    n = sess.run([stage])
    wall = time.time() - t0
    log(f"RAW session (int16 upload + device convert, ic=2 qc=-5) on "
        f"{jax.devices()[0].platform}: {n} blocks in {wall:.2f}s, "
        f"frames={len(frames)} ok={[bool(f['ok']) for f in frames]}")


if __name__ == "__main__":
    main()
