"""Pipeline parallelism: telemetry chain stages on separate device groups.

SURVEY §2.2's PP obligation — the TPU analog of the reference's
thread/stage structure (capture thread -> demod handlers -> output
thread, JavaAudio.java:195-329 / demod.java:489-506): assign pipeline
STAGES to devices and overlap them across successive blocks.

Two stages map onto a ("pp",) mesh of 2 devices:

- **stage 0 (front end, rank 0)**: per-stream NCO mix + 27-tap
  decimating polyphase FIR — the full-rate, HBM-bandwidth-bound half
  (FUNcubeBPSKDemod.java:382-492 work).
- **stage 1 (decode tail, rank 1)**: VCO mix -> matched filter ->
  timing recovery -> sync search on the decimated stream — the
  scan-heavy, low-FLOP half (:505-595 work).

Schedule (GPipe-style, microbatch = one time block): at tick t, rank 0
runs the front end on block t while rank 1 runs the decode tail on
block t-1; the decimated activations hop one ICI ``ppermute`` between
ticks. The SPMD body picks its stage with ``lax.cond`` on
``axis_index`` — each device executes only its own branch at runtime,
so the two stages genuinely overlap in wall time and meet at the
permute. The decimated handoff is rate/9600-times smaller than the
input, so the inter-stage traffic is negligible.

The pipeline carries a one-block latency: outputs at tick t correspond
to input block t-1 (a ``primed`` flag keeps the very first tick from
touching the decode state). State is exact: the front-end state (NCO
numerator, decimator tail) advances on rank 0, the decode state (VCO,
matched filter, timing, 5199-bit ring, counters) on rank 1, and the
handoff carries the tu_phase/ds_tail snapshot that ``_bpsk_post``
threads into the carried state — bit-identical to the sequential
``bpsk_block_batch`` chain (tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..demod import bpsk as B
from ..ops.cplx import CF, as_cf
from ..ops.fir import polyphase_decimate


def make_pp_mesh(devices=None) -> Mesh:
    """A 2-device ("pp",) mesh: rank 0 = front end, rank 1 = decode."""
    devs = list(devices if devices is not None else jax.devices())[:2]
    assert len(devs) == 2, "pipeline mesh needs 2 devices"
    return Mesh(np.array(devs), ("pp",))


def _zero_out(s: int, t_ds: int, max_hits: int) -> B.BpskBlockOut:
    max_bits = 2 * (t_ds // B.SAMPLES_PER_BIT) + 2
    return B.BpskBlockOut(
        windows=jnp.full((s, max_hits, B.FEC_BITS), 0x40, jnp.uint8),
        hit_corr=jnp.zeros((s, max_hits), jnp.int32),
        n_hits=jnp.zeros((s,), jnp.int32),
        bits=jnp.zeros((s, max_bits), jnp.int8),
        n_bits=jnp.zeros((s,), jnp.int32),
        energies=jnp.zeros((s, 2), jnp.float32),
    )


def pipelined_telemetry(mesh: Mesh, rate: int = 96000, max_hits: int = 4,
                        compat_scan: bool = False,
                        use_pallas: bool | None = None):
    """Build the 2-stage pipelined telemetry step over ``mesh``.

    Returns ``fn(iq_blocks, carry, tunings) -> (out, new_carry)``:
    ``iq_blocks`` [n_mb, S, T] (CF or host complex) — n_mb microbatches
    of S streams; ``carry`` starts as ``pipeline_init``. ``out`` stacks
    BpskBlockOut over the n_mb ticks; out[t] decodes input block t-1
    (out[0] of the FIRST call is an empty prime tick with n_hits=0).
    Integral per-stream tunings only (the exact int-numerator NCO path).
    """
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform not in ("cpu",)
    m = rate // B.DOWN_SAMPLE_RATE
    taps = B.DS_FILTER.astype(np.float32)

    def local(iq_re, iq_im, carry, tunings, *, mix_pattern: bool):
        from ..ops.pallas_kernels import mix_decimate
        k = lax.axis_index("pp")
        # shard_map delivers the pp-stacked carry as a leading length-1
        # axis per rank; strip it (re-added on return)
        buf0, st0, primed0 = carry
        buf = tuple(b[0] for b in buf0)
        st = jax.tree.map(lambda x: x[0], st0)
        primed = primed0[0]
        n_mb, s, t_len = iq_re.shape
        t_ds = t_len // m

        def tick(c, x):
            buf, st, primed = c    # buf: (ds, tu_after, tail) last handoff
            xr, xi = x

            def stage0(_):
                if mix_pattern:
                    cos_pat, sin_pat = B._nco_pattern(st.tu_phase, tunings,
                                                      rate)
                    ds, tail = mix_decimate(
                        CF(xr, xi), cos_pat, sin_pat, taps, m, st.ds_tail,
                        gain=B.HOWARD_FUDGE_FACTOR, use_pallas=use_pallas)
                    tu = B._nco_advance(st.tu_phase, tunings, rate, t_len)
                else:
                    mixed, tu = B._tuner_full_mix(CF(xr, xi), st.tu_phase,
                                                  tunings, rate)
                    ds, tail = polyphase_decimate(
                        mixed, jnp.asarray(taps), m, tail=st.ds_tail,
                        gain=B.HOWARD_FUDGE_FACTOR)
                st2 = st._replace(tu_phase=tu, ds_tail=tail)
                return ((ds.re, ds.im, tu, tail.re, tail.im), st2,
                        _zero_out(s, t_ds, max_hits))

            def stage1(_):
                ds = CF(buf[0], buf[1])
                tu, tail = buf[2], CF(buf[3], buf[4])
                post = partial(B._bpsk_post, t_len=t_len, max_hits=max_hits,
                               compat_scan=compat_scan)
                out, st2 = jax.vmap(post)(ds, st, tu, tail, st.fft_tuner)
                # the prime tick (nothing in flight yet) must not touch
                # the decode state or report bits
                st2 = jax.tree.map(
                    lambda new, old: jnp.where(primed, new, old), st2, st)
                out = jax.tree.map(
                    lambda o, z: jnp.where(primed, o, z), out,
                    _zero_out(s, t_ds, max_hits))
                return buf, st2, out

            payload, st, out = lax.cond(k == 0, stage0, stage1, None)
            # decimated activations hop rank 0 -> rank 1 over ICI
            nxt = tuple(lax.ppermute(p, "pp", [(0, 1)]) for p in payload)
            return (nxt, st, jnp.ones((), jnp.bool_)), out

        (buf, st, primed), outs = lax.scan(tick, (buf, st, primed),
                                           (iq_re, iq_im))
        new_carry = (tuple(b[None] for b in buf),
                     jax.tree.map(lambda x: x[None], st), primed[None])
        return new_carry, jax.tree.map(lambda x: x[None], outs)

    pp = P("pp")
    state_specs = jax.tree.map(lambda _: pp, B.bpsk_init(B.BpskConfig()))
    buf_specs = (pp, pp, pp, pp, pp)
    carry_specs = (buf_specs, state_specs, pp)
    out_specs = jax.tree.map(
        lambda _: pp, B.BpskBlockOut(*([0] * len(B.BpskBlockOut._fields))))
    jitted = {}
    for mix_pattern in (False, True):
        smapped = jax.shard_map(
            partial(local, mix_pattern=mix_pattern), mesh=mesh,
            in_specs=(P(None), P(None), carry_specs, P(None)),
            out_specs=(carry_specs, out_specs),
            check_vma=False)
        jitted[mix_pattern] = jax.jit(smapped)

    def run(iq_blocks, carry, tunings=None):
        iq = as_cf(iq_blocks)
        s = iq.shape[1]
        if tunings is None:
            tunings = np.full(s, 12000)
        tun = np.asarray(tunings, np.float64)
        assert np.all(tun == np.round(tun)), \
            "pipelined path needs integral tunings"
        tun_arr = np.maximum(tun, 0.0).astype(np.int32)
        pat = B.pattern_mix_ok(tun, rate)
        carry, outs = jitted[pat](iq.re, iq.im, carry, tun_arr)
        # rank 1 produced the real outputs; rank 0's slots are dummies
        out = jax.tree.map(lambda x: x[1], outs)
        return out, carry

    return run


def pipeline_init(cfg: B.BpskConfig, n_streams: int, block_len: int):
    """Initial pipeline carry (host numpy; uploads at the first call).

    Layout: every leaf leads with the pp axis [2, ...] — each rank owns
    its own copy of the activation buffer and stage state."""
    m = cfg.decim
    t_ds = block_len // m
    n_tail = len(B.DS_FILTER) - 1

    def two(x):
        return np.stack([x, x])

    buf = (two(np.zeros((n_streams, t_ds), np.float32)),
           two(np.zeros((n_streams, t_ds), np.float32)),
           two(np.zeros((n_streams,), np.float32)),
           two(np.zeros((n_streams, n_tail), np.float32)),
           two(np.zeros((n_streams, n_tail), np.float32)))
    st = jax.tree.map(two, B.bpsk_init_batch(cfg, n_streams))
    return (buf, st, np.zeros(2, np.bool_))


def pipeline_flush(run, carry, n_streams: int, block_len: int,
                   tunings=None) -> Tuple[B.BpskBlockOut, tuple]:
    """Drain the in-flight block at end of stream: feeds one zero block
    through the pipe and returns its decode of the LAST real block.
    Use only at stream end (the zero block enters the front end)."""
    z = np.zeros((1, n_streams, block_len), np.complex64)
    out, carry = run(z, carry, tunings)
    return jax.tree.map(lambda x: x[0], out), carry
