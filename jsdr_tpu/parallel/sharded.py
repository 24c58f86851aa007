"""Sharded telemetry pipeline: the multi-chip "training step" of the
framework.

Sharding layout over a ("dp", "sp") mesh:

- streams (batch) partitioned over dp
- each stream's time axis partitioned over sp

The parallel front-end (tuner mix -> decimating FIR -> VCO mix -> matched
filter) is an overlap-save computation: each time shard needs
``64*M + 26`` input samples of left prehistory (cascade of the 27-tap
decimator at the input rate and the 65-tap matched filter at 9600 S/s).
That halo rides the ICI ring via one ``ppermute`` per step — the
TPU-native replacement for the reference's circular delay buffers
(FUNcubeBPSKDemod.java:467-468, 495-496).

The 9600 Hz bit-timing recovery (``_timing_parallel``) needs the whole
segment's decimated stream; it is 10x decimated, so each dp row
``all_gather``s the matched-filter output along sp (cheap) and runs the
(log-depth, fully parallel) recovery on the full segment. sp ranks
compute identical results — redundant FLOPs on a small computation in
exchange for zero cross-shard serialization.

This module processes one contiguous stream segment with zero prehistory
(stream start). Cross-segment state chaining composes at the host level
with the single-device ``bpsk_block``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..demod import bpsk as B
from ..ops.cplx import CF, as_cf, cf_zeros
from ..ops.fir import polyphase_decimate, fir_apply_streaming
from ..ops.spectrum import spectrum_block

TWO_PI = 2.0 * np.pi


def _frontend_local(iq_loc: CF, *, rate: int, tuning: float,
                    n_sp: int) -> CF:
    """Per-shard front-end: [s_loc, t_loc] planar pair -> matched-filter
    output [s_loc, t_loc//M] pair. Runs inside shard_map."""
    m = rate // B.DOWN_SAMPLE_RATE
    ntaps_mf = len(B.DM_FILTER)
    halo = (ntaps_mf - 1) * m + (len(B.DS_FILTER) - 1)
    t_loc = iq_loc.shape[-1]
    assert t_loc % m == 0 and t_loc >= halo, (t_loc, halo)

    sp_idx = lax.axis_index("sp")
    # ring halo: left neighbor's trailing samples; shard 0 gets zeros
    perm = [(i, (i + 1) % n_sp) for i in range(n_sp)]
    left = CF(lax.ppermute(iq_loc.re[..., -halo:], "sp", perm),
              lax.ppermute(iq_loc.im[..., -halo:], "sp", perm))
    left = CF(jnp.where(sp_idx == 0, 0, left.re),
              jnp.where(sp_idx == 0, 0, left.im))

    # tuner NCO phase offset of this shard's first sample
    inc = TWO_PI * tuning / float(rate)
    if inc > 0.0:
        ramp = np.mod(np.arange(1 - halo, t_loc + 1, dtype=np.float64) * inc,
                      TWO_PI).astype(np.float32)
        delta = np.float32(np.mod(t_loc * inc, TWO_PI))
        base = jnp.mod(sp_idx.astype(jnp.float32) * delta, TWO_PI)
        phases = jnp.mod(base + jnp.asarray(ramp), TWO_PI)
        idx = (phases * (B.SINCOS_SIZE / TWO_PI)).astype(jnp.int32) % B.SINCOS_SIZE
        ang = idx.astype(jnp.float32) * (TWO_PI / B.SINCOS_SIZE)
        x = CF(jnp.concatenate([left.re, iq_loc.re], axis=-1),
               jnp.concatenate([left.im, iq_loc.im], axis=-1))
        mixed = CF(x.re * jnp.cos(ang), x.im * jnp.sin(ang))
    else:
        mixed = CF(jnp.concatenate([left.re, iq_loc.re], axis=-1),
                   jnp.concatenate([left.im, iq_loc.im], axis=-1))

    # decimate the extended segment; first (ntaps_mf-1) outputs are the
    # matched filter's prehistory, produced locally from the halo
    ds_taps = jnp.asarray(B.DS_FILTER.astype(np.float32))
    ds_tail = mixed[..., : len(B.DS_FILTER) - 1]
    body = mixed[..., len(B.DS_FILTER) - 1:]
    ds, _ = polyphase_decimate(body, ds_taps, m, tail=ds_tail,
                               gain=B.HOWARD_FUDGE_FACTOR)

    # VCO mix with the global decimated counter offset
    k_loc = t_loc // m
    k0 = sp_idx * k_loc - (ntaps_mf - 1)
    mpos = (k0 + jnp.arange(ds.shape[-1], dtype=jnp.int32)) % 8
    c = jnp.asarray(B._VCO_COS)[mpos]
    s = jnp.asarray(B._VCO_SIN)[mpos]
    bb = CF(ds.re * c, ds.im * s)

    # matched filter over the extended stream; drop the warm-up outputs
    dm_taps = jnp.asarray(B.DM_FILTER.astype(np.float32))
    tail = CF(jnp.zeros((*bb.shape[:-1], ntaps_mf - 1), jnp.float32),
              jnp.zeros((*bb.shape[:-1], ntaps_mf - 1), jnp.float32))
    mf_ext, _ = fir_apply_streaming(bb, dm_taps, tail)
    return mf_ext[..., ntaps_mf - 1:]


def _telemetry_local(iq_re, iq_im, *, rate, tuning, n_sp, max_hits):
    """shard_map body: front-end + gathered scan + sync search."""
    iq_loc = CF(iq_re, iq_im)
    mf_loc = _frontend_local(iq_loc, rate=rate, tuning=tuning, n_sp=n_sp)
    mf = CF(lax.all_gather(mf_loc.re, "sp", axis=mf_loc.ndim - 1, tiled=True),
            lax.all_gather(mf_loc.im, "sp", axis=mf_loc.ndim - 1, tiled=True))

    def per_stream(mf_1d: CF):
        ts = B.bpsk_init(B.BpskConfig(rate=rate, tuning=tuning)).timing
        valid, bit, di, e2, _ = B._timing_parallel(mf_1d, ts)
        max_bits = 2 * (mf_1d.shape[-1] // B.SAMPLES_PER_BIT) + 2
        bits, n_bits = B._compact_bits(valid, bit, max_bits)
        ring = jnp.zeros(B.FEC_BITS - 1, jnp.int8)
        windows, hit_corr, n_hits, _ = B.soft_frames_from_bits(
            bits, n_bits, ring, max_hits)
        return windows, hit_corr, n_hits, n_bits

    return jax.vmap(per_stream)(mf)


def sharded_telemetry_step(mesh: Mesh, rate: int = 96000,
                           tuning: float = 12000.0, max_hits: int = 4):
    """Build the jitted multi-chip telemetry step.

    Returns fn(iq [S, T] CF or host complex, sharded (dp, sp)) ->
    (windows [S, max_hits, 5200] uint8, hit_corr, n_hits [S], n_bits [S])
    with outputs sharded over dp.
    """
    n_sp = mesh.shape["sp"]
    local = partial(_telemetry_local, rate=rate, tuning=tuning,
                    n_sp=n_sp, max_hits=max_hits)
    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dp", "sp"), P("dp", "sp")),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        check_vma=False,
    )
    jitted = jax.jit(smapped)

    def run(iq):
        iq = as_cf(iq)
        return jitted(iq.re, iq.im)

    return run


def sharded_spectrum(mesh: Mesh, rate: float, window: bool = True):
    """Batched FFT/PSD with blocks sharded over the whole mesh (pure DP:
    every block independent — fft.java's per-block transform at scale)."""

    def step(re, im):
        return spectrum_block(CF(re, im), rate=rate, window=window)

    sh = NamedSharding(mesh, P(("dp", "sp"), None))
    jitted = jax.jit(step, in_shardings=(sh, sh))

    def run(blocks):
        blocks = as_cf(blocks)
        return jitted(blocks.re, blocks.im)

    return run
