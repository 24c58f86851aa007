"""Sharded telemetry pipeline: the multi-chip "training step" of the
framework.

Sharding layout over a ("dp", "sp") mesh:

- streams (batch) partitioned over dp — N independent demod instances,
  each with its own traced tuning (jsdr.java:479-484)
- each stream's time axis partitioned over sp

The full-rate front-end (tuner mix -> decimating 27-tap FIR) is an
overlap-save computation: each time shard needs the 26 mixed samples
preceding it. That halo rides the ICI ring via one ``ppermute`` per
step — the TPU-native replacement for the reference's circular delay
buffers (FUNcubeBPSKDemod.java:467-468, 495-496). Shard 0's halo is the
CARRIED mixed-domain tail from the previous segment, so consecutive
sharded steps chain exactly like ``bpsk_block`` does and frames
straddling two step calls are found (the reference's rolling 5200-bit
window spans arbitrary time, FUNcubeBPSKDemod.java:503, 553-554).

The 9600 Hz tail of the chain (VCO mix -> matched filter -> bit-timing
-> sync search) needs the whole segment's decimated stream; it is
``rate/9600``-times decimated, so each dp row ``all_gather``s the
decimated output along sp (cheap) and runs the identical single-device
``_bpsk_post`` on the full segment with the full carried ``BpskState``.
sp ranks compute identical results — redundant FLOPs on a small
computation in exchange for zero cross-shard serialization and exact
state-chaining semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..demod import bpsk as B
from ..ops.cplx import CF, as_cf
from ..ops.fir import polyphase_decimate
from ..ops.spectrum import spectrum_block


def _mix_decimate_local(iq_loc: CF, ds_tail: CF, nu0, tu, *, rate: int,
                        n_sp: int):
    """Per-shard front-end inside shard_map: tuner mix + decimate with a
    26-sample mixed-domain ring halo. iq_loc: [s_loc, t_loc] planar.

    Returns (ds_loc [s_loc, t_loc//m], last26 [s_loc, 26] mixed — the
    would-be carried decimator tail of this shard)."""
    m = rate // B.DOWN_SAMPLE_RATE
    n_ds_tail = len(B.DS_FILTER) - 1                       # 26
    t_loc = iq_loc.shape[-1]
    assert t_loc % m == 0 and t_loc >= n_ds_tail, (t_loc, n_ds_tail)

    sp_idx = lax.axis_index("sp")
    # exact NCO numerator at this shard's first sample: the global
    # sample offset is sp_idx * t_loc (traced), folded mod rate in int32
    g0 = (sp_idx.astype(jnp.int32) * np.int32(t_loc % rate)) % rate
    nu_shard = (nu0.astype(jnp.int32)
                + B._modmul_traced(tu, g0, rate)) % rate    # [s_loc]

    # mix the local samples plus the 26-sample left extension; the
    # extension's raw samples come from the left neighbor via the ICI
    # ring (shard 0 receives the wrap — masked below)
    nums = B.nco_numerators(nu_shard, tu, n_ds_tail + t_loc, rate,
                            start=1 - n_ds_tail)
    c, s = B._num_to_cossin(nums, rate)
    on = (tu > 0)[..., None]
    perm = [(i, (i + 1) % n_sp) for i in range(n_sp)]
    halo = CF(lax.ppermute(iq_loc.re[..., -n_ds_tail:], "sp", perm),
              lax.ppermute(iq_loc.im[..., -n_ds_tail:], "sp", perm))
    ext = CF(jnp.concatenate([halo.re, iq_loc.re], axis=-1),
             jnp.concatenate([halo.im, iq_loc.im], axis=-1))
    mixed = CF(ext.re * jnp.where(on, c, 1.0),
               ext.im * jnp.where(on, s, 1.0))

    # shard 0's prehistory is the CARRIED mixed-domain tail; other
    # shards mixed their neighbor's halo themselves (numerators are
    # globally exact, so both agree bitwise with the chained single-
    # device mix)
    is0 = sp_idx == 0
    pre = CF(jnp.where(is0, ds_tail.re, mixed.re[..., :n_ds_tail]),
             jnp.where(is0, ds_tail.im, mixed.im[..., :n_ds_tail]))
    body = mixed[..., n_ds_tail:]
    ds, _ = polyphase_decimate(
        body, jnp.asarray(B.DS_FILTER.astype(np.float32)), m,
        tail=pre, gain=B.HOWARD_FUDGE_FACTOR)
    return ds, body[..., -n_ds_tail:]


def _telemetry_local(iq_re, iq_im, states: B.BpskState, tunings, *,
                     rate, n_sp, max_hits, compat_scan):
    """shard_map body: sharded front-end + gathered single-device tail."""
    iq_loc = CF(iq_re, iq_im)
    t_total = iq_loc.shape[-1] * n_sp
    sp_idx = lax.axis_index("sp")

    ds_loc, last26 = _mix_decimate_local(
        iq_loc, states.ds_tail, states.tu_phase, tunings,
        rate=rate, n_sp=n_sp)
    # gather the decimated stream: every sp rank sees the full segment
    ds = CF(lax.all_gather(ds_loc.re, "sp", axis=ds_loc.ndim - 1, tiled=True),
            lax.all_gather(ds_loc.im, "sp", axis=ds_loc.ndim - 1, tiled=True))

    # the segment's new carried tails (replicated to all sp ranks)
    last = (sp_idx == n_sp - 1).astype(last26.re.dtype)
    ds_tail = CF(lax.psum(last26.re * last, "sp"),
                 lax.psum(last26.im * last, "sp"))
    tu_phase = B._nco_advance(states.tu_phase, tunings, rate, t_total)

    post = partial(B._bpsk_post, t_len=t_total, max_hits=max_hits,
                   compat_scan=compat_scan)
    return jax.vmap(post)(ds, states, tu_phase, ds_tail, states.fft_tuner)


def sharded_telemetry_step(mesh: Mesh, rate: int = 96000, max_hits: int = 4,
                           compat_scan: bool = False):
    """Build the jitted multi-chip telemetry step with chained state.

    Returns fn(iq, states, tunings=None) ->
    (out: demod.bpsk.BpskBlockOut, new_states: demod.bpsk.BpskState)
    where iq is [S, T] (CF or host complex) sharded (dp, sp), states is
    a batched ``bpsk_init_batch`` pytree sharded over dp, and tunings is
    a host [S] array of per-stream NCO Hz (integral; defaults 12000).
    Consecutive calls chain bit-exactly like ``bpsk_block_batch`` —
    frames straddling two step calls are decoded.
    """
    n_sp = mesh.shape["sp"]
    local = partial(_telemetry_local, rate=rate, n_sp=n_sp,
                    max_hits=max_hits, compat_scan=compat_scan)
    dp = P("dp")
    state_specs = jax.tree.map(lambda _: dp, B.bpsk_init(B.BpskConfig()))
    out_specs = (jax.tree.map(lambda _: dp, B.BpskBlockOut(
        *([0] * len(B.BpskBlockOut._fields)))), state_specs)
    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dp", "sp"), P("dp", "sp"), state_specs, dp),
        out_specs=out_specs,
        check_vma=False,
    )
    jitted = jax.jit(smapped)

    def run(iq, states: B.BpskState, tunings=None):
        iq = as_cf(iq)
        if tunings is None:
            tunings = np.full(iq.shape[0], 12000)
        tun = np.asarray(tunings, np.float64)
        assert np.all(tun == np.round(tun)), \
            "sharded path needs integral tunings"
        tun_arr = np.maximum(tun, 0.0).astype(np.int32)
        return jitted(iq.re, iq.im, states, tun_arr)

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
