"""VMEM-resident bit-timing recovery kernel.

The decode tail's timing recovery (the TPU reformulation of
FUNcubeBPSKDemod.java:505-595 — see demod.bpsk._timing_parallel) is,
as XLA stages, ~1.7 ms device time at the bench shape: the EMA
trajectories, argmax schedule, slot extraction, last-valid fill and
e_out weighting each make full HBM passes over [S, 2G] intermediates.
This kernel runs the WHOLE chain in one VMEM residency per grid step:
one HBM read of the matched-filter stream, one write of the packed
(valid, bit) decisions plus the carried state.

Layout is the whole trick: the matched-filter stream arrives
PHASE-PLANAR [S, 8, G] (sample t = 8*g + p maps to [s, p, g]) so that

- bit-period groups g ride the 128 LANES: the constant-decay EMA
  y_g = a*y_{g-1} + b_g becomes, per (stream, phase) ROW, a chunked
  lower-triangular [128, 128] MXU contraction over lanes with a
  sequential chunk carry — no transposes anywhere;
- the 8 bit phases ride ROWS: the per-group argmax over phases and the
  peak/handoff slot extraction are 8-way unrolled row compares, a pure
  VPU stream;
- the last-valid propagation and the e_out suffix weighting are
  log2(G_BLK) lane-shift passes that never leave VMEM.

Grid = (streams/8, G blocks), ("parallel", "arbitrary"): every carried
recurrence (EMA carry, delayed argmax pipeline, inclusive fill, e_out)
chains across G blocks through scratch, exactly like the front-end
kernels chain their FIR halos. Decisions (valid, bit, peak schedule,
final state) equal demod.bpsk._timing_parallel's up to fp
reassociation inside the EMA (different chunk-carry composition);
selection arithmetic is identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

P_PHASES = 8           # samples (phases) per bit period
_ROWS = 8              # streams per grid step


def _timing_kernel(fi_ref, fq_ref, ema0_ref, misc_ref, tri_ref, pw_ref,
                   vb_ref, emaf_ref, miscf_ref, cema, cmisc, *,
                   g_len: int, g_blk: int, nb: int, e_last: int,
                   s1: float, s2: float, gate: float):
    """Mosaic-lowering notes: lane shifts are pltpu.roll + a lane-mask
    (unaligned vector concats are unsupported), single-lane reads are
    masked row reductions (1-lane slices create offset layouts most ops
    reject), and per-phase planes come from sublane-masked reductions of
    the merged [64, GB] view (strided sublane slicing is unsupported)."""
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = P_PHASES
    r = _ROWS * p
    j = pl.program_id(1)
    f32 = jnp.float32

    lane8 = lax.broadcasted_iota(jnp.int32, (_ROWS, g_blk), 1)

    def lane_at(x, k):
        # [8, GB] -> [8, 1]: value at lane k, as an offset-0 vector
        return jnp.sum(jnp.where(lane8 == k, x, 0.0), axis=1,
                       keepdims=True)

    def shift_r(x, s_, fill):
        # x[:, g-s_] at lane g; `fill` ([8, 1] or scalar) on lanes < s_
        return jnp.where(lane8 < s_, fill, pltpu.roll(x, s_, 1))

    @pl.when(j == 0)
    def _():
        cema[...] = ema0_ref[...]
        cmisc[...] = misc_ref[...]

    fi2 = fi_ref[...].reshape(r, g_blk)            # rows = 8*s + p
    fq2 = fq_ref[...].reshape(r, g_blk)
    e1f = fi2 * fi2 + fq2 * fq2                    # [64, GB]
    lane_r = lax.broadcasted_iota(jnp.int32, (r, g_blk), 1)
    mask_r = (j * g_blk + lane_r) < g_len
    b = jnp.where(mask_r, e1f * f32(s1), 0.0)

    # ---- EMA trajectories: ONE batched triangular matmul over all
    # 128-lane chunks (pw[l] = a^(l+1); tri[jj, l] = a^(l-jj) for
    # jj <= l) — [r*nk, 128] @ [128, 128] instead of nk serially-
    # dependent [r, 128] dots. The inter-chunk carry recurrence
    # z_k = x_k + a^128 * z_{k-1} (x_k = local_k[127]) resolves as a
    # log-depth sublane-roll scan, so the MXU never waits on a carry.
    # Matches _const_ema_trajectory up to carry-composition fp order
    # (tree instead of serial — same contract as before).
    lane128 = lax.broadcasted_iota(jnp.int32, (r, 128), 1)
    pw1 = jnp.max(pw_ref[...], axis=0, keepdims=True)        # [1, 128]
    nk = g_blk // 128
    b3 = b.reshape(r, nk, 128).reshape(r * nk, 128)  # row = nk*row_r + k
    local = jnp.dot(b3, tri_ref[...],
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=f32)              # [r*nk, 128]
    lanes = lax.broadcasted_iota(jnp.int32, (r * nk, 128), 1)
    x = jnp.broadcast_to(
        jnp.sum(jnp.where(lanes == 127, local, 0.0), axis=1,
                keepdims=True), (r * nk, 128))               # x_k, bcast
    cema_all = jnp.broadcast_to(cema[...].reshape(r, 1, 128),
                                (r, nk, 128)).reshape(r * nk, 128)
    k_idx = lax.broadcasted_iota(jnp.int32, (r * nk, 128), 0) % nk
    a = 1.0 - s1
    z = x + jnp.where(k_idx == 0, f32(a ** 128) * cema_all, 0.0)
    s_ = 1
    while s_ < nk:
        z = z + f32(a ** (128 * s_)) * jnp.where(
            k_idx >= s_, pltpu.roll(z, s_, 0), 0.0)
        s_ *= 2
    carry_in = jnp.where(k_idx == 0, cema_all, pltpu.roll(z, 1, 0))
    traj = (local + carry_in * pw1).reshape(r, nk, 128).reshape(r, g_blk)
    cema[...] = jnp.sum(
        jnp.where(k_idx == nk - 1, z, 0.0).reshape(r, nk, 128), axis=1)

    # ---- per-phase planes of the merged view ([8, GB] each): sublane-
    # masked reductions over the (s, p) row grouping
    rowp = lax.broadcasted_iota(jnp.int32, (r, g_blk), 0) % p

    def phase_planes(src2):
        return [jnp.sum(jnp.where(rowp == pp, src2, 0.0)
                        .reshape(_ROWS, p, g_blk), axis=1)
                for pp in range(p)]

    fi_p = phase_planes(fi2)
    fq_p = phase_planes(fq2)
    e1_p = phase_planes(e1f)
    tr_p = phase_planes(traj)

    # ---- per-group argmax over the 8 phases (first occurrence), and the
    # delayed peak pipeline: np0(g) = argmax(g-1), peak0(g) = np0(g-1),
    # seeded across steps/blocks from scratch (ts.new_peak / ts.peak).
    mx = tr_p[0]
    am = jnp.zeros((_ROWS, g_blk), jnp.int32)
    for pp in range(1, p):
        better = tr_p[pp] > mx
        am = jnp.where(better, jnp.int32(pp), am)
        mx = jnp.where(better, tr_p[pp], mx)
    misc = cmisc[...]
    mlane = lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 1)

    def misc_at(k):
        return jnp.sum(jnp.where(mlane == k, misc, 0.0), axis=1,
                       keepdims=True)

    np_seed, pk_seed = misc_at(0), misc_at(1)
    am_f = am.astype(f32)
    np0f = shift_r(am_f, 1, np_seed)
    pk0f = shift_r(np0f, 1, pk_seed)
    np0 = np0f.astype(jnp.int32)
    pk0 = pk0f.astype(jnp.int32)

    gmask = (j * g_blk + lane8) < g_len
    h = (pk0 + 4) % p
    on0 = (pk0 <= h) & gmask
    on1 = (np0 > h) & gmask

    # ---- slot extraction: value at the scheduled phase (8-way unrolled
    # select over the phase planes — a pure VPU stream)
    def at_phase(planes, idx):
        acc = jnp.zeros((_ROWS, g_blk), f32)
        for pp in range(p):
            acc = jnp.where(idx == pp, planes[pp], acc)
        return acc

    vi0 = at_phase(fi_p, pk0)
    vq0 = at_phase(fq_p, pk0)
    vi1 = at_phase(fi_p, np0)
    vq1 = at_phase(fq_p, np0)
    e1s0 = at_phase(e1_p, pk0)
    e1s1 = at_phase(e1_p, np0)

    # ---- last-valid fill over groups (group value = the LAST emitting
    # slot: slot1 if on1 else slot0), inclusive, log-shift, carried
    # across steps; the incoming carry is always available (the seed is
    # ts.last_iq, which stands in for "no prior emission").
    valg_i = jnp.where(on1, vi1, vi0)
    valg_q = jnp.where(on1, vq1, vq0)
    flag = on0 | on1
    yi = jnp.where(flag, valg_i, 0.0)
    yq = jnp.where(flag, valg_q, 0.0)
    fl = jnp.where(flag, 1.0, 0.0)
    s_ = 1
    while s_ < g_blk:
        filled = fl > 0.5
        yi = jnp.where(filled, yi, shift_r(yi, s_, 0.0))
        yq = jnp.where(filled, yq, shift_r(yq, s_, 0.0))
        fl = jnp.maximum(fl, shift_r(fl, s_, 0.0))
        s_ *= 2
    ci, cq = misc_at(2), misc_at(3)
    filled = fl > 0.5
    incl_i = jnp.where(filled, yi, ci)
    incl_q = jnp.where(filled, yq, cq)
    prev_i = shift_r(incl_i, 1, ci)
    prev_q = shift_r(incl_q, 1, cq)

    # ---- differential decisions for both slots (slot1's previous
    # emission is slot0 of the same group when that fired)
    p1i = jnp.where(on0, vi0, prev_i)
    p1q = jnp.where(on0, vq0, prev_q)
    di0 = -(prev_i * vi0 + prev_q * vq0)
    dq0 = prev_i * vq0 - prev_q * vi0
    di1 = -(p1i * vi1 + p1q * vq1)
    dq1 = p1i * vq1 - p1q * vi1
    e20 = jnp.sqrt(di0 * di0 + dq0 * dq0)
    e21 = jnp.sqrt(di1 * di1 + dq1 * dq1)
    # both slots pack into ONE i32 write (slot1 in bits 2-3): halves the
    # kernel's HBM output traffic; the wrapper unpacks with two ANDs
    vb_ref[...] = (jnp.where(on0 & (e20 > f32(gate)), 2, 0)
                   + jnp.where(di0 < 0.0, 1, 0)
                   + jnp.where(on1 & (e21 > f32(gate)), 8, 0)
                   + jnp.where(di1 < 0.0, 4, 0)).astype(jnp.int32)

    # ---- e_out: only the final value matters; chain
    # y' = d^K * y + sum_t on_t * s2 * e1_t * d^(emissions after t
    # in-step) with K = in-step emission count (exact algebra; see
    # _timing_parallel's closed form).
    on0f = on0.astype(f32)
    on1f = on1.astype(f32)
    cum = on0f + on1f
    s_ = 1
    while s_ < g_blk:
        cum = cum + shift_r(cum, s_, 0.0)
        s_ *= 2
    tot = lane_at(cum, g_blk - 1)                  # [8, 1]
    log_d = f32(np.log1p(-s2))
    after1 = tot - cum
    after0 = after1 + on1f
    contrib = (on0f * e1s0 * f32(s2) * jnp.exp(after0 * log_d)
               + on1f * e1s1 * f32(s2) * jnp.exp(after1 * log_d))
    eo_new = (jnp.exp(tot * log_d) * misc_at(4)
              + jnp.sum(contrib, axis=1, keepdims=True))     # [8, 1]

    mis = jnp.where(mlane == 0, lane_at(am_f, g_blk - 1), 0.0)
    mis = jnp.where(mlane == 1, lane_at(np0f, g_blk - 1), mis)
    mis = jnp.where(mlane == 2, lane_at(incl_i, g_blk - 1), mis)
    mis = jnp.where(mlane == 3, lane_at(incl_q, g_blk - 1), mis)
    mis = jnp.where(mlane == 4, eo_new, mis)
    cmisc[...] = mis

    # ---- final carried state, extracted at the STATIC true end lane of
    # the (only possibly ragged) last block
    el = e_last - 1

    @pl.when(j == nb - 1)
    def _():
        lane_g = lax.broadcasted_iota(jnp.int32, (r, g_blk), 1)
        ema_fin = jnp.sum(jnp.where(lane_g == el, traj, 0.0), axis=1,
                          keepdims=True)                     # [64, 1]
        emaf_ref[...] = jnp.broadcast_to(ema_fin, (r, 128))
        fin = jnp.where(mlane == 0, lane_at(np0f, el), 0.0)
        fin = jnp.where(mlane == 1, lane_at(am_f, el), fin)
        fin = jnp.where(mlane == 2, lane_at(incl_i, el), fin)
        fin = jnp.where(mlane == 3, lane_at(incl_q, el), fin)
        fin = jnp.where(mlane == 4, eo_new, fin)
        miscf_ref[...] = fin


@functools.partial(jax.jit,
                   static_argnames=("s1", "s2", "gate", "interpret"))
def _timing_recover_jit(fr, fi_, e_ema, peak, new_peak, e_out, last_iq,
                        s1, s2, gate, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, t_ds = fr.shape
    p = P_PHASES
    g = t_ds // p
    a = 1.0 - s1

    # phase-planar views: sample t = p*g' + p' -> [s, p', g']
    fpp_r = jnp.transpose(fr.reshape(s, g, p), (0, 2, 1))
    fpp_i = jnp.transpose(fi_.reshape(s, g, p), (0, 2, 1))

    rows = _ROWS
    pad_s = -s % rows
    if pad_s:
        zp = jnp.zeros((pad_s, p, g), fr.dtype)
        fpp_r = jnp.concatenate([fpp_r, zp])
        fpp_i = jnp.concatenate([fpp_i, zp])
        zs = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad_s, *x.shape[1:]), x.dtype)])
        e_ema, peak, new_peak, e_out, last_iq = map(
            zs, (e_ema, peak, new_peak, e_out, last_iq))
    sp = s + pad_s

    g_blk = min(2048, -(-g // 128) * 128)
    nb = -(-g // g_blk)
    g_pad = nb * g_blk
    if g_pad != g:
        zg = jnp.zeros((sp, p, g_pad - g), fr.dtype)
        fpp_r = jnp.concatenate([fpp_r, zg], axis=2)
        fpp_i = jnp.concatenate([fpp_i, zg], axis=2)
    e_last = g - (nb - 1) * g_blk

    ema0 = jnp.broadcast_to(
        e_ema.astype(jnp.float32).reshape(sp * p, 1), (sp * p, 128))
    misc_cols = jnp.stack(
        [new_peak.astype(jnp.float32), peak.astype(jnp.float32),
         last_iq[:, 0].astype(jnp.float32), last_iq[:, 1].astype(jnp.float32),
         e_out.astype(jnp.float32)], axis=1)                 # [sp, 5]
    misc = jnp.pad(misc_cols, ((0, 0), (0, 123)))

    k = np.arange(128)
    tri = np.where(k[:, None] <= k[None, :],
                   np.power(a, np.maximum(k[None, :] - k[:, None], 0)),
                   0.0).astype(np.float32)
    # pw rows are identical; the kernel reduces back to [1, 128] (an
    # 8-sublane input satisfies the f32 min tile)
    pw = np.broadcast_to(np.power(a, k + 1).astype(np.float32)[None, :],
                         (8, 128)).copy()

    kernel = functools.partial(
        _timing_kernel, g_len=g, g_blk=g_blk, nb=nb, e_last=e_last,
        s1=float(s1), s2=float(s2), gate=float(gate))
    vbp, emaf, miscf = pl.pallas_call(
        kernel,
        grid=(sp // rows, nb),
        in_specs=[
            pl.BlockSpec((rows, p, g_blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, p, g_blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows * p, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tri.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pw.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, g_blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows * p, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((sp, g_pad), jnp.int32),
            jax.ShapeDtypeStruct((sp * p, 128), jnp.float32),
            jax.ShapeDtypeStruct((sp, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rows * p, 128), jnp.float32),
                        pltpu.VMEM((rows, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(fpp_r, fpp_i, ema0, misc, jnp.asarray(tri), jnp.asarray(pw))

    vbp = vbp[:s, :g]
    vb = jnp.stack([vbp & 3, vbp >> 2], axis=2).reshape(s, 2 * g)
    valid = vb >= 2
    bit = (vb & 1) == 1
    e_ema_f = emaf[:s * p, 0].reshape(s, p)
    peak_f = miscf[:s, 0].astype(jnp.int32)
    new_peak_f = miscf[:s, 1].astype(jnp.int32)
    fin_iq = jnp.stack([miscf[:s, 2], miscf[:s, 3]], axis=1)
    e_out_f = miscf[:s, 4]
    return valid, bit, e_ema_f, peak_f, new_peak_f, e_out_f, fin_iq


def timing_recover_batch(mf_re, mf_im, e_ema, peak, new_peak, e_out,
                         last_iq, *, smooth1: float, smooth2: float,
                         gate: float, interpret: bool = False):
    """Batched bit-timing recovery over [S, T_ds] matched-filter rows.

    State arrays are the stacked TimingState fields (e_ema [S, 8],
    peak/new_peak [S] i32, e_out [S] f32, last_iq [S, 2]); ``pos`` is
    untouched by the recovery (see _timing_parallel). Returns
    (valid [S, 2G] bool, bit [S, 2G] bool, e_ema', peak', new_peak',
    e_out', last_iq') with the same slot ordering as
    vmap(_timing_parallel): slots (g, 0) and (g, 1) interleaved.
    """
    assert mf_re.shape[-1] % P_PHASES == 0
    return _timing_recover_jit(
        mf_re.astype(jnp.float32), mf_im.astype(jnp.float32),
        e_ema, peak, new_peak, e_out, last_iq,
        float(smooth1), float(smooth2), float(gate), bool(interpret))
