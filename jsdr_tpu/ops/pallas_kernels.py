"""Pallas TPU kernels for the display/observability hot path.

``psd_waterfall``: fused |X|^2 -> dBFS -> max-decimate -> waterfall
intensity. The unfused pipeline (ops.spectrum.psd_dbfs + host-side
display reduction) makes four passes over the spectrum and ships the
full-resolution PSD to the host; this kernel reads the spectrum once in
VMEM and emits both the dB PSD and the 8-bit display line, so only
width-sized lines leave the device for rendering.

Every kernel has a pure-jnp reference implementation used as fallback
(and as the correctness oracle in tests; the kernel also runs under
``interpret=True`` on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import CF, as_cf

_EPS = 1e-30
_INTENSITY = -2.55  # waterfall.java:92: 255 - psd * -2.55


def _psd_waterfall_ref(re: jnp.ndarray, im: jnp.ndarray, width: int):
    """jnp reference: [B, N] spectrum halves -> (psd_db [B, N],
    line [B, width] uint8)."""
    n = re.shape[-1]
    cf = (2.0 / n) ** 2
    power = (re * re + im * im) * cf
    db = 10.0 * jnp.log10(jnp.maximum(power, _EPS))
    step = n // width
    dec = jnp.max(db.reshape(*db.shape[:-1], width, step), axis=-1)
    inten = jnp.clip(255.0 - dec * _INTENSITY, 0.0, 255.0).astype(jnp.uint8)
    # centered frequency order (0 Hz mid-screen, waterfall.java:96-106)
    line = jnp.roll(inten, width // 2, axis=-1)
    return db, line


def _psd_waterfall_kernel(re_ref, im_ref, db_ref, line_ref, *, width: int):
    from jax.experimental import pallas as pl  # noqa: F401

    n = re_ref.shape[-1]
    cf = (2.0 / n) ** 2
    re = re_ref[...]
    im = im_ref[...]
    power = (re * re + im * im) * cf
    db = 10.0 * jnp.log10(jnp.maximum(power, _EPS))
    db_ref[...] = db
    step = n // width
    dec = jnp.max(db.reshape(db.shape[0], width, step), axis=-1)
    inten = jnp.clip(255.0 - dec * _INTENSITY, 0.0, 255.0)
    # centered order without jnp.roll (concat of the two halves)
    half = width // 2
    line_ref[...] = jnp.concatenate(
        [inten[:, half:], inten[:, :half]], axis=-1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("width", "use_pallas", "interpret"))
def _psd_waterfall_jit(re, im, width, use_pallas, interpret):
    b, n = re.shape
    if not use_pallas:
        return _psd_waterfall_ref(re, im, width)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = 8  # rows per grid step (f32 sublane tile)
    grid = ((b + rows - 1) // rows,)
    kernel = functools.partial(_psd_waterfall_kernel, width=width)
    db, line_f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n), jnp.float32),
            jax.ShapeDtypeStruct((b, width), jnp.float32),
        ],
        interpret=interpret,
    )(re, im)
    return db, line_f.astype(jnp.uint8)


def psd_waterfall(spec, width: int = 960,
                  use_pallas: bool = True, interpret: bool = False):
    """[B, N] spectrum (CF pair or complex) -> (psd_db [B, N] f32,
    line [B, width] u8). ``width`` must divide N."""
    spec = as_cf(spec)
    assert spec.shape[-1] % width == 0, "width must divide the FFT size"
    return _psd_waterfall_jit(spec.re.astype(jnp.float32),
                              spec.im.astype(jnp.float32),
                              width, use_pallas, interpret)


# ---------------------------------------------------------------------------
# Fused wide-layout spectrum: window + matmul FFT + dBFS PSD in one kernel.
#
# The streaming pipeline keeps IQ as [S, T] (time contiguous per stream);
# the spectrum wants [S*T/n, n] blocks. On TPU that reshape is a (8, 128)
# tile re-shuffle that XLA lowers at ~1/8 of HBM bandwidth — measured
# 14 ms extra on the 61 M-sample bench step. This kernel reads the wide
# rows directly (each n-sample block is a contiguous lane run), does the
# whole two-stage Cooley-Tukey FFT (n = n1 x 128) on the MXU in VMEM,
# and writes dB PSD in natural frequency order. One HBM read, one write.
# ---------------------------------------------------------------------------

_SPEC_ROWS = 8  # streams per grid step (f32 sublane tile)


def _bf16x3_dot(a, b, dn=None):
    """f32 matmul as THREE bf16 MXU passes (hi*hi + hi*lo + lo*hi).

    Mosaic offers only DEFAULT (one bf16 pass, ~3 dB-scale PSD error —
    unusable) and HIGHEST (six passes). The dropped lo*lo term is
    O(2^-16)^2 relative; measured on the 9600-bin spectrum: max 0.13 dB
    vs HIGHEST (mean 2.6e-4 dB), far below the display's own 0.39 dB
    waterfall quantization — at 27% less kernel time. Constants (DFT
    matrices) split exactly once at trace time."""
    import jax.lax as lax
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    bl = b - bh
    d = lax.Precision.DEFAULT
    if dn is None:
        f = lambda x, y: jnp.dot(x, y, precision=d,
                                 preferred_element_type=jnp.float32)
    else:
        f = lambda x, y: lax.dot_general(x, y, dn, precision=d,
                                         preferred_element_type=jnp.float32)
    return f(ah, bh) + f(ah, bl) + f(al, bh)


def _make_spec_dot(precision: str):
    import jax.lax as lax
    if precision == "bf16x3":
        return _bf16x3_dot
    if precision == "bf16":
        # single bf16 pass — ~2^-8 relative error; for perf attribution
        # experiments only, not a production default
        def dot1(a, b, dn=None):
            d = lax.Precision.DEFAULT
            if dn is None:
                return jnp.dot(a, b, precision=d,
                               preferred_element_type=jnp.float32)
            return lax.dot_general(a, b, dn, precision=d,
                                   preferred_element_type=jnp.float32)
        return dot1

    def dot(a, b, dn=None):
        if dn is None:
            return jnp.dot(a, b, precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        return lax.dot_general(a, b, dn, precision=lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    return dot


def _spec_stage1(ar, ai, w1r, w1i, w1s1, w1s2, *, precision: str):
    """Stage-1 Cooley-Tukey matmul for ONE row: B = W1 @ A with A the
    [n1, n2] lane-split row. Per-row because the [n1, n1] @ [n1, n2]
    contraction puts n1 in sublanes — batching rows would need a
    transpose Mosaic doesn't support. Karatsuba 3-product form when
    precision == "bf16x3" (see _spec_row)."""
    dot = _make_spec_dot(precision)
    if precision == "bf16x3":
        t0 = dot(w1r, ar + ai)
        return t0 - dot(w1s1, ai), t0 + dot(w1s2, ar)
    return (dot(w1r, ar) - dot(w1i, ai),
            dot(w1r, ai) + dot(w1i, ar))


def _spec_stage1_concat(a3r, a3i, w1r, w1i, w1s1, w1s2, *, precision: str):
    """Stage 1 for all 8 rows of one FFT block in one wide contraction.
    The rows' [n1, n2] lane-splits concatenate into ONE [n1, 8*n2]
    operand, so stage 1 is 3 (Karatsuba) MXU dots 8 tiles wide instead
    of 24 tile-narrow dots (the small-matmul wall); callers de-concat
    with aligned 128-lane slices (row r = lanes [r*n2, (r+1)*n2)). MXU
    rows are independent, so values are bit-identical to the per-row
    form on TPU (verified: bench/exp_r5_s1concat.py, dwf=0); ALL
    spectrum kernels use this form so they also agree bit-for-bit in
    CPU interpret mode, where dot blocking depends on operand width."""
    ar = jnp.concatenate([a3r[r] for r in range(_SPEC_ROWS)], axis=1)
    ai = jnp.concatenate([a3i[r] for r in range(_SPEC_ROWS)], axis=1)
    return _spec_stage1(ar, ai, w1r, w1i, w1s1, w1s2, precision=precision)


def _spec_stage1_to_scratch(a3r, a3i, w1r, w1i, w1s1, w1s2, sbr, sbi, *,
                            n1: int, n2: int, precision: str):
    """Lane-concat stage 1 (see _spec_stage1_concat) written into the
    batched-tail VMEM scratch."""
    br, bi = _spec_stage1_concat(a3r, a3i, w1r, w1i, w1s1, w1s2,
                                 precision=precision)
    for r in range(_SPEC_ROWS):
        sbr[r, :n1] = br[:, r * n2:(r + 1) * n2]
        sbi[r, :n1] = bi[:, r * n2:(r + 1) * n2]


def _spec_tail_batched(brv, biv, twr, twi, w2r, w2i, w2s1, w2s2, *,
                       n1: int, n2: int, q: int, precision: str):
    """Twiddle + stage 2 + PSD + waterfall-decimate + peak for ALL rows
    of a grid step at once, reading the [R, P, n2] stage-1 scratch
    (P = n1 padded to a sublane/decimation-aligned multiple, pad rows
    zero).

    [R, P, n2] -> [R*P, n2] is a free leading-dim merge, so stage 2 runs
    as 3 (Karatsuba) MXU dots of [R*P, n2] @ [n2, n2] instead of 3 per
    row, and every VPU pass (twiddle, |X|^2, decimation max, log10, peak
    reduction) issues once per step instead of R times — measured 11%
    step win on v5e (bench/exp_r4_spec3.py; the kernel is VPU-pass
    bound, see PERF.md). Zero pad rows are harmless everywhere: power
    >= 0 so they never win the peak max, and the decimated slice [:g]
    drops the pad groups (q | P by construction).

    Returns (wf [R, n1//q, n2] dB lines, mx [R] peak dB, idx [R] flat
    permuted argmax) with values and tie-break identical to the per-row
    _spec_row path."""
    import jax.lax as lax

    r_rows, p_pad, _ = brv.shape
    n = n1 * n2
    dot = _make_spec_dot(precision)
    cf = np.float32((2.0 / n) ** 2)
    dn = (((1,), (1,)), ((), ()))
    cr = brv * twr[None] - biv * twi[None]
    ci = brv * twi[None] + biv * twr[None]
    c2r = cr.reshape(r_rows * p_pad, n2)
    c2i = ci.reshape(r_rows * p_pad, n2)
    if precision == "bf16x3":
        t0 = dot(c2r + c2i, w2r, dn)
        dr = t0 - dot(c2i, w2s1, dn)
        di = t0 + dot(c2r, w2s2, dn)
    else:
        dr = dot(c2r, w2r, dn) - dot(c2i, w2i, dn)
        di = dot(c2r, w2i, dn) + dot(c2i, w2r, dn)
    power = ((dr * dr + di * di) * cf).reshape(r_rows, p_pad, n2)
    g = n1 // q
    dec = jnp.max(power.reshape(r_rows, p_pad // q, q, n2), axis=2)
    wf = 10.0 * jnp.log10(jnp.maximum(dec[:, :g], _EPS))
    col_max = jnp.max(power, axis=1)                        # [R, n2]
    col_arg = jnp.argmax(power, axis=1).astype(jnp.int32)   # first k1
    mx_raw = jnp.max(col_max, axis=1)                       # [R]
    lane = lax.broadcasted_iota(jnp.int32, (r_rows, n2), 1)
    cand = jnp.where(col_max == mx_raw[:, None],
                     col_arg * n2 + lane, jnp.int32(n1 * n2))
    mx = 10.0 * jnp.log10(jnp.maximum(mx_raw, _EPS))
    return wf, mx, jnp.min(cand, axis=1)


def _spec_pad_rows(n1: int, q: int) -> int:
    """Stage-1 scratch row count: n1 rounded up to a multiple of
    lcm(8, q) so the scratch is f32-sublane aligned AND the batched
    waterfall decimation reshape (q must divide P) stays legal."""
    import math

    align = 8 * q // math.gcd(8, q)
    return -(-n1 // align) * align


def _spectrum_wf_kernel(x_re, x_im, win, w1r, w1i, w1s1, w1s2,
                        twr, twi, w2r, w2i, w2s1, w2s2,
                        wf_ref, mx_ref, idx_ref, sbr, sbi, *, n1: int,
                        n2: int, p_pad: int, nblk_step: int,
                        precision: str, wf_group: int):
    """Waterfall-mode spectrum with the SCRATCH-BATCHED tail: stage 1
    stays per-row (its contraction puts n1 in sublanes), but writes into
    a [R, P, n2] VMEM scratch so the twiddle/stage-2/PSD/decimate/peak
    tail runs ONCE per FFT block over all 8 rows — 3 Karatsuba MXU dots
    of [R*P, n2] @ [n2, n2] instead of 24 of [n1, n2] @ [n2, n2] and 8x
    fewer VPU passes. Measured on v5e: 4.93 ms vs 5.39 ms per-row for
    the 64x960k bench shape (bench/exp_r4_spec3.py, blk4 + parallel/
    arbitrary grid semantics). twr/twi arrive zero-padded to [P, n2]."""
    n = n1 * n2
    if p_pad != n1:
        # pad rows must be zero under ANY grid-iteration order
        # (parallel dimension semantics may revisit a step) — zeroing
        # the tiny pad band every step is ~2 vector stores
        sbr[:, n1:] = jnp.zeros((_SPEC_ROWS, p_pad - n1, n2), jnp.float32)
        sbi[:, n1:] = jnp.zeros((_SPEC_ROWS, p_pad - n1, n2), jnp.float32)
    for b in range(nblk_step):
        a3r = (x_re[:, b * n:(b + 1) * n] * win[...]).reshape(
            _SPEC_ROWS, n1, n2)
        a3i = (x_im[:, b * n:(b + 1) * n] * win[...]).reshape(
            _SPEC_ROWS, n1, n2)
        _spec_stage1_to_scratch(a3r, a3i, w1r[...], w1i[...], w1s1[...],
                                w1s2[...], sbr, sbi, n1=n1, n2=n2,
                                precision=precision)
        wf, mx, idx = _spec_tail_batched(
            sbr[...], sbi[...], twr[...], twi[...], w2r[...], w2i[...],
            w2s1[...], w2s2[...], n1=n1, n2=n2, q=wf_group,
            precision=precision)
        wf_ref[b] = wf
        mx_ref[b] = jnp.broadcast_to(mx[:, None], (_SPEC_ROWS, 128))
        idx_ref[b] = jnp.broadcast_to(idx[:, None], (_SPEC_ROWS, 128))


@functools.partial(jax.jit,
                   static_argnames=("n", "window", "interpret", "precision",
                                    "wf_group"))
def _spectrum_fused_jit(re, im, n, window, interpret, precision="bf16x3",
                        wf_group=0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .mxu_fft import _dft_mats, _twiddles
    from .windows import hamming_np

    s, t = re.shape
    n2 = 128
    n1 = n // n2
    nblk = t // n
    w1r, w1i = _dft_mats(n1, -1.0)
    twr, twi = _twiddles(n1, n2, -1.0)
    w2r, w2i = _dft_mats(n2, -1.0)
    # host-precomputed Karatsuba weight sums (exact f32 of the f64 sums)
    w1s1 = (w1r.astype(np.float64) + w1i.astype(np.float64)).astype(np.float32)
    w1s2 = (w1i.astype(np.float64) - w1r.astype(np.float64)).astype(np.float32)
    w2s1 = (w2r.astype(np.float64) + w2i.astype(np.float64)).astype(np.float32)
    w2s2 = (w2i.astype(np.float64) - w2r.astype(np.float64)).astype(np.float32)
    win = (hamming_np(n) if window else np.ones(n)).astype(np.float32)

    rows = _SPEC_ROWS
    pad_s = -s % rows
    if pad_s:
        zp = jnp.zeros((pad_s, t), re.dtype)
        re = jnp.concatenate([re, zp])
        im = jnp.concatenate([im, zp])
    sp = s + pad_s

    const = lambda z: pl.BlockSpec(z.shape, lambda i, j: (0,) * z.ndim,
                                   memory_space=pltpu.VMEM)
    # both modes run the SAME scratch-batched kernel (multi-block
    # grid steps, parallel/arbitrary semantics — measured winner,
    # exp_r4_spec3); full-PSD mode is decimation group q=1, so the
    # waterfall output is bit-exactly the full PSD max-decimated on
    # every backend (one expression graph, not two)
    wf_group = wf_group or 1
    n1_out = n1 // wf_group
    p_pad = _spec_pad_rows(n1, wf_group)
    twr_p = np.zeros((p_pad, n2), np.float32)
    twi_p = np.zeros((p_pad, n2), np.float32)
    twr_p[:n1], twi_p[:n1] = twr, twi
    twr, twi = twr_p, twi_p
    nblk_step = next(k for k in (4, 2, 1) if nblk % k == 0)
    consts = [jnp.asarray(win[None, :])] + [
        jnp.asarray(z) for z in (w1r, w1i, w1s1, w1s2, twr, twi,
                                 w2r, w2i, w2s1, w2s2)]
    kernel = functools.partial(
        _spectrum_wf_kernel, n1=n1, n2=n2, p_pad=p_pad,
        nblk_step=nblk_step, precision=precision, wf_group=wf_group)
    wf, mx, idx = pl.pallas_call(
        kernel,
        grid=(sp // rows, nblk // nblk_step),
        in_specs=[
            pl.BlockSpec((rows, n * nblk_step), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, n * nblk_step), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ] + [const(z) for z in consts],
        out_specs=[
            pl.BlockSpec((nblk_step, rows, n1_out, n2),
                         lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk_step, rows, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk_step, rows, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk, sp, n1_out, n2), jnp.float32),
            jax.ShapeDtypeStruct((nblk, sp, 128), jnp.float32),
            jax.ShapeDtypeStruct((nblk, sp, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, p_pad, n2), jnp.float32),
                        pltpu.VMEM((rows, p_pad, n2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(re, im, *consts)
    # [nblk, S, k1(/q), k2] permuted order + per-block peak
    return wf[:, :s], mx[:, :s, 0], idx[:, :s, 0]


def spectrum_fused(iq, n: int, window: bool = True,
                   interpret: bool = False,
                   precision: str = "bf16x3",
                   with_peaks: bool = False):
    """Fused window+FFT+PSD (+ peak search) over contiguous time rows.

    iq: CF (or complex) [S, T] with T % n == 0 and n % 128 == 0.
    Returns dB PSD as [T//n, S, n1, 128] in PERMUTED frequency order:
    element [..., k1, k2] is natural frequency bin n1*k2 + k1 (the raw
    two-stage Cooley-Tukey output order; Mosaic cannot flatten the
    digit-reversal in-kernel). Use :func:`spectrum_natural_order` or
    index arithmetic to recover natural bins — peak search and display
    decimation work directly on the permuted layout.

    ``with_peaks=True`` additionally returns (peak_db [T//n, S],
    flat permuted argmax [T//n, S] int32) computed INSIDE the kernel
    while the PSD is still in VMEM — identical values and tie-break to
    ``jnp.argmax`` over the flattened PSD, without a second HBM pass
    over the full-resolution spectrum.

    ``precision``: "bf16x3" (default — three bf16 Karatsuba MXU passes,
    <=0.04 dB PSD deviation) or "highest" (six-pass XLA-exact f32
    4-product form) for strict numeric comparisons.
    """
    iq = as_cf(iq)
    s, t = iq.shape
    assert t % n == 0 and n % 128 == 0 and n // 128 <= 512
    psd, mx, idx = _spectrum_fused_jit(iq.re.astype(jnp.float32),
                                       iq.im.astype(jnp.float32),
                                       n, window, interpret, precision)
    return (psd, mx, idx) if with_peaks else psd


def spectrum_natural_order(psd_perm: jnp.ndarray) -> jnp.ndarray:
    """[nblk, S, n1, n2] permuted PSD -> [S, nblk, n] natural order
    (one XLA transpose — use only on display/compat paths)."""
    nblk, s, n1, n2 = psd_perm.shape
    return jnp.transpose(psd_perm, (1, 0, 3, 2)).reshape(s, nblk, n1 * n2)


def wf_group_for(n: int, max_width: int = 2048) -> int:
    """Smallest divisor q of n1 = n//128 with (n1//q)*128 <= max_width
    (the in-kernel waterfall decimation group; 96 k -> q=5 / width 1920,
    192 k -> q=10 / width 1920)."""
    n1 = n // 128
    for q in range(1, n1 + 1):
        if n1 % q == 0 and (n1 // q) * 128 <= max_width:
            return q
    return n1


def spectrum_waterfall(iq, n: int, window: bool = True,
                       interpret: bool = False,
                       precision: str = "bf16x3",
                       max_width: int = 2048):
    """Fused window+FFT+PSD -> DISPLAY-decimated dB lines + peaks, never
    materializing the full PSD in HBM.

    The waterfall display max-decimates the PSD to screen width before
    the intensity map (waterfall.java:90-107 after fft.java's per-pixel
    max, fft.java:142-150); this kernel performs that max-decimation
    while the PSD is still in VMEM. Decimation rides the permuted
    layout: natural bin = n1*k2 + k1, so a group of q consecutive k1 at
    fixed k2 is q consecutive natural bins and the group-max IS a
    natural-order decimation (q = ``wf_group_for(n, max_width)``,
    width = (n1//q)*128).

    Returns (wf [T//n, S, n1//q, 128] dB f32, peak_db [T//n, S],
    flat permuted argmax [T//n, S]). Display pixel p = (n1//q)*k2 + g;
    use :func:`waterfall_natural_order` to flatten, then
    ``ops.spectrum.waterfall_intensity`` (monotone, so max-then-map
    equals map-then-max) and any further 2x max-decimation to narrower
    screens stays exact (max is associative)."""
    iq = as_cf(iq)
    s, t = iq.shape
    assert t % n == 0 and n % 128 == 0 and n // 128 <= 512
    q = wf_group_for(n, max_width)
    return _spectrum_fused_jit(iq.re.astype(jnp.float32),
                               iq.im.astype(jnp.float32),
                               n, window, interpret, precision, wf_group=q)


def waterfall_natural_order(wf: jnp.ndarray) -> jnp.ndarray:
    """[nblk, S, G, n2] decimated lines -> [S, nblk, G*n2] natural pixel
    order (pixel p = G*k2 + g; tiny XLA transpose at display cadence)."""
    nblk, s, g, n2 = wf.shape
    return jnp.transpose(wf, (1, 0, 3, 2)).reshape(s, nblk, g * n2)


# ---------------------------------------------------------------------------
# Fused tuner-mix + decimating-FIR front-end.
#
# The telemetry chain's dominant HBM cost is the full-rate pass: NCO mix
# (FUNcubeBPSKDemod.java:382-397) followed by the 27-tap decimate-by-M
# FIR (:470-492). Unfused, XLA reads/writes the 96 kS/s stream several
# times (mix output, im2col, matmul input); this kernel reads the raw IQ
# rows once, applies the quantized-table mix as a broadcast of a
# 128-lane periodic pattern (the NCO table index sequence is exactly
# periodic for rational tuning/rate — see bpsk._nco_pattern), and runs
# the decimation as one banded MXU matmul per chunk, entirely in VMEM.
# One HBM read of the input, one write of the M-times-smaller output.
# ---------------------------------------------------------------------------

_MD_ROWS = 8          # streams per grid step (f32 sublane tile)
_MD_HALO = 128        # lane-tile-aligned prehistory carried per chunk
_MD_CHUNK_OUT = 1280  # decimated outputs per chunk (K=10 window tiles)


def _dec_tapmat(taps: np.ndarray, m: int, gain: float) -> np.ndarray:
    """Banded tap matrix for one 128-output window of the fused kernel.

    With w = [halo(128) ++ mixed(chunk)], output o of window k reads
    w[128*m*k + j] against T[j, o] = gain*taps[m*o + m + 127 - j]
    (zero outside [0, ntaps)). Shape [128*(m+1), 128]."""
    ntaps = len(taps)
    assert ntaps <= 128 + m, "tap count exceeds the carried halo"
    j = np.arange(128 * (m + 1))[:, None]
    o = np.arange(128)[None, :]
    a = m * o + m + 127 - j
    ok = (a >= 0) & (a < ntaps)
    return np.where(ok, np.asarray(taps)[np.where(ok, a, 0)] * gain,
                    0.0).astype(np.float32)


def _mix_decimate_kernel(xr_ref, xi_ref, t0r_ref, t0i_ref, cos_ref, sin_ref,
                         tap_ref, or_ref, oi_ref, tlr_ref, tli_ref,
                         hr_ref, hi_ref, *, m: int, t_len: int, nb: int,
                         precision: str = "highest"):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    wp = xr_ref.shape[-1]                 # chunk span = _MD_CHUNK_OUT * m
    k_tiles = _MD_CHUNK_OUT // 128
    j = pl.program_id(1)

    # chunk 0 seeds the mixed-domain halo from the carried state tail;
    # later chunks reuse the scratch left by the previous grid step
    # (TPU grids execute sequentially, minor dimension fastest)
    @pl.when(j == 0)
    def _():
        hr_ref[...] = t0r_ref[...]
        hi_ref[...] = t0i_ref[...]

    lane = lax.broadcasted_iota(jnp.int32, (_MD_ROWS, wp), 1)
    mask = (j * wp + lane) < t_len        # ragged last chunk -> zeros
    # periodic-pattern mix: broadcast the [8, 128] table across the chunk
    x3r = xr_ref[...].reshape(_MD_ROWS, wp // 128, 128)
    x3i = xi_ref[...].reshape(_MD_ROWS, wp // 128, 128)
    mr = (x3r * cos_ref[...][:, None, :]).reshape(_MD_ROWS, wp)
    mi = (x3i * sin_ref[...][:, None, :]).reshape(_MD_ROWS, wp)
    wr = jnp.concatenate([hr_ref[...], jnp.where(mask, mr, 0.0)], axis=1)
    wi = jnp.concatenate([hi_ref[...], jnp.where(mask, mi, 0.0)], axis=1)
    # stack the K window tiles (and both planes) into ONE banded matmul
    span = 128 * (m + 1)
    parts = [wr[:, 128 * m * k: 128 * m * k + span] for k in range(k_tiles)]
    parts += [wi[:, 128 * m * k: 128 * m * k + span] for k in range(k_tiles)]
    wall = jnp.concatenate(parts, axis=0)           # [2K*8, span]
    # real taps x complex data is already the minimal 1-matmul form (both
    # planes stacked); bf16x3 (see _bf16x3_dot) halves the MXU passes vs
    # Mosaic's six-pass HIGHEST f32 emulation at O(2^-32) relative error
    dot = _make_spec_dot(precision)
    y = dot(wall, tap_ref[...])                     # [2K*8, 128]
    y4 = y.reshape(2, k_tiles, _MD_ROWS, 128)
    or_ref[...] = jnp.moveaxis(y4[0], 0, 1).reshape(_MD_ROWS, _MD_CHUNK_OUT)
    oi_ref[...] = jnp.moveaxis(y4[1], 0, 1).reshape(_MD_ROWS, _MD_CHUNK_OUT)
    # hand the chunk's last 128 mixed samples to the next grid step
    hr_ref[...] = wr[:, wp:wp + 128]
    hi_ref[...] = wi[:, wp:wp + 128]

    # the carried-tail output comes from the final chunk, whose valid
    # region ends at the STATIC lane offset e_last
    e_last = t_len - (nb - 1) * wp

    @pl.when(j == nb - 1)
    def _():
        tlr_ref[...] = wr[:, e_last:e_last + 128]
        tli_ref[...] = wi[:, e_last:e_last + 128]


def _mix_decimate_ref(iq: CF, cos_pat, sin_pat, taps, m: int,
                      tail: CF, gain: float):
    """jnp oracle: tile the [S, 128] pattern, mix, run the banded-matmul
    polyphase decimator (same math as ops.fir.polyphase_decimate)."""
    from .fir import polyphase_decimate

    s, t = iq.shape
    reps = -(-t // 128)
    cos_full = jnp.tile(cos_pat, (1, reps))[:, :t]
    sin_full = jnp.tile(sin_pat, (1, reps))[:, :t]
    mixed = CF(iq.re * cos_full, iq.im * sin_full)
    return polyphase_decimate(mixed, jnp.asarray(taps, jnp.float32), m,
                              tail=tail, gain=gain)


@functools.partial(jax.jit, static_argnames=("m", "gain", "use_pallas",
                                             "interpret", "precision"))
def _mix_decimate_jit(xr, xi, cos_pat, sin_pat, taps, tapmat, tail_r, tail_i,
                      m, gain, use_pallas, interpret, precision):
    if not use_pallas and not interpret:
        y, new_tail = _mix_decimate_ref(
            CF(xr, xi), cos_pat, sin_pat, taps, m, CF(tail_r, tail_i), gain)
        return y.re, y.im, new_tail.re, new_tail.im

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, t = xr.shape
    ntaps = taps.shape[0]
    wp = _MD_CHUNK_OUT * m
    nb = -(-t // wp)
    rows = _MD_ROWS
    pad_s = -s % rows
    if pad_s:
        zr = jnp.zeros((pad_s, t), xr.dtype)
        xr, xi = jnp.concatenate([xr, zr]), jnp.concatenate([xi, zr])
        zp = jnp.zeros((pad_s, 128), xr.dtype)
        cos_pat = jnp.concatenate([cos_pat, zp])
        sin_pat = jnp.concatenate([sin_pat, zp])
        zt = jnp.zeros((pad_s, ntaps - 1), xr.dtype)
        tail_r = jnp.concatenate([tail_r, zt])
        tail_i = jnp.concatenate([tail_i, zt])
    sp = s + pad_s

    # carried state tail, zero-padded into the 128-lane halo layout
    t0r = jnp.pad(tail_r, ((0, 0), (128 - (ntaps - 1), 0)))
    t0i = jnp.pad(tail_i, ((0, 0), (128 - (ntaps - 1), 0)))

    kernel = functools.partial(_mix_decimate_kernel, m=m, t_len=t, nb=nb,
                               precision=precision)
    yr, yi, tlr, tli = pl.pallas_call(
        kernel,
        grid=(sp // rows, nb),
        in_specs=[
            pl.BlockSpec((rows, wp), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, wp), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tapmat.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, _MD_CHUNK_OUT), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _MD_CHUNK_OUT), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((sp, nb * _MD_CHUNK_OUT), jnp.float32),
            jax.ShapeDtypeStruct((sp, nb * _MD_CHUNK_OUT), jnp.float32),
            jax.ShapeDtypeStruct((sp, 128), jnp.float32),
            jax.ShapeDtypeStruct((sp, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32),
                        pltpu.VMEM((rows, 128), jnp.float32)],
        interpret=interpret,
    )(xr, xi, t0r, t0i, cos_pat, sin_pat, tapmat)
    n_out = t // m
    yr, yi = yr[:s, :n_out], yi[:s, :n_out]
    # new mixed-domain tail = last ntaps-1 valid mixed samples
    return yr, yi, tlr[:s, 128 - (ntaps - 1):], tli[:s, 128 - (ntaps - 1):]


# ---------------------------------------------------------------------------
# Merged spectrum + telemetry front end: ONE pass over the raw input.
#
# The flagship step runs BOTH the display spectrum (fft.java work) and
# the telemetry front end (FUNcubeBPSKDemod mix+decimate) over the same
# full-rate stream; as separate kernels each reads the whole input from
# HBM (~0.9 ms per pass at the bench shapes). This kernel computes both
# from one VMEM residency. The chunk geometry lines up at EVERY decim
# factor m: the FFT block is rate/10 = 960*m samples and the decimation
# sub-chunk is 1280*m, so LCM = 3840*m = 4 FFT blocks = 3 sub-chunks.
# ---------------------------------------------------------------------------

_SF_BLOCKS = 4        # FFT blocks per grid step (96 k geometry)
_SF_SUBCH = 3         # decimation sub-chunks per grid step


def sf_geometry(n: int, m: int) -> tuple[int, int]:
    """Merged-kernel grid geometry: (FFT blocks per grid step, decimated
    outputs per sub-chunk). blocks*n == 3*sub_out*m holds for both
    because n == 960*m (n = rate/10, m = rate/9600). The 4-block /
    1280-out form measures fastest at 96 k, but its m=20 (192 k) input
    chunk (4*19200 samples x 8 rows x 2 planes, double-buffered)
    overflows v5e's ~16 MB VMEM — 192 k drops to 2 blocks / 640-out
    sub-chunks (same per-step structure, half the resident chunk)."""
    return (4, 1280) if 4 * n <= 40_000 else (2, 640)


def _spec_front_kernel(xr_ref, xi_ref, t0r_ref, t0i_ref, cos_ref, sin_ref,
                       win, w1r, w1i, w1s1, w1s2, twr, twi,
                       w2r, w2i, w2s1, w2s2, tap_ref,
                       wf_ref, mx_ref, idx_ref, or_ref, oi_ref,
                       tlr_ref, tli_ref, hr_ref, hi_ref, sbr, sbi, *,
                       m: int, n1: int, n2: int, nb: int, p_pad: int,
                       sf_blocks: int, sub_out: int,
                       precision: str, wf_group: int):
    from jax.experimental import pallas as pl

    n = n1 * n2
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        hr_ref[...] = t0r_ref[...]
        hi_ref[...] = t0i_ref[...]

    # ---- spectrum over the raw rows, one FFT block at a time (the
    # [rows, n] -> [rows, n1, n2] lane split is the supported cast).
    # Stage 1 per row into the [R, P, n2] scratch; the twiddle/stage-2/
    # PSD/decimate/peak tail runs batched once per block (see
    # _spectrum_wf_kernel / _spec_tail_batched; twr/twi are P-padded).
    if p_pad != n1:
        sbr[:, n1:] = jnp.zeros((_SPEC_ROWS, p_pad - n1, n2), jnp.float32)
        sbi[:, n1:] = jnp.zeros((_SPEC_ROWS, p_pad - n1, n2), jnp.float32)
    for b in range(sf_blocks):
        a3r = (xr_ref[:, b * n:(b + 1) * n] * win[...]).reshape(
            _SPEC_ROWS, n1, n2)
        a3i = (xi_ref[:, b * n:(b + 1) * n] * win[...]).reshape(
            _SPEC_ROWS, n1, n2)
        _spec_stage1_to_scratch(a3r, a3i, w1r[...], w1i[...], w1s1[...],
                                w1s2[...], sbr, sbi, n1=n1, n2=n2,
                                precision=precision)
        wf, mx, idx = _spec_tail_batched(
            sbr[...], sbi[...], twr[...], twi[...], w2r[...], w2i[...],
            w2s1[...], w2s2[...], n1=n1, n2=n2, q=wf_group,
            precision=precision)
        wf_ref[b] = wf
        mx_ref[b] = jnp.broadcast_to(mx[:, None], (_SPEC_ROWS, 128))
        idx_ref[b] = jnp.broadcast_to(idx[:, None], (_SPEC_ROWS, 128))

    # ---- tuner mix + decimating FIR (same math as _mix_decimate_kernel,
    # whole chunks only: the wrapper enforces the 3840*m geometry).
    # Mixed samples materialize ONE sub-chunk at a time — the live
    # working set stays ~1/3 of the chunk, which keeps the m=20 (192 k)
    # geometry inside VMEM; the running halo scratch chains sub-chunks
    # exactly like it chains grid steps.
    wsub = sub_out * m
    span = 128 * (m + 1)
    dot = _make_spec_dot(precision)
    k_tiles = sub_out // 128
    for k3 in range(_SF_SUBCH):
        x3r = xr_ref[:, k3 * wsub:(k3 + 1) * wsub].reshape(
            _SPEC_ROWS, wsub // 128, 128)
        x3i = xi_ref[:, k3 * wsub:(k3 + 1) * wsub].reshape(
            _SPEC_ROWS, wsub // 128, 128)
        mr = (x3r * cos_ref[...][:, None, :]).reshape(_SPEC_ROWS, wsub)
        mi = (x3i * sin_ref[...][:, None, :]).reshape(_SPEC_ROWS, wsub)
        wr = jnp.concatenate([hr_ref[...], mr], axis=1)
        wi = jnp.concatenate([hi_ref[...], mi], axis=1)
        parts = [wr[:, 128 * m * k: 128 * m * k + span]
                 for k in range(k_tiles)]
        parts += [wi[:, 128 * m * k: 128 * m * k + span]
                  for k in range(k_tiles)]
        wall = jnp.concatenate(parts, axis=0)           # [2K*8, span]
        y = dot(wall, tap_ref[...])                     # [2K*8, 128]
        y4 = y.reshape(2, k_tiles, _SPEC_ROWS, 128)
        sl = slice(sub_out * k3, sub_out * (k3 + 1))
        or_ref[:, sl] = jnp.moveaxis(y4[0], 0, 1).reshape(
            _SPEC_ROWS, sub_out)
        oi_ref[:, sl] = jnp.moveaxis(y4[1], 0, 1).reshape(
            _SPEC_ROWS, sub_out)
        # hand the sub-chunk's last 128 mixed samples onward
        hr_ref[...] = wr[:, wsub:wsub + 128]
        hi_ref[...] = wi[:, wsub:wsub + 128]

    @pl.when(j == nb - 1)
    def _():
        tlr_ref[...] = hr_ref[...]
        tli_ref[...] = hi_ref[...]


@functools.partial(jax.jit, static_argnames=("n", "m", "gain", "window",
                                             "use_pallas", "interpret",
                                             "precision", "wf_group"))
def _spec_front_jit(xr, xi, cos_pat, sin_pat, taps, tapmat, tail_r, tail_i,
                    n, m, gain, window, use_pallas, interpret, precision,
                    wf_group):
    if not use_pallas and not interpret:
        # staged fallback: interpreted spectrum kernel + jnp front end
        wf, mx, idx = _spectrum_fused_jit(xr, xi, n, window, True,
                                          precision, wf_group)
        y, new_tail = _mix_decimate_ref(
            CF(xr, xi), cos_pat, sin_pat, taps, m, CF(tail_r, tail_i), gain)
        return wf, mx, idx, y.re, y.im, new_tail.re, new_tail.im

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .mxu_fft import _dft_mats, _twiddles
    from .windows import hamming_np

    s, t = xr.shape
    n2 = 128
    n1 = n // n2
    sf_blocks, sub_out = sf_geometry(n, m)
    chunk = sf_blocks * n
    assert chunk == _SF_SUBCH * sub_out * m
    nb = t // chunk
    nblk = t // n
    w1r, w1i = _dft_mats(n1, -1.0)
    twr, twi = _twiddles(n1, n2, -1.0)
    w2r, w2i = _dft_mats(n2, -1.0)
    w1s1 = (w1r.astype(np.float64) + w1i.astype(np.float64)).astype(np.float32)
    w1s2 = (w1i.astype(np.float64) - w1r.astype(np.float64)).astype(np.float32)
    w2s1 = (w2r.astype(np.float64) + w2i.astype(np.float64)).astype(np.float32)
    w2s2 = (w2i.astype(np.float64) - w2r.astype(np.float64)).astype(np.float32)
    win = (hamming_np(n) if window else np.ones(n)).astype(np.float32)
    ntaps = taps.shape[0]

    rows = _SPEC_ROWS
    pad_s = -s % rows
    if pad_s:
        zr = jnp.zeros((pad_s, t), xr.dtype)
        xr, xi = jnp.concatenate([xr, zr]), jnp.concatenate([xi, zr])
        zp = jnp.zeros((pad_s, 128), xr.dtype)
        cos_pat = jnp.concatenate([cos_pat, zp])
        sin_pat = jnp.concatenate([sin_pat, zp])
        zt = jnp.zeros((pad_s, ntaps - 1), xr.dtype)
        tail_r = jnp.concatenate([tail_r, zt])
        tail_i = jnp.concatenate([tail_i, zt])
    sp = s + pad_s
    t0r = jnp.pad(tail_r, ((0, 0), (128 - (ntaps - 1), 0)))
    t0i = jnp.pad(tail_i, ((0, 0), (128 - (ntaps - 1), 0)))

    g_out = n1 // wf_group if wf_group else n1
    p_pad = _spec_pad_rows(n1, wf_group)
    twr_p = np.zeros((p_pad, n2), np.float32)
    twi_p = np.zeros((p_pad, n2), np.float32)
    twr_p[:n1], twi_p[:n1] = twr, twi
    const = lambda z: pl.BlockSpec(z.shape, lambda i, j: (0,) * z.ndim,
                                   memory_space=pltpu.VMEM)
    consts = [jnp.asarray(win[None, :])] + [
        jnp.asarray(z) for z in (w1r, w1i, w1s1, w1s2, twr_p, twi_p,
                                 w2r, w2i, w2s1, w2s2)]
    row128 = lambda: pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                                  memory_space=pltpu.VMEM)
    kernel = functools.partial(_spec_front_kernel, m=m, n1=n1, n2=n2,
                               nb=nb, p_pad=p_pad, sf_blocks=sf_blocks,
                               sub_out=sub_out, precision=precision,
                               wf_group=wf_group)
    wf, mx, idx, yr, yi, tlr, tli = pl.pallas_call(
        kernel,
        grid=(sp // rows, nb),
        in_specs=[
            pl.BlockSpec((rows, chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            row128(), row128(), row128(), row128(),
        ] + [const(z) for z in consts] + [
            pl.BlockSpec(tapmat.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((sf_blocks, rows, g_out, n2),
                         lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sf_blocks, rows, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sf_blocks, rows, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _SF_SUBCH * sub_out),
                         lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _SF_SUBCH * sub_out),
                         lambda i, j: (i, j), memory_space=pltpu.VMEM),
            row128(), row128(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk, sp, g_out, n2), jnp.float32),
            jax.ShapeDtypeStruct((nblk, sp, 128), jnp.float32),
            jax.ShapeDtypeStruct((nblk, sp, 128), jnp.int32),
            jax.ShapeDtypeStruct((sp, t // m), jnp.float32),
            jax.ShapeDtypeStruct((sp, t // m), jnp.float32),
            jax.ShapeDtypeStruct((sp, 128), jnp.float32),
            jax.ShapeDtypeStruct((sp, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32),
                        pltpu.VMEM((rows, 128), jnp.float32),
                        pltpu.VMEM((rows, p_pad, n2), jnp.float32),
                        pltpu.VMEM((rows, p_pad, n2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xr, xi, t0r, t0i, cos_pat, sin_pat, *consts, tapmat)
    return (wf[:, :s], mx[:, :s, 0], idx[:, :s, 0], yr[:s], yi[:s],
            tlr[:s, 128 - (ntaps - 1):], tli[:s, 128 - (ntaps - 1):])


def spectrum_front_fused(iq: CF, n: int, cos_pat, sin_pat, taps, m: int,
                         tail: CF, gain: float = 1.0, window: bool = True,
                         use_pallas: bool | None = None,
                         interpret: bool = False,
                         precision: str = "bf16x3",
                         max_width: int = 2048):
    """Merged waterfall-spectrum + tuner-mix + decimating-FIR over [S, T]
    stream rows — ONE HBM read of the full-rate input for both consumers.

    Requires T to be a multiple of ``sf_geometry(n, m)[0] * n`` (the
    grid-step chunk: a whole number of FFT blocks = 3 decimation
    sub-chunks; callers use n = rate//10 with m = rate//9600, which
    always lines up). Returns (wf [T//n, S, G, 128] dB decimated
    lines — see :func:`spectrum_waterfall` for the layout/identities —
    peak_db [T//n, S], flat permuted argmax [T//n, S] i32,
    ds CF [S, T//m], new_tail CF [S, ntaps-1]).
    """
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform not in ("cpu",)
    elif use_pallas and jax.devices()[0].platform == "cpu":
        interpret = True
    s, t = iq.shape
    sf_blocks, _sub = sf_geometry(n, m)
    assert t % (sf_blocks * n) == 0, (
        f"T must be a multiple of {sf_blocks * n} ({sf_blocks} FFT "
        "blocks = 3 decimation sub-chunks)")
    assert n % 128 == 0 and n // 128 <= 512
    q = wf_group_for(n, max_width)
    taps_np = np.asarray(taps, np.float32)
    tapmat = jnp.asarray(_dec_tapmat(taps_np, m, float(gain)))
    wf, mx, idx, yr, yi, tr, ti = _spec_front_jit(
        iq.re.astype(jnp.float32), iq.im.astype(jnp.float32),
        cos_pat, sin_pat, jnp.asarray(taps_np), tapmat, tail.re, tail.im,
        n, m, float(gain), window, use_pallas, interpret, precision, q)
    return wf, mx, idx, CF(yr, yi), CF(tr, ti)


# ---------------------------------------------------------------------------
# Fully fused telemetry front end: tuner mix + decimating FIR + VCO mix +
# matched filter in ONE kernel.
#
# Extends the mix+decimate kernel with the two decimated-domain stages
# that XLA otherwise runs as separate HBM passes (FUNcubeBPSKDemod.java:
# 511-523): the 1200 Hz VCO quadrature mix and the 65-tap RRC matched
# filter. Because the decimated chunk (1280 samples) is a multiple of 8
# and the VCO advances exactly pi/4 per decimated sample, the VCO factor
# for in-chunk position p depends only on p mod 8 = lane mod 8 — one
# [S, 128] pattern broadcasts across every tile of every chunk. The
# matched filter is a second banded MXU matmul (m=1) against the
# vco-mixed chunk with a 128-lane carried halo. The decimated stream is
# never written to HBM: one read of the raw input, one write of the
# (rate/9600)x-smaller matched-filter output, plus the carried tails.
# ---------------------------------------------------------------------------


def _mix_dec_mf_kernel(xr_ref, xi_ref, t0r_ref, t0i_ref, m0r_ref, m0i_ref,
                       cos_ref, sin_ref, vcoc_ref, vcos_ref,
                       tap_ref, mtap_ref, or_ref, oi_ref,
                       tlr_ref, tli_ref, mlr_ref, mli_ref,
                       hr_ref, hi_ref, mhr_ref, mhi_ref, *,
                       m: int, t_len: int, nb: int,
                       precision: str = "highest"):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    wp = xr_ref.shape[-1]                 # chunk span = _MD_CHUNK_OUT * m
    k_tiles = _MD_CHUNK_OUT // 128
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        hr_ref[...] = t0r_ref[...]
        hi_ref[...] = t0i_ref[...]
        mhr_ref[...] = m0r_ref[...]
        mhi_ref[...] = m0i_ref[...]

    lane = lax.broadcasted_iota(jnp.int32, (_MD_ROWS, wp), 1)
    mask = (j * wp + lane) < t_len        # ragged last chunk -> zeros
    x3r = xr_ref[...].reshape(_MD_ROWS, wp // 128, 128)
    x3i = xi_ref[...].reshape(_MD_ROWS, wp // 128, 128)
    mr = (x3r * cos_ref[...][:, None, :]).reshape(_MD_ROWS, wp)
    mi = (x3i * sin_ref[...][:, None, :]).reshape(_MD_ROWS, wp)
    wr = jnp.concatenate([hr_ref[...], jnp.where(mask, mr, 0.0)], axis=1)
    wi = jnp.concatenate([hi_ref[...], jnp.where(mask, mi, 0.0)], axis=1)
    span = 128 * (m + 1)
    parts = [wr[:, 128 * m * k: 128 * m * k + span] for k in range(k_tiles)]
    parts += [wi[:, 128 * m * k: 128 * m * k + span] for k in range(k_tiles)]
    wall = jnp.concatenate(parts, axis=0)           # [2K*8, span]
    dot = _make_spec_dot(precision)
    y = dot(wall, tap_ref[...])                     # [2K*8, 128]
    y4 = y.reshape(2, k_tiles, _MD_ROWS, 128)
    # VCO quadrature mix (bi = i*cos, bq = q*sin — the reference's
    # non-complex quirk, :515-516): phase index = lane mod 8, so the
    # [8, 128] per-stream pattern broadcasts across the k tiles
    bbr = (y4[0] * vcoc_ref[...][None, :, :]).reshape(
        k_tiles, _MD_ROWS, 128)
    bbi = (y4[1] * vcos_ref[...][None, :, :]).reshape(
        k_tiles, _MD_ROWS, 128)
    br = jnp.moveaxis(bbr, 0, 1).reshape(_MD_ROWS, _MD_CHUNK_OUT)
    bi = jnp.moveaxis(bbi, 0, 1).reshape(_MD_ROWS, _MD_CHUNK_OUT)
    # matched filter: m=1 banded matmul over [mf halo ++ bb]
    ur = jnp.concatenate([mhr_ref[...], br], axis=1)   # [8, 128+1280]
    ui = jnp.concatenate([mhi_ref[...], bi], axis=1)
    mparts = [ur[:, 128 * k: 128 * k + 256] for k in range(k_tiles)]
    mparts += [ui[:, 128 * k: 128 * k + 256] for k in range(k_tiles)]
    mwall = jnp.concatenate(mparts, axis=0)          # [2K*8, 256]
    z = dot(mwall, mtap_ref[...])                    # [2K*8, 128]
    z4 = z.reshape(2, k_tiles, _MD_ROWS, 128)
    or_ref[...] = jnp.moveaxis(z4[0], 0, 1).reshape(_MD_ROWS, _MD_CHUNK_OUT)
    oi_ref[...] = jnp.moveaxis(z4[1], 0, 1).reshape(_MD_ROWS, _MD_CHUNK_OUT)
    # carry halos to the next grid step
    hr_ref[...] = wr[:, wp:wp + 128]
    hi_ref[...] = wi[:, wp:wp + 128]
    mhr_ref[...] = ur[:, _MD_CHUNK_OUT:_MD_CHUNK_OUT + 128]
    mhi_ref[...] = ui[:, _MD_CHUNK_OUT:_MD_CHUNK_OUT + 128]

    # carried tails come from the final chunk at STATIC offsets
    e_last = t_len - (nb - 1) * wp                    # mixed domain
    e_ds = e_last // m                                # decimated domain

    @pl.when(j == nb - 1)
    def _():
        tlr_ref[...] = wr[:, e_last:e_last + 128]
        tli_ref[...] = wi[:, e_last:e_last + 128]
        mlr_ref[...] = ur[:, e_ds:e_ds + 128]
        mli_ref[...] = ui[:, e_ds:e_ds + 128]


@functools.partial(jax.jit, static_argnames=("m", "gain", "use_pallas",
                                             "interpret", "precision"))
def _mix_dec_mf_jit(xr, xi, cos_pat, sin_pat, vcoc, vcos, taps, tapmat,
                    mf_taps, mtapmat, tail_r, tail_i, mtail_r, mtail_i,
                    m, gain, use_pallas, interpret, precision):
    if not use_pallas and not interpret:
        ds, new_tail = _mix_decimate_ref(
            CF(xr, xi), cos_pat, sin_pat, taps, m, CF(tail_r, tail_i), gain)
        # jnp oracle for the fused tail: broadcast VCO pattern + FIR
        t_ds = ds.shape[-1]
        reps = -(-t_ds // 128)
        vc = jnp.tile(vcoc, (1, reps))[:, :t_ds]
        vs = jnp.tile(vcos, (1, reps))[:, :t_ds]
        bb = CF(ds.re * vc, ds.im * vs)
        from .fir import fir_apply_streaming
        mf, mf_tail = fir_apply_streaming(
            bb, mf_taps, CF(mtail_r, mtail_i), precision=precision)
        return (mf.re, mf.im, new_tail.re, new_tail.im,
                mf_tail.re, mf_tail.im)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, t = xr.shape
    ntaps = taps.shape[0]
    n_mf = mf_taps.shape[0]
    wp = _MD_CHUNK_OUT * m
    nb = -(-t // wp)
    rows = _MD_ROWS
    pad_s = -s % rows
    if pad_s:
        zr = jnp.zeros((pad_s, t), xr.dtype)
        xr, xi = jnp.concatenate([xr, zr]), jnp.concatenate([xi, zr])
        zp = jnp.zeros((pad_s, 128), xr.dtype)
        cos_pat = jnp.concatenate([cos_pat, zp])
        sin_pat = jnp.concatenate([sin_pat, zp])
        vcoc = jnp.concatenate([vcoc, zp])
        vcos = jnp.concatenate([vcos, zp])
        zt = jnp.zeros((pad_s, ntaps - 1), xr.dtype)
        tail_r = jnp.concatenate([tail_r, zt])
        tail_i = jnp.concatenate([tail_i, zt])
        zm = jnp.zeros((pad_s, n_mf - 1), xr.dtype)
        mtail_r = jnp.concatenate([mtail_r, zm])
        mtail_i = jnp.concatenate([mtail_i, zm])
    sp = s + pad_s

    t0r = jnp.pad(tail_r, ((0, 0), (128 - (ntaps - 1), 0)))
    t0i = jnp.pad(tail_i, ((0, 0), (128 - (ntaps - 1), 0)))
    m0r = jnp.pad(mtail_r, ((0, 0), (128 - (n_mf - 1), 0)))
    m0i = jnp.pad(mtail_i, ((0, 0), (128 - (n_mf - 1), 0)))

    kernel = functools.partial(_mix_dec_mf_kernel, m=m, t_len=t, nb=nb,
                               precision=precision)
    row_spec = lambda w: pl.BlockSpec((rows, w), lambda i, j: (i, 0),
                                      memory_space=pltpu.VMEM)
    yr, yi, tlr, tli, mlr, mli = pl.pallas_call(
        kernel,
        grid=(sp // rows, nb),
        in_specs=[
            pl.BlockSpec((rows, wp), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, wp), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            row_spec(128), row_spec(128), row_spec(128), row_spec(128),
            row_spec(128), row_spec(128), row_spec(128), row_spec(128),
            pl.BlockSpec(tapmat.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mtapmat.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, _MD_CHUNK_OUT), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _MD_CHUNK_OUT), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            row_spec(128), row_spec(128), row_spec(128), row_spec(128),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((sp, nb * _MD_CHUNK_OUT), jnp.float32),
            jax.ShapeDtypeStruct((sp, nb * _MD_CHUNK_OUT), jnp.float32),
            jax.ShapeDtypeStruct((sp, 128), jnp.float32),
            jax.ShapeDtypeStruct((sp, 128), jnp.float32),
            jax.ShapeDtypeStruct((sp, 128), jnp.float32),
            jax.ShapeDtypeStruct((sp, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32),
                        pltpu.VMEM((rows, 128), jnp.float32),
                        pltpu.VMEM((rows, 128), jnp.float32),
                        pltpu.VMEM((rows, 128), jnp.float32)],
        interpret=interpret,
    )(xr, xi, t0r, t0i, m0r, m0i, cos_pat, sin_pat, vcoc, vcos,
      tapmat, mtapmat)
    n_out = t // m
    yr, yi = yr[:s, :n_out], yi[:s, :n_out]
    return (yr, yi, tlr[:s, 128 - (ntaps - 1):], tli[:s, 128 - (ntaps - 1):],
            mlr[:s, 128 - (n_mf - 1):], mli[:s, 128 - (n_mf - 1):])


def mix_decimate_mf(iq: CF, cos_pat, sin_pat, taps, m: int, tail: CF,
                    vco_cos, vco_sin, mf_taps, mf_tail: CF,
                    gain: float = 1.0, use_pallas: bool | None = None,
                    interpret: bool = False, precision: str = "bf16x3"):
    """Fused NCO mix + decimate-by-m FIR + VCO mix + matched filter.

    Same contract as :func:`mix_decimate` plus: ``vco_cos``/``vco_sin``
    [S, 128] per-stream VCO patterns (pi/4-per-sample quadrature table,
    valid because in-chunk decimated position mod 8 == lane mod 8),
    ``mf_taps`` [n_mf] matched-filter taps, ``mf_tail`` CF [S, n_mf-1]
    carried vco-mixed history. Returns (mf CF [S, T//m], new_tail CF,
    new_mf_tail CF). The decimated stream itself never touches HBM.
    """
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform not in ("cpu",)
    elif use_pallas and jax.devices()[0].platform == "cpu":
        interpret = True      # kernel path requested on CPU -> interpret
    s, t = iq.shape
    assert t % m == 0
    taps_np = np.asarray(taps, np.float32)
    mf_np = np.asarray(mf_taps, np.float32)
    assert len(mf_np) <= 129, "matched filter exceeds the carried halo"
    tapmat = jnp.asarray(_dec_tapmat(taps_np, m, float(gain)))
    mtapmat = jnp.asarray(_dec_tapmat(mf_np, 1, 1.0))
    yr, yi, tr, ti, mr_, mi_ = _mix_dec_mf_jit(
        iq.re, iq.im, cos_pat, sin_pat, vco_cos, vco_sin,
        jnp.asarray(taps_np), tapmat, jnp.asarray(mf_np), mtapmat,
        tail.re, tail.im, mf_tail.re, mf_tail.im,
        m, float(gain), use_pallas, interpret, precision)
    return CF(yr, yi), CF(tr, ti), CF(mr_, mi_)


def mix_decimate(iq: CF, cos_pat, sin_pat, taps, m: int, tail: CF,
                 gain: float = 1.0, use_pallas: bool | None = None,
                 interpret: bool = False, precision: str = "bf16x3"):
    """Fused NCO mix + decimate-by-m FIR over [S, T] stream rows.

    ``cos_pat``/``sin_pat``: [S, 128] per-stream mix tables, valid when
    the quantized NCO index sequence is 128-lane periodic (see
    ``bpsk._nco_pattern``; pass ones for no mix). ``tail``: CF [S,
    ntaps-1] carried MIXED-domain history (same state as
    ``ops.fir.polyphase_decimate``). T need not be chunk-aligned; it must
    be a multiple of m. Returns (ds CF [S, T//m], new_tail CF).

    ``precision``: "bf16x3" (default — three bf16 MXU passes for the
    banded FIR matmul, O(2^-32) relative error, well inside the decode
    chain's energy gates) or "highest" (six-pass XLA-exact f32) for
    strict numeric comparisons.
    """
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform not in ("cpu",)
    elif use_pallas and jax.devices()[0].platform == "cpu":
        interpret = True      # kernel path requested on CPU -> interpret
    s, t = iq.shape
    assert t % m == 0
    taps_np = np.asarray(taps, np.float32)
    tapmat = jnp.asarray(_dec_tapmat(taps_np, m, float(gain)))
    yr, yi, tr, ti = _mix_decimate_jit(
        iq.re, iq.im, cos_pat, sin_pat, jnp.asarray(taps_np), tapmat,
        tail.re, tail.im, m, float(gain), use_pallas, interpret, precision)
    return CF(yr, yi), CF(tr, ti)
