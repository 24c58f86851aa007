"""FFT auto-tune front-end — the ``doBufferFFT`` path of the reference
(FUNcubeBPSKDemod.java:399-464).

Per 0.1 s block: forward FFT, box-averaged PSD peak search in the lower
(or upper, ``track_high``) half-band with EMA-tracked peak power, centre
bin clamped >= 102, then a 204-bin slice around the peak is inverse-FFT'd
and ONLY ITS REAL PART is fed to the decimator (the reference drops Q —
a deliberate quirk of its C++ heritage, :462).

The EMA state chains across blocks, so blocks run under ``lax.scan``
with a (avePeakPower, aveCentreBin, centreBin) carry. Transforms use the
planar MXU matmul FFT (no complex HLO).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.cplx import CF, as_cf
from ..ops.mxu_fft import fft_cf, ifft_cf

# FUNcubeBPSKDemod.java:399-402
PSD_AVG = 2.0 / (10 + 1)
PSD_INV = 1.0 - PSD_AVG
SLICE_HALF = 102          # bins copied around the peak (:458)
BOX_HALF = 50             # box-average half width (:435)
EDGE = 75                 # peak-search guard band (:433)
MIN_CENTRE = 102          # clamp (:453)


class FftTunerState(NamedTuple):
    ave_peak_power: jnp.ndarray  # scalar f32
    ave_centre_bin: jnp.ndarray  # scalar f32
    centre_bin: jnp.ndarray      # scalar i32


def fft_tuner_init() -> FftTunerState:
    return FftTunerState(
        ave_peak_power=np.zeros((), np.float32),
        ave_centre_bin=np.zeros((), np.float32),
        centre_bin=np.zeros((), np.int32),
    )


def _tune_one_block(state: FftTunerState, iq: CF, *, track_high):
    samples = iq.shape[-1]
    spec = fft_cf(iq)
    psd = spec[: samples // 2].abs()

    # track_high is TRACED (scalar bool): the search half-band is data,
    # so per-instance FUNcube<n>-bpsk-upper settings batch in one compile
    # (FUNcubeBPSKDemod.java:97-99) and toggling never recompiles
    th = jnp.asarray(track_high)
    beg = jnp.where(th, samples // 4, 0)
    end = jnp.where(th, samples // 2, samples // 4)
    # box sum over [i-50, i+50) via cumulative sum
    csum = jnp.cumsum(jnp.concatenate([jnp.zeros(1, psd.dtype), psd]))
    i_all = jnp.arange(samples // 2)
    ave = csum[jnp.clip(i_all + BOX_HALF, 0, samples // 2)] - \
        csum[jnp.clip(i_all - BOX_HALF, 0, samples // 2)]
    in_range = (i_all >= beg + EDGE) & (i_all < end - EDGE)
    masked = jnp.where(in_range, ave, -jnp.inf)
    bin_pos = jnp.argmax(masked).astype(jnp.int32)
    max_bin = masked[bin_pos]

    centre = jnp.clip(state.centre_bin, 0, end - 1)
    ave_pp = PSD_AVG * ave[centre] + PSD_INV * state.ave_peak_power
    take = (max_bin > ave_pp * 1.25) & (bin_pos > 0)
    ave_cb = jnp.where(take, bin_pos.astype(jnp.float32), state.ave_centre_bin)
    centre2 = jnp.where(take, (ave_cb + 1.0).astype(jnp.int32), centre)
    centre2 = jnp.maximum(centre2, MIN_CENTRE)

    # inverse FFT of the 204-bin slice [centre-102, centre+102), at bin 0
    start = jnp.clip(centre2 - SLICE_HALF, 0, samples - 2 * SLICE_HALF)
    sl = CF(lax.dynamic_slice(spec.re, (start,), (2 * SLICE_HALF,)),
            lax.dynamic_slice(spec.im, (start,), (2 * SLICE_HALF,)))
    rev = CF(jnp.zeros(samples, jnp.float32).at[: 2 * SLICE_HALF].set(sl.re),
             jnp.zeros(samples, jnp.float32).at[: 2 * SLICE_HALF].set(sl.im))
    td = ifft_cf(rev)
    feed_re = td.re.astype(jnp.float32)
    new_state = FftTunerState(ave_pp.astype(jnp.float32),
                              ave_cb.astype(jnp.float32), centre2)
    # the decimator receives (re, re) — Q dropped (:461-463)
    return new_state, (CF(feed_re, feed_re), centre2)


@jax.jit
def _fft_tuner_blocks_jit(iq_blocks: CF, state: FftTunerState,
                          track_high: jnp.ndarray):
    step = partial(_tune_one_block, track_high=track_high)
    new_state, (feeds, centres) = lax.scan(step, state, iq_blocks)
    return feeds.reshape(-1), centres, new_state


def fft_tuner_blocks(iq_blocks, state: FftTunerState,
                     track_high=False
                     ) -> Tuple[CF, jnp.ndarray, FftTunerState]:
    """Auto-tune a sequence of 0.1 s blocks.

    iq_blocks: CF [n_blocks, samples] (or host complex). ``track_high``
    may be a python bool or a traced scalar bool (per-instance
    FUNcube<n>-bpsk-upper). Returns (feed CF [n_blocks*samples] with
    I=Q=real part, centre_bins [n_blocks] i32, new state).
    """
    return _fft_tuner_blocks_jit(as_cf(iq_blocks), state,
                                 jnp.asarray(track_high, bool))
