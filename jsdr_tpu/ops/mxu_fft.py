"""FFT as MXU matmuls on planar (re, im) pairs — no complex HLO.

A two-level Cooley-Tukey decomposition N = N1*N2 turns the DFT into two
small dense matmuls plus a twiddle multiply:

    A[n1, n2] = x[N2*n1 + n2]
    B = DFT_N1 @ A                      (contract n1)
    C[k1, n2] = B[k1, n2] * W_N^(k1*n2) (twiddle)
    D = C @ DFT_N2^T                    (contract n2)
    X[N1*k2 + k1] = D[k1, k2]

Each complex matmul is 4 real matmuls — exactly what the MXU wants; the
twiddles fuse into the elementwise VPU stream. Sizes with a factor split
whose parts are <= ``max_factor`` use this path; small/prime sizes fall
back to a single dense DFT matmul. Batched over leading dimensions.

This replaces ``jnp.fft`` everywhere in the pipeline because the
environment's TPU compiler rejects complex HLO — and a matmul FFT is the
natural TPU formulation regardless (the FFT sizes here, rate/10, are
highly composite).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .cplx import CF

_MAX_FACTOR = 512


@functools.lru_cache(maxsize=32)
def _dft_mats(n: int, sign: float) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin DFT matrices W[k, t] = exp(sign*2pi*i*k*t/n), host f64->f32."""
    k = np.arange(n)[:, None]
    t = np.arange(n)[None, :]
    ang = sign * 2.0 * np.pi * (k * t % n) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _twiddles(n1: int, n2: int, sign: float) -> Tuple[np.ndarray, np.ndarray]:
    """W_N^(sign*k1*n2) as [n1, n2] cos/sin, host-exact."""
    n = n1 * n2
    k1 = np.arange(n1)[:, None]
    m2 = np.arange(n2)[None, :]
    ang = sign * 2.0 * np.pi * (k1 * m2 % n) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _best_split(n: int) -> Optional[Tuple[int, int]]:
    """Factor n = n1*n2 with both parts <= _MAX_FACTOR, most balanced."""
    best = None
    for n1 in range(2, int(np.sqrt(n)) + 1):
        if n % n1 == 0:
            n2 = n // n1
            if n1 <= _MAX_FACTOR and n2 <= _MAX_FACTOR:
                best = (n1, n2)   # later = more balanced
    return best


def _cmatmul(wr: np.ndarray, wi: np.ndarray, x: CF,
             side: str = "left") -> CF:
    """(wr + i wi) @ x  (side="left", contract x's -2 axis) or
    x @ (wr + i wi)^T (side="right", contract x's -1 axis).

    Reshaped to single large 2D matmuls (batch folded into the free
    dimension) so XLA emits one clean MXU contraction per real matmul
    instead of many small batched dots.
    """
    wr = jnp.asarray(wr)
    wi = jnp.asarray(wi)
    k = wr.shape[0]
    if side == "left":
        # [..., n, m] -> 2D [n, prod(batch)*m] with n leading
        n, m = x.shape[-2], x.shape[-1]
        batch = x.shape[:-2]
        perm = (x.ndim - 2,) + tuple(range(x.ndim - 2)) + (x.ndim - 1,)

        def two_d(z):
            return jnp.transpose(z, perm).reshape(n, -1)

        xr, xi = two_d(x.re), two_d(x.im)
        rr = jnp.dot(wr, xr, preferred_element_type=jnp.float32) - \
            jnp.dot(wi, xi, preferred_element_type=jnp.float32)
        ri = jnp.dot(wr, xi, preferred_element_type=jnp.float32) + \
            jnp.dot(wi, xr, preferred_element_type=jnp.float32)

        def back(z):
            z = z.reshape((k,) + batch + (m,))
            inv = tuple(range(1, x.ndim - 1)) + (0, x.ndim - 1)
            return jnp.transpose(z, inv)

        return CF(back(rr), back(ri))
    # right: [..., m, n] @ [k, n]^T -> flatten leading dims into rows
    n = x.shape[-1]
    lead = x.shape[:-1]
    xr = x.re.reshape(-1, n)
    xi = x.im.reshape(-1, n)
    rr = jnp.dot(xr, wr.T, preferred_element_type=jnp.float32) - \
        jnp.dot(xi, wi.T, preferred_element_type=jnp.float32)
    ri = jnp.dot(xi, wr.T, preferred_element_type=jnp.float32) + \
        jnp.dot(xr, wi.T, preferred_element_type=jnp.float32)
    return CF(rr.reshape(*lead, k), ri.reshape(*lead, k))


def fft_cf(x: CF, inverse: bool = False) -> CF:
    """DFT along the last axis of a CF array (any leading batch dims).

    Forward matches ``np.fft.fft``; inverse matches ``np.fft.ifft``
    (including the 1/N scale).
    """
    n = x.shape[-1]
    sign = 1.0 if inverse else -1.0
    split = _best_split(n)
    if split is None:
        wr, wi = _dft_mats(n, sign)
        y = _cmatmul(wr, wi, x.reshape(*x.shape[:-1], n, 1), "left")
        y = y.reshape(*x.shape)
    else:
        n1, n2 = split
        a = x.reshape(*x.shape[:-1], n1, n2)
        w1r, w1i = _dft_mats(n1, sign)
        b = _cmatmul(w1r, w1i, a, "left")                  # [..., k1, n2]
        twr, twi = _twiddles(n1, n2, sign)
        c = b * CF(jnp.asarray(twr), jnp.asarray(twi))
        w2r, w2i = _dft_mats(n2, sign)
        d = _cmatmul(w2r, w2i, c, "right")                 # [..., k1, k2]
        y = d.swapaxes(-1, -2).reshape(*x.shape)           # X[N1*k2+k1]
    if inverse:
        y = y * jnp.float32(1.0 / n)
    return y


def ifft_cf(x: CF) -> CF:
    return fft_cf(x, inverse=True)
