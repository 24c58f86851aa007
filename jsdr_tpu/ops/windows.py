"""Window functions.

The reference computes a Hamming window but never applies it to the data
(fft.java:71-73 computes, :190-195 transforms raw data — the menu toggle
only changes a label). The framework applies windows for real; the
spectrum path keeps a compat flag to skip application when matching the
reference numerically.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hamming_np(n: int) -> np.ndarray:
    """Host-side (numpy) Hamming with the reference's period-N convention
    — for baking into kernels as a compile-time constant."""
    s = np.arange(n, dtype=np.float64)
    return (0.54 - 0.46 * np.cos(2 * np.pi * s / n)).astype(np.float32)


def hamming(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Hamming window with the reference's convention w[s] = 0.54 -
    0.46*cos(2*pi*s/N) (period N, not N-1; fft.java:72-73)."""
    s = jnp.arange(n, dtype=dtype)
    return (0.54 - 0.46 * jnp.cos(2 * jnp.pi * s / n)).astype(dtype)


def hamming_symmetric(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Symmetric Hamming (period N-1) used by the FIR designer
    (demod.java:365, fir.java:188)."""
    s = jnp.arange(n, dtype=dtype)
    return (0.54 - 0.46 * jnp.cos(2 * jnp.pi * s / (n - 1))).astype(dtype)
