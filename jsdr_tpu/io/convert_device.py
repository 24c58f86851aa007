"""Device-side sample conversion: upload raw int16 and convert on-chip.

The host in typical TPU deployments is the ingest bottleneck (this
container's host does ~40 MB/s); shipping the raw S16LE bytes to the
device halves the transfer size vs complex64 AND moves the convert loop
onto the VPU. Semantics identical to io.convert.s16le_to_complex
(wrapping 16-bit DC correction then 1/32767 scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def s16_interleaved_to_complex(samples: jnp.ndarray, i_corr: jnp.ndarray,
                               q_corr: jnp.ndarray) -> jnp.ndarray:
    """[2N] int16 interleaved I/Q (device) -> [N] complex64."""
    s = samples.reshape(-1, 2)
    i = (s[:, 0] + i_corr.astype(jnp.int16)).astype(jnp.int16)
    q = (s[:, 1] + q_corr.astype(jnp.int16)).astype(jnp.int16)
    scale = jnp.float32(1.0 / 32767.0)
    return (i.astype(jnp.float32) * scale
            + 1j * (q.astype(jnp.float32) * scale)).astype(jnp.complex64)


def upload_raw(raw: bytes | np.ndarray) -> jnp.ndarray:
    """Host bytes -> device int16 array (half the bytes of complex64)."""
    s = np.frombuffer(raw, dtype="<i2") if not isinstance(raw, np.ndarray) else raw
    return jnp.asarray(s)
