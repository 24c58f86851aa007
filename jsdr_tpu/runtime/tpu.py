"""TPU backend resilience.

The tunneled TPU backend in this environment exhibits two failure modes:
a long (~minutes) first-op claim latency, and transient UNIMPLEMENTED /
FAILED_PRECONDITION errors from the remote-compile service that poison
the client. ``ensure_tpu_ready`` probes with a real compile+readback and
re-initializes the backend between attempts.
"""

from __future__ import annotations

import sys
import time


def ensure_tpu_ready(attempts: int = 6, sleep_s: float = 10.0) -> bool:
    """Probe compile+execute+readback; re-init the backend on failure.

    Returns True when a probe succeeds. Raises the last error otherwise.
    """
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    last = None
    for attempt in range(attempts):
        try:
            # randomized shape + baked constant => a genuinely fresh HLO
            # module every time, so a server-side compile cache cannot
            # mask a broken remote-compile service
            n = 512 + 8 * random.randrange(1, 64)
            c = float(random.random())
            x = jnp.asarray(np.arange(n, dtype=np.float32))
            r = np.asarray(jax.block_until_ready(
                jax.jit(lambda a: jnp.tanh(a * c) + c)(x)))
            assert r.shape == (n,)
            return True
        except Exception as e:  # noqa: BLE001 — backend errors vary by type
            last = e
            print(f"[tpu] probe attempt {attempt} failed: {repr(e)[:100]}; "
                  "re-initializing backend", file=sys.stderr, flush=True)
            from jax._src import xla_bridge
            xla_bridge._clear_backends()
            xla_bridge.get_backend.cache_clear()
            time.sleep(sleep_s)
    raise last
