"""Weak-scaling harness: samples/s of the sharded telemetry step vs
device count (BASELINE.md target: >=85% efficiency 1 -> N).

Real multi-chip hardware is not attachable in this environment, so the
default run measures shard-count invariance + scaling SHAPE on virtual
CPU devices (methodology harness); on a real pod slice, run with
JAX_PLATFORMS unset and it measures actual ICI scaling. Work per device
is held constant (weak scaling): streams = 2 * dp, samples = t_shard * sp.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure(n_devices: int, t_shard: int = 480_000, streams_per_dp: int = 2,
            iters: int = 3) -> float:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jsdr_tpu.parallel import make_mesh, sharded_telemetry_step

    sp = 1
    for cand in (4, 3, 2):
        if n_devices % cand == 0 and n_devices >= cand:
            sp = cand
            break
    dp = n_devices // sp
    mesh = make_mesh(dp=dp, sp=sp)
    n_streams = streams_per_dp * dp
    t_len = t_shard * sp
    rng = np.random.default_rng(0)
    iq = (0.2 * (rng.standard_normal((n_streams, t_len))
                 + 1j * rng.standard_normal((n_streams, t_len)))
          ).astype(np.complex64)
    from jsdr_tpu.demod.bpsk import BpskConfig, bpsk_init_batch
    step = sharded_telemetry_step(mesh, rate=96000)
    states = bpsk_init_batch(BpskConfig(rate=96000), n_streams)
    x = jax.device_put(jnp.asarray(iq), NamedSharding(mesh, P("dp", "sp")))
    jax.block_until_ready(step(x, states))     # compile
    best = np.inf
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(step(x, states))
        best = min(best, time.time() - t0)
    return n_streams * t_len / best


def main():
    import os
    import jax

    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8").strip()
    if len(jax.devices()) < 2:
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge
        xla_bridge._clear_backends()
        xla_bridge.get_backend.cache_clear()
    n_max = len(jax.devices())
    results = {}
    base = None
    for n in [1, 2, 4, 8]:
        if n > n_max:
            break
        sps = measure(n)
        results[n] = sps
        if base is None:
            base = sps
        eff = sps / (base * n)
        print(f"devices={n}: {sps/1e6:.2f} MS/s, weak-scaling eff "
              f"{100*eff:.1f}%", file=sys.stderr)
    ns = sorted(results)
    eff = results[ns[-1]] / (results[ns[0]] * ns[-1] / ns[0])
    print(json.dumps({
        "metric": "weak-scaling efficiency (sharded telemetry, virtual devices)",
        "value": round(eff, 3),
        "unit": "fraction",
        "devices": ns[-1],
        "samples_per_s": {str(k): round(v) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
