"""Worker process for the two-process multi-host test (run by
tests/test_multihost.py). Each process owns 4 virtual CPU devices; the
("dp", "sp") mesh spans both processes, so the dp axis crosses the
process boundary — the DCN analog — while sp stays process-local (the
ICI analog), exactly the layout make_mesh documents for pods.

Usage: python -m tests._multihost_worker <coordinator> <num_procs> <pid>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main(coordinator: str, num_processes: int, process_id: int) -> None:
    from jsdr_tpu.parallel.mesh import init_multihost
    init_multihost(coordinator, num_processes, process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == 4 * num_processes
    assert len(jax.local_devices()) == 4

    # dp spans processes (DCN), sp stays within each process (ICI)
    devs = np.array(jax.devices()).reshape(num_processes, 4)
    mesh = Mesh(devs, ("dp", "sp"))

    # 1) collectives across the process boundary: psum over dp must see
    # every process's contribution
    import jax.numpy as jnp
    from jax import lax

    def body(x):
        total = lax.psum(x, "dp")
        ring = lax.ppermute(
            x, "sp", [(i, (i + 1) % 4) for i in range(4)])
        return total, ring

    sh = NamedSharding(mesh, P("dp", "sp"))
    # deterministic global data: every process constructs the same array
    # and hands jax its addressable shards
    full = np.arange(8 * 4 * 8, dtype=np.float32).reshape(8, 4 * 8)
    garr = jax.make_array_from_callback(
        full.shape, sh, lambda idx: full[idx])
    f = jax.jit(jax.shard_map(body, mesh=mesh,
                              in_specs=P("dp", "sp"),
                              out_specs=(P(None, "sp"), P("dp", "sp"))))
    total, ring = f(garr)
    expect_total = full.reshape(2, 4, -1).sum(0)          # [4, 32]
    for shard in total.addressable_shards:
        np.testing.assert_allclose(np.asarray(shard.data),
                                   expect_total[shard.index])
    # ring ppermute over sp moved each 8-col block right by one slot
    expect_ring = full.reshape(8, 4, 8)[:, [3, 0, 1, 2], :].reshape(8, 32)
    for shard in ring.addressable_shards:
        np.testing.assert_allclose(np.asarray(shard.data),
                                   expect_ring[shard.index])

    # 2) the framework's sharded spectrum over the 2-process mesh must
    # match the single-device result
    from jsdr_tpu.ops.cplx import CF
    from jsdr_tpu.ops.spectrum import spectrum_block
    from jsdr_tpu.parallel.sharded import sharded_spectrum

    rng = np.random.default_rng(7)
    blocks = (rng.standard_normal((8, 1024))
              + 1j * rng.standard_normal((8, 1024))).astype(np.complex64)
    re = np.ascontiguousarray(blocks.real, np.float32)
    im = np.ascontiguousarray(blocks.imag, np.float32)
    bsh = NamedSharding(mesh, P(("dp", "sp"), None))
    g_re = jax.make_array_from_callback(re.shape, bsh, lambda i: re[i])
    g_im = jax.make_array_from_callback(im.shape, bsh, lambda i: im[i])
    run = sharded_spectrum(mesh, rate=96000.0)
    res = run(CF(g_re, g_im))
    local = spectrum_block(CF(re, im), rate=96000.0)
    # each process checks its addressable rows
    for shard in res.psd.addressable_shards:
        rows = shard.index[0]
        np.testing.assert_allclose(np.asarray(shard.data),
                                   np.asarray(local.psd)[rows], rtol=1e-5)
    print(f"proc {process_id}: OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
