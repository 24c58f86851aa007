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

    # 3) THE FLAGSHIP across the process boundary: the sp-sharded
    # telemetry step with the sp axis CROSSING the two processes, so
    # every decode-tail collective (decimator + matched-filter ring
    # halos, EMA / last-valid / e_out all_gathers, the 2-scalar peak
    # hop, and the sync-search hit merge — parallel/sharded.py) rides
    # a REAL process boundary (the DCN analog). Bit-equality against
    # the single-device chain, with a frame STRADDLING two chained
    # step calls.
    import time as _time

    from jsdr_tpu.demod.bpsk import (BpskConfig, bpsk_block_batch,
                                     bpsk_init_batch)
    from jsdr_tpu.fec.decoder import fec_decode
    from jsdr_tpu.io.sources import synth_bpsk_stream
    from jsdr_tpu.parallel.sharded import sharded_telemetry_step

    devs2 = np.array(jax.devices()).reshape(num_processes, 4).T
    mesh2 = Mesh(devs2, ("dp", "sp"))      # [4, n_procs]: sp spans DCN
    rate = 96000
    seg = 230400                            # 2.4 s; the frame straddles
    rng2 = np.random.default_rng(42)
    arr = (0.1 * (rng2.standard_normal((4, 2 * seg))
                  + 1j * rng2.standard_normal((4, 2 * seg)))
           ).astype(np.complex64)
    payload = np.arange(256, dtype=np.uint8)[None]
    burst = synth_bpsk_stream(payload, rate=rate, preamble_bits=64)
    arr[0, :min(len(burst), 2 * seg)] += burst[: 2 * seg]
    cfg = BpskConfig(rate=rate)
    step = sharded_telemetry_step(mesh2, rate=rate)
    sh2 = NamedSharding(mesh2, P("dp", "sp"))

    def gput(x):
        return jax.make_array_from_callback(x.shape, sh2, lambda i: x[i])

    states = bpsk_init_batch(cfg, 4)
    st_ref = bpsk_init_batch(cfg, 4)
    for b in range(2):
        blk = arr[:, b * seg:(b + 1) * seg]
        out, states = step(
            CF(gput(np.ascontiguousarray(blk.real, np.float32)),
               gput(np.ascontiguousarray(blk.imag, np.float32))), states)
        ref, st_ref = bpsk_block_batch(blk, cfg, st_ref)
        # out specs are P("dp") with an sp replica per process, so the
        # global arrays are fully addressable on every process
        for field in ("n_bits", "n_hits", "windows", "bits", "hit_corr"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out, field)),
                np.asarray(getattr(ref, field)), err_msg=field)
        if b == 0:
            assert int(np.asarray(out.n_hits)[0]) == 0
    assert int(np.asarray(out.n_hits)[0]) == 1, "straddling frame missed"
    dec = fec_decode(out.windows[:1])
    assert bool(np.asarray(dec.ok)[0, 0])
    assert np.array_equal(np.asarray(dec.payload)[0, 0], payload[0])
    for a, b_ in zip(jax.tree.leaves(states), jax.tree.leaves(st_ref)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b_, np.float64),
                                   rtol=2e-4, atol=1e-6)
    print(f"proc {process_id}: flagship-over-DCN bit-equal, "
          "straddling frame decoded", flush=True)

    # 4) real-collectives sp-scaling sanity datapoint (the 94%-at-sp=4
    # weak-scaling number in PERF.md is a single-chip SIMULATION; this
    # is the same per-device work with the tail collectives crossing a
    # real process boundary): sp=1 (pure dp) vs sp=2 (time axis split
    # across the two processes), per-device front-end work held equal.
    S = 4 * num_processes
    noise = (0.1 * (rng2.standard_normal((S, 2 * seg))
                    + 1j * rng2.standard_normal((S, 2 * seg)))
             ).astype(np.complex64)
    mesh_dp = Mesh(np.array(jax.devices()).reshape(S, 1), ("dp", "sp"))
    trend = []
    for label, m, s_n, t_n in (("sp=1", mesh_dp, S, seg),
                               ("sp=2", mesh2, 4, 2 * seg)):
        dat = noise[:s_n, :t_n]
        shm = NamedSharding(m, P("dp", "sp"))
        gp = lambda x: jax.make_array_from_callback(  # noqa: E731
            x.shape, shm, lambda i: x[i])
        stp = sharded_telemetry_step(m, rate=rate)
        sts = bpsk_init_batch(cfg, s_n)
        cfd = CF(gp(np.ascontiguousarray(dat.real, np.float32)),
                 gp(np.ascontiguousarray(dat.imag, np.float32)))
        o, sts = stp(cfd, sts)             # compile + warmup
        jax.block_until_ready(o)
        t0 = _time.perf_counter()
        reps = 2
        for _ in range(reps):
            o, sts = stp(cfd, sts)
        jax.block_until_ready(o)
        dt = (_time.perf_counter() - t0) / reps
        trend.append(dt)
        print(f"proc {process_id}: sp-trend {label}: {dt * 1e3:.0f} "
              f"ms/step ({s_n}x{t_n} samples, {s_n * t_n / 8} "
              "per device)", flush=True)
    print(f"proc {process_id}: sp-trend ratio sp2/sp1 = "
          f"{trend[1] / trend[0]:.2f}", flush=True)
    print(f"proc {process_id}: OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
