"""Round-3b: input-read pattern study for the spectrum kernel.

The breakdown (exp_r4_spec) shows a 2.91 ms DMA floor for the 491 MB
input at grid (8, 100) x block (8, 9600) — 169 GB/s vs the 540 GB/s
straight-copy bandwidth, and compute adds on top without overlap.
Question: is the floor per-grid-step overhead or strided-DMA cost, and
which block geometry reaches copy bandwidth?
"""
import functools
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jsdr_tpu.runtime.tpu import ensure_tpu_ready

def log(*a): print(*a, file=sys.stderr, flush=True)

def timeit(fn, *args, iters=10, tag="", gb=None):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    extra = f" ({gb/dt:.0f} GB/s)" if gb else ""
    log(f"{tag}: {dt*1000:.2f} ms{extra}")
    return dt


def _sum_kernel(xr, xi, o, *, nsub):
    acc = jnp.zeros((xr.shape[0], 128), jnp.float32)
    w = xr.shape[-1] // nsub
    for k in range(nsub):
        acc = acc + xr[:, k * w:k * w + 128] + xi[:, k * w:k * w + 128]
    o[...] = acc


@functools.partial(jax.jit, static_argnames=("rows", "span"))
def read_pat(re, im, rows, span):
    s, t = re.shape
    grid = (s // rows, t // span)
    k = functools.partial(_sum_kernel, nsub=1)
    o = pl.pallas_call(
        k, grid=grid,
        in_specs=[pl.BlockSpec((rows, span), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, 128), jnp.float32),
    )(re, im)
    return o.sum()


def main():
    ensure_tpu_ready(attempts=1)
    log(f"device: {jax.devices()[0]}")
    n_streams, t_len = 64, 960_000
    gb = n_streams * t_len * 4 * 2 / 1e9
    rng = np.random.default_rng(0)
    re = jax.device_put(rng.standard_normal(
        (n_streams, t_len)).astype(np.float32))
    im = jax.device_put(rng.standard_normal(
        (n_streams, t_len)).astype(np.float32))
    jax.block_until_ready((re, im))

    f = jax.jit(lambda a, b: a.sum() + b.sum())
    timeit(f, re, im, tag="jnp.sum (XLA reduction)", gb=gb)
    # dependent 4-op chain amortizes the ~1 ms dispatch overhead
    def chain(a, b):
        s = jnp.float32(0.0)
        for k in range(4):
            s = s + (a + s).sum() + (b + s).sum()
        return s
    timeit(jax.jit(chain), re, im, tag="jnp.sum x4 chain", gb=4 * gb)
    # row-sum (lane-axis reduction, no cross-row traffic)
    f2 = jax.jit(lambda a, b: a.sum(axis=1) + b.sum(axis=1))
    timeit(f2, re, im, tag="jnp row-sum", gb=gb)

    for rows, span in [(8, 9600), (8, 38400), (8, 96000), (8, 192000),
                       (16, 38400), (32, 38400), (64, 38400),
                       (64, 96000), (64, 192000), (8, 480000)]:
        steps = (n_streams // rows) * (t_len // span)
        vmem = rows * span * 4 * 2 / 1e6
        try:
            timeit(functools.partial(read_pat, rows=rows, span=span), re, im,
                   tag=f"rows={rows} span={span} steps={steps} "
                       f"vmem={vmem:.1f}MB", gb=gb)
        except Exception as e:
            log(f"rows={rows} span={span}: FAILED {repr(e)[:200]}")


if __name__ == "__main__":
    main()
