"""Round-5 FEC-tail attack (VERDICT r4 #4): attribute the ~0.6 ms/frame
fec_decode cost across its stages (deinterleave+metrics / Viterbi ACS
scan / traceback scan / RS / re-encode-verify), then attack the
sequential 2566-step scans with chunked unrolling (same math, fewer scan
iterations) and measure full-decode frames/s for the candidate combos.

Run on the TPU backend. Every timed form perturbs its input per
iteration (the repeat-elision hazard documented in bench.py).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from jsdr_tpu.fec import viterbi as V                      # noqa: E402
from jsdr_tpu.fec.decoder import (deinterleave, descramble_demux,  # noqa: E402
                                  fec_decode)
from jsdr_tpu.fec import encode as jenc                    # noqa: E402
from jsdr_tpu.fec import rs as jrs                         # noqa: E402
from jsdr_tpu.fec.ref_numpy import encode_fec40, symbols_to_soft  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = 10


def make_input(batch):
    rng = np.random.default_rng(1)
    payloads = rng.integers(0, 256, (batch, 256), dtype=np.uint8)
    raws = np.stack([symbols_to_soft(encode_fec40(p)) for p in payloads])
    for r in raws:
        r[rng.choice(5200, 120, replace=False)] ^= 0x80
    return jax.device_put(jnp.asarray(raws, jnp.uint8)), payloads


def perturbed(fn):
    """jit(step(x, i)) that flips one confidence bit so no two
    dispatches are identical."""

    @jax.jit
    def step(x, i):
        x = x.at[0, 0].set(
            ((x[0, 0].astype(jnp.int32) + i) % 256).astype(jnp.uint8))
        return fn(x)

    return step


def timeit(label, fn, x, extra=""):
    step = perturbed(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(step(x, jnp.int32(0)))
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(ITERS):
        r = step(x, jnp.int32(i + 1))
    # d2h value barrier: block_until_ready alone was caught returning
    # early on this backend (see bench.py force_value)
    np.asarray(jax.tree.leaves(r)[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:44s} {dt * 1e3:8.2f} ms  ({BATCH / dt:7.0f} frames/s)"
          f"  [compile {t_c:.1f}s] {extra}", flush=True)
    return dt


# ---- unroll-parametric ACS + traceback (same math as fec/viterbi.py) ----

def acs(mets, unroll):
    def step(cmetric, met_t):
        b1 = met_t[V._SYM_A]
        b2 = met_t[V._SYM_B]
        lo, hi = cmetric[:32], cmetric[32:]
        even_a, even_b = lo + b1, hi + b2
        odd_a, odd_b = lo + b2, hi + b1
        dec = jnp.stack([even_b > even_a, odd_b > odd_a], -1).reshape(-1)
        nm = jnp.stack([jnp.maximum(even_a, even_b),
                        jnp.maximum(odd_a, odd_b)], -1).reshape(-1)
        return nm, dec

    init = jnp.full((64,), V._INIT_METRIC, jnp.int32).at[0].set(0)
    _, decisions = lax.scan(step, init, mets, unroll=unroll)
    return decisions


def traceback(decisions, unroll):
    def step(state, dec_t):
        dec = dec_t[state]
        ns = (state >> 1) | jnp.where(dec, jnp.int32(0x20), jnp.int32(0))
        return ns, dec.astype(jnp.uint8)

    _, bits = lax.scan(step, jnp.int32(0), decisions[V.K_FLUSH:],
                       reverse=True, unroll=unroll)
    return bits


def vit_bits(symbols, u_acs, u_tb):
    return traceback(acs(V.branch_metrics(symbols), u_acs), u_tb)


def full_decode(raw, u_acs, u_tb):
    symbols = deinterleave(raw)
    bits = jax.vmap(lambda s: vit_bits(s, u_acs, u_tb))(symbols)
    vitdec = V.bits_to_bytes(bits)
    rsblocks = descramble_demux(vitdec)
    corrected, nerr = jax.vmap(jax.vmap(jrs.decode_rs_codeword))(rsblocks)
    ok = jnp.all(nerr >= 0, axis=-1)
    from jsdr_tpu.fec.tables import KK, RSPAD
    payload = jnp.swapaxes(corrected[..., RSPAD:KK], -1, -2
                           ).reshape(raw.shape[0], -1)
    payload = jnp.where(ok[:, None], payload, 0).astype(jnp.uint8)
    reenc = jax.vmap(jenc.encode_frame)(payload)
    errors = jnp.sum((reenc != (raw >> 7)).astype(jnp.int32), axis=-1)
    return payload, ok, jnp.where(ok, errors, -1)


def main():
    print(f"device: {jax.devices()[0].device_kind}, batch={BATCH}")
    x, payloads = make_input(BATCH)

    # baseline + correctness anchor
    res = jax.block_until_ready(fec_decode(x))
    assert int(res.ok.sum()) == BATCH, int(res.ok.sum())
    timeit("full fec_decode (shipped)", lambda v: fec_decode(v).rc, x)

    # ---- stage attribution (each standalone, output forced) ----
    timeit("deint + branch metrics",
           lambda v: jax.vmap(V.branch_metrics)(deinterleave(v)), x)
    timeit("+ ACS scan (decisions out)",
           lambda v: jax.vmap(lambda s: acs(V.branch_metrics(s), 1))(
               deinterleave(v)), x)
    timeit("+ traceback (bits out)",
           lambda v: jax.vmap(lambda s: vit_bits(s, 1, 1))(deinterleave(v)),
           x)

    def to_rs(v):
        bits = jax.vmap(lambda s: vit_bits(s, 1, 1))(deinterleave(v))
        rsblocks = descramble_demux(V.bits_to_bytes(bits))
        _, nerr = jax.vmap(jax.vmap(jrs.decode_rs_codeword))(rsblocks)
        return nerr

    timeit("+ RS decode x2", to_rs, x)

    # ---- unroll sweep ----
    for u in (4, 8, 16, 32):
        timeit(f"ACS unroll={u}",
               lambda v, u=u: jax.vmap(
                   lambda s: acs(V.branch_metrics(s), u))(deinterleave(v)),
               x)
    for u in (8, 32):
        timeit(f"ACS u=8 + traceback unroll={u}",
               lambda v, u=u: jax.vmap(
                   lambda s: vit_bits(s, 8, u))(deinterleave(v)), x)

    # ---- full decode with candidate combos ----
    for ua, ut in ((8, 32), (16, 32), (32, 32)):
        def f(v, ua=ua, ut=ut):
            p, ok, rc = full_decode(v, ua, ut)
            return ok.sum(), rc.sum()

        dt = timeit(f"full decode unroll acs={ua} tb={ut}", f, x)
    # correctness of the unrolled form
    p, ok, rc = jax.block_until_ready(
        jax.jit(lambda v: full_decode(v, 8, 32))(x))
    assert int(ok.sum()) == BATCH
    assert np.array_equal(np.asarray(p), payloads)
    print("unrolled decode bit-exact vs payloads: OK")


if __name__ == "__main__":
    main()
