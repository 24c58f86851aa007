"""Multi-chip sharding on the 8-device CPU mesh: the sharded telemetry
step must match the single-device chain exactly (shard-count invariance),
and frames must decode across time-shard boundaries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from jsdr_tpu.demod.bpsk import BpskConfig, bpsk_init, bpsk_block
from jsdr_tpu.fec.decoder import fec_decode
from jsdr_tpu.io.sources import synth_bpsk_stream, synth_noise
from jsdr_tpu.parallel import make_mesh, sharded_telemetry_step, sharded_spectrum


@pytest.fixture(scope="module")
def streams(  ):
    rng = np.random.default_rng(11)
    payloads = rng.integers(0, 256, (2, 256), dtype=np.uint8)
    t_len = 96000 * 6
    s0 = synth_bpsk_stream(payloads[:1], rate=96000, preamble_bits=200, seed=1)
    s1 = synth_bpsk_stream(payloads[1:], rate=96000, preamble_bits=300, seed=2)

    def fit(x):
        out = np.zeros(t_len, np.complex64)
        out[:min(len(x), t_len)] = x[:t_len]
        return out

    arr = np.stack([fit(s0), fit(s1),
                    synth_noise(t_len, 0.3, 3),
                    synth_noise(t_len, 0.3, 4)])
    return arr, payloads


def test_sharded_matches_single_device(streams):
    arr, payloads = streams
    mesh = make_mesh(dp=2, sp=4)
    step = sharded_telemetry_step(mesh, rate=96000, tuning=12000.0)
    x = jax.device_put(jnp.asarray(arr), NamedSharding(mesh, P("dp", "sp")))
    windows, corr, n_hits, n_bits = jax.block_until_ready(step(x))

    # single-device reference for stream 0 and 1
    cfg = BpskConfig(rate=96000, tuning=12000.0)
    for s in range(2):
        st = bpsk_init(cfg)
        out, st = bpsk_block(jnp.asarray(arr[s]), cfg, st)
        assert int(n_bits[s]) == int(out.n_bits)
        assert int(n_hits[s]) == int(out.n_hits) == 1
        assert int(corr[s, 0]) == int(out.hit_corr[0]) == 65
        assert np.array_equal(np.asarray(windows[s, 0]),
                              np.asarray(out.windows[0]))
    res = fec_decode(windows)
    for s in range(2):
        assert bool(res.ok[s, 0])
        assert np.array_equal(np.asarray(res.payload[s, 0]), payloads[s])


def test_mesh_shape_invariance(streams):
    """dp x sp factorization must not change results."""
    arr, _ = streams
    results = []
    for dp, sp in [(4, 2), (2, 4), (1, 8)]:
        mesh = make_mesh(dp=dp, sp=sp)
        step = sharded_telemetry_step(mesh, rate=96000, tuning=12000.0)
        x = jax.device_put(jnp.asarray(arr[:4]),
                           NamedSharding(mesh, P("dp", "sp")))
        w, c, h, b = jax.block_until_ready(step(x))
        results.append((np.asarray(w), np.asarray(h), np.asarray(b)))
    for w, h, b in results[1:]:
        assert np.array_equal(w, results[0][0])
        assert np.array_equal(h, results[0][1])
        assert np.array_equal(b, results[0][2])


def test_sharded_spectrum(streams):
    arr, _ = streams
    mesh = make_mesh(dp=4, sp=2)
    fn = sharded_spectrum(mesh, rate=96000.0)
    blocks = jax.device_put(jnp.asarray(arr.reshape(-1, 9600)[:64]),
                            NamedSharding(mesh, P(("dp", "sp"), None)))
    res = jax.block_until_ready(fn(blocks))
    assert res.psd.shape == (64, 9600)
    # stream 0 carries BPSK spread around 13.2 kHz; the peak wanders
    # within the +-1200 Hz main lobe
    assert abs(int(res.peak_freq[0]) - 13200) < 1300
