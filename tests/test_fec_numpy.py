"""Oracle (numpy) codec self-consistency: encode -> corrupt -> decode."""

import numpy as np
import pytest

from jsdr_tpu.fec import ref_numpy as ref
from jsdr_tpu.fec.tables import SYMPBLOCK


def test_roundtrip_clean(rng):
    payload = rng.integers(0, 256, 256, dtype=np.uint8)
    sym = ref.encode_fec40(payload)
    assert sym.shape == (SYMPBLOCK,)
    out, rc = ref.fec_decode(ref.symbols_to_soft(sym))
    assert rc == 0
    assert np.array_equal(out, payload)


def test_roundtrip_with_channel_errors(rng):
    payload = rng.integers(0, 256, 256, dtype=np.uint8)
    soft = ref.symbols_to_soft(ref.encode_fec40(payload))
    bad = soft.copy()
    idx = rng.choice(SYMPBLOCK, 120, replace=False)
    bad[idx] ^= 0x80  # flip hard decisions
    out, rc = ref.fec_decode(bad)
    assert rc == 120  # re-encode check counts exactly the flipped symbols
    assert np.array_equal(out, payload)


def test_soft_noise_decodes(rng):
    """Soft symbols jittered around the hard points still decode."""
    payload = rng.integers(0, 256, 256, dtype=np.uint8)
    sym = ref.encode_fec40(payload)
    centers = np.where(sym > 0, 0xC0, 0x40).astype(np.int64)
    noisy = np.clip(centers + rng.integers(-48, 49, SYMPBLOCK), 0, 255)
    out, rc = ref.fec_decode(noisy.astype(np.uint8))
    assert rc >= 0
    assert np.array_equal(out, payload)


def test_uncorrectable_fails(rng):
    noise = rng.integers(0, 256, SYMPBLOCK, dtype=np.uint8)
    _, rc = ref.fec_decode(noise)
    assert rc == -1


def test_rs_codeword_correction(rng):
    """RS layer alone corrects up to 16 byte errors, fails at 17."""
    payload = rng.integers(0, 256, 256, dtype=np.uint8)
    cw = ref.descramble_demux(ref.viterbi27(
        ref.deinterleave(ref.symbols_to_soft(ref.encode_fec40(payload)))))[0]
    for nerr, expect_ok in [(16, True), (17, False)]:
        bad = cw.copy()
        pos = 95 + rng.choice(160, nerr, replace=False)
        bad[pos] ^= rng.integers(1, 256, nerr).astype(np.uint8)
        fixed, cnt = ref.decode_rs_8(bad)
        if expect_ok:
            assert cnt == nerr
            assert np.array_equal(fixed, cw)
        else:
            # 17 errors: either detected failure or a miscorrection, never
            # a silent success with the original codeword
            assert cnt == -1 or not np.array_equal(fixed, cw)
