"""Generated FEC tables must match the published AO-40 constants embedded in
the reference (FECDecoder.java:40-181, FUNcubeBPSKDemod.java:79-81)."""

import numpy as np

from jsdr_tpu.fec import tables as t


def test_partab_spot():
    # parity of a byte
    for v in range(256):
        assert t.PARTAB[v] == bin(v).count("1") % 2


def test_gf_tables():
    # spot values from FECDecoder.java:145-181
    assert list(t.ALPHA_TO[:12]) == [1, 2, 4, 8, 16, 32, 64, 128, 0x87, 0x89, 0x95, 0xAD]
    assert t.ALPHA_TO[254] == 0xC3
    assert t.INDEX_OF[0] == 255 and t.INDEX_OF[1] == 0
    assert t.INDEX_OF[3] == 0x63 and t.INDEX_OF[255] == 0xB7
    assert t.INDEX_OF[0x80] == 0x07
    # log/antilog are inverse on nonzero elements
    for i in range(255):
        assert t.INDEX_OF[t.ALPHA_TO[i]] == i


def test_syms():
    # Syms[sr] = parity(sr&0x4f)<<1 | (1-parity(sr&0x6d)); FECDecoder.java:105-114
    assert list(t.SYMS[:16]) == [1, 2, 3, 0, 2, 1, 0, 3, 2, 1, 0, 3, 1, 2, 3, 0]
    assert list(t.SYMS[112:128]) == [3, 0, 1, 2, 0, 3, 2, 1, 0, 3, 2, 1, 3, 0, 1, 2]


def test_scrambler():
    # CCSDS randomizer, FECDecoder.java:118-139
    head = [0xFF, 0x48, 0x0E, 0xC0, 0x9A, 0x0D, 0x70, 0xBC,
            0x8E, 0x2C, 0x93, 0xAD, 0xA7, 0xB7, 0x46, 0xCE]
    assert list(t.SCRAMBLER[:16]) == head
    assert t.SCRAMBLER[254] == 0x58 and t.SCRAMBLER[255] == 0xFF
    assert list(t.SCRAMBLER[256:260]) == [0x48, 0x0E, 0xC0, 0x9A]
    assert t.SCRAMBLER[319] == 0xFD


def test_sync_vector():
    expect = [1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, 1, 1, 1, -1, 1, 1, 1, 1,
              -1, -1, 1, -1, 1, 1, -1, -1, 1, -1, -1, 1, -1, -1, -1, -1, -1,
              -1, 1, -1, -1, -1, 1, -1, -1, 1, 1, -1, -1, -1, 1, -1, 1, 1, 1,
              -1, 1, -1, 1, 1, -1, 1, 1, -1, -1, -1]
    assert list(t.SYNC_VECTOR) == expect  # FUNcubeBPSKDemod.java:79-81


def test_mettab_shape_and_spots():
    assert t.METTAB.shape == (2, 256)
    assert t.METTAB[0, 0] == 20 and t.METTAB[0, 255] == -372
    assert t.METTAB[1, 0] == -372 and t.METTAB[1, 255] == 20
    assert t.METTAB[0, 0x40] == 20 and t.METTAB[0, 0xC0] == -164
    assert t.METTAB[1, 0x40] == -161 and t.METTAB[1, 0xC0] == 20


def test_constants():
    assert t.NBITS == 2566
    assert t.SYMPBLOCK == 5200
    assert t.NN - t.RSPAD - t.NROOTS == 128  # shortened payload per codeword
