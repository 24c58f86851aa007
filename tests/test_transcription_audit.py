"""Transcription audit: every constant table in the framework equals the
reference's literal arrays.

Parity must not rest on one transcription being right twice (the FEC
oracle and the JAX path share this module's tables), so each table is
checked two independent ways:

1. parsed straight out of the reference JAVA SOURCE at test time
   (FECDecoder.java:40-181, 544-546; FUNcubeBPSKDemod.java:27-81) when
   /root/reference is present — a literal-vs-derived comparison;
2. against embedded SHA-256 checksums of the canonical byte encoding,
   so the values stay pinned even where the reference tree is absent.
"""

from __future__ import annotations

import hashlib
import re
from pathlib import Path

import numpy as np
import pytest

from jsdr_tpu.demod.bpsk import DM_FILTER, DS_FILTER, HOWARD_FUDGE_FACTOR
from jsdr_tpu.fec import tables as T

REF = Path("/root/reference")

# sha256 of the canonical encoding (see _digest) of every constant table
CHECKSUMS = {
    "PARTAB": "5ee98246b0f362addc3876494a339d3a058e9a02dcc295338b8a94f59215943e",
    "METTAB": "fea36d4e695f8d2d0c6f634f3a4ba135476c9005871a6e1ce056e0e5d9b8a4b6",
    "SYMS": "08511ddba77c3ab4d4ed892f7053cdb33735748b1f6de3fb6b01d34d2ab2c9c2",
    "SCRAMBLER": "f296f0107a25912676df0498d306785fde4b7e0cb619c078f3ffa6e361cae370",
    "ALPHA_TO": "8596635238d9ccef8d780345387889824562f99a077342f6ed30c3cc68fddaca",
    "INDEX_OF": "e23724fcdedf96246a5f9c92576df266a5f8cc4a845601bf04a528d2fa0512d3",
    "RS_POLY": "f717d5b0d8b81090c5df8c3898fb760004496f5d5a5a955ce78783527bb2f0e6",
    "SYNC_VECTOR": "ab2f814ac744426ee5b54baa9895960362221bcb24ea0e8c6f009b8650489822",
    "DS_FILTER": "242311bd74848682b2f3f97df5ee2448e6cbd6aebcce38bea432b40e3d214da6",
    "DM_FILTER": "c95440f26c7d128e9000d51006be6f078d663e774d4081df7de2e7e53cbc98fc",
}


def _digest(arr: np.ndarray) -> str:
    """Canonical digest: int tables as int64 bytes, float tables as the
    repr of float64 values (exact decimal round-trip)."""
    a = np.asarray(arr)
    if np.issubdtype(a.dtype, np.integer):
        data = a.astype(np.int64).tobytes()
    else:
        data = ",".join(repr(float(v)) for v in a.reshape(-1)).encode()
    return hashlib.sha256(data).hexdigest()


def _parse_java_array(path: Path, decl_regex: str) -> np.ndarray:
    """Extract the literal initializer of a Java array declaration:
    scan from the declaration to the brace-matched '};', strip comments,
    parse every numeric token (F/f/L suffixes dropped)."""
    src = path.read_text()
    m = re.search(decl_regex, src)
    assert m, f"{decl_regex!r} not found in {path}"
    i = src.index("{", m.start())
    depth, j = 0, i
    while True:
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                break
        j += 1
    body = src[i:j + 1]
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    body = re.sub(r"//[^\n]*", "", body)
    toks = re.findall(
        r"[-+]?0[xX][0-9a-fA-F]+|[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?", body)
    if all("." not in t and "e" not in t.lower() or t.lower().startswith("0x")
           for t in toks):
        return np.asarray([int(t, 0) for t in toks], dtype=np.int64)
    return np.asarray([float(t) for t in toks], dtype=np.float64)


# (our table, checksum key, reference file, declaration regex)
AUDITS = [
    (lambda: T.PARTAB, "PARTAB", "FECDecoder.java", r"byte Partab\[\]"),
    (lambda: T.METTAB, "METTAB", "FECDecoder.java", r"int mettab\[\]\[\]"),
    (lambda: T.SYMS, "SYMS", "FECDecoder.java", r"int Syms\[\]"),
    (lambda: T.SCRAMBLER, "SCRAMBLER", "FECDecoder.java",
     r"int Scrambler\[\]"),
    (lambda: T.ALPHA_TO, "ALPHA_TO", "FECDecoder.java", r"int ALPHA_TO\[\]"),
    (lambda: T.INDEX_OF, "INDEX_OF", "FECDecoder.java", r"int INDEX_OF\[\]"),
    (lambda: T.RS_POLY, "RS_POLY", "FECDecoder.java", r"int RS_poly\[\]"),
    (lambda: T.SYNC_VECTOR, "SYNC_VECTOR", "FUNcubeBPSKDemod.java",
     r"byte\[\] SYNC_VECTOR"),
    (lambda: DS_FILTER, "DS_FILTER", "FUNcubeBPSKDemod.java",
     r"double\[\] dsFilter"),
    (lambda: DM_FILTER, "DM_FILTER", "FUNcubeBPSKDemod.java",
     r"double\[\] dmFilter"),
]


@pytest.mark.parametrize("getter,key,ref_file,decl",
                         AUDITS, ids=[a[1] for a in AUDITS])
def test_table_matches_reference_literals(getter, key, ref_file, decl):
    ours = np.asarray(getter())
    if not (REF / ref_file).exists():
        pytest.skip("reference tree not present")
    ref = _parse_java_array(REF / ref_file, decl)
    if key == "DM_FILTER":
        # the reference stores the matched filter DUPLICATED 2x for
        # wrap-free circular indexing (FUNcubeBPSKDemod.java:58-77)
        assert ref.size == 2 * ours.size
        np.testing.assert_array_equal(ref[:ours.size], ref[ours.size:])
        ref = ref[:ours.size]
    assert ref.size == ours.size, (key, ref.size, ours.size)
    if np.issubdtype(ours.dtype, np.floating):
        np.testing.assert_array_equal(ref, ours.reshape(-1).astype(np.float64))
    else:
        np.testing.assert_array_equal(ref.reshape(ours.shape),
                                      ours.astype(np.int64))


@pytest.mark.parametrize("getter,key,ref_file,decl",
                         AUDITS, ids=[a[1] for a in AUDITS])
def test_table_checksum_pinned(getter, key, ref_file, decl):
    assert _digest(np.asarray(getter())) == CHECKSUMS[key], key


def test_howard_fudge_factor():
    """The USED decimator gain is 0.9*32768 (FUNcubeBPSKDemod.java:469 —
    not the dead DOWN_SAMPLE_MULT at :56)."""
    assert HOWARD_FUDGE_FACTOR == 0.9 * 32768.0
    if REF.exists():
        src = (REF / "FUNcubeBPSKDemod.java").read_text()
        assert "HOWARD_FUDGE_FACTOR = 0.9 * 32768.0" in src
        assert "fi * HOWARD_FUDGE_FACTOR" in src


if __name__ == "__main__":
    # regenerate the checksum block (out-of-band; run by hand)
    for getter, key, _, _ in AUDITS:
        print(f'    "{key}": "{_digest(np.asarray(getter()))}",')
