"""AO-40 FEC codec: Viterbi(k=7, r=1/2) + 2x shortened RS(255,223).

Layered as:

- :mod:`jsdr_tpu.fec.tables` — generated/public constant tables
- :mod:`jsdr_tpu.fec.ref_numpy` — host oracle + test-vector generator
- :mod:`jsdr_tpu.fec.viterbi` — batched JAX Viterbi (scan ACS + traceback)
- :mod:`jsdr_tpu.fec.rs` — batched JAX RS(255,223) decoder
- :mod:`jsdr_tpu.fec.decoder` — full-frame decode API (parity with
  FECDecoder.FECDecode, FECDecoder.java:703)
"""

from .tables import SYNC_VECTOR, SYNC_BITS, SYMPBLOCK, NBITS, BLOCKSIZE  # noqa: F401
from .ref_numpy import encode_fec40, fec_decode, symbols_to_soft  # noqa: F401
