"""Demodulators: AM/NFM/WFM audio (demod.java) and the FUNcube 1200 bps
BPSK telemetry chain (FUNcubeBPSKDemod.java), re-designed as batched XLA
ops + ``lax.scan`` recurrences over explicit state pytrees."""

from .am_fm import AmFmConfig, AmFmState, Mode, demod_block  # noqa: F401
from .bpsk import (  # noqa: F401
    BpskConfig, BpskState, bpsk_init, bpsk_block, soft_frames_from_bits,
)
