"""IQ ingestion and synthesis: S16LE conversion with DC correction,
raw/WAV file sources with loop semantics, block framing, synthetic
signal generators (sine/noise/BPSK), raw recorder sink."""

from .convert import s16le_to_complex, complex_to_s16le  # noqa: F401
from .sources import (  # noqa: F401
    FileSource, open_source, read_wav, synth_sine, synth_noise,
    synth_bpsk_stream,
)
from .framer import BlockFramer  # noqa: F401
from .recorder import RawRecorder  # noqa: F401
