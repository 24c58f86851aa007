"""Live ingest (paced/pipe/subprocess sources) and real-time audio sink —
the application-loop capabilities of the reference (JavaAudio.java
capture+pacing, demod.java speaker thread), built on OS pipes."""

import os
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from jsdr_tpu.io import convert, sources
from jsdr_tpu.io.live import AudioSink, PacedSource, StreamSource


def test_paced_source_deadline_pacing():
    """Pacing is deadline-based: sleeps sum to n_samples/rate regardless
    of per-chunk jitter (JavaAudio.java:231-233 semantics)."""
    clock_t = [0.0]
    sleeps = []

    def clock():
        return clock_t[0]

    def sleep(dt):
        sleeps.append(dt)
        clock_t[0] += dt

    chunks = [np.zeros(9600, np.complex64)] * 5
    out = list(PacedSource(iter(chunks), rate=96000, clock=clock, sleep=sleep))
    assert len(out) == 5
    # each 9600-sample chunk at 96k = 0.1 s cadence
    assert sleeps == pytest.approx([0.1] * 5)
    # a slow consumer (clock already past deadline) never sleeps
    clock_t[0] = 0.0
    sleeps.clear()

    def eager_clock():
        clock_t[0] += 0.2          # consumer takes 0.2 s per chunk
        return clock_t[0]

    out = list(PacedSource(iter(chunks), rate=96000,
                           clock=eager_clock, sleep=sleep))
    assert len(out) == 5 and sleeps == []


def test_stream_source_fifo(tmp_path):
    """A FIFO producer paces the pipeline; partial frames are held back
    until complete (the blocking sound-device read analog)."""
    fifo = tmp_path / "iq.fifo"
    os.mkfifo(fifo)
    iq = sources.synth_sine(19200, 4410.0, 96000.0)
    raw = convert.complex_to_s16le(iq)

    def producer():
        with open(fifo, "wb") as fh:
            # dribble in odd-sized pieces incl. a torn frame boundary
            for ofs in range(0, len(raw), 4099):
                fh.write(raw[ofs:ofs + 4099])
                fh.flush()

    t = threading.Thread(target=producer)
    t.start()
    src = StreamSource(f"pipe:{fifo}", rate=96000)
    got = np.concatenate(list(src))
    t.join()
    assert len(got) == len(iq)
    np.testing.assert_array_equal(got, convert.s16le_to_complex(raw))


def test_stream_source_capture_subprocess(tmp_path):
    """capture:<cmd> ingests a subprocess's stdout (device-capture analog,
    JavaAudio.java:347-367)."""
    iq = sources.synth_sine(9600, 1000.0, 96000.0)
    raw = convert.complex_to_s16le(iq)
    f = tmp_path / "c.raw"
    f.write_bytes(raw)
    src = StreamSource(f"capture:cat {f}", rate=96000)
    got = np.concatenate(list(src))
    np.testing.assert_array_equal(got, convert.s16le_to_complex(raw))


def test_audio_sink_file_and_overrun(tmp_path):
    out = tmp_path / "audio.raw"
    sink = AudioSink(str(out), max_blocks=32)
    audio = np.linspace(-0.5, 0.5, 960, dtype=np.float32)
    for _ in range(10):
        sink.write(audio)
    sink.close()
    data = np.frombuffer(out.read_bytes(), dtype="<i2").reshape(-1, 2)
    assert data.shape == (9600, 2)
    np.testing.assert_array_equal(data[:, 0], data[:, 1])   # mono dup
    assert data[0, 0] == np.int16(np.round(-0.5 * 32767))
    assert sink.overruns == 0 and sink.blocks_written == 10

    # a sink whose consumer never drains drops oldest blocks + counts
    fifo = tmp_path / "stuck.fifo"
    os.mkfifo(fifo)
    rd = os.open(fifo, os.O_RDONLY | os.O_NONBLOCK)  # reader that never reads
    try:
        slow = AudioSink(str(fifo), max_blocks=2)
        big = np.zeros(1 << 16, dtype=np.float32)    # > pipe buffer
        for _ in range(8):
            slow.write(big)
        deadline = time.time() + 5
        while slow.overruns == 0 and time.time() < deadline:
            time.sleep(0.01)
        assert slow.overruns > 0
        # the daemon writer thread is blocked in write(); closing the
        # read end (finally below) breaks the pipe and lets it exit —
        # don't close()/join here, the queue is full and put(None) blocks
    finally:
        os.close(rd)


def test_cli_demod_live_pipe_to_sink(tmp_path):
    """End-to-end application loop: S16LE IQ piped into `demod`, audio
    streamed out to a file sink via the real-time stage."""
    carrier = sources.synth_sine(96000, 4000.0, 96000.0, amplitude=0.4)
    t = np.arange(96000) / 96000.0
    iq = (carrier * (1.0 + 0.5 * np.sin(2 * np.pi * 1000.0 * t))
          ).astype(np.complex64)                 # AM: 1 kHz envelope
    src = tmp_path / "in.raw"
    src.write_bytes(convert.complex_to_s16le(iq))
    out = tmp_path / "live_audio.raw"
    r = subprocess.run(
        [sys.executable, "-m", "jsdr_tpu.app.main", "--cpu", "demod",
         "pipe:" + str(src), "--mode", "am", "--audio-out", str(out)],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "10 blocks (1.0s) demodulated (am)" in r.stdout, r.stdout
    data = np.frombuffer(out.read_bytes(), dtype="<i2")
    assert len(data) == 2 * 96000          # stereo at the input rate
    assert data.std() > 0                  # carrier produced audio


def test_cli_telemetry_live_pipe(tmp_path):
    """Telemetry over a live pipe: BPSK frames piped in as S16LE IQ
    decode as they stream (the running FUNcube-tab application loop)."""
    payload = np.arange(256, dtype=np.uint8)[None]
    sig = sources.synth_bpsk_stream(payload, rate=96000, preamble_bits=300)
    sig = np.concatenate([sig, np.zeros((-len(sig)) % 96000, np.complex64)])
    src = tmp_path / "telemetry.raw"
    src.write_bytes(convert.complex_to_s16le(sig))
    r = subprocess.run(
        [sys.executable, "-m", "jsdr_tpu.app.main", "--cpu", "telemetry",
         "pipe:" + str(src), "--tuning", "12000"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok=True channel_errors=0" in r.stdout, r.stdout
    assert "frames=1" in r.stdout
    # the hexdump shows the known payload
    assert "  0: 00 01 02 03" in r.stdout.replace("   0:", "  0:")
