"""Interactive shell tests: the TuiModel state machine (key dispatch per
accelerator-map.txt, pub/sub ingestion, screen composition, config
persistence) and the full pipeline thread driving a file source."""

import time

import numpy as np
import pytest

from jsdr_tpu.app.tui import (Controls, PipelineThread, StageManager,
                              TuiModel, decode_key)
from jsdr_tpu.runtime.config import Config
from jsdr_tpu.runtime.pubsub import PubSub


def make_model(tmp_path, **kw):
    cfg = Config(tmp_path / "jsdr.properties")
    pubsub = PubSub()
    controls = Controls()
    return TuiModel(cfg, pubsub, controls, **kw), cfg, pubsub, controls


# ------------------------------------------------------------- key decode

def test_decode_key():
    assert decode_key(ord("a")) == "a"
    assert decode_key(17) == "ctrl-q"                 # Ctrl-Q
    assert decode_key(15) == "ctrl-o"                 # Ctrl-O
    assert decode_key(9) == "tab"
    assert decode_key(353) == "shift-tab"
    assert decode_key(10) == "enter"
    assert decode_key(127) == "backspace"
    assert decode_key(27) == "esc"
    assert decode_key(27, ord("p")) == "alt-p"        # Alt-P pause
    assert decode_key(27, ord("I")) == "alt-I"        # Alt-Shift-I
    assert decode_key(500) is None                    # unmapped special


# ----------------------------------------------------------- key handling

def test_tab_focus_and_persistence(tmp_path):
    model, cfg, _, _ = make_model(tmp_path)
    assert model.tabs == ["phase", "fft", "demod", "record",
                          "FUNcube0", "FUNcube1"]
    model.handle_key("tab")
    assert model.tabs[model.tab] == "demod"   # default focus 1 (fft) + 1
    model.handle_key("shift-tab")
    model.handle_key("1")
    assert model.tabs[model.tab] == "phase"
    model.handle_key("5")
    assert model.tabs[model.tab] == "FUNcube0"
    # quit saves jsdr-tab-focus (jsdr.java:105-115 analog)
    assert model.handle_key("ctrl-q") is False
    saved = Config(tmp_path / "jsdr.properties")
    assert saved.get_int("jsdr-tab-focus", -1) == 4


def test_pause_and_corrections(tmp_path):
    model, _, _, controls = make_model(tmp_path)
    model.handle_key("p")
    assert controls.paused
    model.handle_key("alt-p")
    assert not controls.paused
    # audio menu: Alt-I/Alt-Shift-I, Alt-Q/Alt-Shift-Q, Alt-R
    model.handle_key("alt-i")
    model.handle_key("alt-i")
    model.handle_key("alt-Q")
    assert (controls.icorr, controls.qcorr) == (2, -1)
    model.handle_key("alt-r")
    assert (controls.icorr, controls.qcorr) == (0, 0)
    # phase-tab-scoped plain keys do the same (corrections shown there)
    model.handle_key("1")
    model.handle_key("i")
    model.handle_key("q")
    model.handle_key("Q")
    model.handle_key("Q")
    assert (controls.icorr, controls.qcorr) == (1, -1)


def test_fcd_tuning_steps_and_prompt(tmp_path):
    model, _, pubsub, _ = make_model(tmp_path)
    f0 = model.fcd_khz
    model.handle_key("+")
    model.handle_key(">")
    model.handle_key("}")
    model.handle_key("-")
    assert model.fcd_khz == f0 + 1 + 10 + 50 - 1
    assert pubsub.get("fcd-tune-khz") == model.fcd_khz
    # Ctrl-F opens the frequency prompt; digits + enter commit
    model.handle_key("ctrl-f")
    assert model.prompt is not None
    for ch in "145935":
        model.handle_key(ch)
    model.handle_key("enter")
    assert model.prompt is None and model.fcd_khz == 145935
    # esc cancels, backspace edits
    model.handle_key("ctrl-f")
    model.handle_key("9")
    model.handle_key("backspace")
    model.handle_key("esc")
    assert model.prompt is None and model.fcd_khz == 145935


def test_fft_hamming_toggle_scoped(tmp_path):
    model, _, _, _ = make_model(tmp_path)
    model.handle_key("2")                      # fft tab
    assert model.hamming
    model.handle_key("h")
    assert not model.hamming
    model.handle_key("1")                      # phase tab: h unmapped
    model.handle_key("h")
    assert not model.hamming
    model.handle_key("alt-h")                  # global chord still works
    assert model.hamming


def test_demod_tab_keys(tmp_path):
    model, _, pubsub, _ = make_model(tmp_path)
    model.handle_key("3")                      # demod tab
    model.handle_key("n")
    assert model.demod_mode == "nfm" and model.demod_dirty
    model.handle_key("a")
    assert model.demod_mode == "am"
    model.handle_key("w")
    assert model.demod_mode == "wfm"
    model.handle_key("g")
    assert model.agc
    model.handle_key("i")
    assert model.fir_enabled
    model.handle_key("s")
    assert model.downshift
    # band move/widen in 500 Hz steps (accelerator-map: AltGr-L/K chords)
    flo, fhi = model.flo, model.fhi
    model.handle_key("l")
    assert (model.flo, model.fhi) == (flo + 500, fhi + 500)
    model.handle_key("k")
    model.handle_key("L")
    assert (model.flo, model.fhi) == (flo - 250, fhi + 250)
    model.handle_key("K")
    # the overlay topics fft.java reads (demod-filter-low/high)
    assert pubsub.get("demod-filter-low") == model.flo
    assert pubsub.get("demod-filter-high") == model.fhi
    # FIR band prompt
    model.handle_key("f")
    for ch in "-2000:2500":
        model.handle_key(ch)
    model.handle_key("enter")
    assert (model.flo, model.fhi) == (-2000, 2500)
    # mode keys are demod-tab-scoped: 'w' elsewhere does nothing
    model.handle_key("1")
    model.handle_key("o")
    assert model.demod_mode == "wfm"


def test_funcube_tab_keys(tmp_path):
    model, _, pubsub, _ = make_model(tmp_path)
    model.handle_key("6")                      # FUNcube1 tab
    model.handle_key("F")
    for ch in "9000":
        model.handle_key(ch)
    model.handle_key("enter")
    assert model.tunings == [12000.0, 9000.0]
    assert pubsub.get("FUNcube1-bpsk-tune") == 9000.0
    assert pubsub.get("bpsk-tunings") == [12000.0, 9000.0]
    model.handle_key("u")
    assert model.track_high[1] and model.bpsk_dirty
    model.handle_key("x")
    assert model.dofft[1]


def test_record_tab_keys(tmp_path):
    model, _, _, _ = make_model(tmp_path)
    model.handle_key("4")
    model.handle_key("o")
    for ch in "cap.raw":
        model.handle_key(ch)
    model.handle_key("enter")
    assert model.record_path == "cap.raw"
    model.handle_key("e")
    assert model.record_enabled and model.record_dirty


def test_open_and_close_source(tmp_path):
    model, _, _, controls = make_model(tmp_path)
    model.handle_key("ctrl-o")
    for ch in "x.raw":
        model.handle_key(ch)
    model.handle_key("enter")
    assert controls.new_source == "file:x.raw"
    assert controls.source_epoch == 1
    model.handle_key("ctrl-d")
    for ch in "pipe:/tmp/f":
        model.handle_key(ch)
    model.handle_key("enter")
    assert controls.new_source == "pipe:/tmp/f"
    model.handle_key("ctrl-w")
    assert controls.stop_source


def test_config_roundtrip(tmp_path):
    model, _, _, controls = make_model(tmp_path)
    model.handle_key("3")
    model.handle_key("n")
    model.handle_key("g")
    model.handle_key("alt-i")
    model.handle_key("6")
    model.handle_key("f")
    for ch in "8500":
        model.handle_key(ch)
    model.handle_key("enter")
    model.handle_key("ctrl-q")
    # a new model constructed from the saved file restores the state
    model2, _, _, c2 = make_model(tmp_path)
    assert model2.demod_mode == "nfm" and model2.agc
    assert c2.icorr == 1
    assert model2.tunings[1] == 8500.0
    assert model2.tabs[model2.tab] == "FUNcube1"


# ---------------------------------------------------------------- render

def test_render_screens(tmp_path):
    model, _, pubsub, _ = make_model(tmp_path)
    w, h = 100, 36
    # publish a PSD line with a peak at +12 kHz (bin 1200 of 9600 @ 96k)
    psd = np.full(9600, -90.0, np.float32)
    psd[1200] = -20.0
    pubsub.publish("fft-psd", psd)
    pubsub.publish("fft-peak", (12000, -20.0))
    pubsub.publish("audio-frame", 41)
    scr = model.render(w, h)
    assert len(scr) == h and all(len(ln) == w for ln in scr)
    assert "block 42" in scr[0]
    model.handle_key("2")                      # fft tab shows the peak
    scr = "\n".join(model.render(w, h))
    assert "peak -20.0 dBFS @ 12000 Hz" in scr
    assert "#" in scr                          # psd trace drawn
    # waterfall ingested the line (non-blank shades)
    assert model.waterfall.buf[0].max() > 0
    # phase tab with an IQ block
    pubsub.publish("iq-block",
                   (0.5 * np.exp(2j * np.pi * 0.01 *
                                 np.arange(2048))).astype(np.complex64))
    model.handle_key("1")
    scr = "\n".join(model.render(w, h))
    assert "*" in scr and "autoscale" in scr
    # funcube tab shows a decoded frame hexdump
    pubsub.publish("telemetry-frame",
                   {"demod": 0, "tuning": 12000.0, "ok": True, "corr": 60,
                    "channel_errors": 3,
                    "payload": np.arange(256, dtype=np.uint8)})
    pubsub.publish("telemetry-counters", {0: (100, 10, 5, 1)})
    model.handle_key("5")
    scr = "\n".join(model.render(w, h))
    assert "corr=60" in scr and "00 01 02 03" in scr
    assert "raw=100" in scr
    # prompt renders in the status bar
    model.handle_key("F")
    model.handle_key("9")
    assert "9_" in model.render(w, h)[-1]


# ------------------------------------------------------- pipeline thread

def test_pipeline_thread_end_to_end(tmp_path):
    """Full application loop: file source -> StageManager stages ->
    pub/sub -> model, with a live demod-mode change swapping the stage.
    (The curses layer is the only part not under test.)"""
    from jsdr_tpu.io.sources import synth_sine
    from jsdr_tpu.io.convert import complex_to_s16le

    rate = 9600      # keep the CPU test fast; all shapes derive from rate
    iq = synth_sine(rate * 2, 1200.0, rate, analytic=False)
    path = tmp_path / "tone.raw"
    path.write_bytes(complex_to_s16le(iq))

    model, cfg, pubsub, controls = make_model(tmp_path, rate=rate,
                                              n_funcube=1)
    controls.new_source = f"file:{path}"
    controls.source_epoch += 1
    pipe = PipelineThread(model, rate, paced=False)
    pipe.start()
    deadline = time.time() + 60
    while model.blocks < 3 and time.time() < deadline:
        time.sleep(0.05)
    assert model.blocks >= 3, f"pipeline stalled: {model.status}"
    assert model.last_psd is not None and model.last_iq is not None
    # live reconfiguration: enable AM demod mid-run
    model.handle_key("3")
    model.handle_key("a")
    b0 = model.blocks
    while (model.blocks < b0 + 3 or pubsub.get("audio-out") is None) \
            and time.time() < deadline:
        time.sleep(0.05)
    assert pubsub.get("audio-out") is not None, "demod stage not swapped in"
    # pause stops block flow
    model.handle_key("p")
    time.sleep(0.3)
    b1 = model.blocks
    time.sleep(0.3)
    assert model.blocks <= b1 + 1
    model.handle_key("p")
    # quit tears the thread down
    model.handle_key("ctrl-q")
    pipe.join(timeout=10)
    assert not pipe.is_alive()


def test_stage_manager_mesh(tmp_path):
    """ui --mesh: the StageManager builds the telemetry stage on the
    device mesh, and degrades (with a status note) when the TUI's 0.1 s
    block cadence cannot satisfy the mesh's shard-shape contract (dofft
    needs whole 0.1 s blocks PER SHARD)."""
    from jsdr_tpu.parallel import make_mesh

    mesh = make_mesh(dp=2, sp=4)
    model, _, pubsub, _ = make_model(tmp_path, rate=96000, n_funcube=1)
    mgr = StageManager(model, 96000, mesh=mesh)
    assert mgr.telem is not None and mgr.telem.mesh is mesh
    mgr.close()

    model2, _, _, _ = make_model(tmp_path, rate=96000, n_funcube=1)
    model2.handle_key("5")            # FUNcube tab
    model2.handle_key("x")            # dofft on
    mgr2 = StageManager(model2, 96000, mesh=mesh)
    assert mgr2.telem is not None and mgr2.telem.mesh is None
    assert "mesh off" in model2.status
    mgr2.close()


def test_stage_manager_swaps(tmp_path):
    model, _, pubsub, _ = make_model(tmp_path, rate=9600, n_funcube=1)
    mgr = StageManager(model, 9600)
    names = [s.name for s in mgr.stages]
    assert names == ["control-sync", "phase-tap", "spectrum", "telemetry"]
    # demod-mode change appends a demod stage on the next sync
    model.handle_key("3")
    model.handle_key("n")

    import types
    fake = types.SimpleNamespace(pubsub=pubsub)

    def sync():
        mgr.process(None, fake)
    mgr.process(None, fake)
    assert [s.name for s in mgr.stages][-1] == "demod"
    # mode off removes it again
    model.handle_key("o")
    mgr.process(None, fake)
    assert "demod" not in [s.name for s in mgr.stages]
    # tuning sync flows into the telemetry stage without a rebuild
    telem0 = mgr.telem
    model.handle_key("5")
    model.handle_key("F")
    for ch in "9000":
        model.handle_key(ch)
    model.handle_key("enter")
    mgr.process(None, fake)
    assert mgr.telem is telem0 and mgr.telem.tunings == [9000.0]
    # dofft toggle rebuilds (compile-time config change)
    model.handle_key("x")
    mgr.process(None, fake)
    assert mgr.telem is not telem0
    mgr.close()
