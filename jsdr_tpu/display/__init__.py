"""Headless display pipeline: data reductions that feed any renderer
(PNG, terminal, web) — the compute half of the reference's Swing tabs
(phase.java, fft.java, waterfall.java) without the AWT half."""

from .waterfall import Waterfall  # noqa: F401
from .phase_scope import phase_scope_data  # noqa: F401
from .render import (render_waterfall_png, render_psd_ascii,  # noqa: F401
                     render_phase_png, render_trace_ascii,  # noqa: F401
                     render_spectrum_png, write_png_rgb)  # noqa: F401
