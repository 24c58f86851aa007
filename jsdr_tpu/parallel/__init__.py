"""Multi-chip scaling: device meshes, halo-exchange overlap-save
filtering, and the sharded telemetry pipeline.

The reference is single-process thread-parallel (SURVEY.md section 2.2);
this package supplies the distributed design obligations: DP (streams
across devices), SP (time axis across devices with ring halo exchange of
filter prehistory via ``ppermute``), and XLA collectives over ICI/DCN.
"""

from .mesh import make_mesh  # noqa: F401
from .sharded import sharded_telemetry_step, sharded_spectrum  # noqa: F401
