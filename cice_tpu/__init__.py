"""cice_tpu — a TPU-native sea-ice modeling framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
CICE-Consortium/CICE v6 (EVP/rEVP/EAP/VP dynamics, incremental-remapping
transport, ridging, Icepack-equivalent column physics, forcing, history,
restart, diagnostics), built for TPU meshes: global-array state sharded with
`jax.sharding`, functional stepping under `jit`, Pallas kernels on the hot
stencils.
"""

from .config import Config, box2001_config, gx3_config
from .calendar import Calendar
from .core.grid import Grid, make_grid, rectgrid, latlon_grid, grid_average_X2Y
from .core.halo import BC

__version__ = "0.1.0"
