"""Device mesh construction and sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.8); parallelism is
a first-class subsystem here instead:

- ``dp``   frame/data parallel — independent video segments or batch rows
- ``sp``   spatial parallel — H-axis sharding within a frame (halo stencils)
- ``tp``   tensor parallel — attention heads / MLP columns of depth models

Axis sizes are chosen to fill ``jax.devices()``; any axis can be 1. All
shardings are ``NamedSharding`` over one global mesh so XLA lays collectives
onto ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "sp", "tp")


def make_mesh(dp: int | None = None, sp: int = 1, tp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (sp * tp)
    assert dp * sp * tp == n, (
        f"mesh {dp}x{sp}x{tp} != {n} devices"
    )
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, AXES)


def frame_dp_sharding(mesh: Mesh) -> NamedSharding:
    """[T, H, W, C] batches sharded over frames."""
    return NamedSharding(mesh, P("dp"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """[T, H, W, C] batches sharded over frames and image rows."""
    return NamedSharding(mesh, P("dp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
