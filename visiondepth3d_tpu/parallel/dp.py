"""Frame-level data parallelism: segment-parallel video rendering.

The EMA trackers make frames *sequential* — the reference renders strictly
serially. The DP scheme that preserves local semantics: cut the video into G
contiguous segments, give each mesh ``dp`` device one segment, and run the
scanned stereo step independently per segment (each segment's trackers warm
up from scratch, exactly like starting the reference at a scene boundary).
Segment boundaries are chosen at scene cuts when available so the EMA
warm-up is invisible.

Implementation is pure pjit: vmap the scanned chunk over the segment axis
and constrain that axis to the ``dp`` mesh dim — XLA partitions the whole
scan across devices with zero collectives in the steady state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..state import StereoTrackers, init_trackers
from ..stereo import StereoParams
from ..stereo.step import render_chunk


def init_trackers_batch(g: int, height: int, width: int) -> StereoTrackers:
    one = init_trackers(height, width)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (g,) + x.shape), one)


def render_segments(
    params: StereoParams,
    trackers: StereoTrackers,  # batched: leading axis G
    frames: jnp.ndarray,  # [G, T, H, W, 3]
    depths: jnp.ndarray,  # [G, T, H, W]
    mesh: Mesh | None = None,
):
    """Render G contiguous segments in parallel; returns (trackers, outs)."""

    def one(t, f, d):
        return render_chunk(params, t, f, d)

    if mesh is not None:
        seg_sharding = NamedSharding(mesh, P("dp"))
        frames = jax.lax.with_sharding_constraint(frames, seg_sharding)
        depths = jax.lax.with_sharding_constraint(depths, seg_sharding)
        trackers = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, seg_sharding), trackers
        )
    return jax.vmap(one)(trackers, frames, depths)


def segment_bounds(total_frames: int, g: int,
                   scene_cuts: list[int] | None = None) -> list[tuple[int, int]]:
    """Split [0, total) into G contiguous spans, snapping to scene cuts when
    they are within 10% of the even split point."""
    even = [round(i * total_frames / g) for i in range(g + 1)]
    if scene_cuts:
        tol = max(1, total_frames // (g * 10))
        for i in range(1, g):
            best = min(scene_cuts, key=lambda c: abs(c - even[i]), default=None)
            if best is not None and abs(best - even[i]) <= tol:
                even[i] = best
    return [(even[i], even[i + 1]) for i in range(g)]


def render_chunk_spatial(
    params: StereoParams,
    trackers: StereoTrackers,
    frames: jnp.ndarray,  # [T, H, W, 3]
    depths: jnp.ndarray,  # [T, H, W]
    mesh: Mesh,
):
    """Spatially-sharded stereo chunk: frame rows split over the ``sp`` axis.

    For 4K+ frames that don't fit (or don't saturate) one chip. Pure GSPMD:
    the inputs carry a P(None, "sp") sharding constraint and XLA partitions
    the whole scanned step — halo exchanges for the blur/gradient stencils
    and psums for the depth statistics are inserted automatically, riding
    ICI. The warp stays row-local (zero communication) because the
    shifted-accumulation only mixes columns. Use warp_backend="xla" here
    (the Pallas kernel doesn't partition).
    """
    sh = NamedSharding(mesh, P(None, "sp"))
    frames = jax.lax.with_sharding_constraint(frames, NamedSharding(mesh, P(None, "sp", None, None)))
    depths = jax.lax.with_sharding_constraint(depths, sh)
    if params.warp_backend == "auto":
        params = params.replace(warp_backend="xla")
    return render_chunk(params, trackers, frames, depths)
