"""Halo exchange for spatially-sharded stencil ops.

The stereo stage's stencils (box blur, gradients, Gaussian DOF levels) reach
at most ``halo`` rows across an H-shard boundary. Inside ``shard_map`` over
the ``sp`` axis, ``halo_exchange_rows`` ships boundary rows to the vertical
neighbors with ``ppermute`` (ICI neighbor traffic only) so each shard can run
the stencil locally and crop back — the TPU generalization of the
reference's Hann-window spatial tiler (render_depth.py:102-170).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str = "sp") -> jnp.ndarray:
    """Pad a row-sharded block with neighbor rows.

    x: local shard [..., H_loc, W] (H axis is -2 for 2-D data or -3 for
    [..., H, W, C]; pass arrays with H at axis ``h_axis``).

    Returns [..., halo + H_loc + halo, ...]. Edge shards get zero padding on
    the outer side (matching the zero padding of F.avg_pool2d / F.pad in the
    reference ops).
    """
    return _exchange(x, halo, axis_name, h_axis=0)


def _exchange(x: jnp.ndarray, halo: int, axis_name: str, h_axis: int) -> jnp.ndarray:
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    top_rows = lax.slice_in_dim(x, 0, halo, axis=h_axis)
    bot_rows = lax.slice_in_dim(
        x, x.shape[h_axis] - halo, x.shape[h_axis], axis=h_axis
    )

    # send my top rows up (to shard i-1's bottom halo) and my bottom rows
    # down (to shard i+1's top halo)
    up = [(i, (i - 1) % n) for i in range(n)]
    down = [(i, (i + 1) % n) for i in range(n)]
    from_below = lax.ppermute(top_rows, axis_name, up)  # rows of shard i+1
    from_above = lax.ppermute(bot_rows, axis_name, down)  # rows of shard i-1

    zero = jnp.zeros_like(top_rows)
    from_above = jnp.where(idx == 0, zero, from_above)
    from_below = jnp.where(idx == n - 1, zero, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=h_axis)


def crop_halo_rows(x: jnp.ndarray, halo: int, h_axis: int = 0) -> jnp.ndarray:
    return lax.slice_in_dim(x, halo, x.shape[h_axis] - halo, axis=h_axis)
