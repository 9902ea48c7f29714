"""ops/pallas_dof.py: fused DOF+grade kernel == apply_dof + apply_color_grade."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from visiondepth3d_tpu.ops.dof import apply_dof
from visiondepth3d_tpu.ops.grade import apply_color_grade
from visiondepth3d_tpu.ops.pallas_dof import dof_grade_pallas, dof_reach


def _ref(rgb, depth, focal, max_sigma, fw, n, sat, con, bri, grade):
    out = apply_dof(rgb, depth, focal, max_sigma, fw, n)
    if grade:
        out = apply_color_grade(out, sat, con, bri)
    return out


def test_dof_grade_kernel_matches_ops():
    rng = np.random.default_rng(0)
    h, w, n, sigma = 32, 48, 5, 2.0
    left = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    right = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    depth = jnp.asarray(rng.random((h, w)), jnp.float32)
    focal = jnp.asarray(0.45)
    args = dict(max_sigma=sigma, focus_width=0.35, num_levels=n)
    with pltpu.force_tpu_interpret_mode():
        ol, orr = dof_grade_pallas(
            left, right, depth, focal, saturation=1.3, contrast=1.1,
            brightness=0.05, block_rows=8, **args)
    rl = _ref(left, depth, focal, sigma, 0.35, n, 1.3, 1.1, 0.05, True)
    rr = _ref(right, depth, focal, sigma, 0.35, n, 1.3, 1.1, 0.05, True)
    np.testing.assert_allclose(np.asarray(ol), np.asarray(rl), atol=3e-6)
    np.testing.assert_allclose(np.asarray(orr), np.asarray(rr), atol=3e-6)


def test_dof_kernel_no_grade_and_reach():
    assert dof_reach(2.0, 5) == 4
    assert dof_reach(2.0, 3) == 4
    assert dof_reach(3.5, 5) == 7
    rng = np.random.default_rng(1)
    h, w, n, sigma = 16, 40, 3, 1.5
    left = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    right = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    depth = jnp.asarray(rng.random((h, w)), jnp.float32)
    focal = jnp.asarray(0.5)
    with pltpu.force_tpu_interpret_mode():
        ol, _ = dof_grade_pallas(left, right, depth, focal, max_sigma=sigma,
                                 num_levels=n, apply_grade=False,
                                 block_rows=8)
    rl = apply_dof(left, depth, focal, sigma, 0.35, n)
    np.testing.assert_allclose(np.asarray(ol), np.asarray(rl), atol=3e-6)
