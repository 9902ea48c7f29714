"""Parity of the big-size device-matrix resize path vs the 2-tap gather.

Sizes above ``_MATRIX_LIMIT`` used to fall back to ``_gather_axis_linear``
(lane-axis gathers, slow on TPU); they now build the bilinear weight
matrices on device (``_device_linear_matrix``) and run MXU matmuls. The
hat-function construction must match the host ``_linear_matrix``
(np.add.at with border tap collapse) and the gather path bit-for-bit
within f32 matmul tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from visiondepth3d_tpu.ops.resize import (
    _MATRIX_LIMIT,
    _device_linear_matrix,
    _gather_axis_linear,
    _linear_matrix,
    resize_bilinear,
)


@pytest.mark.parametrize("in_size,out_size", [(1080, 518), (518, 1080),
                                              (7, 3), (3, 7), (1920, 1920)])
@pytest.mark.parametrize("align_corners", [False, True])
def test_device_matrix_equals_host_matrix(in_size, out_size, align_corners):
    dev = np.asarray(_device_linear_matrix(in_size, out_size, align_corners,
                                           jnp.float32))
    host = _linear_matrix(in_size, out_size, align_corners)
    np.testing.assert_allclose(dev, host, atol=1e-4)


@pytest.mark.parametrize("out_hw,align_corners",
                         [((518, 918), False), ((518, 918), True),
                          ((1080, 1920), False)])
def test_big_resize_matches_gather(rng, out_hw, align_corners):
    img = jnp.asarray(rng.random((2, 270, 480, 3)), jnp.float32)
    assert 270 * out_hw[0] > _MATRIX_LIMIT or 480 * out_hw[1] > _MATRIX_LIMIT
    got = resize_bilinear(img, out_hw, align_corners=align_corners)
    ref = _gather_axis_linear(
        _gather_axis_linear(img, out_hw[0], 1, align_corners),
        out_hw[1], 2, align_corners)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_one_pixel_axis_still_tiles():
    img = jnp.ones((1, 1, 700, 3), jnp.float32)
    out = resize_bilinear(img, (4, 1400))
    assert out.shape == (1, 4, 1400, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)
