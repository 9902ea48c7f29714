"""ops/pallas_conv.py: the 9-matmul Pallas conv == flax nn.Conv exactly,
including SAME zero padding at all four borders, bias, and activations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn
from jax.experimental.pallas import tpu as pltpu

from visiondepth3d_tpu.ops.pallas_conv import conv3x3_pallas


@pytest.mark.parametrize("variant", ["cat3", "cat9", "mm9"])
@pytest.mark.parametrize("c,o,bh", [(16, 24, 4), (24, 16, 8)])
def test_conv3x3_matches_nn_conv(c, o, bh, variant):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, c)), jnp.float32)
    conv = nn.Conv(o, (3, 3), padding=((1, 1), (1, 1)))
    params = conv.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(conv.apply({"params": params}, x))
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(conv3x3_pallas(
            x, params["kernel"], params["bias"], block_rows=bh,
            variant=variant))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_conv3x3_activations_and_no_bias():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.3, jnp.float32)
    conv = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)), use_bias=False)
    ref = conv.apply({"params": {"kernel": k}}, x)
    with pltpu.force_tpu_interpret_mode():
        plain = conv3x3_pallas(x, k, None, block_rows=4)
        relu = conv3x3_pallas(x, k, None, act="relu", block_rows=4)
        lrelu = conv3x3_pallas(x, k, None, act="lrelu", slope=0.2,
                               block_rows=4)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(relu), np.asarray(jnp.maximum(ref, 0)), rtol=1e-5,
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(lrelu),
        np.asarray(jnp.where(ref >= 0, ref, ref * 0.2)), rtol=1e-5,
        atol=1e-5)


def test_conv3x3_bf16():
    """bf16 in/out with f32 tap accumulation: stays within a few bf16 ulps
    of the f32 reference."""
    rng = np.random.default_rng(2)
    x32 = rng.standard_normal((1, 8, 16, 16)).astype(np.float32)
    k32 = (rng.standard_normal((3, 3, 16, 16)) * 0.2).astype(np.float32)
    conv = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)), use_bias=False)
    ref = np.asarray(conv.apply({"params": {"kernel": jnp.asarray(k32)}},
                                jnp.asarray(x32)))
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(conv3x3_pallas(
            jnp.asarray(x32, jnp.bfloat16), jnp.asarray(k32, jnp.bfloat16),
            None, block_rows=4), np.float32)
    assert np.abs(ours - ref).max() < 0.15  # bf16 inputs: ~1% of |ref|max
