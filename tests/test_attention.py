"""ops/attention.py: the bf16-softmax path must match reference attention."""

import numpy as np
import jax
import jax.numpy as jnp

from visiondepth3d_tpu.ops.attention import (
    _bf16_softmax_attention,
    multi_head_attention,
)


def test_bf16_softmax_attention_matches_reference():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (2, 640, 4, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (2, 640, 4, 32)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (2, 640, 4, 32)), jnp.bfloat16)
    ours = np.asarray(_bf16_softmax_attention(q, k, v), np.float32)
    ref = np.asarray(jax.nn.dot_product_attention(q, k, v), np.float32)
    # bf16 storage of logits/softmax: expect ~1e-2 worst-case on unit inputs
    assert np.abs(ours - ref).max() < 3e-2
    assert np.abs(ours - ref).mean() < 3e-3


def test_dispatch_falls_back_off_tpu():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 600, 2, 16)), jnp.float32)
    out = multi_head_attention(x, x, x)  # CPU backend -> XLA path
    ref = jax.nn.dot_product_attention(x, x, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
