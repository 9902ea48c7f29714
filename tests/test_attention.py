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


def test_vmem_attention_matches_reference():
    """Single-pass VMEM kernel (interpret mode) == XLA attention, including
    the pad-column masking at a non-128-multiple N."""
    from jax.experimental.pallas import tpu as pltpu

    from visiondepth3d_tpu.ops.pallas_attention import vmem_attention

    rng = np.random.default_rng(2)
    b, n, h, d = 2, 270, 3, 64  # N pads 270 -> 384
    q = jnp.asarray(rng.normal(0, 1, (b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, n, h, d)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(vmem_attention(q, k, v))
    ref = np.asarray(jax.nn.dot_product_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=2e-6)

    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    with pltpu.force_tpu_interpret_mode():
        ours_b = np.asarray(vmem_attention(qb, kb, vb), np.float32)
    # f32 logits/softmax: tighter than the bf16-softmax path's 3e-2
    assert np.abs(ours_b - ref).max() < 1e-2
