"""DINOv2 ViT backbone in Flax — the encoder behind Depth Anything V1/V2,
Distill-Any-Depth and the DINOv2 DPT variants.

TPU-first choices:
- NHWC everywhere; the patch embedding is a reshape + one MXU matmul
  (stride-p conv == block reshape x dense), not a conv kernel.
- Attention uses a single fused QKV projection internally (weights from HF's
  separate q/k/v are concatenated by the converter) and
  ``jax.nn.dot_product_attention`` so XLA can pick the fastest path.
- Position embeddings are bicubically re-gridded at trace time for the
  (static) input resolution — matching Dinov2Embeddings.interpolate_pos_
  encoding semantics (bicubic, align_corners=False).

Behavioral parity target: transformers Dinov2Backbone with
apply_layernorm=True, reshape_hidden_states=False (the DepthAnything
configuration), verified against torch in tests/test_depth_models.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .configs import ViTConfig


class PatchEmbed(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] -> [B, h*w, C]
        p = self.cfg.patch_size
        b, h, w, c = x.shape
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * c)
        # kernel layout (p*p*3, hidden) ordered (dy, dx, c) — converter maps
        # torch conv weight (O, C, p, p).permute(2, 3, 1, 0)
        x = nn.Dense(self.cfg.hidden_size, name="proj")(x)
        return x


def interpolate_pos_embed(pos: jnp.ndarray, grid_hw: tuple[int, int]) -> jnp.ndarray:
    """Re-grid [1, 1+N, C] position embeddings to a new patch grid (bicubic,
    half-pixel centers — torch bicubic align_corners=False parity)."""
    n = pos.shape[1] - 1
    side = int(round(n**0.5))
    gh, gw = grid_hw
    if (gh, gw) == (side, side):
        return pos
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    grid = patch_pos.reshape(side, side, -1)
    from ..ops.resize import resize_bicubic

    grid = resize_bicubic(grid, (gh, gw), align_corners=False, channel_last=True)
    return jnp.concatenate([cls_pos, grid.reshape(1, gh * gw, -1)], axis=1)


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        c = self.cfg.hidden_size
        nh = self.cfg.num_heads
        hd = c // nh
        qkv = nn.Dense(3 * c, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], nh, hd)

        from ..ops.attention import multi_head_attention

        out = multi_head_attention(heads(q), heads(k), heads(v))
        out = out.reshape(x.shape[0], x.shape[1], c)
        return nn.Dense(c, name="proj")(out)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg.hidden_size
        x = nn.Dense(c * self.cfg.mlp_ratio, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(c, name="fc2")(x)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm1")(x)
        h = Attention(cfg, name="attn")(h)
        if cfg.layerscale:
            h = h * self.param("ls1", nn.initializers.ones, (cfg.hidden_size,))
        x = x + h
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm2")(x)
        h = Mlp(cfg, name="mlp")(h)
        if cfg.layerscale:
            h = h * self.param("ls2", nn.initializers.ones, (cfg.hidden_size,))
        return x + h


class Dinov2Backbone(nn.Module):
    """Returns the final-LN-normalized hidden states at ``out_indices``
    (1-based block outputs, Dinov2Backbone parity) plus the patch grid."""

    cfg: ViTConfig
    out_indices: tuple

    @nn.compact
    def __call__(self, pixels):  # [B, H, W, 3] normalized
        cfg = self.cfg
        b, h, w, _ = pixels.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size

        x = PatchEmbed(cfg, name="patch_embed")(pixels)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), x], 1)
        side = cfg.image_size // cfg.patch_size
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, side * side + 1, cfg.hidden_size)
        )
        x = x + interpolate_pos_embed(pos, (gh, gw))

        final_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")
        feats = []
        want = set(self.out_indices)
        if 0 in want:
            feats.append(final_ln(x))
        for i in range(cfg.num_layers):
            x = Block(cfg, name=f"block{i}")(x)
            if (i + 1) in want:
                feats.append(final_ln(x))
        return feats, (gh, gw)
