"""CLIP ViT vision encoder (image conditioning for DepthCrafter/SVD).

The reference loads the laion CLIP ViT-H image encoder
(depthcrafter_adapter.py:33-36) to produce the cross-attention context for
the ST-UNet. Standard CLIP vision tower: patch conv (no bias), class
embedding, learned position embeddings, pre-LN transformer, final LN +
linear projection to the conditioning width.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dinov2 import Attention, Mlp
from ..configs import ViTConfig


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    projection_dim: int = 1024


CLIP_TINY = CLIPVisionConfig(hidden_size=32, num_layers=2, num_heads=2,
                             image_size=28, projection_dim=16)


class CLIPBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + Attention(self.cfg, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x + Mlp(self.cfg, name="mlp")(h)


class CLIPVisionEncoder(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, pixels):  # [B, S, S, 3] CLIP-normalized
        cfg = self.cfg
        vcfg = ViTConfig(hidden_size=cfg.hidden_size, num_heads=cfg.num_heads,
                         mlp_ratio=4, layerscale=False)
        b = pixels.shape[0]
        p = cfg.patch_size
        gh, gw = pixels.shape[1] // p, pixels.shape[2] // p
        x = pixels.reshape(b, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * 3)
        x = nn.Dense(cfg.hidden_size, use_bias=False, name="patch_embed")(x)
        cls = self.param("class_embed", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), x], 1)
        n = (cfg.image_size // p) ** 2 + 1
        pos = self.param("pos_embed", nn.initializers.zeros, (1, n, cfg.hidden_size))
        x = x + pos[:, : x.shape[1]]
        x = nn.LayerNorm(epsilon=1e-5, name="pre_ln")(x)
        for i in range(cfg.num_layers):
            x = CLIPBlock(vcfg, name=f"block{i}")(x)
        pooled = nn.LayerNorm(epsilon=1e-5, name="post_ln")(x[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, name="proj")(pooled)
