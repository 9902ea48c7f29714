"""BEiT backbone + DPT head (MiDaS v3.1 / Intel dpt-beit-large-512) in Flax.

BEiT differences from the plain ViT (per HF ``modeling_beit.py``):
- no absolute position embeddings; each layer's attention adds a RELATIVE
  position bias looked up from a per-layer table indexed by pairwise grid
  offsets (cls row/col/corner get 3 dedicated entries);
- the key projection has no bias (query/value do);
- layerscale (lambda_1 / lambda_2);
- arbitrary window sizes re-grid the bias table bilinearly (the MiDaS v3.1
  modification, modeling_beit.py:573-633).

The head is the classic DPT neck (project-readout "ignore" variant: BEiT-DPT
uses readout_type="project"; see configuration defaults) — we reuse
depth/dpt_classic components.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .configs import ViTConfig
from .dinov2 import Mlp, PatchEmbed


@dataclasses.dataclass(frozen=True)
class BEiTConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    patch_size: int = 16
    image_size: int = 512  # pretraining window for the bias tables
    layer_norm_eps: float = 1e-12
    layerscale_value: float = 0.1


BEIT_LARGE_512 = BEiTConfig()
BEIT_TINY = BEiTConfig(hidden_size=32, num_layers=4, num_heads=2,
                       image_size=64, layerscale_value=0.1)


@functools.lru_cache(maxsize=16)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """[(N+1), (N+1)] int index into the bias table (HF parity)."""
    area = wh * ww
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    idx = np.zeros((area + 1, area + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


class RelativePositionBias(nn.Module):
    """Per-layer bias table; re-gridded bilinearly for new window sizes."""

    cfg: BEiTConfig

    @nn.compact
    def __call__(self, grid_hw: tuple[int, int]) -> jnp.ndarray:
        cfg = self.cfg
        side = cfg.image_size // cfg.patch_size
        old_h, old_w = 2 * side - 1, 2 * side - 1
        table = self.param(
            "table", nn.initializers.zeros,
            (old_h * old_w + 3, cfg.num_heads),
        )
        gh, gw = grid_hw
        new_h, new_w = 2 * gh - 1, 2 * gw - 1
        if (new_h, new_w) != (old_h, old_w):
            from ..ops.resize import resize_bilinear

            # HF reshapes (1, old_w, old_h, heads) — kept verbatim for parity
            grid = table[:-3].reshape(old_w, old_h, cfg.num_heads)
            grid = resize_bilinear(grid, (new_h, new_w), align_corners=False,
                                   channel_last=True)
            table = jnp.concatenate(
                [grid.reshape(new_h * new_w, cfg.num_heads), table[-3:]], axis=0
            )
        idx = jnp.asarray(relative_position_index(gh, gw))
        bias = table[idx.reshape(-1)].reshape(idx.shape + (cfg.num_heads,))
        return bias.transpose(2, 0, 1)  # [heads, N+1, N+1]


class BEiTAttention(nn.Module):
    cfg: BEiTConfig

    @nn.compact
    def __call__(self, x, bias):  # x: [B, T, C]; bias: [heads, T, T]
        cfg = self.cfg
        c, nh = cfg.hidden_size, cfg.num_heads
        hd = c // nh
        q = nn.Dense(c, name="q")(x)
        k = nn.Dense(c, use_bias=False, name="k")(x)
        v = nn.Dense(c, name="v")(x)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], nh, hd)

        out = jax.nn.dot_product_attention(
            heads(q), heads(k), heads(v), bias=bias[None]
        )
        out = out.reshape(x.shape[0], x.shape[1], c)
        return nn.Dense(c, name="proj")(out)


class BEiTBlock(nn.Module):
    cfg: BEiTConfig

    @nn.compact
    def __call__(self, x, grid_hw):
        cfg = self.cfg
        vcfg = ViTConfig(hidden_size=cfg.hidden_size, num_heads=cfg.num_heads,
                         mlp_ratio=4)
        bias = RelativePositionBias(cfg, name="rel_bias")(grid_hw)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm1")(x)
        h = BEiTAttention(cfg, name="attn")(h, bias)
        h = h * self.param("ls1", nn.initializers.constant(cfg.layerscale_value),
                           (cfg.hidden_size,))
        x = x + h
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm2")(x)
        h = Mlp(vcfg, name="mlp")(h)
        h = h * self.param("ls2", nn.initializers.constant(cfg.layerscale_value),
                           (cfg.hidden_size,))
        return x + h


class BEiTBackbone(nn.Module):
    cfg: BEiTConfig
    out_indices: tuple

    @nn.compact
    def __call__(self, pixels):  # [B, H, W, 3] normalized
        cfg = self.cfg
        b, h, w, _ = pixels.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        vcfg = ViTConfig(hidden_size=cfg.hidden_size, patch_size=cfg.patch_size)
        x = PatchEmbed(vcfg, name="patch_embed")(pixels)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), x], axis=1
        )
        feats = []
        want = set(self.out_indices)
        for i in range(cfg.num_layers):
            x = BEiTBlock(cfg, name=f"block{i}")(x, (gh, gw))
            if (i + 1) in want:
                feats.append(x)
        return feats, (gh, gw)
