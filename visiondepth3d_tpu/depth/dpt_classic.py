"""Classic DPT / MiDaS v3 family (Intel/dpt-large etc.) in Flax.

Differences from the DepthAnything variant (depth/dpt.py), per HF
``modeling_dpt.py``:
- backbone: a plain ViT (no layerscale), learned position embeddings
  interpolated BILINEARLY for new grids, intermediate hidden states taken
  WITHOUT a final layernorm;
- readout: each tapped stage concatenates the CLS token to every patch
  token and projects 2C -> C with GELU ("project" readout);
- fusion: always upsamples by exactly 2x (align_corners=True), residual
  resize align_corners=False;
- head: conv -> 2x bilinear upsample -> conv -> ReLU -> 1x1 conv -> ReLU
  (output at half input resolution; callers resize).

Covers: Intel/dpt-large, MiDaS v3 ViT-L, and (with BN residuals off) the
relative-depth DPT checkpoints in the reference's catalog.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .configs import ViTConfig
from .dinov2 import Block, PatchEmbed


@dataclasses.dataclass(frozen=True)
class DPTClassicConfig:
    backbone: ViTConfig = ViTConfig(
        hidden_size=1024, num_layers=24, num_heads=16, patch_size=16,
        layerscale=False, image_size=384, layer_norm_eps=1e-12,
    )
    out_indices: tuple = (6, 12, 18, 24)  # 1-based block outputs
    reassemble_factors: tuple = (4, 2, 1, 0.5)
    neck_hidden_sizes: tuple = (256, 512, 1024, 1024)
    fusion_hidden_size: int = 256


DPT_LARGE = DPTClassicConfig()
DPT_TINY = DPTClassicConfig(
    backbone=ViTConfig(hidden_size=32, num_layers=4, num_heads=2, patch_size=16,
                       layerscale=False, image_size=64, layer_norm_eps=1e-12),
    out_indices=(1, 2, 3, 4),
    neck_hidden_sizes=(16, 24, 32, 40),
    fusion_hidden_size=16,
)


class ViTClassicBackbone(nn.Module):
    """Plain ViT returning raw (pre-final-LN) hidden states + cls tokens."""

    cfg: ViTConfig
    out_indices: tuple

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg
        b, h, w, _ = pixels.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        x = PatchEmbed(cfg, name="patch_embed")(pixels)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), x], 1)
        side = cfg.image_size // cfg.patch_size
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, side * side + 1, cfg.hidden_size))
        if (gh, gw) != (side, side):
            cls_pos, grid = pos[:, :1], pos[:, 1:].reshape(side, side, -1)
            grid = resize_bilinear(grid, (gh, gw), align_corners=False,
                                   channel_last=True)
            pos = jnp.concatenate([cls_pos, grid.reshape(1, gh * gw, -1)], axis=1)
        x = x + pos
        feats = []
        want = set(self.out_indices)
        for i in range(cfg.num_layers):
            x = Block(cfg, name=f"block{i}")(x)
            if (i + 1) in want:
                feats.append(x)
        return feats, (gh, gw)


class DPTClassic(nn.Module):
    cfg: DPTClassicConfig = DPT_LARGE
    fast_head: bool = False

    @nn.compact
    def __call__(self, pixels):  # [B, H, W, 3] normalized
        cfg = self.cfg
        feats, (gh, gw) = ViTClassicBackbone(
            cfg.backbone, cfg.out_indices, name="backbone"
        )(pixels)

        maps = []
        for i, (feat, ch, factor) in enumerate(
            zip(feats, cfg.neck_hidden_sizes, cfg.reassemble_factors)
        ):
            cls_tok, tokens = feat[:, 0], feat[:, 1:]
            # "project" readout: concat cls to every token, 2C->C + GELU
            readout = jnp.broadcast_to(cls_tok[:, None, :], tokens.shape)
            t = jnp.concatenate([tokens, readout], axis=-1)
            t = nn.Dense(cfg.backbone.hidden_size, name=f"readout{i}")(t)
            t = jax.nn.gelu(t, approximate=False)
            fm = t.reshape(t.shape[0], gh, gw, t.shape[-1])
            from .dpt import ReassembleLayer

            fm = ReassembleLayer(ch, factor, name=f"reassemble{i}")(fm)
            maps.append(fm)

        feats2 = [
            nn.Conv(cfg.fusion_hidden_size, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name=f"scratch{i}")(m)
            for i, m in enumerate(maps)
        ]
        from .dpt import PreActResidual

        rev = feats2[::-1]
        fused = None
        for idx, stage in enumerate(rev):
            name = f"fusion{idx}"
            if fused is None:
                fused = stage
            else:
                res = stage
                if res.shape[1:3] != fused.shape[1:3]:
                    res = resize_bilinear(res, fused.shape[1:3],
                                          align_corners=False,
                                          channel_last=True)
                fused = fused + PreActResidual(cfg.fusion_hidden_size,
                                               name=f"{name}_res1")(res)
            fused = PreActResidual(cfg.fusion_hidden_size,
                                   name=f"{name}_res2")(fused)
            fused = resize_bilinear(fused,
                                    (fused.shape[1] * 2, fused.shape[2] * 2),
                                    align_corners=True, channel_last=True)
            fused = nn.Dense(cfg.fusion_hidden_size, name=f"{name}_proj")(fused)

        f = cfg.fusion_hidden_size
        x = nn.Conv(f // 2, (3, 3), padding=((1, 1), (1, 1)), name="head_conv1")(fused)
        if not self.fast_head:
            x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                                align_corners=True, channel_last=True)
        x = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), name="head_conv2")(x)
        x = jax.nn.relu(x)
        x = nn.Dense(1, name="head_conv3")(x)
        out = jax.nn.relu(x)[..., 0]
        if self.fast_head:
            # same params, convs at half resolution, 1-ch upsample last
            # (see dpt.DPTNeckHead.fast_head)
            out = resize_bilinear(out, (out.shape[1] * 2, out.shape[2] * 2),
                                  align_corners=True, channel_last=False)
        return out
