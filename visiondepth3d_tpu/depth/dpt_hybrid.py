"""DPT-Hybrid / MiDaS 3.0 (Intel/dpt-hybrid-midas) in Flax.

The reference catalog's "DPT-Hybrid (MiDaS 3.0)" dropdown entry
(render_depth.py model list). Architecture per HF ``modeling_dpt.py`` with
``is_hybrid=True``:

- a BiT (ResNetV2 + weight standardization, depth/bit.py) stem produces
  three feature maps at /4, /8 and /16;
- the /16 map is projected 1x1 to the ViT width, gets a CLS token and
  bilinearly-resized learned position embeddings, and runs through a plain
  ViT encoder (no layerscale);
- the DPT neck consumes [bit/4, bit/8, vit@idx0, vit@idx1]: the two conv
  features pass straight to the scratch convs (reassemble layers 0/1 are
  identities, ``neck_ignore_stages``), the two transformer taps get the
  "project" readout and reassemble factors (1, 0.5);
- fusion + head are identical to the classic DPT (dpt_classic.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .bit import BitBackbone, BitConfig
from .configs import ViTConfig
from .dinov2 import Block
from .dpt import PreActResidual, ReassembleLayer


@dataclasses.dataclass(frozen=True)
class DPTHybridConfig:
    backbone: ViTConfig = ViTConfig(
        hidden_size=768, num_layers=12, num_heads=12, patch_size=16,
        layerscale=False, image_size=384, layer_norm_eps=1e-12,
    )
    bit: BitConfig = BitConfig()
    vit_out_indices: tuple = (9, 12)  # 1-based block outputs (HF [8, 11])
    reassemble_factors: tuple = (1, 0.5)
    neck_hidden_sizes: tuple = (256, 512, 768, 768)
    fusion_hidden_size: int = 256


DPT_HYBRID = DPTHybridConfig()
DPT_HYBRID_TINY = DPTHybridConfig(
    backbone=ViTConfig(hidden_size=32, num_layers=4, num_heads=2,
                       patch_size=16, layerscale=False, image_size=64,
                       layer_norm_eps=1e-12),
    bit=BitConfig(embedding_size=8, hidden_sizes=(8, 16, 32),
                  depths=(1, 1, 1), num_groups=2),
    vit_out_indices=(3, 4),
    neck_hidden_sizes=(8, 16, 24, 32),
    fusion_hidden_size=16,
)


class DPTHybrid(nn.Module):
    cfg: DPTHybridConfig = DPT_HYBRID
    fast_head: bool = False

    @nn.compact
    def __call__(self, pixels):  # [B, H, W, 3] normalized
        cfg = self.cfg
        c = cfg.backbone.hidden_size
        b, h, w, _ = pixels.shape
        gh, gw = h // cfg.backbone.patch_size, w // cfg.backbone.patch_size

        bit_feats = BitBackbone(cfg.bit, name="bit")(pixels)
        f16 = bit_feats[-1]  # [B, gh, gw, C_bit] (/16 == the patch grid)

        tokens = nn.Dense(c, name="projection")(f16).reshape(b, gh * gw, c)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c)), tokens], 1)
        side = cfg.backbone.image_size // cfg.backbone.patch_size
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, side * side + 1, c))
        if (gh, gw) != (side, side):
            cls_pos, grid = pos[:, :1], pos[:, 1:].reshape(side, side, -1)
            grid = resize_bilinear(grid, (gh, gw), align_corners=False,
                                   channel_last=True)
            pos = jnp.concatenate([cls_pos, grid.reshape(1, gh * gw, -1)], 1)
        x = x + pos

        taps = []
        want = set(cfg.vit_out_indices)
        for i in range(cfg.backbone.num_layers):
            x = Block(cfg.backbone, name=f"block{i}")(x)
            if (i + 1) in want:
                taps.append(x)

        # neck inputs: two conv features pass through untouched
        # (neck_ignore_stages), two transformer taps get readout+reassemble
        maps = [bit_feats[0], bit_feats[1]]
        for j, (feat, factor) in enumerate(zip(taps, cfg.reassemble_factors)):
            i = j + 2
            cls_tok, toks = feat[:, 0], feat[:, 1:]
            readout = jnp.broadcast_to(cls_tok[:, None, :], toks.shape)
            t = nn.Dense(c, name=f"readout{i}")(
                jnp.concatenate([toks, readout], axis=-1)
            )
            t = jax.nn.gelu(t, approximate=False)
            fm = t.reshape(b, gh, gw, c)
            fm = ReassembleLayer(cfg.neck_hidden_sizes[i], factor,
                                 name=f"reassemble{i}")(fm)
            maps.append(fm)

        feats2 = [
            nn.Conv(cfg.fusion_hidden_size, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name=f"scratch{i}")(m)
            for i, m in enumerate(maps)
        ]
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
        x = nn.Conv(f // 2, (3, 3), padding=((1, 1), (1, 1)),
                    name="head_conv1")(fused)
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


def convert_dpt_hybrid(state: dict, cfg: DPTHybridConfig) -> dict:
    """HF DPTForDepthEstimation (is_hybrid) state dict -> Flax params."""
    g = {k: np.asarray(v, np.float32) for k, v in state.items()}

    def lin(prefix):
        return {"kernel": g[f"{prefix}.weight"].T, "bias": g[f"{prefix}.bias"]}

    def conv(prefix, bias=True):
        out = {"kernel": g[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = g[f"{prefix}.bias"]
        return out

    def dense_1x1(prefix):
        return {"kernel": g[f"{prefix}.weight"][:, :, 0, 0].T,
                "bias": g[f"{prefix}.bias"]}

    def gn(prefix):
        return {"gn": {"scale": g[f"{prefix}.weight"],
                       "bias": g[f"{prefix}.bias"]}}

    bit_pre = "dpt.embeddings.backbone.bit"
    bit = {
        "stem_conv": conv(f"{bit_pre}.embedder.convolution", bias=False),
        "stem_norm": gn(f"{bit_pre}.embedder.norm"),
    }
    for si, depth in enumerate(cfg.bit.depths):
        for li in range(depth):
            pre = f"{bit_pre}.encoder.stages.{si}.layers.{li}"
            layer = {
                "conv1": conv(f"{pre}.conv1", bias=False),
                "norm1": gn(f"{pre}.norm1"),
                "conv2": conv(f"{pre}.conv2", bias=False),
                "norm2": gn(f"{pre}.norm2"),
                "conv3": conv(f"{pre}.conv3", bias=False),
                "norm3": gn(f"{pre}.norm3"),
            }
            if f"{pre}.downsample.conv.weight" in g:
                layer["down_conv"] = conv(f"{pre}.downsample.conv", bias=False)
                layer["down_norm"] = gn(f"{pre}.downsample.norm")
            bit[f"stage{si}_layer{li}"] = layer

    params: dict = {
        "bit": bit,
        "cls_token": g["dpt.embeddings.cls_token"],
        "pos_embed": g["dpt.embeddings.position_embeddings"],
        "projection": dense_1x1("dpt.embeddings.projection"),
    }
    for i in range(cfg.backbone.num_layers):
        pre = f"dpt.encoder.layer.{i}"
        qkv_w = np.concatenate(
            [g[f"{pre}.attention.attention.{n}.weight"].T
             for n in ("query", "key", "value")], axis=1)
        qkv_b = np.concatenate(
            [g[f"{pre}.attention.attention.{n}.bias"]
             for n in ("query", "key", "value")])
        params[f"block{i}"] = {
            "norm1": {"scale": g[f"{pre}.layernorm_before.weight"],
                      "bias": g[f"{pre}.layernorm_before.bias"]},
            "norm2": {"scale": g[f"{pre}.layernorm_after.weight"],
                      "bias": g[f"{pre}.layernorm_after.bias"]},
            "attn": {"qkv": {"kernel": qkv_w, "bias": qkv_b},
                     "proj": lin(f"{pre}.attention.output.dense")},
            "mlp": {"fc1": lin(f"{pre}.intermediate.dense"),
                    "fc2": lin(f"{pre}.output.dense")},
        }

    for j, factor in enumerate(cfg.reassemble_factors):
        i = j + 2  # HF indices 2/3 (0/1 are identities)
        params[f"readout{i}"] = lin(
            f"neck.reassemble_stage.readout_projects.{i}.0")
        pre = f"neck.reassemble_stage.layers.{i}"
        layer = {"projection": dense_1x1(f"{pre}.projection")}
        if factor > 1:
            wt = g[f"{pre}.resize.weight"]  # ConvTranspose2d (I, O, f, f)
            layer["resize"] = {"kernel": wt.transpose(0, 2, 3, 1),
                               "bias": g[f"{pre}.resize.bias"]}
        elif factor < 1:
            layer["resize"] = conv(f"{pre}.resize")
        params[f"reassemble{i}"] = layer
    for i in range(len(cfg.neck_hidden_sizes)):
        params[f"scratch{i}"] = conv(f"neck.convs.{i}", bias=False)
        pre = f"neck.fusion_stage.layers.{i}"
        params[f"fusion{i}_proj"] = dense_1x1(f"{pre}.projection")
        params[f"fusion{i}_res1"] = {
            "conv1": conv(f"{pre}.residual_layer1.convolution1"),
            "conv2": conv(f"{pre}.residual_layer1.convolution2"),
        }
        params[f"fusion{i}_res2"] = {
            "conv1": conv(f"{pre}.residual_layer2.convolution1"),
            "conv2": conv(f"{pre}.residual_layer2.convolution2"),
        }
    params["head_conv1"] = conv("head.head.0")
    params["head_conv2"] = conv("head.head.2")
    params["head_conv3"] = dense_1x1("head.head.4")
    return params
