"""DPT with a BEiT backbone (Intel/dpt-beit-large-512, MiDaS v3.1) + converter."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .beit import BEIT_LARGE_512, BEIT_TINY, BEiTBackbone, BEiTConfig
from .dpt import PreActResidual, ReassembleLayer


@dataclasses.dataclass(frozen=True)
class DPTBEiTConfig:
    backbone: BEiTConfig = BEIT_LARGE_512
    out_indices: tuple = (6, 12, 18, 24)
    reassemble_factors: tuple = (4, 2, 1, 0.5)
    neck_hidden_sizes: tuple = (256, 512, 1024, 1024)
    fusion_hidden_size: int = 256


DPT_BEIT_LARGE_512 = DPTBEiTConfig()
DPT_BEIT_TINY = DPTBEiTConfig(
    backbone=BEIT_TINY,
    out_indices=(1, 2, 3, 4),
    neck_hidden_sizes=(16, 24, 32, 40),
    fusion_hidden_size=16,
)


class DPTBEiT(nn.Module):
    cfg: DPTBEiTConfig = DPT_BEIT_LARGE_512
    fast_head: bool = False

    @nn.compact
    def __call__(self, pixels):  # [B, H, W, 3] normalized
        cfg = self.cfg
        feats, (gh, gw) = BEiTBackbone(
            cfg.backbone, cfg.out_indices, name="backbone"
        )(pixels)

        maps = []
        for i, (feat, ch, factor) in enumerate(
            zip(feats, cfg.neck_hidden_sizes, cfg.reassemble_factors)
        ):
            cls_tok, tokens = feat[:, 0], feat[:, 1:]
            readout = jnp.broadcast_to(cls_tok[:, None, :], tokens.shape)
            t = jnp.concatenate([tokens, readout], axis=-1)
            t = nn.Dense(cfg.backbone.hidden_size, name=f"readout{i}")(t)
            t = jax.nn.gelu(t, approximate=False)
            fm = t.reshape(t.shape[0], gh, gw, t.shape[-1])
            fm = ReassembleLayer(ch, factor, name=f"reassemble{i}")(fm)
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
                                          align_corners=False, channel_last=True)
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


def convert_dpt_beit(state: dict, cfg: DPTBEiTConfig) -> dict:
    """HF DPTForDepthEstimation(Beit backbone) state dict -> flax params."""

    g = {k: np.asarray(v, np.float32) for k, v in state.items()}
    p = cfg.backbone.patch_size
    hid = cfg.backbone.hidden_size

    def lin(prefix, bias=True):
        out = {"kernel": g[f"{prefix}.weight"].T}
        if bias:
            out["bias"] = g[f"{prefix}.bias"]
        return out

    def conv(prefix, bias=True):
        out = {"kernel": g[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = g[f"{prefix}.bias"]
        return out

    def dense_1x1(prefix):
        return {"kernel": g[f"{prefix}.weight"][:, :, 0, 0].T,
                "bias": g[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": g[f"{prefix}.weight"], "bias": g[f"{prefix}.bias"]}

    pe_w = g["backbone.embeddings.patch_embeddings.projection.weight"]
    backbone = {
        "cls_token": g["backbone.embeddings.cls_token"],
        "patch_embed": {
            "proj": {
                "kernel": pe_w.transpose(2, 3, 1, 0).reshape(p * p * 3, hid),
                "bias": g["backbone.embeddings.patch_embeddings.projection.bias"],
            }
        },
    }
    for i in range(cfg.backbone.num_layers):
        pre = f"backbone.encoder.layer.{i}"
        backbone[f"block{i}"] = {
            "norm1": ln(f"{pre}.layernorm_before"),
            "norm2": ln(f"{pre}.layernorm_after"),
            "ls1": g[f"{pre}.lambda_1"],
            "ls2": g[f"{pre}.lambda_2"],
            "attn": {
                "q": lin(f"{pre}.attention.attention.query"),
                "k": lin(f"{pre}.attention.attention.key", bias=False),
                "v": lin(f"{pre}.attention.attention.value"),
                "proj": lin(f"{pre}.attention.output.dense"),
            },
            "rel_bias": {
                "table": g[
                    f"{pre}.attention.attention.relative_position_bias."
                    "relative_position_bias_table"
                ],
            },
            "mlp": {
                "fc1": lin(f"{pre}.intermediate.dense"),
                "fc2": lin(f"{pre}.output.dense"),
            },
        }

    params: dict = {"backbone": backbone}
    for i, factor in enumerate(cfg.reassemble_factors):
        params[f"readout{i}"] = lin(f"neck.reassemble_stage.readout_projects.{i}.0")
        pre = f"neck.reassemble_stage.layers.{i}"
        layer = {"projection": dense_1x1(f"{pre}.projection")}
        if factor > 1:
            w = g[f"{pre}.resize.weight"]
            layer["resize"] = {"kernel": w.transpose(0, 2, 3, 1),
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
