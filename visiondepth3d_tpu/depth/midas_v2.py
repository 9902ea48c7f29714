"""MiDaS v2.1-small in Flax: EfficientNet-Lite3 backbone + MidasNet-small
decoder.

Covers the reference dropdown's "Midas-V2" entry (qualcomm/Midas-V2,
render_depth.py:711 — an ONNX/TFLite export of isl-org MiDaS
``midas_v21_small_256``). Architecture per the MiDaS repo:

- backbone: timm ``tf_efficientnet_lite3`` (no squeeze-excite, ReLU6),
  tapped at strides 4/8/16/32 -> 32/48/136/384 channels via the layer1-4
  Sequential grouping of MidasNet_small;
- decoder: bias-free 3x3 ``layerX_rn`` convs to 64/128/256/512 (features=64
  with channel "expand"), channel-halving FeatureFusionBlocks with pre-act
  residual units, and the output head (3x3 -> upsample -> 3x3 -> ReLU ->
  1x1 -> ReLU for non-negative inverse depth).

BatchNorm is folded into the convolutions at weight conversion
(inference-only framework), so the Flax modules are plain convs.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear

# (expand_ratio, out_channels, repeats, stride, kernel) per stage;
# EfficientNet-Lite3 = B0 table scaled w=1.2/d=1.4 with first/last repeats
# and stem/head channels fixed (the "lite" modifications).
LITE3_STAGES = (
    (1, 24, 1, 1, 3),
    (6, 32, 3, 2, 3),
    (6, 48, 3, 2, 5),
    (6, 96, 5, 2, 3),
    (6, 136, 5, 1, 5),
    (6, 232, 6, 2, 5),
    (6, 384, 1, 1, 3),
)
# MidasNet_small layer1-4 grouping: stages [0,1], [2], [3,4], [5,6]
LITE_TAPS = ((0, 1), (2,), (3, 4), (5, 6))


@dataclasses.dataclass(frozen=True)
class MidasV2Config:
    stages: tuple = LITE3_STAGES
    taps: tuple = LITE_TAPS
    stem_channels: int = 32
    features: int = 64
    expand: bool = True  # fusion widths 1x/2x/4x/8x of features

    @property
    def tap_channels(self):
        return tuple(self.stages[g[-1]][1] for g in self.taps)

    @property
    def fusion_channels(self):
        if self.expand:
            return tuple(self.features * 2**i for i in range(len(self.taps)))
        return (self.features,) * len(self.taps)


MIDAS_V2_SMALL = MidasV2Config()
MIDAS_V2_TINY = MidasV2Config(
    stages=((1, 8, 1, 1, 3), (6, 8, 2, 2, 3), (6, 12, 1, 2, 5),
            (6, 16, 2, 2, 3), (6, 16, 1, 1, 5), (6, 24, 2, 2, 5),
            (6, 32, 1, 1, 3)),
    stem_channels=8,
    features=8,
)


def _conv(out, k, stride=1, bias=True, name=None, groups=1):
    pad = k // 2
    return nn.Conv(out, (k, k), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=bias,
                   feature_group_count=groups, name=name)


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


class MBConvLite(nn.Module):
    """Inverted residual without squeeze-excite (the lite variant);
    expand==1 degenerates to the depthwise-separable stage-0 block."""

    in_ch: int
    out_ch: int
    expand: int
    stride: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        h = x
        if self.expand != 1:
            h = relu6(_conv(self.in_ch * self.expand, 1, name="pw")(h))
        mid = h.shape[-1]
        h = relu6(_conv(mid, self.kernel, self.stride, groups=mid,
                        name="dw")(h))
        h = _conv(self.out_ch, 1, name="pwl")(h)
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + x
        return h


class ResidualUnit(nn.Module):
    """Pre-act residual conv unit (ResidualConvUnit_custom, relu/no-bn)."""

    ch: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(x)
        h = _conv(self.ch, 3, name="conv1")(h)
        h = jax.nn.relu(h)
        h = _conv(self.ch, 3, name="conv2")(h)
        return h + x


class FusionBlock(nn.Module):
    """FeatureFusionBlock_custom: skip-add, residual unit, 2x upsample,
    1x1 out_conv (which halves channels when expand)."""

    ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + ResidualUnit(self.ch, name="res1")(skip)
        x = ResidualUnit(self.ch, name="res2")(x)
        hw = out_hw or (x.shape[1] * 2, x.shape[2] * 2)
        x = resize_bilinear(x, hw, align_corners=True, channel_last=True)
        return nn.Dense(self.out_ch, name="projection")(x)


class MidasNetSmall(nn.Module):
    cfg: MidasV2Config = MIDAS_V2_SMALL

    @nn.compact
    def __call__(self, pixels):  # [B, H, W, 3] normalized -> [B, H, W]
        cfg = self.cfg
        x = relu6(_conv(cfg.stem_channels, 3, stride=2, name="stem")(pixels))
        taps = []
        in_ch = cfg.stem_channels
        for si, (e, c, n, s, k) in enumerate(cfg.stages):
            for j in range(n):
                x = MBConvLite(in_ch, c, e, s if j == 0 else 1, k,
                               name=f"stage{si}_block{j}")(x)
                in_ch = c
            if any(si == g[-1] for g in cfg.taps):
                taps.append(x)

        fus = cfg.fusion_channels
        rn = [
            _conv(fus[i], 3, bias=False, name=f"layer{i + 1}_rn")(t)
            for i, t in enumerate(taps)
        ]
        # deepest first; each fusion halves channels down to features
        out_chs = list(fus[:-1][::-1]) + [cfg.features]
        y = None
        for idx in range(len(rn)):
            depth_i = len(rn) - 1 - idx  # rn index, deepest first
            ch = fus[depth_i]
            out_hw = (rn[depth_i - 1].shape[1:3] if depth_i > 0
                      else (rn[0].shape[1] * 2, rn[0].shape[2] * 2))
            blk = FusionBlock(ch, out_chs[idx],
                              name=f"refinenet{depth_i + 1}")
            if y is None:
                y = blk(rn[depth_i], None, out_hw)
            else:
                y = blk(y, rn[depth_i], out_hw)

        y = _conv(cfg.features // 2, 3, name="out_conv0")(y)
        y = resize_bilinear(y, (pixels.shape[1], pixels.shape[2]),
                            align_corners=True, channel_last=True)
        y = _conv(32, 3, name="out_conv2")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(1, name="out_conv4")(y)
        y = jax.nn.relu(y)  # non_negative
        return y[..., 0]


def _fold_bn(w_oihw, conv_bias, bn, eps=1e-3):
    """Fold BatchNorm (gamma, beta, mean, var) into a conv's weight/bias.
    EfficientNet BN eps is 1e-3 (tf default)."""
    gamma, beta, mean, var = bn
    scale = gamma / np.sqrt(var + eps)
    w = w_oihw * scale[:, None, None, None]
    b = (conv_bias if conv_bias is not None else 0.0) - mean
    return w, b * scale + beta


def convert_midas_small(source, cfg: MidasV2Config = MIDAS_V2_SMALL) -> dict:
    """isl-org MiDaS ``midas_v21_small_256.pt`` state dict (or its ONNX
    export's initializers) -> Flax params, BatchNorm folded.

    Checkpoint naming: ``pretrained.layer{L}.{idx}...`` where layer
    Sequentials unpack (conv_stem, bn1, act1, stage0, stage1), (stage2,),
    (stage3, stage4), (stage5, stage6); timm block keys are
    conv_dw/bn1/conv_pw/bn2 for stage 0 and conv_pw/bn1/conv_dw/bn2/
    conv_pwl/bn3 otherwise. Decoder: ``scratch.layer{X}_rn``,
    ``scratch.refinenet{N}.resConfUnit{1,2}.conv{1,2}`` + ``out_conv``,
    ``scratch.output_conv.{0,2,4}``.
    """
    if isinstance(source, str) or hasattr(source, "__fspath__"):
        p = str(source)
        if p.endswith(".onnx"):
            from ..utils.onnx_reader import read_onnx_initializers

            source = read_onnx_initializers(p)
        elif p.endswith(".safetensors"):
            from .convert import load_safetensors_state

            source = load_safetensors_state(p)
        else:
            import torch

            raw = torch.load(p, map_location="cpu", weights_only=True)
            source = raw.get("model", raw) if isinstance(raw, dict) else raw
    g = {k: np.asarray(v, dtype=np.float32) for k, v in source.items()}

    def bn(prefix):
        return (g[f"{prefix}.weight"], g[f"{prefix}.bias"],
                g[f"{prefix}.running_mean"], g[f"{prefix}.running_var"])

    def folded_conv(conv_prefix, bn_prefix):
        w = g[f"{conv_prefix}.weight"]  # OIHW (I=per-group input)
        w, b = _fold_bn(w, g.get(f"{conv_prefix}.bias"), bn(bn_prefix))
        return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}

    def conv(prefix, bias=True):
        out = {"kernel": g[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = g[f"{prefix}.bias"]
        return out

    def dense_from_1x1(prefix):
        return {"kernel": g[f"{prefix}.weight"][:, :, 0, 0].T,
                "bias": g[f"{prefix}.bias"]}

    params: dict = {}
    # stage index -> checkpoint prefix, from the layer grouping
    stage_prefix: dict[int, str] = {}
    for li, group in enumerate(cfg.taps):
        base = 3 if li == 0 else 0  # layer1 carries stem/bn1/act1 first
        for off, si in enumerate(group):
            stage_prefix[si] = f"pretrained.layer{li + 1}.{base + off}"
    params["stem"] = folded_conv("pretrained.layer1.0", "pretrained.layer1.1")

    for si, (e, c, n, s, k) in enumerate(cfg.stages):
        for j in range(n):
            pre = f"{stage_prefix[si]}.{j}"
            blk: dict = {}
            if e == 1:  # DepthwiseSeparableConv: conv_dw/bn1, conv_pw/bn2
                blk["dw"] = folded_conv(f"{pre}.conv_dw", f"{pre}.bn1")
                blk["pwl"] = folded_conv(f"{pre}.conv_pw", f"{pre}.bn2")
            else:  # InvertedResidual: conv_pw/bn1, conv_dw/bn2, conv_pwl/bn3
                blk["pw"] = folded_conv(f"{pre}.conv_pw", f"{pre}.bn1")
                blk["dw"] = folded_conv(f"{pre}.conv_dw", f"{pre}.bn2")
                blk["pwl"] = folded_conv(f"{pre}.conv_pwl", f"{pre}.bn3")
            params[f"stage{si}_block{j}"] = blk

    for i in range(len(cfg.taps)):
        params[f"layer{i + 1}_rn"] = conv(f"scratch.layer{i + 1}_rn",
                                          bias=False)
    for npos in range(len(cfg.taps), 0, -1):
        pre = f"scratch.refinenet{npos}"
        blk = {
            "res2": {"conv1": conv(f"{pre}.resConfUnit2.conv1"),
                     "conv2": conv(f"{pre}.resConfUnit2.conv2")},
            "projection": dense_from_1x1(f"{pre}.out_conv"),
        }
        if npos < len(cfg.taps):  # deepest block has no skip input
            blk["res1"] = {"conv1": conv(f"{pre}.resConfUnit1.conv1"),
                           "conv2": conv(f"{pre}.resConfUnit1.conv2")}
        params[f"refinenet{npos}"] = blk
    params["out_conv0"] = conv("scratch.output_conv.0")
    params["out_conv2"] = conv("scratch.output_conv.2")
    params["out_conv4"] = dense_from_1x1("scratch.output_conv.4")
    return params
