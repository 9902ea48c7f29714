"""DPT neck + depth head in Flax (DepthAnything variant).

Behavioral parity target: transformers
``modeling_depth_anything.py`` (reassemble -> scratch convs -> feature
fusion -> 3-conv head). Interpolation conventions matter and are kept
exactly: fusion upsampling is bilinear align_corners=True, residual size
adaptation is align_corners=False, the head's mid-upsample is
align_corners=True to (grid * patch).

TPU notes: all convs run NHWC; the factor-f transposed conv of the
reassemble stage is expressed as one einsum + reshape (an MXU matmul per
pixel block, no conv_transpose lowering).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .configs import DPTConfig
from .dinov2 import Dinov2Backbone


class UpsampleConv(nn.Module):
    """ConvTranspose2d(kernel=f, stride=f) == per-pixel f x f block matmul."""

    channels: int
    factor: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        f, o = self.factor, self.channels
        b, h, w, c = x.shape
        # kernel layout (C, f, f, O); converter transposes torch's (C, O, f, f)
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02), (c, f, f, o)
        )
        out = jnp.einsum("bhwc,cfgo->bhfwgo", x, kernel)
        out = out.reshape(b, h * f, w * f, o)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (o,))
        return out


class ReassembleLayer(nn.Module):
    channels: int
    factor: float

    @nn.compact
    def __call__(self, x):  # [B, H, W, hidden]
        x = nn.Dense(self.channels, name="projection")(x)  # 1x1 conv
        if self.factor > 1:
            x = UpsampleConv(self.channels, int(self.factor), name="resize")(x)
        elif self.factor < 1:
            stride = int(1 / self.factor)
            x = nn.Conv(
                self.channels, (3, 3), strides=(stride, stride),
                padding=((1, 1), (1, 1)), name="resize",
            )(x)
        return x


class PreActResidual(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(h)
        return x + h


class FeatureFusionLayer(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, residual=None, size=None):
        if residual is not None:
            if residual.shape[1:3] != x.shape[1:3]:
                residual = resize_bilinear(
                    residual, x.shape[1:3], align_corners=False, channel_last=True
                )
            x = x + PreActResidual(self.features, name="res1")(residual)
        x = PreActResidual(self.features, name="res2")(x)
        target = size if size is not None else (x.shape[1] * 2, x.shape[2] * 2)
        x = resize_bilinear(x, target, align_corners=True, channel_last=True)
        return nn.Dense(self.features, name="projection")(x)  # 1x1 conv


class DPTNeckHead(nn.Module):
    """DPT neck + 3-conv depth head.

    ``fast_head=True`` commutes the head's mid-upsample past the last two
    convs: head_conv2/head_conv3 run at the fused-feature resolution
    (patch_grid*8, e.g. 296^2 for DA at 518^2) and the single-channel
    depth is bilinearly upsampled at the end, instead of upsampling the
    32-channel tensor first. Same parameters, ~3x fewer head FLOPs and
    32x less resize traffic (measured 0.97 -> ~0.35 ms/frame for DA-V2-S
    bf16 on v5e); output differs from the exact order only by the
    interpolation/conv commutation (see tests/test_depth_models.py
    fast-head bound). Default False = exact transformers order for
    converter parity.
    """

    cfg: DPTConfig
    fast_head: bool = False

    @nn.compact
    def __call__(self, feats, grid_hw):
        cfg = self.cfg
        gh, gw = grid_hw
        # reassemble: drop cls, reshape to grid, project + resize
        maps = []
        for i, (feat, ch, factor) in enumerate(
            zip(feats, cfg.neck_hidden_sizes, cfg.reassemble_factors)
        ):
            tokens = feat[:, 1:]
            fm = tokens.reshape(tokens.shape[0], gh, gw, tokens.shape[-1])
            fm = ReassembleLayer(ch, factor, name=f"reassemble{i}")(fm)
            maps.append(fm)
        # scratch convs to the fusion width (bias-free 3x3)
        feats2 = [
            nn.Conv(cfg.fusion_hidden_size, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name=f"scratch{i}")(m)
            for i, m in enumerate(maps)
        ]
        # fusion, from the deepest stage back up
        rev = feats2[::-1]
        fused = None
        fused_all = []
        for idx, hs in enumerate(rev):
            size = rev[idx + 1].shape[1:3] if idx != len(rev) - 1 else None
            layer = FeatureFusionLayer(cfg.fusion_hidden_size, name=f"fusion{idx}")
            fused = layer(hs, None, size) if fused is None else layer(fused, hs, size)
            fused_all.append(fused)

        x = fused_all[-1]
        f = cfg.fusion_hidden_size
        x = nn.Conv(f // 2, (3, 3), padding=((1, 1), (1, 1)), name="head_conv1")(x)
        p = cfg.backbone.patch_size
        if not self.fast_head:
            x = resize_bilinear(x, (gh * p, gw * p), align_corners=True,
                                channel_last=True)
        x = nn.Conv(cfg.head_hidden_size, (3, 3), padding=((1, 1), (1, 1)),
                    name="head_conv2")(x)
        x = jax.nn.relu(x)
        x = nn.Dense(1, name="head_conv3")(x)  # 1x1 conv
        if cfg.depth_estimation_type == "relative":
            x = jax.nn.relu(x)
        else:
            x = jax.nn.sigmoid(x)
        x = x[..., 0] * cfg.max_depth  # [B, h, w]
        if self.fast_head:
            x = resize_bilinear(x, (gh * p, gw * p), align_corners=True,
                                channel_last=False)
        return x


class DepthAnything(nn.Module):
    """Full model: DINOv2 backbone + DPT neck/head -> relative depth map."""

    cfg: DPTConfig
    fast_head: bool = False

    @nn.compact
    def __call__(self, pixels):  # [B, H, W, 3] ImageNet-normalized
        feats, grid = Dinov2Backbone(
            self.cfg.backbone, self.cfg.out_indices, name="backbone"
        )(pixels)
        return DPTNeckHead(self.cfg, fast_head=self.fast_head,
                           name="neck_head")(feats, grid)
