"""BiT / ResNetV2 backbone (weight-standardized convs + GroupNorm) in Flax.

The convolutional stem of MiDaS 3.0 "hybrid" (Intel/dpt-hybrid-midas — the
reference catalog's `DPT-Hybrid (MiDaS 3.0)` entry, render_depth.py model
dropdown). Behavioral spec from HF ``modeling_bit.py`` with the DPT-hybrid
configuration (non-preactivation "bottleneck" layers, TF-SAME padding,
dynamic-padded stem maxpool):

- every conv standardizes its kernel per OUTPUT channel over the fan-in
  (mean/biased-var, eps 1e-8) before the convolution — "weight
  standardization";
- TF-style SAME padding everywhere == ``lax.conv`` ``padding="SAME"``; the
  stem maxpool's zero-value dynamic padding is equivalent to reduce_window's
  -inf SAME padding because its input is post-ReLU (>= 0);
- bottleneck: 1x1 -> GN/ReLU -> 3x3 (stride) -> GN/ReLU -> 1x1 -> GN, plus a
  1x1-conv + GN shortcut on each stage's first layer; ReLU after the add;
- stage strides are (1, 2, 2, ...) on top of the /4 stem; mid width is
  ``make_div(out * 0.25)``.

Returns the per-stage feature maps (NHWC); DPT-hybrid consumes stages 1/2
directly and projects stage 3 into ViT tokens.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn


def make_div(value, divisor: int = 8) -> int:
    min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return new_value


@dataclasses.dataclass(frozen=True)
class BitConfig:
    embedding_size: int = 64
    hidden_sizes: tuple = (256, 512, 1024)
    depths: tuple = (3, 4, 9)
    num_groups: int = 32
    width_factor: int = 1
    output_stride: int = 32


class WSConv(nn.Module):
    """Weight-standardized conv, TF-SAME padding, no bias."""

    features: int
    kernel: tuple
    stride: int = 1
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        w = (w - mean) * jax.lax.rsqrt(var + self.eps)
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class GNAct(nn.Module):
    groups: int
    act: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="gn")(x)
        return jax.nn.relu(x) if self.act else x


class BitBottleneck(nn.Module):
    cfg: BitConfig
    out_ch: int
    stride: int = 1
    is_first: bool = False

    @nn.compact
    def __call__(self, x):
        mid = make_div(self.out_ch * 0.25)
        shortcut = x
        if self.is_first:
            shortcut = WSConv(self.out_ch, (1, 1), self.stride,
                              name="down_conv")(x)
            shortcut = GNAct(self.cfg.num_groups, act=False,
                             name="down_norm")(shortcut)
        h = WSConv(mid, (1, 1), name="conv1")(x)
        h = GNAct(self.cfg.num_groups, name="norm1")(h)
        h = WSConv(mid, (3, 3), self.stride, name="conv2")(h)
        h = GNAct(self.cfg.num_groups, name="norm2")(h)
        h = WSConv(self.out_ch, (1, 1), name="conv3")(h)
        h = GNAct(self.cfg.num_groups, act=False, name="norm3")(h)
        return jax.nn.relu(h + shortcut)


class BitBackbone(nn.Module):
    """Stem + stages; returns every stage's output feature map (NHWC)."""

    cfg: BitConfig = BitConfig()

    @nn.compact
    def __call__(self, pixels):  # [B, H, W, 3] normalized
        cfg = self.cfg
        x = WSConv(cfg.embedding_size, (7, 7), 2, name="stem_conv")(pixels)
        x = GNAct(cfg.num_groups, name="stem_norm")(x)
        # SAME maxpool 3x3 s2 (zero dynamic pad == -inf pad on ReLU'd input)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
        )

        feats = []
        current_stride, dilation = 4, 1
        for si, (depth, hidden) in enumerate(zip(cfg.depths, cfg.hidden_sizes)):
            out_ch = make_div(hidden * cfg.width_factor)
            stride = 1 if si == 0 else 2
            if current_stride >= cfg.output_stride:
                dilation *= stride
                stride = 1
            if dilation != 1:
                raise NotImplementedError(
                    "dilated BiT stages (output_stride hit) are not needed "
                    "by the DPT-hybrid configuration"
                )
            current_stride *= stride
            for li in range(depth):
                x = BitBottleneck(
                    cfg, out_ch, stride=stride if li == 0 else 1,
                    is_first=(li == 0), name=f"stage{si}_layer{li}",
                )(x)
            feats.append(x)
        return feats
