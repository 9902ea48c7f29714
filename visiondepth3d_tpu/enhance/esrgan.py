"""Real-ESRGAN (RRDBNet) super-resolution in Flax.

The reference runs Real-ESRGAN ONNX sessions with optional pre-downscale,
overlap tiling and output blend modes (merged_pipeline.py:240-284). Same
architecture here, NHWC and jit-compiled: conv_first -> nb x RRDB (3 dense
blocks of 5 convs, residual scaling 0.2) -> trunk conv -> 2x nearest-neighbor
upsample convs -> HR convs. x2 checkpoints pixel-unshuffle the input
(standard Real-ESRGAN trick) so the trunk always runs at 1/scale resolution.

Weight conversion from official Real-ESRGAN checkpoints (state dict names
conv_first / body.N.rdbM.convK / conv_body / conv_up1 / conv_up2 / conv_hr /
conv_last) is in ``convert_rrdbnet``; parity is tested against an
independent torch transcription of RRDBNet in tests/test_enhance.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


class ResidualDenseBlock(nn.Module):
    nf: int
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        def conv(n, out):
            return nn.Conv(out, (3, 3), padding=((1, 1), (1, 1)), name=n)

        x1 = _lrelu(conv("conv1", self.gc)(x))
        x2 = _lrelu(conv("conv2", self.gc)(jnp.concatenate([x, x1], -1)))
        x3 = _lrelu(conv("conv3", self.gc)(jnp.concatenate([x, x1, x2], -1)))
        x4 = _lrelu(conv("conv4", self.gc)(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv("conv5", self.nf)(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x + 0.2 * x5


class RRDB(nn.Module):
    nf: int
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        h = ResidualDenseBlock(self.nf, self.gc, name="rdb1")(x)
        h = ResidualDenseBlock(self.nf, self.gc, name="rdb2")(h)
        h = ResidualDenseBlock(self.nf, self.gc, name="rdb3")(h)
        return x + 0.2 * h


def _nearest_up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _pixel_unshuffle(x, r):
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, c * r * r)


class RRDBNet(nn.Module):
    """scale in {1, 2, 4}; scale<4 pixel-unshuffles the input."""

    nf: int = 64
    nb: int = 23
    gc: int = 32
    scale: int = 4

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] in [0, 1] -> [B, H*s, W*s, 3]
        if self.scale == 2:
            x = _pixel_unshuffle(x, 2)
        elif self.scale == 1:
            x = _pixel_unshuffle(x, 4)

        def conv(n, out):
            return nn.Conv(out, (3, 3), padding=((1, 1), (1, 1)), name=n)

        feat = conv("conv_first", self.nf)(x)
        trunk = feat
        for i in range(self.nb):
            trunk = RRDB(self.nf, self.gc, name=f"body{i}")(trunk)
        feat = feat + conv("conv_body", self.nf)(trunk)
        feat = _lrelu(conv("conv_up1", self.nf)(_nearest_up2(feat)))
        feat = _lrelu(conv("conv_up2", self.nf)(_nearest_up2(feat)))
        feat = _lrelu(conv("conv_hr", self.nf)(feat))
        return conv("conv_last", 3)(feat)


def convert_rrdbnet(state: dict, nb: int = 23) -> dict:
    """Official Real-ESRGAN torch state dict -> flax params."""

    def conv(prefix):
        return {
            "kernel": np.asarray(state[f"{prefix}.weight"], np.float32)
            .transpose(2, 3, 1, 0),
            "bias": np.asarray(state[f"{prefix}.bias"], np.float32),
        }

    params = {
        "conv_first": conv("conv_first"),
        "conv_body": conv("conv_body"),
        "conv_up1": conv("conv_up1"),
        "conv_up2": conv("conv_up2"),
        "conv_hr": conv("conv_hr"),
        "conv_last": conv("conv_last"),
    }
    for i in range(nb):
        blk = {}
        for r in (1, 2, 3):
            blk[f"rdb{r}"] = {
                f"conv{k}": conv(f"body.{i}.rdb{r}.conv{k}") for k in range(1, 6)
            }
        params[f"body{i}"] = blk
    return params


def blend_images(original: jnp.ndarray, upscaled: jnp.ndarray,
                 mode: str = "OFF") -> jnp.ndarray:
    """AI-blend modes (merged_pipeline.py:233-238): alpha of the upscaled
    result vs the plain-resized original: OFF/LOW/MEDIUM/HIGH."""
    alpha = {"OFF": 1.0, "LOW": 0.85, "MEDIUM": 0.5, "HIGH": 0.25}[mode]
    return upscaled * alpha + original * (1.0 - alpha)
