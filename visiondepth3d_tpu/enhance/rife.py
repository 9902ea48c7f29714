"""RIFE-style frame interpolation (IFNet) in Flax.

The reference runs a RIFE ONNX export: input concat(frame1, frame2)/255 as
[1, 6, H, W], output the middle frame (merged_pipeline.py:196-219), batched
for 4x by repeating pairs. This is the same IFNet design natively: a
coarse-to-fine pyramid of flow blocks, each refining bidirectional flow +
an occlusion mask at increasing resolution, with backward warping between
levels — jit-compiled NHWC, fused into the render graph instead of a
separate ONNX session.

Structure (practical-RIFE v4.x IFBlock layout): per level L (scales 4,2,1):
  inputs = [img0_s, img1_s, timestep, warped0, warped1, mask, flow]
  conv0: 2x stride-2 conv + PReLU; convblock: 8 residual convs;
  lastconv: 2x transposed upsample -> (4 flow + 1 mask) deltas at scale.
Weight conversion from the practical-RIFE checkpoints maps module-for-module
(see convert_rife); exactness is validated structurally (shape/flow
identities) since the ONNX graph itself isn't redistributable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.flow_warp import flow_warp_batch
from ..ops.resize import resize_bilinear


def _resize(x, hw):
    return resize_bilinear(x, hw, align_corners=False, channel_last=True)


class PReLU(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (self.channels,))
        return jnp.where(x >= 0, x, a * x)


class ConvPReLU(nn.Module):
    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), name="conv")(x)
        return PReLU(self.out, name="prelu")(x)


class ResConv(nn.Module):
    c: int

    @nn.compact
    def __call__(self, x):
        beta = self.param("beta", nn.initializers.ones, (self.c,))
        h = ConvPReLU(self.c, name="conv")(x)
        return x + h * beta


class IFBlock(nn.Module):
    c: int

    @nn.compact
    def __call__(self, x, flow_scale: float):
        h, w = x.shape[1], x.shape[2]
        y = ConvPReLU(self.c // 2, stride=2, name="down0")(x)
        y = ConvPReLU(self.c, stride=2, name="down1")(y)
        for i in range(8):
            y = ResConv(self.c, name=f"res{i}")(y)
        # upsample 4x back to block input res: two 2x transposed convs
        y = nn.ConvTranspose(self.c // 2, (4, 4), strides=(2, 2),
                             padding=((1, 1), (1, 1)), name="up0")(y)
        y = PReLU(self.c // 2, name="up0_prelu")(y)
        y = nn.ConvTranspose(5, (4, 4), strides=(2, 2),
                             padding=((1, 1), (1, 1)), name="up1")(y)
        y = _resize(y, (h, w))
        flow = y[..., :4] * flow_scale
        mask = y[..., 4:5]
        return flow, mask


class IFNet(nn.Module):
    """Coarse-to-fine interpolation network. scales e.g. (4, 2, 1)."""

    c: int = 96
    scales: tuple = (4, 2, 1)

    @nn.compact
    def __call__(self, img0, img1, timestep=0.5):
        """img0/img1: [B, H, W, 3] in [0, 1] -> middle frame [B, H, W, 3]."""
        b, h, w, _ = img0.shape
        t = jnp.full((b, h, w, 1), timestep, img0.dtype)
        flow = jnp.zeros((b, h, w, 4), img0.dtype)
        mask = jnp.zeros((b, h, w, 1), img0.dtype)
        warped0, warped1 = img0, img1

        for i, s in enumerate(self.scales):
            hs, ws = h // s, w // s
            inp = jnp.concatenate(
                [
                    _resize(img0, (hs, ws)),
                    _resize(img1, (hs, ws)),
                    _resize(t, (hs, ws)),
                    _resize(warped0, (hs, ws)),
                    _resize(warped1, (hs, ws)),
                    _resize(mask, (hs, ws)),
                    _resize(flow, (hs, ws)) / s,
                ],
                axis=-1,
            )
            dflow, dmask = IFBlock(self.c // (i + 1), name=f"block{i}")(
                inp, flow_scale=float(s)
            )
            dflow = _resize(dflow, (h, w))
            dmask = _resize(dmask, (h, w))
            flow = flow + dflow
            mask = mask + dmask
            warped0 = flow_warp_batch(img0, flow[..., 0:2])
            warped1 = flow_warp_batch(img1, flow[..., 2:4])

        m = jax.nn.sigmoid(mask)
        out = warped0 * m + warped1 * (1.0 - m)
        return jnp.clip(out, 0.0, 1.0)


def interpolate_pairs(params, model: IFNet, frames01: jnp.ndarray,
                      multiplier: int = 2) -> jnp.ndarray:
    """[T, H, W, 3] -> [ (T-1)*mult + 1, H, W, 3 ] with mult-1 in-betweens
    per original pair (run_rife batching analog, merged_pipeline.py:204-219)."""
    img0 = frames01[:-1]
    img1 = frames01[1:]
    mids = []
    for k in range(1, multiplier):
        tstep = k / multiplier
        mids.append(model.apply({"params": params}, img0, img1, tstep))
    # interleave: f0, mids(f0,f1)..., f1, mids(f1,f2)..., ..., fT
    t = frames01.shape[0]
    seq = []
    for i in range(t - 1):
        seq.append(frames01[i])
        for m in mids:
            seq.append(m[i])
    seq.append(frames01[-1])
    return jnp.stack(seq)
