"""Spatio-temporal conditional UNet (SVD-class) in Flax — the DepthCrafter
denoiser.

The reference subclasses diffusers' UNetSpatioTemporalConditionModel with a
custom forward (core/unet.py:8-142): 8-channel input (4 noisy depth latent +
4 conditioning frame latent), per-frame time embeddings, CLIP image-embed
cross attention, ``image_only_indicator`` zeros; config = 4 blocks
(320/640/1280/1280), 25-frame native window
(weights/DepthCrafter/unet_config.json).

Native design, NHWC, tensors [B, T, H, W, C]:
- spatial sublayers fold T into the batch;
- temporal sublayers fold (H, W) into the batch and attend/convolve over T;
- each spatial resnet/attention is followed by its temporal twin, merged by
  a learnable sigmoid mix factor (the SVD AlphaBlender);
- the temporal axis is where context parallelism shards (parallel/, the
  ring-attention analog of the reference's serial sliding window).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet2d import CrossAttention, GEGLU, timestep_embedding


@dataclasses.dataclass(frozen=True)
class UNetSTConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: tuple = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    norm_groups: int = 32
    with_attn: tuple = (True, True, True, False)


UNET_ST_TINY = UNetSTConfig(
    block_out_channels=(16, 32),
    layers_per_block=1,
    attention_head_dim=(2, 4),
    cross_attention_dim=16,
    norm_groups=4,
    with_attn=(True, False),
)


def _conv(out, name, k=3, stride=1):
    pad = k // 2
    return nn.Conv(out, (k, k), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), name=name)


class AlphaBlender(nn.Module):
    """Learnable spatial/temporal mix: out = a*spatial + (1-a)*temporal."""

    @nn.compact
    def __call__(self, spatial, temporal):
        mix = self.param("mix_factor", nn.initializers.constant(0.5), ())
        a = jax.nn.sigmoid(mix)
        return a * spatial + (1.0 - a) * temporal


class SpatialResnet(nn.Module):
    out_ch: int
    groups: int

    @nn.compact
    def __call__(self, x, temb):  # x: [BT, H, W, C], temb: [BT, D]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm1")(x)
        h = jax.nn.silu(h)
        h = _conv(self.out_ch, "conv1")(h)
        h = h + nn.Dense(self.out_ch, name="time_emb")(jax.nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm2")(h)
        h = jax.nn.silu(h)
        h = _conv(self.out_ch, "conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="shortcut")(x)
        return x + h


class TemporalResnet(nn.Module):
    """Resnet with a (3,) temporal conv per spatial position."""

    out_ch: int
    groups: int

    @nn.compact
    def __call__(self, x, temb, t: int):  # x: [BT, H, W, C]
        bt, h, w, c = x.shape
        b = bt // t
        y = x.reshape(b, t, h, w, c).transpose(0, 2, 3, 1, 4).reshape(
            b * h * w, t, c
        )
        r = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm1")(y)
        r = jax.nn.silu(r)
        r = nn.Conv(self.out_ch, (3,), padding=((1, 1),), name="conv1")(r)
        # per-frame embedding [BT, C] -> [B, T, C], broadcast over positions
        te = nn.Dense(self.out_ch, name="time_emb")(jax.nn.silu(temb))
        te = te.reshape(b, t, self.out_ch)
        r = r.reshape(b, h * w, t, self.out_ch) + te[:, None, :, :]
        r = r.reshape(b * h * w, t, self.out_ch)
        r = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm2")(r)
        r = jax.nn.silu(r)
        r = nn.Conv(self.out_ch, (3,), padding=((1, 1),), name="conv2")(r)
        if y.shape[-1] != self.out_ch:
            y = nn.Dense(self.out_ch, name="shortcut")(y)
        out = y + r
        return out.reshape(b, h, w, t, self.out_ch).transpose(0, 3, 1, 2, 4).reshape(
            bt, h, w, self.out_ch
        )


class STResnet(nn.Module):
    out_ch: int
    groups: int

    @nn.compact
    def __call__(self, x, temb, t: int):
        s = SpatialResnet(self.out_ch, self.groups, name="spatial")(x, temb)
        tm = TemporalResnet(self.out_ch, self.groups, name="temporal")(s, temb, t)
        return AlphaBlender(name="mix")(s, tm)


class TransformerLayer(nn.Module):
    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, ctx):
        x = x + CrossAttention(self.heads, self.head_dim, name="attn1")(
            nn.LayerNorm(name="norm1")(x)
        )
        x = x + CrossAttention(self.heads, self.head_dim, name="attn2")(
            nn.LayerNorm(name="norm2")(x), ctx
        )
        h = GEGLU(x.shape[-1] * 4, name="ff_geglu")(nn.LayerNorm(name="norm3")(x))
        return x + nn.Dense(x.shape[-1], name="ff_out")(h)


class STTransformer(nn.Module):
    """Spatial transformer + temporal transformer, alpha-blended."""

    heads: int
    head_dim: int
    groups: int

    @nn.compact
    def __call__(self, x, ctx, t: int):  # x: [BT, H, W, C]; ctx: [BT, L, D]
        bt, h, w, c = x.shape
        b = bt // t
        res = x
        y = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm")(x)
        y = nn.Dense(c, name="proj_in")(y.reshape(bt, h * w, c))
        y = TransformerLayer(self.heads, self.head_dim, name="spatial")(y, ctx)
        # temporal attention: tokens are the T frames at each position.
        # Its attn2 CROSS-attends to the first frame's CLIP context
        # broadcast per spatial position (diffusers
        # TransformerSpatioTemporalModel's time_context_first_timestep) —
        # self-attention here would both diverge from SVD semantics and
        # crash on converted weights (to_k expects the 1024-dim context).
        z = y.reshape(b, t, h * w, c).transpose(0, 2, 1, 3).reshape(b * h * w, t, c)
        tctx = ctx.reshape(b, t, *ctx.shape[1:])[:, 0]  # [b, L, D]
        tctx = jnp.repeat(tctx, h * w, axis=0)  # [b*h*w, L, D]
        z = TransformerLayer(self.heads, self.head_dim, name="temporal")(z, tctx)
        z = z.reshape(b, h * w, t, c).transpose(0, 2, 1, 3).reshape(bt, h * w, c)
        y = AlphaBlender(name="mix")(y, z)
        y = nn.Dense(c, name="proj_out")(y).reshape(bt, h, w, c)
        return y + res


class UNetSpatioTemporal(nn.Module):
    cfg: UNetSTConfig = UNetSTConfig()

    @nn.compact
    def __call__(self, latents, timesteps, context):
        """latents: [B, T, H, W, Cin]; timesteps: scalar / [B] / [B, T]
        (per-frame embeddings, core/unet.py parity); context: [B, L, D]
        (CLIP image embeddings). Returns [B, T, H, W, Cout]."""
        cfg = self.cfg
        b, t, hh, ww, _ = latents.shape
        c0 = cfg.block_out_channels[0]

        ts = jnp.asarray(timesteps, jnp.float32)
        if ts.ndim == 0:
            ts = jnp.broadcast_to(ts, (b, t))
        elif ts.ndim == 1:
            ts = jnp.broadcast_to(ts[:, None], (b, t))
        temb = timestep_embedding(ts.reshape(b * t), c0)
        temb = nn.Dense(c0 * 4, name="time_fc1")(temb)
        temb = nn.Dense(c0 * 4, name="time_fc2")(jax.nn.silu(temb))  # [BT, 4c0]
        # keep the whole net at the latents' dtype: an f32 temb would
        # promote every resnet to f32 (see unet2d.py, same rationale)
        temb = temb.astype(latents.dtype)

        ctx = jnp.repeat(context, t, axis=0).astype(latents.dtype)  # [BT, L, D]

        x = latents.reshape(b * t, hh, ww, cfg.in_channels)
        x = _conv(c0, "conv_in")(x)
        skips = [x]
        for i, ch in enumerate(cfg.block_out_channels):
            heads = cfg.attention_head_dim[i]
            for j in range(cfg.layers_per_block):
                x = STResnet(ch, cfg.norm_groups, name=f"down{i}_res{j}")(x, temb, t)
                if cfg.with_attn[i]:
                    x = STTransformer(heads, ch // heads, cfg.norm_groups,
                                      name=f"down{i}_attn{j}")(x, ctx, t)
                skips.append(x)
            if i < len(cfg.block_out_channels) - 1:
                x = _conv(ch, f"down{i}_downsample", stride=2)(x)
                skips.append(x)
        cm = cfg.block_out_channels[-1]
        hm = cfg.attention_head_dim[-1]
        x = STResnet(cm, cfg.norm_groups, name="mid_res1")(x, temb, t)
        x = STTransformer(hm, cm // hm, cfg.norm_groups, name="mid_attn")(x, ctx, t)
        x = STResnet(cm, cfg.norm_groups, name="mid_res2")(x, temb, t)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            bi = len(cfg.block_out_channels) - 1 - i
            heads = cfg.attention_head_dim[bi]
            for j in range(cfg.layers_per_block + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = STResnet(ch, cfg.norm_groups, name=f"up{i}_res{j}")(x, temb, t)
                if cfg.with_attn[bi]:
                    x = STTransformer(heads, ch // heads, cfg.norm_groups,
                                      name=f"up{i}_attn{j}")(x, ctx, t)
            if i < len(cfg.block_out_channels) - 1:
                bt_, h2, w2, c2 = x.shape
                x = jax.image.resize(x, (bt_, h2 * 2, w2 * 2, c2), "nearest")
                x = _conv(c2, f"up{i}_upsample")(x)
        x = nn.GroupNorm(cfg.norm_groups, epsilon=1e-5, name="norm_out")(x)
        x = jax.nn.silu(x)
        x = _conv(cfg.out_channels, "conv_out")(x)
        return x.reshape(b, t, hh, ww, cfg.out_channels)
