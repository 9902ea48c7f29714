"""SD2-class conditional UNet (UNet2DConditionModel) in Flax, NHWC.

The Marigold depth core: an 8-channel-input (RGB latent + depth latent)
Stable Diffusion 2 UNet conditioned on a (cached, empty-prompt) text
embedding (the reference drives it through diffusers'
MarigoldDepthPipeline, render_depth.py:767-797). Config-driven blocks:

  down: (CrossAttnDownBlock x3 + DownBlock), each 2 resnets (+ spatial
  transformer), stride-2 downsamplers; mid: resnet-attn-resnet;
  up: mirrored with skip concats; SiLU/GroupNorm(32); sinusoidal timestep
  MLP; GEGLU feed-forwards.

TPU notes: attention over (H/8)^2 tokens uses jax.nn.dot_product_attention;
all convs NHWC; the whole denoise loop jits as one graph per step count.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: tuple = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    norm_groups: int = 32
    with_attn: tuple = (True, True, True, False)  # per down block


UNET2D_TINY = UNet2DConfig(
    block_out_channels=(32, 64),
    layers_per_block=1,
    attention_head_dim=(2, 4),
    cross_attention_dim=32,
    norm_groups=8,
    with_attn=(True, False),
)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period=10000.0) -> jnp.ndarray:
    """Sinusoidal embedding (diffusers flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = t[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _conv(out, name, k=3, stride=1):
    pad = k // 2
    return nn.Conv(out, (k, k), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), name=name)


class ResnetBlock(nn.Module):
    out_ch: int
    groups: int

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm1")(x)
        h = jax.nn.silu(h)
        h = _conv(self.out_ch, "conv1")(h)
        t = nn.Dense(self.out_ch, name="time_emb")(jax.nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm2")(x=h)
        h = jax.nn.silu(h)
        h = _conv(self.out_ch, "conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, self.head_dim)

        # multi_head_attention flash-es self-attention over the latent
        # grid (9216 tokens at 768^2 input) — the logits never exist in
        # HBM; cross-attention (77 text tokens) stays on the fused default
        from ...ops.attention import multi_head_attention

        out = multi_head_attention(split(q), split(k), split(v))
        out = out.reshape(x.shape[0], x.shape[1], inner)
        return nn.Dense(x.shape[-1], name="to_out")(out)


class GEGLU(nn.Module):
    """Gated-GELU feed-forward head (diffusers FeedForward geglu):
    projects to ``2 * inner_dim``, gates -> ``inner_dim``. SD transformer
    blocks use inner_dim = 4 * c. (r5 fix: the previous ``out_dim * 8``
    with ``c // 2`` call sites built a HALF-width FF on random init —
    converted checkpoints were unaffected because flax adopts the loaded
    kernel shapes, but benchmarks under-counted the FF and param counts
    read 791M instead of SD2's ~865M.)"""

    inner_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.inner_dim * 2, name="proj")(x)
        a, b = jnp.split(h, 2, axis=-1)
        return a * jax.nn.gelu(b)


class TransformerBlock(nn.Module):
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
        h = nn.LayerNorm(name="norm3")(x)
        h = GEGLU(x.shape[-1] * 4, name="ff_geglu")(h)
        x = x + nn.Dense(x.shape[-1], name="ff_out")(h)
        return x


class SpatialTransformer(nn.Module):
    heads: int
    head_dim: int
    groups: int

    @nn.compact
    def __call__(self, x, ctx):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm")(x)
        x = nn.Dense(c, name="proj_in")(x.reshape(b, h * w, c))
        x = TransformerBlock(self.heads, self.head_dim, name="block")(x, ctx)
        x = nn.Dense(c, name="proj_out")(x).reshape(b, h, w, c)
        return x + res


class UNet2DCondition(nn.Module):
    cfg: UNet2DConfig = UNet2DConfig()

    @nn.compact
    def __call__(self, latents, timesteps, context):
        """latents: [B, H, W, Cin]; timesteps: [B] or scalar; context:
        [B, L, cross_dim]. Returns [B, H, W, Cout]."""
        cfg = self.cfg
        c0 = cfg.block_out_channels[0]
        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (latents.shape[0],))
        temb = timestep_embedding(timesteps, c0)
        temb = nn.Dense(c0 * 4, name="time_fc1")(temb)
        temb = nn.Dense(c0 * 4, name="time_fc2")(jax.nn.silu(temb))
        # the sinusoidal embedding is f32; without this cast an f32 temb
        # promotes every resnet (and everything downstream) to f32, which
        # on the MXU runs at a fraction of bf16 throughput — the whole
        # UNet must run at the latents' dtype (the reference runs the
        # entire Marigold pipe fp16, render_depth.py:771)
        temb = temb.astype(latents.dtype)
        context = context.astype(latents.dtype)

        h = _conv(c0, "conv_in")(latents)
        skips = [h]
        # down
        for i, ch in enumerate(cfg.block_out_channels):
            heads = cfg.attention_head_dim[i]
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, cfg.norm_groups, name=f"down{i}_res{j}")(h, temb)
                if cfg.with_attn[i]:
                    h = SpatialTransformer(
                        heads, ch // heads, cfg.norm_groups, name=f"down{i}_attn{j}"
                    )(h, context)
                skips.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = _conv(ch, f"down{i}_downsample", stride=2)(h)
                skips.append(h)
        # mid
        cm = cfg.block_out_channels[-1]
        hm = cfg.attention_head_dim[-1]
        h = ResnetBlock(cm, cfg.norm_groups, name="mid_res1")(h, temb)
        h = SpatialTransformer(hm, cm // hm, cfg.norm_groups, name="mid_attn")(
            h, context
        )
        h = ResnetBlock(cm, cfg.norm_groups, name="mid_res2")(h, temb)
        # up
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            bi = len(cfg.block_out_channels) - 1 - i
            heads = cfg.attention_head_dim[bi]
            for j in range(cfg.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock(ch, cfg.norm_groups, name=f"up{i}_res{j}")(h, temb)
                if cfg.with_attn[bi]:
                    h = SpatialTransformer(
                        heads, ch // heads, cfg.norm_groups, name=f"up{i}_attn{j}"
                    )(h, context)
            if i < len(cfg.block_out_channels) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = _conv(c, f"up{i}_upsample")(h)
        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-5, name="norm_out")(h)
        h = jax.nn.silu(h)
        return _conv(cfg.out_channels, "conv_out")(h)
