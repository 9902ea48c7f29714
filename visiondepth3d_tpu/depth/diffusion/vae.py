"""Stable-Diffusion AutoencoderKL (VAE) in Flax, NHWC.

Shared latent codec for Marigold (SD2 VAE) and DepthCrafter (sd-vae-ft-mse,
loaded by depthcrafter_adapter.py:33). Standard architecture: encoder
(conv_in -> 4 down blocks of 2 resnets -> mid block with attention ->
GroupNorm/SiLU -> conv_out -> 2*latent moments), decoder mirror, latent
scaling factor 0.18215. Weight conversion maps diffusers state dict names.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_groups: int = 32
    scaling_factor: float = 0.18215
    in_channels: int = 3
    out_channels: int = 3


VAE_TINY = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                     norm_groups=4)


def _conv(out, name, k=3, stride=1):
    pad = k // 2
    return nn.Conv(out, (k, k), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), name=name)


class ResnetBlock(nn.Module):
    out_ch: int
    groups: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm1")(x)
        h = jax.nn.silu(h)
        h = _conv(self.out_ch, "conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm2")(h)
        h = jax.nn.silu(h)
        h = _conv(self.out_ch, "conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    groups: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="q")(y)
        k = nn.Dense(c, name="k")(y)
        v = nn.Dense(c, name="v")(y)
        # single-head attention through the dispatcher: at the 768² mid
        # block (9216 tokens) the naive einsum materializes a [N, N] f32
        # logits tensor (340 MB); the tuned flash path is slightly faster
        # (3.17 vs 3.64 ms, benchmarks/vae_decode_split.py) and O(N) memory
        from ...ops.attention import multi_head_attention

        y = multi_head_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        ).reshape(b, h * w, c)
        y = nn.Dense(c, name="proj")(y).reshape(b, h, w, c)
        return x + y


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = _conv(cfg.block_out_channels[0], "conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, cfg.norm_groups, name=f"down{i}_res{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers pads (0,1,0,1) then 3x3 stride 2
                h = jnp.pad(h, [(0, 0), (0, 1), (0, 1), (0, 0)])
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            name=f"down{i}_downsample")(h)
        c_mid = cfg.block_out_channels[-1]
        h = ResnetBlock(c_mid, cfg.norm_groups, name="mid_res1")(h)
        h = AttnBlock(cfg.norm_groups, name="mid_attn")(h)
        h = ResnetBlock(c_mid, cfg.norm_groups, name="mid_res2")(h)
        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, name="norm_out")(h)
        h = jax.nn.silu(h)
        return _conv(2 * cfg.latent_channels, "conv_out")(h)  # moments


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        chans = list(reversed(cfg.block_out_channels))
        h = _conv(chans[0], "conv_in")(z)
        h = ResnetBlock(chans[0], cfg.norm_groups, name="mid_res1")(h)
        h = AttnBlock(cfg.norm_groups, name="mid_attn")(h)
        h = ResnetBlock(chans[0], cfg.norm_groups, name="mid_res2")(h)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(ch, cfg.norm_groups, name=f"up{i}_res{j}")(h)
            if i < len(chans) - 1:
                b, hh, ww, c = h.shape
                # 2x nearest as broadcast+reshape: exact; measured a WASH
                # vs jax.image.resize (51.8 vs 51.6 ms whole-decode A/B —
                # XLA handles the 2x nearest gather fine); kept for
                # consistency with the esrgan upsample style
                h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                     (b, hh, 2, ww, 2, c)
                                     ).reshape(b, hh * 2, ww * 2, c)
                h = _conv(ch, f"up{i}_upsample")(h)
        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, name="norm_out")(h)
        h = jax.nn.silu(h)
        return _conv(cfg.out_channels, "conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def encode_moments(self, x):
        return self.encoder(x)

    def encode_mode(self, x):
        """Deterministic encode (mode of the posterior) scaled to latent
        units — what Marigold/DepthCrafter use for conditioning."""
        moments = self.encoder(x)
        mean = moments[..., : self.cfg.latent_channels]
        return mean * self.cfg.scaling_factor

    def decode(self, z):
        return self.decoder(z / self.cfg.scaling_factor)

    def __call__(self, x):
        return self.decode(self.encode_mode(x))
