"""Marigold depth estimation pipeline (diffusion, single image).

The reference wraps diffusers' MarigoldDepthPipeline in fp16 with 4 steps /
ensemble 5 (render_depth.py:771-793). Native equivalent: encode the RGB
image to SD latent space, run a short DDIM v-prediction loop on a depth
latent conditioned by channel-concat with the RGB latent (8ch UNet input),
decode, average latent channels, ensemble-reduce. The empty-prompt text
embedding is a fixed [1, 77, 1024] tensor shipped with converted weights
(or zeros for random-weight testing).

The whole denoise loop unrolls into ONE jitted graph (static step count) —
no per-step host round trips.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .schedulers import DDIMSchedule
from .unet2d import UNet2DCondition, UNet2DConfig
from .vae import VAE_TINY, AutoencoderKL, VAEConfig


@dataclasses.dataclass
class MarigoldPipeline:
    unet_cfg: UNet2DConfig
    vae_cfg: VAEConfig
    unet_params: dict
    vae_params: dict
    empty_text_embed: np.ndarray  # [1, 77, cross_dim]
    num_steps: int = 4
    ensemble_size: int = 1

    def __post_init__(self):
        self.unet = UNet2DCondition(self.unet_cfg)
        self.vae = AutoencoderKL(self.vae_cfg)
        self.schedule = DDIMSchedule(num_inference_steps=self.num_steps)
        # device-resident once (see DepthPredictor.__post_init__)
        import jax as _jax

        self.unet_params = _jax.device_put(self.unet_params)
        self.vae_params = _jax.device_put(self.vae_params)
        # compute dtype follows the weights: bf16 params -> bf16
        # activations end to end (the reference runs the whole Marigold
        # pipe fp16, render_depth.py:771). Without this cast, f32 inputs
        # promote every matmul/conv to f32 on the MXU.
        cdt = jnp.result_type(*jax.tree.leaves(self.unet_params)[:1])
        self.compute_dtype = cdt

        def run(unet_params, vae_params, rgb01, noise):
            """rgb01: [B, H, W, 3] in [0,1]; noise: [B, h8, w8, 4]."""
            rgb = (rgb01.astype(cdt) * 2.0 - 1.0)
            noise = noise.astype(cdt)
            rgb_latent = self.vae.apply(
                {"params": vae_params}, rgb, method=AutoencoderKL.encode_mode
            )
            ctx = jnp.asarray(self.empty_text_embed, rgb.dtype)
            ctx = jnp.broadcast_to(ctx, (rgb.shape[0],) + ctx.shape[1:])
            depth_latent = noise
            for i in range(len(self.schedule.timesteps)):
                t = int(self.schedule.timesteps[i])
                inp = jnp.concatenate([rgb_latent, depth_latent], axis=-1)
                v = self.unet.apply(
                    {"params": unet_params}, inp, jnp.asarray(t, jnp.float32), ctx
                )
                depth_latent = self.schedule.step(v, i, depth_latent)
            depth = self.vae.apply(
                {"params": vae_params}, depth_latent, method=AutoencoderKL.decode
            )
            depth = jnp.mean(depth.astype(jnp.float32), axis=-1)  # [-1, 1]
            return jnp.clip((depth + 1.0) / 2.0, 0.0, 1.0)

        self._run = jax.jit(run)

        def run_ens(unet_params, vae_params, rgb01, noise_e):
            """Ensemble folded into the batch axis: encode ONCE, denoise
            all E members in one batched graph, median on device. The
            TPU-native formulation of the reference's serial
            ensemble_size loop (render_depth.py:785) — one launch, the
            MXU sees an E-fold batch, and the RGB latent is computed
            once instead of E times."""
            e = noise_e.shape[0]
            b = rgb01.shape[0]
            rgb = rgb01.astype(cdt) * 2.0 - 1.0
            noise_e = noise_e.astype(cdt)
            rgb_latent = self.vae.apply(
                {"params": vae_params}, rgb, method=AutoencoderKL.encode_mode
            )  # [B, h8, w8, 4]
            # member-major [e0(b0..), e1(b0..), ...] to pair with the
            # noise reshape below
            rgb_lat_e = jnp.tile(rgb_latent, (e, 1, 1, 1))  # [E*B, ...]
            ctx = jnp.asarray(self.empty_text_embed, rgb.dtype)
            ctx = jnp.broadcast_to(ctx, (e * b,) + ctx.shape[1:])
            depth_latent = noise_e.reshape((e * b,) + noise_e.shape[2:])
            for i in range(len(self.schedule.timesteps)):
                t = int(self.schedule.timesteps[i])
                inp = jnp.concatenate([rgb_lat_e, depth_latent], axis=-1)
                v = self.unet.apply(
                    {"params": unet_params}, inp,
                    jnp.asarray(t, jnp.float32), ctx
                )
                depth_latent = self.schedule.step(v, i, depth_latent)
            # decode members one at a time: the batched [E*B, 96, 96, 4]
            # decode measured 606 ms vs 5 x 54.6 ms chunked at product
            # geometry (benchmarks/marigold_split.py — the 768^2 decoder's
            # intermediates at batch 5 blow past VMEM and XLA spills);
            # lax.map compiles ONE batch-1 body reused E*B times
            depth = jax.lax.map(
                lambda z: self.vae.apply(
                    {"params": vae_params}, z[None],
                    method=AutoencoderKL.decode)[0],
                depth_latent,
            )
            depth = jnp.mean(depth.astype(jnp.float32), axis=-1)  # [E*B, H, W]
            depth = jnp.clip((depth + 1.0) / 2.0, 0.0, 1.0)
            return jnp.median(depth.reshape((e, b) + depth.shape[1:]),
                              axis=0)

        self._run_ens = jax.jit(run_ens)

    def run_ensemble(self, rgb01: np.ndarray, seed: int = 0) -> jnp.ndarray:
        """[B, H, W, 3] -> [B, H, W]; all ensemble members in ONE launch."""
        rgb01 = jnp.asarray(rgb01)
        b, h, w = rgb01.shape[0], rgb01.shape[1], rgb01.shape[2]
        stride = 2 ** (len(self.vae_cfg.block_out_channels) - 1)
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (self.ensemble_size, b, h // stride, w // stride,
             self.vae_cfg.latent_channels), jnp.float32)
        return self._run_ens(self.unet_params, self.vae_params, rgb01, noise)

    def __call__(self, rgb01: np.ndarray, seed: int = 0) -> jnp.ndarray:
        """[B, H, W, 3] float RGB in [0,1] -> [B, H, W] depth in [0,1].

        H, W must be multiples of the VAE stride (8 for full SD; 2^(n-1) for
        n VAE blocks). Ensembling runs the loop with e different noise seeds
        and medians the results (the diffusers ensemble reduction).
        """
        rgb01 = jnp.asarray(rgb01)
        b, h, w = rgb01.shape[0], rgb01.shape[1], rgb01.shape[2]
        stride = 2 ** (len(self.vae_cfg.block_out_channels) - 1)
        lh, lw = h // stride, w // stride
        outs = []
        for e in range(self.ensemble_size):
            key = jax.random.PRNGKey(seed + e)
            noise = jax.random.normal(
                key, (b, lh, lw, self.vae_cfg.latent_channels), jnp.float32
            )
            outs.append(self._run(self.unet_params, self.vae_params, rgb01, noise))
        if len(outs) == 1:
            return outs[0]
        return jnp.median(jnp.stack(outs), axis=0)


def tiny_marigold(seed: int = 0, steps: int = 2) -> MarigoldPipeline:
    """Random-weight tiny pipeline for tests/benchmarks."""
    unet_cfg = dataclasses.replace(UNet2DConfig(), **{})
    from .unet2d import UNET2D_TINY

    unet = UNet2DCondition(UNET2D_TINY)
    vae = AutoencoderKL(VAE_TINY)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    sample = jnp.zeros((1, 8, 8, 8), jnp.float32)
    ctx = jnp.zeros((1, 7, UNET2D_TINY.cross_attention_dim), jnp.float32)
    up = unet.init(k1, sample, jnp.asarray(1.0), ctx)["params"]
    vp = vae.init(k2, jnp.zeros((1, 16, 16, 3), jnp.float32))["params"]
    return MarigoldPipeline(
        UNET2D_TINY, VAE_TINY, up, vp,
        np.zeros((1, 7, UNET2D_TINY.cross_attention_dim), np.float32),
        num_steps=steps,
    )
