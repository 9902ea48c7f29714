"""DepthCrafter: temporal video-diffusion depth with sliding windows.

Behavioral port of the reference's SVD-derived pipeline
(core/depth_crafter_ppl.py:87-366 + core/depthcrafter_adapter.py):

- conditioning: VAE latents of the input frames (channel-concat with the
  noisy depth latent -> 8ch UNet input) + CLIP image embedding of the first
  frame as cross-attention context; noise aug 0.02 on the conditioning.
- Euler-discrete denoising with EDM preconditioning.
- **sliding-window long-video strategy** (the reference's only long-context
  mechanism, depth_crafter_ppl.py:245-335): windows of ``window_size``
  frames with ``overlap``; at each new window the overlap region's latents
  re-seed from the previous window's finished latents scaled by the sigma
  ratio, and finished windows stitch with linear cross-fade weights.
- output: decode depth latents, channel-mean, min-max normalize over the
  whole video (save_depthcrafter_outputs analog).

Each window's full denoise loop is ONE jitted graph (static window shape,
so every window after the first hits the compile cache). Distributing
windows across mesh devices with neighbor overlap exchange = temporal
context parallelism (parallel/).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .schedulers import EulerSchedule, svd_precondition
from .unet_st import UNET_ST_TINY, UNetSpatioTemporal, UNetSTConfig
from .vae import VAE_TINY, AutoencoderKL, VAEConfig
from .clip_vision import CLIP_TINY, CLIPVisionConfig, CLIPVisionEncoder


@dataclasses.dataclass
class DepthCrafterPipeline:
    unet_cfg: UNetSTConfig
    vae_cfg: VAEConfig
    clip_cfg: CLIPVisionConfig
    unet_params: dict
    vae_params: dict
    clip_params: dict
    num_steps: int = 2  # reference "DC-Max Quality" default (render_depth.py:1781)
    window_size: int = 24
    overlap: int = 6
    noise_aug: float = 0.02

    def __post_init__(self):
        # Degenerate-geometry guard (the reference GUI SHIPS window 24 /
        # overlap 25, render_depth.py:1788-1789): in the reference
        # pipeline stride = window - overlap = -1, so a >window batch
        # either yields ZERO windows (25..32 frames: "Inference failed")
        # or loops forever (depth_crafter_ppl.py:244,336 — idx_start
        # decreases). The only working interpretation of that config is
        # "one window per <=24-frame batch", which t <= window_size
        # already produces. Here overlap >= window clamps to window-1
        # (stride 1) so every geometry terminates with full coverage;
        # benchmarks/dc_overlap_curve.py records the seam/cost curve that
        # justifies the cheaper default (overlap 6).
        if self.overlap >= self.window_size:
            self.overlap = self.window_size - 1
        self.unet = UNetSpatioTemporal(self.unet_cfg)
        self.vae = AutoencoderKL(self.vae_cfg)
        self.clip = CLIPVisionEncoder(self.clip_cfg)
        self.schedule = EulerSchedule(num_inference_steps=self.num_steps)
        # device-resident once; an SVD-class checkpoint re-shipped per
        # window would dominate the denoise loop
        import jax as _jax

        self.unet_params = _jax.device_put(self.unet_params)
        self.vae_params = _jax.device_put(self.vae_params)
        self.clip_params = _jax.device_put(self.clip_params)
        # compute dtype follows the weights (bf16 params -> bf16
        # activations end to end; the reference runs fp16 with a
        # fp32-upcast only inside the VAE, depth_crafter_ppl.py:175-198).
        # Without these casts, f32 inputs promote the whole 1.1B-param
        # UNet to f32 on the MXU.
        cdt = jnp.result_type(*jax.tree.leaves(self.unet_params)[:1])
        self.compute_dtype = cdt

        def denoise_window(unet_params, cond_latent, ctx, init_latent):
            """cond_latent: [1, Tw, h, w, 4]; ctx: [1, 1, D];
            init_latent: [1, Tw, h, w, 4] = noise*sigma0 (possibly re-seeded).
            """
            cond_latent = cond_latent.astype(cdt)
            ctx = ctx.astype(cdt)
            latent = init_latent.astype(cdt)
            for i in range(self.num_steps):
                sigma = float(self.schedule.sigmas[i])
                c_skip, c_out, c_in = svd_precondition(sigma)
                inp = jnp.concatenate([latent * c_in, cond_latent], axis=-1)
                t = jnp.asarray(0.25 * np.log(sigma), jnp.float32)  # EDM c_noise
                f = self.unet.apply({"params": unet_params}, inp, t, ctx)
                denoised = c_skip * latent + c_out * f
                latent = self.schedule.step(denoised, i, latent)
            return latent

        self._denoise_window = jax.jit(denoise_window)

        def encode(vae_params, frames01):
            return self.vae.apply(
                {"params": vae_params}, frames01.astype(cdt) * 2.0 - 1.0,
                method=AutoencoderKL.encode_mode,
            )

        self._encode = jax.jit(encode)

        def decode(vae_params, latents):
            # frames decode one at a time (lax.map, one batch-1 body): at
            # product geometry the batched decoder's intermediates spill —
            # chunk-1 measured 2.2x cheaper per frame at the same pixel
            # count (benchmarks/marigold_split.py decode5 vs decode1)
            d = jax.lax.map(
                lambda z: self.vae.apply(
                    {"params": vae_params}, z[None].astype(cdt),
                    method=AutoencoderKL.decode)[0],
                latents,
            )
            return jnp.mean(d.astype(jnp.float32), axis=-1)

        self._decode = jax.jit(decode)

    def _windows(self, t: int) -> list[int]:
        if t <= self.window_size:
            return [0]
        stride = self.window_size - self.overlap
        starts = list(range(0, t - self.window_size, stride))
        starts.append(t - self.window_size)
        return starts

    def denoise_windows_parallel(self, cond, ctx, noise_full, starts, mesh=None):
        """Temporal context parallelism: all windows denoise CONCURRENTLY,
        sharded over the mesh ``dp`` axis.

        The serial re-seeding chain (reference semantics) is replaced by
        per-frame noise shared across windows — overlapping frames see the
        same noise in every window that covers them, which is what keeps the
        cross-fade coherent. This is the TPU mapping of the reference's only
        long-context mechanism (SURVEY.md §5): windows across devices
        instead of a serial Python loop.
        """
        import jax

        tw = min(self.window_size, cond.shape[0])
        cond_w = jnp.stack([cond[s : s + tw] for s in starts])  # [G, Tw, h, w, 4]
        noise_w = jnp.stack([noise_full[s : s + tw] for s in starts])
        sigma0 = float(self.schedule.sigmas[0])

        def one(cw, nw):
            return self._denoise_window(
                self.unet_params, cw[None], ctx, (nw * sigma0)[None]
            )[0]

        g = cond_w.shape[0]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # pad the window axis to a dp multiple (sharding needs even
            # splits); padded windows recompute the last one and are
            # discarded — segments normally carry >= dp windows
            dp = mesh.shape.get("dp", 1)
            pad = (-g) % dp
            if pad:
                cond_w = jnp.concatenate(
                    [cond_w, jnp.repeat(cond_w[-1:], pad, axis=0)])
                noise_w = jnp.concatenate(
                    [noise_w, jnp.repeat(noise_w[-1:], pad, axis=0)])
            sh = NamedSharding(mesh, P("dp"))
            cond_w = jax.lax.with_sharding_constraint(cond_w, sh)
            noise_w = jax.lax.with_sharding_constraint(noise_w, sh)
        return jax.vmap(one)(cond_w, noise_w)[:g]  # [G, Tw, h, w, 4]

    def run_parallel(self, frames01: np.ndarray, seed: int = 0, mesh=None):
        """Throughput mode: window-parallel denoising + whole-clip min-max
        normalization (same output contract as __call__)."""
        depth = self.run_raw_parallel(frames01, seed, mesh)
        lo, hi = jnp.min(depth), jnp.max(depth)
        return np.asarray(
            jnp.clip((depth - lo) / jnp.maximum(hi - lo, 1e-9), 0, 1)
        )

    def run_raw_parallel(self, frames01: np.ndarray, seed: int = 0,
                         mesh=None) -> jnp.ndarray:
        """Window-parallel denoise, UNNORMALIZED [T, H, W] depth — the
        streaming route (pipeline/depth_pipeline.py) stitches segments and
        normalizes globally; with a mesh this is its per-segment worker."""
        frames01 = jnp.asarray(frames01, jnp.float32)
        t = frames01.shape[0]
        key = jax.random.PRNGKey(seed)
        key, k1, k2 = jax.random.split(key, 3)
        aug = frames01 + self.noise_aug * jax.random.normal(k1, frames01.shape)
        cond = self._encode(self.vae_params, aug)
        from ...ops.resize import resize_bilinear

        s = self.clip_cfg.image_size
        clip_in = resize_bilinear(frames01[:1], (s, s), channel_last=True)
        emb = self.clip.apply({"params": self.clip_params}, clip_in)
        ctx = emb[:, None, :]
        noise_full = jax.random.normal(k2, cond.shape)
        starts = self._windows(t)
        tw = min(self.window_size, t)
        finals = self.denoise_windows_parallel(cond, ctx, noise_full, starts, mesh)

        # stitch in f32 regardless of compute dtype (cross-fade accumulation)
        out_latents = jnp.zeros(cond.shape, jnp.float32)
        weights = jnp.zeros((t, 1, 1, 1), jnp.float32)
        for g, start in enumerate(starts):
            ramp = np.ones(tw, np.float32)
            if start > 0:
                ov = min(self.overlap, tw)
                ramp[:ov] = np.linspace(1.0 / (ov + 1), 1.0, ov, endpoint=False)
            wgt = jnp.asarray(ramp)[:, None, None, None]
            out_latents = out_latents.at[start : start + tw].add(
                finals[g].astype(jnp.float32) * wgt)
            weights = weights.at[start : start + tw].add(wgt)
        out_latents = out_latents / jnp.maximum(weights, 1e-8)
        return self._decode(self.vae_params, out_latents)  # [T, H, W]

    def __call__(self, frames01: np.ndarray, seed: int = 0) -> np.ndarray:
        """frames01: [T, H, W, 3] in [0, 1] -> [T, H, W] depth in [0, 1]
        (whole-clip min-max normalized, save_depthcrafter_outputs
        semantics, render_depth.py:1161-1184)."""
        depth = self.run_raw(frames01, seed)
        lo, hi = jnp.min(depth), jnp.max(depth)
        return np.asarray(
            jnp.clip((depth - lo) / jnp.maximum(hi - lo, 1e-9), 0, 1)
        )

    def run_raw(self, frames01: np.ndarray, seed: int = 0) -> jnp.ndarray:
        """Sliding-window denoise, UNNORMALIZED [T, H, W] depth — the
        streaming route normalizes globally after stitching segments."""
        frames01 = jnp.asarray(frames01, jnp.float32)
        t, h, w = frames01.shape[:3]
        key = jax.random.PRNGKey(seed)

        # conditioning latents for every frame (noise-aug like :169-172)
        key, k1 = jax.random.split(key)
        aug = frames01 + self.noise_aug * jax.random.normal(k1, frames01.shape)
        cond = self._encode(self.vae_params, aug)  # [T, h8, w8, 4]

        # CLIP context from the first frame (resized to the CLIP grid)
        from ...ops.resize import resize_bilinear

        s = self.clip_cfg.image_size
        clip_in = resize_bilinear(frames01[:1], (s, s), channel_last=True)
        emb = self.clip.apply({"params": self.clip_params}, clip_in)  # [1, D]
        ctx = emb[:, None, :]  # [1, 1, D]

        tw = min(self.window_size, t)
        sigma0 = float(self.schedule.sigmas[0])
        lat_shape = (1, tw) + cond.shape[1:3] + (cond.shape[-1],)

        out_latents = jnp.zeros((t,) + cond.shape[1:], jnp.float32)
        weights = jnp.zeros((t, 1, 1, 1), jnp.float32)
        prev_final = None
        prev_start = 0

        for start in self._windows(t):
            key, kn = jax.random.split(key)
            noise = jax.random.normal(kn, lat_shape) * sigma0
            init = noise
            if prev_final is not None:
                # re-seed the overlap region from the previous window's
                # finished latents, scaled back up to sigma0
                # (depth_crafter_ppl.py:245-266 semantics)
                ov = prev_start + tw - start
                ov = max(0, min(ov, tw))
                if ov > 0:
                    prev_tail = prev_final[:, -ov:] if start > prev_start else prev_final[:, :ov]
                    seeded = prev_tail + noise[:, :ov]
                    init = jnp.concatenate([seeded, noise[:, ov:]], axis=1)
            cond_win = cond[start : start + tw][None]
            final = self._denoise_window(self.unet_params, cond_win, ctx, init)
            prev_final, prev_start = final, start

            # linear cross-fade stitch over the overlap (:323-333)
            ramp = np.ones(tw, np.float32)
            if start > 0:
                ov = min(self.overlap, tw)
                ramp[:ov] = np.linspace(1.0 / (ov + 1), 1.0, ov, endpoint=False)
            wgt = jnp.asarray(ramp)[:, None, None, None]
            out_latents = out_latents.at[start : start + tw].add(final[0] * wgt)
            weights = weights.at[start : start + tw].add(wgt)

        out_latents = out_latents / jnp.maximum(weights, 1e-8)
        return self._decode(self.vae_params, out_latents)  # [T, H, W]


def tiny_depthcrafter(seed: int = 0, steps: int = 2, window: int = 6,
                      overlap: int = 2) -> DepthCrafterPipeline:
    """Random-weight tiny pipeline for tests."""
    unet = UNetSpatioTemporal(UNET_ST_TINY)
    vae = AutoencoderKL(VAE_TINY)
    clip = CLIPVisionEncoder(CLIP_TINY)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    up = unet.init(
        k1,
        jnp.zeros((1, 2, 8, 8, 8), jnp.float32),
        jnp.asarray(0.0),
        jnp.zeros((1, 1, UNET_ST_TINY.cross_attention_dim), jnp.float32),
    )["params"]
    vp = vae.init(k2, jnp.zeros((1, 16, 16, 3), jnp.float32))["params"]
    cp = clip.init(k3, jnp.zeros((1, CLIP_TINY.image_size, CLIP_TINY.image_size, 3),
                                 jnp.float32))["params"]
    return DepthCrafterPipeline(
        UNET_ST_TINY, VAE_TINY,
        dataclasses.replace(CLIP_TINY, projection_dim=UNET_ST_TINY.cross_attention_dim),
        up, vp, cp, num_steps=steps, window_size=window, overlap=overlap,
    )
