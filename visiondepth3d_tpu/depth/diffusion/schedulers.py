"""Diffusion schedulers as pure functions: DDIM (Marigold) and
Euler-discrete (DepthCrafter / SVD).

The reference gets these from diffusers (MarigoldDepthPipeline's DDIM,
EulerDiscreteScheduler in depthcrafter_adapter.py:27-31). Native versions
here are small closed-form state machines that live inside jit — timesteps
and sigmas are static numpy computed at trace time, so a full denoise loop
is one compiled graph per window.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


def betas_scaled_linear(n: int = 1000, beta_start: float = 0.00085,
                        beta_end: float = 0.012) -> np.ndarray:
    """SD-family 'scaled_linear' beta schedule."""
    return np.linspace(beta_start**0.5, beta_end**0.5, n, dtype=np.float64) ** 2


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Deterministic DDIM (eta=0) over a trailing-spaced subset of steps."""

    num_train_timesteps: int = 1000
    num_inference_steps: int = 4
    prediction_type: str = "v_prediction"  # Marigold v1-0 uses v-prediction

    def __post_init__(self):
        betas = betas_scaled_linear(self.num_train_timesteps)
        alphas_cumprod = np.cumprod(1.0 - betas)
        object.__setattr__(self, "alphas_cumprod", alphas_cumprod)
        # trailing spacing (diffusers timestep_spacing='trailing' for few-step)
        step = self.num_train_timesteps / self.num_inference_steps
        ts = np.round(np.arange(self.num_train_timesteps, 0, -step)).astype(int) - 1
        object.__setattr__(self, "timesteps", ts)

    def alpha_bar(self, t: int) -> float:
        return float(self.alphas_cumprod[t]) if t >= 0 else 1.0

    def step(self, model_out: jnp.ndarray, t_index: int, sample: jnp.ndarray):
        """One DDIM update. t_index indexes self.timesteps (static python int)."""
        t = int(self.timesteps[t_index])
        prev_t = (
            int(self.timesteps[t_index + 1])
            if t_index + 1 < len(self.timesteps)
            else -1
        )
        a_t = self.alpha_bar(t)
        a_prev = self.alpha_bar(prev_t)
        sqrt_at, sqrt_1mat = a_t**0.5, (1 - a_t) ** 0.5
        if self.prediction_type == "epsilon":
            x0 = (sample - sqrt_1mat * model_out) / sqrt_at
            eps = model_out
        else:  # v_prediction
            x0 = sqrt_at * sample - sqrt_1mat * model_out
            eps = sqrt_at * model_out + sqrt_1mat * sample
        return (a_prev**0.5) * x0 + ((1 - a_prev) ** 0.5) * eps

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: int):
        a = self.alpha_bar(int(t))
        return (a**0.5) * x0 + ((1 - a) ** 0.5) * noise


@dataclasses.dataclass(frozen=True)
class EulerSchedule:
    """Euler-discrete with Karras-style sigma interpolation (SVD family)."""

    num_train_timesteps: int = 1000
    num_inference_steps: int = 2
    sigma_min_max: tuple = (0.002, 700.0)  # SVD uses huge sigma_max
    rho: float = 7.0

    def __post_init__(self):
        n = self.num_inference_steps
        smin, smax = self.sigma_min_max
        ramp = np.linspace(0, 1, n, dtype=np.float64)
        inv_rho = 1.0 / self.rho
        sigmas = (smax**inv_rho + ramp * (smin**inv_rho - smax**inv_rho)) ** self.rho
        object.__setattr__(self, "sigmas", np.append(sigmas, 0.0))

    def scale_input(self, sample: jnp.ndarray, i: int) -> jnp.ndarray:
        s = float(self.sigmas[i])
        return sample / ((s**2 + 1) ** 0.5)

    def init_noise_sigma(self) -> float:
        return float((self.sigmas[0] ** 2 + 1) ** 0.5)

    def step(self, model_out: jnp.ndarray, i: int, sample: jnp.ndarray):
        """Euler step with v-prediction-style denoised estimate (SVD uses
        c_skip/c_out preconditioning; here model_out IS the denoised x0
        prediction — the UNet wrapper applies the preconditioning)."""
        s, s_next = float(self.sigmas[i]), float(self.sigmas[i + 1])
        derivative = (sample - model_out) / s
        return sample + derivative * (s_next - s)


def svd_precondition(sigma: float) -> tuple[float, float, float]:
    """EDM preconditioning constants (c_skip, c_out, c_in) for SVD-style
    models: the raw UNet output F is combined as x0 = c_skip*x + c_out*F,
    with the network fed c_in*x."""
    c_skip = 1.0 / (sigma**2 + 1.0)
    c_out = -sigma / (sigma**2 + 1.0) ** 0.5
    c_in = 1.0 / (sigma**2 + 1.0) ** 0.5
    return c_skip, c_out, c_in
