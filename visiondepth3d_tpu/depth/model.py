"""Depth model wrapper: preprocessing, jitted forward, postprocessing.

Mirrors the uniform callable convention of the reference's pipe dispatcher
(``_run_pipe_or_tile`` / ``pipe(images) -> [{"predicted_depth": ...}]``,
render_depth.py:201-268) with a TPU-shaped API: batches of frames in, batch
of depth maps out, one jitted graph, static inference size snapped to the
ViT patch multiple (snap_for_vda analog, render_depth.py:56-59).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .configs import DPTConfig
from .dpt import DepthAnything

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def snap(value: int, multiple: int) -> int:
    """Largest multiple of ``multiple`` that is <= value (min one)."""
    return max(multiple, (value // multiple) * multiple)


def snap_hw(size, multiple: int) -> tuple[int, int]:
    """Per-dimension snap for square or rectangular inference sizes.

    ``size``: int (square) or an (h, w) pair — the reference's resolution
    catalog is rectangle-rich (INFERENCE_RESOLUTIONS,
    render_depth.py:631-684: 1024x576 "DC-Max Quality", 910x518, ...) and
    its video pipeline runs feed-forward models at those shapes; snapping
    happens per dimension to the backbone's patch multiple.
    """
    if isinstance(size, (tuple, list)):
        h, w = int(size[0]), int(size[1])
    else:
        h = w = int(size)
    return snap(h, multiple), snap(w, multiple)


@dataclasses.dataclass
class DepthPredictor:
    """A loaded depth model: params + jitted forward at a fixed size.

    Works for any Flax module mapping normalized [B, S, S, 3] -> [B, h, w]
    (DepthAnything, DPTClassic, ...); pass ``model`` to override the default
    DepthAnything built from ``cfg``.
    """

    cfg: DPTConfig
    params: dict
    inference_size: int | tuple = 518  # square int or (h, w) rectangle
    dtype: str = "float32"
    model: object = None
    # per-model preprocessing: DA/DPT families use ImageNet stats; ZoeDepth
    # and DepthPro use the HF "standard" 0.5/0.5 stats (their processors'
    # IMAGENET_STANDARD_MEAN/STD defaults).
    mean: tuple = IMAGENET_MEAN
    std: tuple = IMAGENET_STD
    # models returning tuples (ZoeDepthNK -> (depth, domain_logits),
    # DepthPro -> (depth, fov)): index of the depth output
    select: int | None = None
    # override the inference-size snap (families whose valid sizes aren't
    # "multiple of the patch", e.g. DepthPro's power-of-two pyramid)
    snap_multiple: int | None = None
    # run the DPT head's last two convs at feature resolution and upsample
    # the 1-channel depth last (see DPTNeckHead.fast_head). Product default
    # via DepthConfig; False keeps the exact transformers op order.
    fast_head: bool = False

    def __post_init__(self):
        if self.model is None:
            self.model = DepthAnything(self.cfg, fast_head=self.fast_head)
        # Commit params to the default device ONCE. Host numpy params
        # passed to a jitted forward are re-transferred on EVERY call —
        # measured 19.4 s/frame for BEiT-L through the axon tunnel vs
        # 133 ms with device-resident params. On any rig this avoids a
        # per-batch host->HBM copy of the whole checkpoint.
        # bf16 predictors: cast ONCE here, not per forward call — an
        # in-graph tree cast re-streams the full f32 checkpoint through
        # HBM every chunk (1.8 GB/chunk for BEiT-L).
        if self.dtype == "bfloat16":
            self.params = jax.tree.map(
                lambda p: jnp.asarray(p).astype(jnp.bfloat16), self.params
            )
        self.params = jax.device_put(self.params)
        patch = self.snap_multiple
        if patch is None:
            bb = getattr(self.cfg, "backbone", None)
            if bb is None:  # ZoeDepthNKConfig nests its trunk under .base
                bb = getattr(getattr(self.cfg, "base", None), "backbone", None)
            patch = bb.patch_size
        self._size = snap_hw(self.inference_size, patch)  # (h, w)

        @jax.jit
        def forward(params, frames01):  # [B, H, W, 3] in [0, 1]
            if self.dtype == "bfloat16":
                # cast BEFORE the input resize: the source is u8 video, so
                # bf16 loses nothing, and the [B, H, W, 3] -> [B, s, s, 3]
                # resize matmuls halve their HBM traffic and run
                # single-pass on the MXU
                frames01 = frames01.astype(jnp.bfloat16)
                x = resize_bilinear(frames01, self._size,
                                    channel_last=True, precision="default")
            else:
                x = resize_bilinear(frames01, self._size,
                                    channel_last=True)
            mean = jnp.asarray(self.mean, x.dtype)
            std = jnp.asarray(self.std, x.dtype)
            x = (x - mean) / std
            depth = self.model.apply({"params": params}, x)
            if self.select is not None:
                depth = depth[self.select]
            return depth.astype(jnp.float32)  # [B, s, s] raw relative depth

        self._forward = forward

    def __call__(self, frames01: np.ndarray | jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] float RGB in [0, 1] -> [B, s, s] raw depth."""
        return self._forward(self.params, jnp.asarray(frames01))

    def predict_01(self, frames01, out_hw: tuple[int, int] | None = None):
        """Depth normalized per-batch to [0, 1] and resized to out_hw —
        the uniform contract the stereo stage consumes."""
        d = self(frames01)
        lo = jnp.min(d, axis=(1, 2), keepdims=True)
        hi = jnp.max(d, axis=(1, 2), keepdims=True)
        d01 = (d - lo) / jnp.maximum(hi - lo, 1e-6)
        if out_hw is not None:
            d01 = resize_bilinear(d01, out_hw, channel_last=False)
        return d01


def init_random(cfg: DPTConfig, seed: int = 0,
                size: int | tuple | None = None) -> dict:
    """Random-init params (tests / benchmarks without checkpoints)."""
    s = size or cfg.backbone.image_size
    h, w = (s, s) if isinstance(s, int) else s
    return init_random_model(DepthAnything(cfg), (1, h, w, 3), seed)


def init_random_model(model, input_shape: tuple, seed: int = 0) -> dict:
    """Host-side random init for ANY Flax depth model.

    Uses ``jax.eval_shape`` + host RNG instead of ``model.init`` — the init
    program would otherwise compile and run on the accelerator (measured
    ~2 min through the axon relay for ViT-S; the BEiT-L init graph killed
    the relay compiler outright) just to produce throwaway weights.
    """
    return init_random_model_args(
        model, (jax.ShapeDtypeStruct(input_shape, jnp.float32),), seed)


def init_random_model_args(model, args: tuple, seed: int = 0) -> dict:
    """init_random_model for models whose ``__call__`` takes several args
    (diffusion UNets: latents, timestep, context). Tuple entries may be
    shape tuples (-> f32 ShapeDtypeStructs) or ready specs/arrays."""
    specs = [jax.ShapeDtypeStruct(a, jnp.float32) if isinstance(a, tuple)
             else a for a in args]
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            *specs)["params"]
    rng = np.random.default_rng(seed)

    def make(path, leaf):
        name = str(path[-1])
        if "scale" in name or name.endswith("ls1')") or name.endswith("ls2')"):
            return np.ones(leaf.shape, leaf.dtype)
        if "bias" in name:
            return np.zeros(leaf.shape, leaf.dtype)
        fan_in = leaf.shape[0] if leaf.ndim >= 2 else max(leaf.size, 1)
        return rng.normal(0.0, fan_in**-0.5, leaf.shape).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(make, shapes)
