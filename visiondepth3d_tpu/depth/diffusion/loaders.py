"""Checkpoint-directory loaders for the diffusion depth pipelines.

The reference loads Marigold via diffusers ``from_pretrained``
(render_depth.py:771-793) and DepthCrafter from a local weights folder
(depthcrafter_adapter.py:17-66, weights/DepthCrafter). The TPU equivalents
consume the same directory layouts — safetensors + config.json per
component — and convert the weights into Flax params on load:

  marigold/                          depthcrafter/
    unet/config.json                   unet/config.json         (or flat,
    unet/diffusion_pytorch_model.safetensors                     like the
    vae/config.json                    vae/...                   reference
    vae/diffusion_pytorch_model.safetensors                      weights/
    empty_text_embed.npy (optional)    image_encoder/config.json  dir)
                                       image_encoder/model.safetensors

``empty_text_embed.npy`` is the CLIP text embedding of the empty prompt
([1, 77, cross_dim]) Marigold conditions on — precompute once with
transformers' CLIPTextModel; a missing file falls back to zeros with a
warning (depth quality degrades slightly; the UNet treats it as an
unconditional context).
"""

from __future__ import annotations

import dataclasses
import json
import os
import warnings

import numpy as np

from ..convert import load_safetensors_state
from .clip_vision import CLIP_TINY, CLIPVisionConfig
from .convert_diffusers import (
    convert_clip_vision,
    convert_unet2d,
    convert_unet_st,
    convert_vae,
)
from .depthcrafter import DepthCrafterPipeline, tiny_depthcrafter
from .marigold import MarigoldPipeline, tiny_marigold
from .unet2d import UNet2DConfig
from .unet_st import UNetSTConfig
from .vae import VAEConfig


def _load_component(root, name, filenames=("diffusion_pytorch_model"
                                           ".safetensors",
                                           "model.safetensors")):
    """Return (state_dict, config_dict) for ``root/name`` — or, when the
    component dir is absent, the reference's flat layout (safetensors +
    <name>_config.json / config.json at the root, weights/DepthCrafter)."""
    candidates = [
        (os.path.join(root, name, fn), os.path.join(root, name, "config.json"))
        for fn in filenames
    ] + [
        (os.path.join(root, fn), os.path.join(root, f"{name}_config.json"))
        for fn in filenames
    ]
    for state_path, cfg_path in candidates:
        if os.path.exists(state_path):
            cfg = {}
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    cfg = json.load(f)
            return load_safetensors_state(state_path), cfg
    raise FileNotFoundError(
        f"no {name} checkpoint under {root!r} (looked for {filenames} in "
        f"'{name}/' and the directory root)"
    )


def _aliased(cfg: dict) -> dict:
    # diffusers config key -> our dataclass field
    if "norm_num_groups" in cfg and "norm_groups" not in cfg:
        cfg = dict(cfg, norm_groups=cfg["norm_num_groups"])
    return cfg


def _vae_config(cfg: dict) -> VAEConfig:
    cfg = _aliased(cfg)
    out = VAEConfig()
    fields = {f.name for f in dataclasses.fields(VAEConfig)}
    kw = {k: tuple(v) if isinstance(v, list) else v
          for k, v in cfg.items() if k in fields}
    return dataclasses.replace(out, **kw)


def _unet_config(cfg: dict, cls):
    cfg = _aliased(cfg)
    out = cls()
    fields = {f.name for f in dataclasses.fields(cls)}
    kw = {}
    for k, v in cfg.items():
        if k not in fields:
            continue
        kw[k] = tuple(v) if isinstance(v, list) else v
    if "attention_head_dim" in kw and not isinstance(
            kw["attention_head_dim"], tuple):
        kw["attention_head_dim"] = (kw["attention_head_dim"],) * len(
            kw.get("block_out_channels", out.block_out_channels))
    # diffusers encodes attention presence in down_block_types
    types = cfg.get("down_block_types")
    if types:
        kw["with_attn"] = tuple("CrossAttn" in t for t in types)
    return dataclasses.replace(out, **kw)


def _clip_config(cfg: dict) -> CLIPVisionConfig:
    return CLIPVisionConfig(
        hidden_size=cfg.get("hidden_size", 1280),
        num_layers=cfg.get("num_hidden_layers", 32),
        num_heads=cfg.get("num_attention_heads", 16),
        patch_size=cfg.get("patch_size", 14),
        image_size=cfg.get("image_size", 224),
        projection_dim=cfg.get("projection_dim", 1024),
    )


def load_marigold(checkpoint_dir, steps: int = 4,
                  ensemble: int = 1) -> MarigoldPipeline:
    unet_state, unet_cfg_d = _load_component(checkpoint_dir, "unet")
    vae_state, vae_cfg_d = _load_component(checkpoint_dir, "vae")
    unet_cfg = _unet_config(unet_cfg_d, UNet2DConfig)
    vae_cfg = _vae_config(vae_cfg_d)
    embed_path = os.path.join(checkpoint_dir, "empty_text_embed.npy")
    if os.path.exists(embed_path):
        embed = np.load(embed_path).astype(np.float32)
    else:
        warnings.warn(
            "empty_text_embed.npy missing: conditioning on a zero text "
            "context (precompute it with CLIPTextModel for full parity)"
        )
        embed = np.zeros((1, 77, unet_cfg.cross_attention_dim), np.float32)
    return MarigoldPipeline(
        unet_cfg, vae_cfg,
        convert_unet2d(unet_state, unet_cfg),
        convert_vae(vae_state, vae_cfg.layers_per_block,
                    len(vae_cfg.block_out_channels)),
        embed, num_steps=steps, ensemble_size=ensemble,
    )


def load_depthcrafter(checkpoint_dir, steps: int = 2, window: int = 24,
                      overlap: int = 6) -> DepthCrafterPipeline:
    unet_state, unet_cfg_d = _load_component(checkpoint_dir, "unet")
    vae_state, vae_cfg_d = _load_component(checkpoint_dir, "vae")
    clip_state, clip_cfg_d = _load_component(checkpoint_dir, "image_encoder")
    unet_cfg = _unet_config(unet_cfg_d, UNetSTConfig)
    vae_cfg = _vae_config(vae_cfg_d)
    clip_cfg = _clip_config(clip_cfg_d)
    return DepthCrafterPipeline(
        unet_cfg, vae_cfg, clip_cfg,
        convert_unet_st(unet_state, unet_cfg),
        convert_vae(vae_state, vae_cfg.layers_per_block,
                    len(vae_cfg.block_out_channels)),
        convert_clip_vision(clip_state, clip_cfg),
        num_steps=steps, window_size=window, overlap=overlap,
    )


def _cast_pipeline(pipe, dtype: str):
    """Cast a pipeline's float weights to ``dtype`` (the pipelines cast
    activations to the weight dtype internally; the reference runs its
    diffusion paths fp16, render_depth.py:771)."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(dtype)
    if dt == jnp.float32:
        return pipe

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    kw = {"unet_params": cast(pipe.unet_params),
          "vae_params": cast(pipe.vae_params)}
    if hasattr(pipe, "clip_params"):
        kw["clip_params"] = cast(pipe.clip_params)
    return _dc.replace(pipe, **kw)


def load_diffusion_pipeline(name: str, checkpoint=None, steps: int | None = None,
                            window: int = 24, overlap: int = 6,
                            ensemble: int = 1, allow_random: bool = False,
                            dtype: str = "float32"):
    """Dispatcher entry for the diffusion catalog families.

    ``checkpoint`` must be a converted checkpoint directory (see module
    docstring); running without one requires ``allow_random=True`` and
    produces tiny random-weight pipelines — noise, for shape/compile
    testing only (the round-1 failure mode this guards against)."""
    is_dc = "depthcrafter" in name
    if checkpoint is None:
        if not allow_random:
            raise ValueError(
                f"{name}: diffusion depth needs a checkpoint directory "
                "(random weights produce noise, not depth). Pass "
                "allow_random=True for shape/compile testing only."
            )
        if is_dc:
            pipe = tiny_depthcrafter(steps=steps or 2, window=window,
                                     overlap=overlap)
        else:
            pipe = tiny_marigold(steps=steps or 2)
    elif is_dc:
        pipe = load_depthcrafter(checkpoint, steps=steps or 2,
                                 window=window, overlap=overlap)
    else:
        pipe = load_marigold(checkpoint, steps=steps or 4, ensemble=ensemble)
    return _cast_pipeline(pipe, dtype)
