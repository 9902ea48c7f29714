"""Depth model catalog.

The reference ships a 25+ entry dropdown (load_supported_models,
render_depth.py:686-726) spanning HF transformer models, ONNX exports and
diffusion pipelines. Architecturally they reduce to these families; each
catalog entry names its family, our config, the upstream checkpoint id (for
weight conversion on hosts with the checkpoint available) and the reference
dropdown names it covers.

Families:
- ``dpt_dinov2``  ViT/DINOv2 + DPT head (Flax, depth/dpt.py): Depth Anything
  V1/V2 S/B/L, Distill-Any-Depth, DepthPro-style relative variants.
- ``dpt_vit``     classic DPT/MiDaS ViT+hybrid heads (planned port).
- ``diffusion``   Marigold (SD UNet) and DepthCrafter (SVD ST-UNet)
  (depth/diffusion/).
- ``onnx``        reference-only ONNX graphs (VDA, RIFE, Distill-ONNX) —
  covered by Flax ports of the same architectures.
"""

from __future__ import annotations

import dataclasses

from . import configs


@dataclasses.dataclass(frozen=True)
class ModelEntry:
    name: str
    family: str
    config: object | None
    hf_id: str | None
    reference_names: tuple = ()


CATALOG: dict[str, ModelEntry] = {}


def _add(entry: ModelEntry):
    CATALOG[entry.name] = entry


_add(ModelEntry(
    "depth-anything-v2-small", "dpt_dinov2", configs.DA_V2_SMALL,
    "depth-anything/Depth-Anything-V2-Small-hf",
    ("Depth Anything V2 Small",),
))
_add(ModelEntry(
    "depth-anything-v2-base", "dpt_dinov2", configs.DA_V2_BASE,
    "depth-anything/Depth-Anything-V2-Base-hf",
    ("Depth Anything V2 Base",),
))
_add(ModelEntry(
    "depth-anything-v2-large", "dpt_dinov2", configs.DA_V2_LARGE,
    "depth-anything/Depth-Anything-V2-Large-hf",
    ("Depth Anything V2 Large",),
))
_add(ModelEntry(
    "depth-anything-v1-small", "dpt_dinov2", configs.DA_V2_SMALL,
    "LiheYoung/depth-anything-small-hf",
    ("Depth Anything V1 Small",),
))
_add(ModelEntry(
    "depth-anything-v1-base", "dpt_dinov2", configs.DA_V2_BASE,
    "LiheYoung/depth-anything-base-hf",
    ("Depth Anything V1 Base",),
))
_add(ModelEntry(
    "depth-anything-v1-large", "dpt_dinov2", configs.DA_V2_LARGE,
    "LiheYoung/depth-anything-large-hf",
    ("Depth Anything V1 Large",),
))
_add(ModelEntry(
    "distill-any-depth-small", "dpt_dinov2", configs.DA_V2_SMALL,
    "xingyang1/Distill-Any-Depth-Small-hf",
    ("Distill Any Depth Small",),
))
_add(ModelEntry(
    "distill-any-depth-large", "dpt_dinov2", configs.DA_V2_LARGE,
    "xingyang1/Distill-Any-Depth-Large-hf",
    ("Distill Any Depth Large",),
))
_add(ModelEntry(
    "depth-anything-v2-metric-indoor", "dpt_dinov2",
    configs.DA_V2_METRIC_INDOOR,
    "depth-anything/Depth-Anything-V2-Metric-Indoor-Large-hf",
    ("V2-Metric-Indoor-Large",),
))
_add(ModelEntry(
    "depth-anything-v2-metric-outdoor", "dpt_dinov2",
    configs.DA_V2_METRIC_OUTDOOR,
    "depth-anything/Depth-Anything-V2-Metric-Outdoor-Large-hf",
    ("V2-Metric-Outdoor-Large",),
))
_add(ModelEntry(
    "marigold", "diffusion", None, "prs-eth/marigold-depth-v1-0",
    ("Marigold Depth (Diffusion)", "marigold-depth-v1-0"),
))
_add(ModelEntry(
    "depthcrafter", "diffusion", None, "tencent/DepthCrafter",
    ("DepthCrafter (Video Diffusion)",),
))
# classic DPT family (Flax port planned; listed for catalog completeness)
from .dpt_classic import DPT_LARGE

_add(ModelEntry("dpt-large", "dpt_classic", DPT_LARGE, "Intel/dpt-large",
                ("DPT-Large", "MiDaS 3.0")))
from .dpt_beit import DPT_BEIT_LARGE_512

_add(ModelEntry("dpt-beit-large-512", "dpt_beit", DPT_BEIT_LARGE_512,
                "Intel/dpt-beit-large-512", ("dpt-beit-large-512",)))
from .zoedepth import ZoeDepthConfig as _ZoeCfg

_add(ModelEntry("zoedepth-nyu", "zoedepth", _ZoeCfg(),
                "Intel/zoedepth-nyu", ("ZoeDepth",)))
from .depth_pro import DepthProConfig as _DPConfig
from .vda import VDA_TINY as _VDA_TINY, VDAConfig as _VDAConfig

_add(ModelEntry("depth-pro", "depth_pro", _DPConfig(), "apple/DepthPro-hf",
                ("DepthPro",)))
_add(ModelEntry("video-depth-anything", "vda", _VDAConfig(),
                "depth-anything/Video-Depth-Anything-Small",
                ("Video Depth Anything (ONNX)",)))
# remaining family ports tracked in COVERAGE.md "known gaps"
from .zoedepth import ZoeDepthNKConfig as _ZoeNKCfg

_add(ModelEntry("zoedepth-nyu-kitti", "zoedepth_nk", _ZoeNKCfg(),
                "Intel/zoedepth-nyu-kitti", ("ZoeDepth",)))
from .dpt_hybrid import DPT_HYBRID as _DPT_HYBRID

_add(ModelEntry("midas-v3-hybrid", "dpt_hybrid", _DPT_HYBRID,
                "Intel/dpt-hybrid-midas", ("DPT-Hybrid (MiDaS 3.0)",)))
# remaining port (qualcomm ONNX distribution) tracked in COVERAGE.md
_add(ModelEntry("midas-v2", "dpt_vit", None, "qualcomm/Midas-V2",
                ("midas-v2",)))


def load_predictor(name: str, checkpoint=None, inference_size: int = 518,
                   seed: int = 0, dtype: str = "float32"):
    """Instantiate a DepthPredictor for a catalog entry.

    checkpoint: path to a .safetensors file (converted on load) or a ready
    params pytree; None random-initializes (shape/compile testing).
    """
    from .convert import convert_depth_anything, load_safetensors_state
    from .model import DepthPredictor, init_random

    entry = CATALOG[name]
    cfg = entry.config
    if entry.family == "dpt_dinov2":
        if checkpoint is None:
            params = init_random(cfg, seed, size=inference_size)
        elif isinstance(checkpoint, dict):
            params = checkpoint
        else:
            params = convert_depth_anything(
                load_safetensors_state(checkpoint), cfg
            )
        return DepthPredictor(cfg, params, inference_size, dtype=dtype)
    if entry.family == "dpt_beit":
        import jax
        import jax.numpy as jnp

        from .dpt_beit import DPTBEiT, convert_dpt_beit

        model = DPTBEiT(cfg)
        if checkpoint is None:
            s2 = inference_size - inference_size % cfg.backbone.patch_size
            params = model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, s2, s2, 3), jnp.float32)
            )["params"]
        elif isinstance(checkpoint, dict):
            params = checkpoint
        else:
            params = convert_dpt_beit(load_safetensors_state(checkpoint), cfg)
        return DepthPredictor(cfg, params, inference_size, dtype=dtype, model=model)
    if entry.family == "dpt_hybrid":
        import jax
        import jax.numpy as jnp

        from .dpt_hybrid import DPTHybrid, convert_dpt_hybrid

        model = DPTHybrid(cfg)
        if checkpoint is None:
            s = inference_size - inference_size % cfg.backbone.patch_size
            params = model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, s, s, 3), jnp.float32)
            )["params"]
        elif isinstance(checkpoint, dict):
            params = checkpoint
        else:
            params = convert_dpt_hybrid(load_safetensors_state(checkpoint), cfg)
        return DepthPredictor(cfg, params, inference_size, dtype=dtype, model=model)
    if entry.family == "dpt_classic":
        import jax
        import jax.numpy as jnp

        from .convert_dpt import convert_dpt_classic
        from .dpt_classic import DPTClassic

        model = DPTClassic(cfg)
        if checkpoint is None:
            s = inference_size - inference_size % cfg.backbone.patch_size
            params = model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, s, s, 3), jnp.float32)
            )["params"]
        elif isinstance(checkpoint, dict):
            params = checkpoint
        else:
            params = convert_dpt_classic(load_safetensors_state(checkpoint), cfg)
        return DepthPredictor(cfg, params, inference_size, dtype=dtype, model=model)
    raise NotImplementedError(
        f"{name}: family {entry.family} loads via its own module"
    )


# Recommended inference sizes per family (INFERENCE_RESOLUTIONS,
# render_depth.py:631-684): the reference keys these per dropdown model;
# they reduce to the backbone's patch multiple and the checkpoint's
# training size. First entry = the reference's default.
_FAMILY_RESOLUTIONS = {
    "dpt_dinov2": (518, 392, 266, 700, 924),   # /14 patch
    "dpt_classic": (384, 256, 512),            # /16 patch
    "dpt_beit": (512, 384, 256),
    "dpt_hybrid": (384, 256, 512),
    "zoedepth": (384, 512),
    "zoedepth_nk": (384, 512),
    "depth_pro": (1536, 768),
    "diffusion": (576, 480, 768),
    "vda": (518, 392),
    "dpt_vit": (384, 256),
}


def inference_resolutions(name: str) -> tuple:
    """Recommended square inference sizes for a catalog entry."""
    return _FAMILY_RESOLUTIONS.get(CATALOG[name].family, (384,))
