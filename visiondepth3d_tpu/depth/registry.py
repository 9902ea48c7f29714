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
    # vitl14 is the pre-hf upload of the same ViT-L architecture
    ("Depth Anything V1 Large", "vitl14"),
))
_add(ModelEntry(
    "distill-any-depth-small", "dpt_dinov2", configs.DA_V2_SMALL,
    "xingyang1/Distill-Any-Depth-Small-hf",
    # keetrap/* are re-uploads of the same checkpoints (render_depth.py:694-695)
    ("Distil-Any-Depth-Small", "keetrap-Distil-Any-Depth-Small"),
))
_add(ModelEntry(
    "distill-any-depth-large", "dpt_dinov2", configs.DA_V2_LARGE,
    "xingyang1/Distill-Any-Depth-Large-hf",
    ("Distil-Any-Depth-Large", "keetrap-Distil-Any-Depth-Large"),
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
    ("Marigold Depth (Diffusers)", "marigold-depth-v1-0",
     "marigold-depth-v1-1"),
))
_add(ModelEntry(
    "depthcrafter", "diffusion", None, "tencent/DepthCrafter",
    ("DepthCrafter (Video Diffusion)",),
))
# classic DPT family (Flax port planned; listed for catalog completeness)
from .dpt_classic import DPT_LARGE

_add(ModelEntry("dpt-large", "dpt_classic", DPT_LARGE, "Intel/dpt-large",
                # Manojb/dpt-large is a mirror of Intel/dpt-large
                ("DPT-Large", "Manojb - DPT-Large")))
from .dpt_beit import DPT_BEIT_LARGE_512

_add(ModelEntry("dpt-beit-large-512", "dpt_beit", DPT_BEIT_LARGE_512,
                "Intel/dpt-beit-large-512", ("dpt-beit-large-512",)))
from .zoedepth import ZoeDepthConfig as _ZoeCfg

_add(ModelEntry("zoedepth-nyu", "zoedepth", _ZoeCfg(),
                "Intel/zoedepth-nyu", ("ZoeDepth",)))
from .depth_pro import DepthProConfig as _DPConfig
from .vda import VDAConfig as _VDAConfig

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
from .midas_v2 import MIDAS_V2_SMALL as _MIDAS_V2_SMALL

_add(ModelEntry("midas-v2", "dpt_vit", _MIDAS_V2_SMALL, "qualcomm/Midas-V2",
                ("Midas-V2",)))


STANDARD_MEAN = (0.5, 0.5, 0.5)  # HF IMAGENET_STANDARD (ZoeDepth, DepthPro)
STANDARD_STD = (0.5, 0.5, 0.5)


def load_predictor(name: str, checkpoint=None,
                   inference_size: int | tuple = 518,
                   seed: int = 0, dtype: str = "float32", config=None,
                   **family_kw):
    """Instantiate a predictor for a catalog entry — the uniform dispatcher
    (ensure_model_downloaded analog, render_depth.py:728-829): every
    non-diffusion family returns a DepthPredictor-contract object
    ([B, H, W, 3] float01 -> [B, s, s] raw depth; VDA is windowed video),
    diffusion entries return the pipeline objects.

    checkpoint: path to a .safetensors file (converted on load), a ready
    params pytree, or for diffusion a checkpoint directory; None
    random-initializes (shape/compile testing only).
    config: override the catalog config (tiny configs in tests).
    """
    from .convert import convert_depth_anything, load_safetensors_state
    from .model import DepthPredictor, init_random

    # fast_head is a feed-forward-family knob; pop it so loaders without
    # **kwargs (diffusion, ADVICE r2) never see it — e.g. a 'local:' dir
    # whose base is a diffusion family arriving via render_depth_video_file
    fast_head = bool(family_kw.pop("fast_head", False))
    rect = isinstance(inference_size, (tuple, list))
    if rect and tuple(inference_size)[0] == tuple(inference_size)[1]:
        inference_size, rect = int(inference_size[0]), False
    if name.startswith("onnx:"):
        # arbitrary ONNX graph through the jax interpreter
        # (render_depth.py:832-954 run_onnx analog)
        from .onnx_exec import OnnxDepthPredictor

        if rect or inference_size is None:
            raise ValueError("onnx: graphs run at square sizes; pass an int")
        return OnnxDepthPredictor(name[len("onnx:"):], inference_size)
    if name.startswith("local:"):
        import os

        root = name[len("local:"):]
        onnx_path = (root if root.endswith(".onnx")
                     else os.path.join(root, "model.onnx"))
        if not os.path.exists(os.path.join(root, "vd3d.json")) and \
                os.path.exists(onnx_path):
            # [Local] folder holding a raw model.onnx: run it directly
            # (reference [Local] discovery, render_depth.py:716-724)
            from .onnx_exec import OnnxDepthPredictor

            if rect or inference_size is None:
                raise ValueError(
                    "local: ONNX graphs run at square sizes; pass an int")
            return OnnxDepthPredictor(onnx_path, inference_size)
        entry = resolve_local_model(root)
        if checkpoint is None:
            checkpoint = load_local_params(root)
    else:
        entry = CATALOG[name]
    cfg = config if config is not None else entry.config
    if entry.family == "dpt_dinov2":
        if checkpoint is None:
            from .model import snap_hw

            params = init_random(
                cfg, seed,
                size=snap_hw(inference_size, cfg.backbone.patch_size)
            )
        elif isinstance(checkpoint, dict):
            params = checkpoint
        else:
            params = convert_depth_anything(
                load_safetensors_state(checkpoint), cfg
            )
        return DepthPredictor(cfg, params, inference_size, dtype=dtype,
                              fast_head=fast_head)
    if entry.family == "dpt_beit":
        import jax
        import jax.numpy as jnp

        from .dpt_beit import DPTBEiT, convert_dpt_beit

        model = DPTBEiT(cfg, fast_head=fast_head)
        if checkpoint is None:
            from .model import snap_hw

            sh, sw = snap_hw(inference_size, cfg.backbone.patch_size)
            params = model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, sh, sw, 3), jnp.float32)
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

        model = DPTHybrid(cfg, fast_head=fast_head)
        if checkpoint is None:
            from .model import snap_hw

            sh, sw = snap_hw(inference_size, cfg.backbone.patch_size)
            params = model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, sh, sw, 3), jnp.float32)
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

        model = DPTClassic(cfg, fast_head=fast_head)
        if checkpoint is None:
            from .model import snap_hw

            sh, sw = snap_hw(inference_size, cfg.backbone.patch_size)
            params = model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, sh, sw, 3), jnp.float32)
            )["params"]
        elif isinstance(checkpoint, dict):
            params = checkpoint
        else:
            params = convert_dpt_classic(load_safetensors_state(checkpoint), cfg)
        return DepthPredictor(cfg, params, inference_size, dtype=dtype, model=model)
    if entry.family in ("zoedepth", "zoedepth_nk"):
        import jax
        import jax.numpy as jnp

        from .zoedepth import (
            ZoeDepth,
            ZoeDepthNK,
            convert_zoedepth,
            convert_zoedepth_nk,
        )

        nk = entry.family == "zoedepth_nk"
        model = ZoeDepthNK(cfg) if nk else ZoeDepth(cfg)
        patch = (cfg.base if nk else cfg).backbone.patch_size
        if checkpoint is None:
            from .model import snap_hw

            sh, sw = snap_hw(inference_size, patch)
            params = model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, sh, sw, 3), jnp.float32)
            )["params"]
        elif isinstance(checkpoint, dict):
            params = checkpoint
        else:
            convert = convert_zoedepth_nk if nk else convert_zoedepth
            params = convert(load_safetensors_state(checkpoint), cfg)
        return DepthPredictor(
            cfg, params, inference_size, dtype=dtype, model=model,
            mean=STANDARD_MEAN, std=STANDARD_STD,
            select=0 if nk else None,
        )
    if entry.family == "depth_pro":
        import math

        import jax
        import jax.numpy as jnp

        from .depth_pro import DepthPro, convert_depth_pro

        model = DepthPro(cfg)
        if rect:
            raise ValueError(
                "depth-pro's multi-scale pyramid is square-only "
                "(image_size * 2^k); pass a square inference size")
        # valid input sizes are image_size * 2^k (the multi-scale pyramid
        # halves down to the patch encoder's native window)
        base = cfg.image_model.image_size
        k = max(0, round(math.log2(max(inference_size, base) / base)))
        s = base * 2**k
        if checkpoint is None:
            params = model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, s, s, 3), jnp.float32)
            )["params"]
        elif isinstance(checkpoint, dict):
            params = checkpoint
        else:
            params = convert_depth_pro(load_safetensors_state(checkpoint), cfg)
        return DepthPredictor(
            cfg, params, s, dtype=dtype, model=model,
            mean=STANDARD_MEAN, std=STANDARD_STD, select=0, snap_multiple=s,
        )
    if entry.family == "vda":
        import jax
        import jax.numpy as jnp

        from .vda import VDAPredictor, VideoDepthAnything, convert_vda

        model = VideoDepthAnything(cfg)
        if rect:
            raise ValueError(
                "video-depth-anything runs its windowed pipeline at a "
                "square size; pass an int")
        if checkpoint is None:
            patch = cfg.base.backbone.patch_size
            s = max(patch, inference_size - inference_size % patch)
            params = model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, cfg.window, s, s, 3), jnp.float32),
            )["params"]
        elif isinstance(checkpoint, dict):
            params = checkpoint
        else:
            params = convert_vda(checkpoint, cfg)
        return VDAPredictor(cfg, params)
    if entry.family == "dpt_vit":  # midas-v2 (MidasNet-small)
        import jax
        import jax.numpy as jnp

        from .midas_v2 import MidasNetSmall, convert_midas_small

        model = MidasNetSmall(cfg)
        if checkpoint is None:
            from .model import snap_hw

            sh, sw = snap_hw(inference_size, 32)
            params = model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, sh, sw, 3), jnp.float32)
            )["params"]
        elif isinstance(checkpoint, dict):
            params = checkpoint
        else:
            params = convert_midas_small(checkpoint, cfg)
        return DepthPredictor(cfg, params, inference_size, dtype=dtype,
                              model=model, snap_multiple=32)
    if entry.family == "diffusion":
        from .diffusion import load_diffusion_pipeline

        return load_diffusion_pipeline(name, checkpoint, dtype=dtype,
                                       **family_kw)
    raise NotImplementedError(
        f"{name}: family {entry.family} loads via its own module"
    )


def resolve_local_model(path: str) -> ModelEntry:
    """[Local] folder discovery analog (render_depth.py:686-726): a local
    directory is loadable when it carries a converted .safetensors plus a
    vd3d.json naming the catalog family whose architecture it holds."""
    import json
    import os

    meta_path = os.path.join(path, "vd3d.json")
    if not os.path.isdir(path) or not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"local model dir {path!r} needs a vd3d.json "
            "({'family': ..., 'base': <catalog name>}) with converted "
            ".safetensors, or a raw model.onnx (runs through the jax "
            "ONNX interpreter)"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    base = CATALOG[meta["base"]]
    return dataclasses.replace(base, name=f"local:{path}")


def load_local_params(root: str):
    """Load a local folder's weights. ``format`` in vd3d.json:
    "native" (default): flat "a/b/c"-keyed safetensors of our params tree;
    "hf": upstream-named safetensors, returned as a path for the family
    converter."""
    import json
    import os

    with open(os.path.join(root, "vd3d.json")) as f:
        meta = json.load(f)
    path = None
    for fn in ("model.safetensors", "diffusion_pytorch_model.safetensors"):
        p = os.path.join(root, fn)
        if os.path.exists(p):
            path = p
            break
    if path is None:
        raise FileNotFoundError(f"{root}: no .safetensors weights found")
    if meta.get("format", "native") != "native":
        return path  # family converter handles upstream naming
    from .convert import load_safetensors_state

    flat = load_safetensors_state(path)
    tree: dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    return tree


def discover_local_models(root: str) -> dict[str, ModelEntry]:
    """Scan a weights dir for loadable local model folders (the reference's
    auto-added "[Local] {folder}" entries)."""
    import os

    found = {}
    if not os.path.isdir(root):
        return found
    for folder in sorted(os.listdir(root)):
        p = os.path.join(root, folder)
        try:
            found[f"[Local] {folder}"] = resolve_local_model(p)
        except (FileNotFoundError, KeyError):
            continue
    return found


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


# Named rectangular presets mirroring the reference's resolution dropdown
# (INFERENCE_RESOLUTIONS, render_depth.py:631-684), width-first like its
# labels. Families snap each dimension to their patch multiple on load.
INFERENCE_RESOLUTIONS: dict[str, tuple[int, int] | None] = {
    "original": None,  # run at the (snapped) source resolution
    "dc-fastest": (512, 256),
    "dc-balanced": (704, 384),
    "dc-good-quality": (960, 540),
    "dc-max-quality": (1024, 576),
    "depth-anything-wide": (910, 518),
    "720p": (1280, 720),
    "1080p": (1920, 1080),
}


def parse_inference_size(spec) -> int | tuple[int, int] | None:
    """CLI size spec -> square int, (h, w) pair, or None ("original").

    Accepts a bare int ("518"), "WxH" width-first (the reference catalog's
    label convention: "1024x576" is 16:9 landscape), or a named preset
    from INFERENCE_RESOLUTIONS.
    """
    if spec is None or isinstance(spec, int):
        return spec
    if isinstance(spec, (tuple, list)):
        return tuple(int(v) for v in spec)
    s = str(spec).strip().lower()
    if s in INFERENCE_RESOLUTIONS:
        wh = INFERENCE_RESOLUTIONS[s]
        return None if wh is None else (wh[1], wh[0])
    if "x" in s:
        w, h = s.split("x", 1)
        return (int(h), int(w))
    try:
        return int(s)
    except ValueError:
        raise ValueError(
            f"--inference-size {spec!r}: expected an int, WxH, or one of "
            f"{sorted(INFERENCE_RESOLUTIONS)}") from None


def save_local_params(root: str, base_name: str, params) -> str:
    """Write a converted params tree as a ``[Local]``-discoverable folder:
    flat "a/b/c"-keyed ``model.safetensors`` + ``vd3d.json`` naming the
    catalog entry whose architecture it holds. Inverse of
    ``load_local_params`` (format "native"); the ``vd3d convert`` CLI
    uses this so upstream checkpoints convert ONCE instead of on every
    load."""
    import json
    import os

    import numpy as np
    from safetensors.numpy import save_file

    if base_name not in CATALOG:
        raise KeyError(f"{base_name!r}: not a catalog entry")
    os.makedirs(root, exist_ok=True)
    flat: dict = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params, "")
    save_file(flat, os.path.join(root, "model.safetensors"))
    with open(os.path.join(root, "vd3d.json"), "w") as f:
        json.dump({"base": base_name, "format": "native"}, f, indent=2)
    return root
