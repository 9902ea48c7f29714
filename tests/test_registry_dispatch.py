"""load_predictor must dispatch EVERY catalog family (the reference's
uniform ensure_model_downloaded loader, render_depth.py:728-829) — the
round-1 gap where half the ported zoo raised NotImplementedError.

Tiny config overrides keep the CPU cost sane; the dispatch branch, the
predictor contract ([B, H, W, 3] float01 -> finite depth), and per-family
preprocessing are what's under test."""

import numpy as np
import pytest

import jax.numpy as jnp

from visiondepth3d_tpu.depth import registry
from visiondepth3d_tpu.depth.configs import DA_TINY
from visiondepth3d_tpu.depth.depth_pro import DEPTH_PRO_TINY
from visiondepth3d_tpu.depth.dpt_beit import DPT_BEIT_TINY
from visiondepth3d_tpu.depth.dpt_classic import DPT_TINY
from visiondepth3d_tpu.depth.dpt_hybrid import DPT_HYBRID_TINY
from visiondepth3d_tpu.depth.midas_v2 import MIDAS_V2_TINY
from visiondepth3d_tpu.depth.vda import VDA_TINY
from visiondepth3d_tpu.depth.zoedepth import ZOE_NK_TINY, ZOE_TINY

TINY_BY_FAMILY = {
    "dpt_dinov2": DA_TINY,
    "dpt_classic": DPT_TINY,
    "dpt_beit": DPT_BEIT_TINY,
    "dpt_hybrid": DPT_HYBRID_TINY,
    "zoedepth": ZOE_TINY,
    "zoedepth_nk": ZOE_NK_TINY,
    "depth_pro": DEPTH_PRO_TINY,
    "vda": VDA_TINY,
    "dpt_vit": MIDAS_V2_TINY,
}

# one representative catalog entry per non-diffusion family
REPRESENTATIVES = [
    "depth-anything-v2-small",
    "dpt-large",
    "dpt-beit-large-512",
    "midas-v3-hybrid",
    "zoedepth-nyu",
    "zoedepth-nyu-kitti",
    "depth-pro",
    "video-depth-anything",
    "midas-v2",
]


def test_every_catalog_family_is_dispatchable():
    families = {e.family for e in registry.CATALOG.values()}
    assert families == set(TINY_BY_FAMILY) | {"diffusion"}
    # no config-less stubs left
    for name, e in registry.CATALOG.items():
        if e.family != "diffusion":
            assert e.config is not None, f"{name} has no config"


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_load_predictor_dispatch(name):
    entry = registry.CATALOG[name]
    cfg = TINY_BY_FAMILY[entry.family]
    pred = registry.load_predictor(name, inference_size=64, config=cfg)
    rng = np.random.default_rng(0)
    if entry.family == "vda":
        frames = rng.random((cfg.window, 70, 70, 3), dtype=np.float32)
        d = np.asarray(pred(frames))
        assert d.shape[0] == cfg.window
    else:
        frames = rng.random((2, 48, 64, 3), dtype=np.float32)
        d = np.asarray(pred(jnp.asarray(frames)))
        assert d.shape[0] == 2 and d.ndim == 3
    if entry.family not in ("zoedepth", "zoedepth_nk"):
        # ZoeDepth's conditional-log-binomial head is NaN-prone under
        # RANDOM weights (log of sign-indefinite intermediates — the HF
        # torch model behaves the same); converted checkpoints are finite
        # (tests/test_zoedepth.py)
        assert np.isfinite(d).all()


def test_diffusion_requires_checkpoint():
    with pytest.raises(ValueError, match="checkpoint"):
        registry.load_predictor("marigold")
    with pytest.raises(ValueError, match="checkpoint"):
        registry.load_predictor("depthcrafter")
    pipe = registry.load_predictor("marigold", allow_random=True, steps=1)
    out = np.asarray(pipe(np.zeros((1, 16, 16, 3), np.float32)))
    assert out.shape == (1, 16, 16)


def test_local_model_discovery(tmp_path):
    import json

    from safetensors.numpy import save_file

    from visiondepth3d_tpu.depth.model import init_random

    d = tmp_path / "MyLocalDA"
    d.mkdir()
    (d / "vd3d.json").write_text(json.dumps({"base": "depth-anything-v2-small"}))
    params = init_random(DA_TINY, size=28)
    flat = {}

    def flatten(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                flatten(v, f"{prefix}{k}/")
            else:
                flat[f"{prefix}{k}"] = np.asarray(v)

    flatten(params)
    save_file(flat, str(d / "model.safetensors"))

    found = registry.discover_local_models(str(tmp_path))
    assert "[Local] MyLocalDA" in found
    entry = found["[Local] MyLocalDA"]
    assert entry.family == "dpt_dinov2"

    # the local entry loads with its own weights (native flat format)
    pred = registry.load_predictor(f"local:{d}", inference_size=28,
                                   config=DA_TINY)
    out = np.asarray(pred(np.zeros((1, 28, 28, 3), np.float32)))
    assert np.isfinite(out).all()

    # and an undecorated folder is skipped
    (tmp_path / "junk").mkdir()
    found2 = registry.discover_local_models(str(tmp_path))
    assert "[Local] junk" not in found2


def test_save_load_local_roundtrip(tmp_path):
    """vd3d convert's persistence: params tree -> [Local] folder
    (model.safetensors + vd3d.json) -> load_predictor('local:...')
    reproduces the exact tree and a working predictor."""
    import numpy as np
    import jax

    from visiondepth3d_tpu.depth import DA_TINY, init_random
    from visiondepth3d_tpu.depth.registry import (
        discover_local_models,
        load_predictor,
        save_local_params,
    )

    params = init_random(DA_TINY, size=28)
    root = tmp_path / "my_model"
    save_local_params(str(root), "depth-anything-v2-small", params)
    assert (root / "model.safetensors").exists()
    assert (root / "vd3d.json").exists()

    pred = load_predictor(f"local:{root}", inference_size=28,
                          config=DA_TINY)
    chex = jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, jax.tree.map(np.asarray, pred.params))
    del chex
    d = pred(np.zeros((1, 28, 28, 3), np.float32))
    assert np.isfinite(np.asarray(d)).all()

    # folder discovery surfaces it as a "[Local] ..." entry
    found = discover_local_models(str(tmp_path))
    assert any("my_model" in k for k in found)
