"""Rectangular inference sizes (VERDICT r4 #4).

The reference's resolution catalog is rectangle-rich (INFERENCE_RESOLUTIONS,
render_depth.py:631-684 — "1024x576 (DC-Max Quality)", "910x518 (Depth
Anything)", 1280x720, ...) and its video pipeline runs feed-forward models
at those shapes. These tests pin: per-dimension snapping, the WxH/named CLI
spec parser, torch parity of the ViT+DPT stack on a non-square grid, and
the vd3d depth route end-to-end at a 16:9 working shape.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from visiondepth3d_tpu.depth import DA_TINY, DepthPredictor
from visiondepth3d_tpu.depth.model import snap_hw
from visiondepth3d_tpu.depth.registry import (
    INFERENCE_RESOLUTIONS,
    load_predictor,
    parse_inference_size,
)


def test_snap_hw():
    assert snap_hw(518, 14) == (518, 518)
    # the reference's named rectangles snap per dimension
    assert snap_hw((576, 1024), 14) == (574, 1022)
    assert snap_hw((518, 910), 14) == (518, 910)  # /14-exact by design
    assert snap_hw((540, 960), 32) == (512, 960)
    assert snap_hw((8, 8), 14) == (14, 14)  # min one patch


def test_parse_inference_size():
    assert parse_inference_size("518") == 518
    assert parse_inference_size("1024x576") == (576, 1024)  # WxH -> (h, w)
    assert parse_inference_size("dc-max-quality") == (576, 1024)
    assert parse_inference_size("depth-anything-wide") == (518, 910)
    assert parse_inference_size("original") is None
    assert parse_inference_size(None) is None
    assert parse_inference_size((288, 512)) == (288, 512)
    with pytest.raises(ValueError):
        parse_inference_size("not-a-size")
    # every named preset maps to a valid (W, H) or None
    for name, wh in INFERENCE_RESOLUTIONS.items():
        got = parse_inference_size(name)
        assert got == (None if wh is None else (wh[1], wh[0]))


def test_dpt_dinov2_rect_parity_vs_torch():
    """Non-square token grid through the full ViT+DPT stack must match
    transformers (which interpolates pos embeddings to the rect grid)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from test_depth_models import _tiny_hf_model

    from visiondepth3d_tpu.depth.convert import convert_depth_anything
    from visiondepth3d_tpu.depth.dpt import DepthAnything

    hf = _tiny_hf_model()
    params = convert_depth_anything(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, DA_TINY)
    rng = np.random.default_rng(5)
    x = rng.random((1, 56, 98, 3), dtype=np.float32)  # 4x7 patch grid
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.moveaxis(x, -1, 1))
                 ).predicted_depth.numpy()
    ours = np.asarray(DepthAnything(DA_TINY).apply(
        {"params": params}, jnp.asarray(x)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=3e-4)


def test_predictor_rect_shapes():
    pred = load_predictor("depth-anything-v2-small", config=DA_TINY,
                          inference_size=(56, 98))
    assert pred._size == (56, 98)
    frames = np.random.default_rng(0).random((2, 36, 64, 3),
                                             dtype=np.float32)
    d = pred.predict_01(frames, out_hw=(36, 64))
    assert d.shape == (2, 36, 64)
    assert float(jnp.min(d)) >= 0.0 and float(jnp.max(d)) <= 1.0


def test_predictor_square_tuple_collapses():
    pred = load_predictor("depth-anything-v2-small", config=DA_TINY,
                          inference_size=(70, 70))
    assert pred._size == (70, 70)


def test_depth_route_rect_e2e(tmp_path):
    """vd3d depth at a 16:9 rectangle: output geometry matches the SOURCE
    (not a square stretch), full frame count."""
    from visiondepth3d_tpu.io import Y4MReader, Y4MWriter
    from visiondepth3d_tpu.pipeline.depth_pipeline import (
        DepthConfig,
        render_depth_video_file,
    )

    src = tmp_path / "in.y4m"
    h, w, t = 36, 64, 5
    with Y4MWriter(src, w, h, 24.0) as wr:
        for i in range(t):
            yy, xx = np.mgrid[0:h, 0:w]
            wr.write(np.repeat(((xx * 3 + i) % 256).astype(np.uint8)
                               [..., None], 3, -1))
    cfg = DepthConfig(model="depth-anything-v2-small",
                      inference_size=(56, 98), batch_size=3)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random-weights warning
        # config override keeps the test tiny
        from visiondepth3d_tpu.depth.registry import load_predictor as lp

        pred = lp("depth-anything-v2-small", config=DA_TINY,
                  inference_size=(56, 98))
        n = render_depth_video_file(src, tmp_path / "d.y4m", cfg,
                                    predictor=pred)
    assert n == t
    with Y4MReader(tmp_path / "d.y4m") as rd:
        frames = list(rd)
    assert len(frames) == t
    assert frames[0].shape == (h, w, 3)


def test_depth_route_original_size(tmp_path):
    """inference_size=None ('Original'): the working size becomes the
    snapped source geometry."""
    cfg_cls = pytest.importorskip(
        "visiondepth3d_tpu.pipeline.depth_pipeline")
    cfg = cfg_cls.DepthConfig(inference_size=None)
    resolved = cfg_cls._resolve_size(cfg, (36, 64))
    assert resolved.inference_size == (36, 64)


@pytest.mark.parametrize("name,cfg_path,size", [
    ("dpt-large", "visiondepth3d_tpu.depth.dpt_classic:DPT_TINY", (48, 96)),
    ("dpt-beit-large-512",
     "visiondepth3d_tpu.depth.dpt_beit:DPT_BEIT_TINY", (48, 96)),
    ("midas-v3-hybrid",
     "visiondepth3d_tpu.depth.dpt_hybrid:DPT_HYBRID_TINY", (64, 96)),
    ("midas-v2", "visiondepth3d_tpu.depth.midas_v2:MIDAS_V2_TINY", (64, 96)),
    ("zoedepth-nyu", None, None),  # zoedepth tiny config not exported
])
def test_family_rect_smoke(name, cfg_path, size):
    """Every feed-forward family that supports rectangles must load and
    run at a non-square inference size (per-family snap paths)."""
    if cfg_path is None:
        pytest.skip("no tiny config exported for this family")
    mod_name, attr = cfg_path.split(":")
    import importlib

    cfg = getattr(importlib.import_module(mod_name), attr)
    pred = load_predictor(name, config=cfg, inference_size=size)
    frames = np.random.default_rng(0).random((1, 40, 72, 3),
                                             dtype=np.float32)
    d = pred.predict_01(frames, out_hw=(40, 72))
    assert d.shape == (1, 40, 72)
    assert np.isfinite(np.asarray(d)).all()


def test_square_only_families_refuse_rect():
    from visiondepth3d_tpu.depth.depth_pro import DepthProConfig

    with pytest.raises(ValueError, match="square"):
        load_predictor("depth-pro", config=DepthProConfig(),
                       inference_size=(512, 768))
