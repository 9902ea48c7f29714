"""Flax depth model vs transformers-torch ground truth (offline: a tiny
DepthAnything is instantiated from config, its random weights converted, and
both frameworks must produce the same depth map)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from visiondepth3d_tpu.depth import DA_TINY, DepthPredictor, init_random
from visiondepth3d_tpu.depth.convert import convert_depth_anything
from visiondepth3d_tpu.depth.dpt import DepthAnything


def _tiny_hf_model():
    from transformers import DepthAnythingConfig, DepthAnythingForDepthEstimation
    from transformers.models.dinov2 import Dinov2Config

    bb = Dinov2Config(
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=2,
        mlp_ratio=4,
        image_size=70,
        patch_size=14,
        layerscale_value=1.0,
        out_indices=[1, 2, 3, 4],
        apply_layernorm=True,
        reshape_hidden_states=False,
    )
    cfg = DepthAnythingConfig(
        backbone_config=bb,
        reassemble_hidden_size=32,
        patch_size=14,
        neck_hidden_sizes=[16, 24, 32, 40],
        fusion_hidden_size=16,
        head_hidden_size=8,
        reassemble_factors=[4, 2, 1, 0.5],
    )
    torch.manual_seed(0)
    model = DepthAnythingForDepthEstimation(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def tiny_pair():
    hf = _tiny_hf_model()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_depth_anything(state, DA_TINY)
    return hf, params


def test_depth_anything_parity_native_size(tiny_pair):
    hf, params = tiny_pair
    rng = np.random.default_rng(0)
    x = rng.random((2, 70, 70, 3), dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.moveaxis(x, -1, 1))).predicted_depth.numpy()
    model = DepthAnything(DA_TINY)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=2e-4)


def test_depth_anything_parity_interp_pos_embed(tiny_pair):
    # different input size exercises bicubic position-embedding re-gridding
    hf, params = tiny_pair
    rng = np.random.default_rng(1)
    x = rng.random((1, 98, 126, 3), dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.moveaxis(x, -1, 1))).predicted_depth.numpy()
    model = DepthAnything(DA_TINY)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-4)


def test_fast_head_matches_exact_head(tiny_pair):
    """fast_head commutes the head's mid-upsample past the last two convs:
    identical param tree, same output shape, and the normalized depth map
    stays close to the exact transformers order. Resize and a 3x3 conv
    commute exactly only for band-limited filters, so this random-weight
    tiny model (full-band filters, 8-ch head) is the worst case — trained
    checkpoints' smooth depth heads agree far tighter. The bound that
    matters downstream: normalized-depth mean error, which multiplies
    directly into the stereo disparity (2% of depth range ~ 0.4 px at the
    default 20 px shift budget)."""
    _, params = tiny_pair
    rng = np.random.default_rng(2)
    # smooth ramp + low-frequency bumps, image-like
    yy, xx = np.mgrid[0:70, 0:70].astype(np.float32) / 70.0
    base = 0.5 + 0.3 * np.sin(2 * np.pi * xx)[..., None] * np.cos(
        2 * np.pi * yy)[..., None]
    x = np.clip(base + 0.05 * rng.random((70, 70, 3), dtype=np.float32),
                0, 1)[None]
    exact = np.asarray(
        DepthAnything(DA_TINY).apply({"params": params}, jnp.asarray(x)))
    fast = np.asarray(
        DepthAnything(DA_TINY, fast_head=True).apply(
            {"params": params}, jnp.asarray(x)))
    assert fast.shape == exact.shape

    def norm01(d):
        return (d - d.min()) / max(d.max() - d.min(), 1e-6)

    a, b = norm01(exact[0]), norm01(fast[0])
    assert np.abs(a - b).mean() < 0.02  # measured 0.013
    assert np.percentile(np.abs(a - b), 99) < 0.1  # tails stay bounded too

    # mechanism check: with a band-limited head filter (the trained-weight
    # regime) the commutation is much tighter
    p2 = jax.tree.map(np.asarray, params)
    k = p2["neck_head"]["head_conv2"]["kernel"]
    p2["neck_head"]["head_conv2"]["kernel"] = (
        np.ones_like(k) / (k.shape[0] * k.shape[1]) * k.sum((0, 1), keepdims=True)
    )
    e2 = np.asarray(DepthAnything(DA_TINY).apply({"params": p2}, jnp.asarray(x)))
    f2 = np.asarray(DepthAnything(DA_TINY, fast_head=True).apply(
        {"params": p2}, jnp.asarray(x)))
    a2, b2 = norm01(e2[0]), norm01(f2[0])
    assert np.abs(a2 - b2).mean() < 0.01  # measured 0.008


def test_predictor_contract():
    pred = DepthPredictor(DA_TINY, init_random(DA_TINY, size=70), inference_size=70)
    frames = np.random.default_rng(0).random((2, 48, 64, 3)).astype(np.float32)
    d01 = np.asarray(pred.predict_01(frames, out_hw=(48, 64)))
    assert d01.shape == (2, 48, 64)
    assert d01.min() >= 0.0 and d01.max() <= 1.0


def test_vda_windowed_inference():
    import jax

    from visiondepth3d_tpu.depth.vda import VDA_TINY, VDAPredictor, VideoDepthAnything

    model = VideoDepthAnything(VDA_TINY)
    rng2 = np.random.default_rng(0)
    sample = jnp.zeros((1, VDA_TINY.window, 70, 70, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), sample)["params"]
    pred = VDAPredictor(VDA_TINY, params)
    frames = rng2.random((9, 70, 70, 3), dtype=np.float32)  # 3 windows
    depth = pred(frames)
    assert depth.shape == (9, 70, 70)
    assert np.isfinite(depth).all()


def test_vda_short_clip_pads():
    import jax

    from visiondepth3d_tpu.depth.vda import VDA_TINY, VDAPredictor, VideoDepthAnything

    model = VideoDepthAnything(VDA_TINY)
    sample = jnp.zeros((1, VDA_TINY.window, 70, 70, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), sample)["params"]
    pred = VDAPredictor(VDA_TINY, params)
    frames = np.random.default_rng(1).random((2, 70, 70, 3)).astype(np.float32)
    depth = pred(frames)
    assert depth.shape == (2, 70, 70)


def test_depth_pro_shapes():
    """DepthPro tiny: multi-scale patching, fusion, head, FOV — shape and
    finiteness checks (HF's tiny DepthPro isn't instantiable without remote
    code for some versions; numerical parity is tracked once a checkpoint
    is mountable)."""
    import jax

    from visiondepth3d_tpu.depth.depth_pro import DEPTH_PRO_TINY, DepthPro

    model = DepthPro(DEPTH_PRO_TINY)
    rng2 = np.random.default_rng(0)
    x = jnp.asarray(rng2.random((2, 64, 64, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    depth, fov = model.apply({"params": params}, x)
    assert depth.shape[0] == 2 and depth.ndim == 3
    assert fov.shape == (2,)
    assert np.isfinite(np.asarray(depth)).all()
    assert np.isfinite(np.asarray(fov)).all()


def test_depth_pro_parity_vs_hf():
    import pytest as _pytest

    torch = _pytest.importorskip("torch")
    from transformers import DepthProConfig as HFCfg
    from transformers import DepthProForDepthEstimation
    from transformers.models.dinov2 import Dinov2Config

    from visiondepth3d_tpu.depth.depth_pro import (
        DEPTH_PRO_TINY,
        DepthPro,
        convert_depth_pro,
    )

    tiny = dict(hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
                image_size=32, patch_size=16, layerscale_value=1.0)
    cfg = HFCfg(
        patch_model_config=Dinov2Config(**tiny),
        image_model_config=Dinov2Config(**tiny),
        fov_model_config=Dinov2Config(**tiny),
        patch_size=32,
        scaled_images_ratios=[0.5, 1.0],
        scaled_images_overlap_ratios=[0.0, 0.25],
        scaled_images_feature_dims=[16, 16],
        intermediate_hook_ids=[1],
        intermediate_feature_dims=[16],
        fusion_hidden_size=16,
        merge_padding_value=1,
        num_fov_head_layers=1,
        use_fov_model=True,
    )
    torch.manual_seed(0)
    hf = DepthProForDepthEstimation(cfg).eval()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_depth_pro(state, DEPTH_PRO_TINY)
    model = DepthPro(DEPTH_PRO_TINY)
    rng2 = np.random.default_rng(0)
    x = rng2.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(np.moveaxis(x, -1, 1)))
    ref_depth = out.predicted_depth.numpy()
    ref_fov = out.field_of_view.numpy()
    depth, fov = model.apply({"params": params}, jnp.asarray(x))
    assert depth.shape == ref_depth.shape
    scale = max(np.abs(ref_depth).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(depth) / scale, ref_depth / scale,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(fov), ref_fov, atol=1e-3)
