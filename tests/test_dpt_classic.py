"""Classic DPT (MiDaS family) vs transformers-torch ground truth, offline."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from visiondepth3d_tpu.depth.convert_dpt import convert_dpt_classic
from visiondepth3d_tpu.depth.dpt_classic import DPT_TINY, DPTClassic


def _tiny_hf_dpt():
    from transformers import DPTConfig, DPTForDepthEstimation

    cfg = DPTConfig(
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=2,
        intermediate_size=128,
        image_size=64,
        patch_size=16,
        backbone_out_indices=[0, 1, 2, 3],
        neck_hidden_sizes=[16, 24, 32, 40],
        fusion_hidden_size=16,
        reassemble_factors=[4, 2, 1, 0.5],
        readout_type="project",
        is_hybrid=False,
        add_projection=False,
    )
    torch.manual_seed(0)
    model = DPTForDepthEstimation(cfg)
    model.eval()
    return model, cfg


def test_dpt_classic_parity():
    hf, hf_cfg = _tiny_hf_dpt()
    # HF backbone_out_indices are 0-based encoder layer outputs AFTER the
    # block, i.e. index k = block k+1 in our 1-based convention
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_dpt_classic(state, DPT_TINY)
    model = DPTClassic(DPT_TINY)

    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.moveaxis(x, -1, 1))).predicted_depth.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=3e-4)


def test_dpt_classic_pos_interp():
    hf, _ = _tiny_hf_dpt()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_dpt_classic(state, DPT_TINY)
    model = DPTClassic(DPT_TINY)
    rng = np.random.default_rng(1)
    x = rng.random((1, 96, 96, 3), dtype=np.float32)
    with torch.no_grad():
        ref = hf(
            torch.from_numpy(np.moveaxis(x, -1, 1)),
            interpolate_pos_encoding=True,
        ).predicted_depth.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=1e-3)


def test_dpt_beit_parity():
    from transformers import BeitConfig, DPTConfig, DPTForDepthEstimation

    from visiondepth3d_tpu.depth.dpt_beit import (
        DPT_BEIT_TINY,
        DPTBEiT,
        convert_dpt_beit,
    )

    bb = BeitConfig(
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=2,
        intermediate_size=128,
        image_size=64,
        patch_size=16,
        use_relative_position_bias=True,
        use_absolute_position_embeddings=False,
        layer_scale_init_value=0.1,
        out_features=["stage1", "stage2", "stage3", "stage4"],
        reshape_hidden_states=False,
    )
    cfg = DPTConfig(
        backbone_config=bb,
        is_hybrid=False,
        neck_hidden_sizes=[16, 24, 32, 40],
        fusion_hidden_size=16,
        reassemble_factors=[4, 2, 1, 0.5],
        readout_type="project",
        add_projection=False,
    )
    torch.manual_seed(0)
    hf = DPTForDepthEstimation(cfg).eval()
    # make the bias tables non-zero so the rel-pos path is actually tested
    with torch.no_grad():
        for layer in hf.backbone.encoder.layer:
            layer.attention.attention.relative_position_bias.relative_position_bias_table.normal_(
                0, 0.05
            )
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_dpt_beit(state, DPT_BEIT_TINY)
    model = DPTBEiT(DPT_BEIT_TINY)
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.moveaxis(x, -1, 1))).predicted_depth.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-4)
