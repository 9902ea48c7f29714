"""ZoeDepth (metric bins) vs transformers-torch ground truth, offline."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from visiondepth3d_tpu.depth.zoedepth import ZOE_TINY, ZoeDepth, convert_zoedepth


def _tiny_hf_zoe():
    from transformers import BeitConfig, ZoeDepthConfig, ZoeDepthForDepthEstimation

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
    cfg = ZoeDepthConfig(
        backbone_config=bb,
        neck_hidden_sizes=[16, 24, 32, 40],
        fusion_hidden_size=16,
        reassemble_factors=[4, 2, 1, 0.5],
        readout_type="project",
        bottleneck_features=16,
        num_relative_features=8,
        bin_embedding_dim=8,
        num_attractors=[4, 2, 2, 1],
        bin_centers_type="softplus",
        bin_configurations=[{"name": "nyu", "n_bins": 8, "min_depth": 1e-3,
                             "max_depth": 10.0}],
        add_projection=False,
    )
    torch.manual_seed(0)
    model = ZoeDepthForDepthEstimation(cfg).eval()
    with torch.no_grad():
        for layer in model.backbone.encoder.layer:
            layer.attention.attention.relative_position_bias.relative_position_bias_table.normal_(
                0, 0.05
            )
    return model


def test_zoedepth_parity():
    hf = _tiny_hf_zoe()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_zoedepth(state, ZOE_TINY)
    model = ZoeDepth(ZOE_TINY)
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.moveaxis(x, -1, 1))).predicted_depth.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=1e-3)


def test_zoedepth_nk_two_domain_parity():
    from transformers import BeitConfig, ZoeDepthConfig, ZoeDepthForDepthEstimation

    from visiondepth3d_tpu.depth.zoedepth import (
        ZOE_NK_TINY,
        ZoeDepthNK,
        convert_zoedepth_nk,
    )

    bb = BeitConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=128, image_size=64, patch_size=16,
        use_relative_position_bias=True, use_absolute_position_embeddings=False,
        layer_scale_init_value=0.1,
        out_features=["stage1", "stage2", "stage3", "stage4"],
        reshape_hidden_states=False,
    )
    cfg = ZoeDepthConfig(
        backbone_config=bb,
        neck_hidden_sizes=[16, 24, 32, 40],
        fusion_hidden_size=16,
        reassemble_factors=[4, 2, 1, 0.5],
        readout_type="project",
        bottleneck_features=16,
        num_relative_features=8,
        bin_embedding_dim=8,
        num_attractors=[4, 2, 2, 1],
        bin_centers_type="softplus",
        bin_configurations=[
            {"name": "nyu", "n_bins": 8, "min_depth": 1e-3, "max_depth": 10.0},
            {"name": "kitti", "n_bins": 8, "min_depth": 1e-3, "max_depth": 80.0},
        ],
        num_patch_transformer_layers=4,
        patch_transformer_hidden_size=128,
        patch_transformer_intermediate_size=32,
        patch_transformer_num_attention_heads=2,
        add_projection=False,
    )
    torch.manual_seed(0)
    hf = ZoeDepthForDepthEstimation(cfg).eval()
    with torch.no_grad():
        for layer in hf.backbone.encoder.layer:
            layer.attention.attention.relative_position_bias.relative_position_bias_table.normal_(
                0, 0.05
            )
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_zoedepth_nk(state, ZOE_NK_TINY)
    model = ZoeDepthNK(ZOE_NK_TINY)
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(np.moveaxis(x, -1, 1)))
    ref = out.predicted_depth.numpy()
    ref_logits = out.domain_logits.numpy()
    depth, logits = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=1e-3)
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(depth) / scale, ref / scale, atol=1e-3)
