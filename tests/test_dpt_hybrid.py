"""DPT-Hybrid (BiT stem + ViT) vs transformers-torch ground truth, offline."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from visiondepth3d_tpu.depth.dpt_hybrid import (
    DPT_HYBRID_TINY,
    DPTHybrid,
    convert_dpt_hybrid,
)


def _tiny_hf_hybrid():
    from transformers import BitConfig, DPTConfig, DPTForDepthEstimation

    bb = BitConfig(
        embedding_size=8, hidden_sizes=[8, 16, 32], depths=[1, 1, 1],
        num_groups=2, layer_type="bottleneck", global_padding="SAME",
        embedding_dynamic_padding=True,
        out_features=["stage1", "stage2", "stage3"],
    )
    cfg = DPTConfig(
        is_hybrid=True, backbone_config=bb,
        backbone_featmap_shape=[1, 32, 4, 4],
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=128, image_size=64, patch_size=16,
        backbone_out_indices=[0, 1, 2, 3],
        neck_hidden_sizes=[8, 16, 24, 32], fusion_hidden_size=16,
        reassemble_factors=[1, 1, 1, 0.5],
        readout_type="project", neck_ignore_stages=[0, 1],
    )
    torch.manual_seed(0)
    return DPTForDepthEstimation(cfg).eval()


def test_dpt_hybrid_parity():
    hf = _tiny_hf_hybrid()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_dpt_hybrid(state, DPT_HYBRID_TINY)
    model = DPTHybrid(DPT_HYBRID_TINY)
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.moveaxis(x, -1, 1))).predicted_depth.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=1e-3)
