"""HF torch checkpoint -> Flax params conversion for the ViT+DPT family.

Consumes a torch ``state_dict`` (from safetensors or an instantiated
``DepthAnythingForDepthEstimation``) and emits the params pytree for
``depth.dpt.DepthAnything``. Pure numpy — no torch dependency at runtime
(torch is only needed by whoever loads the checkpoint).
"""

from __future__ import annotations

import numpy as np

from .configs import DPTConfig


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def convert_depth_anything(state: dict, cfg: DPTConfig) -> dict:
    """state: name -> array (torch tensors or numpy). Returns flax params."""
    g = {k: _t(v) for k, v in state.items()}
    p = cfg.backbone.patch_size
    hid = cfg.backbone.hidden_size

    def lin(prefix):  # torch Linear -> flax Dense
        return {"kernel": g[f"{prefix}.weight"].T, "bias": g[f"{prefix}.bias"]}

    def conv(prefix, bias=True):  # torch Conv2d OIHW -> flax HWIO
        out = {"kernel": g[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = g[f"{prefix}.bias"]
        return out

    def dense_from_1x1(prefix):  # 1x1 Conv2d (O, I, 1, 1) -> Dense (I, O)
        return {
            "kernel": g[f"{prefix}.weight"][:, :, 0, 0].T,
            "bias": g[f"{prefix}.bias"],
        }

    def ln(prefix):
        return {"scale": g[f"{prefix}.weight"], "bias": g[f"{prefix}.bias"]}

    # ---- backbone ----
    pe_w = g["backbone.embeddings.patch_embeddings.projection.weight"]
    backbone = {
        "cls_token": g["backbone.embeddings.cls_token"],
        "pos_embed": g["backbone.embeddings.position_embeddings"],
        "patch_embed": {
            "proj": {
                "kernel": pe_w.transpose(2, 3, 1, 0).reshape(p * p * 3, hid),
                "bias": g["backbone.embeddings.patch_embeddings.projection.bias"],
            }
        },
        "norm": ln("backbone.layernorm"),
    }
    for i in range(cfg.backbone.num_layers):
        pre = f"backbone.encoder.layer.{i}"
        qkv_w = np.concatenate(
            [
                g[f"{pre}.attention.attention.query.weight"].T,
                g[f"{pre}.attention.attention.key.weight"].T,
                g[f"{pre}.attention.attention.value.weight"].T,
            ],
            axis=1,
        )
        qkv_b = np.concatenate(
            [
                g[f"{pre}.attention.attention.query.bias"],
                g[f"{pre}.attention.attention.key.bias"],
                g[f"{pre}.attention.attention.value.bias"],
            ]
        )
        block = {
            "norm1": ln(f"{pre}.norm1"),
            "norm2": ln(f"{pre}.norm2"),
            "attn": {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "proj": lin(f"{pre}.attention.output.dense"),
            },
            "mlp": {"fc1": lin(f"{pre}.mlp.fc1"), "fc2": lin(f"{pre}.mlp.fc2")},
        }
        if cfg.backbone.layerscale:
            block["ls1"] = g[f"{pre}.layer_scale1.lambda1"]
            block["ls2"] = g[f"{pre}.layer_scale2.lambda1"]
        backbone[f"block{i}"] = block

    # ---- neck + head ----
    nh: dict = {}
    for i, factor in enumerate(cfg.reassemble_factors):
        pre = f"neck.reassemble_stage.layers.{i}"
        layer = {"projection": dense_from_1x1(f"{pre}.projection")}
        if factor > 1:
            w = g[f"{pre}.resize.weight"]  # ConvTranspose2d (I, O, f, f)
            layer["resize"] = {
                "kernel": w.transpose(0, 2, 3, 1),  # (C, f, f, O)
                "bias": g[f"{pre}.resize.bias"],
            }
        elif factor < 1:
            layer["resize"] = conv(f"{pre}.resize")
        nh[f"reassemble{i}"] = layer
    for i in range(len(cfg.neck_hidden_sizes)):
        nh[f"scratch{i}"] = conv(f"neck.convs.{i}", bias=False)
    for i in range(len(cfg.neck_hidden_sizes)):
        pre = f"neck.fusion_stage.layers.{i}"
        nh[f"fusion{i}"] = {
            "projection": dense_from_1x1(f"{pre}.projection"),
            "res1": {
                "conv1": conv(f"{pre}.residual_layer1.convolution1"),
                "conv2": conv(f"{pre}.residual_layer1.convolution2"),
            },
            "res2": {
                "conv1": conv(f"{pre}.residual_layer2.convolution1"),
                "conv2": conv(f"{pre}.residual_layer2.convolution2"),
            },
        }
    nh["head_conv1"] = conv("head.conv1")
    nh["head_conv2"] = conv("head.conv2")
    nh["head_conv3"] = dense_from_1x1("head.conv3")

    return {"backbone": backbone, "neck_head": nh}


def load_safetensors_state(path) -> dict:
    """Load a .safetensors checkpoint into a numpy state dict (no torch)."""
    from safetensors import safe_open

    state = {}
    with safe_open(str(path), framework="np") as f:
        for k in f.keys():
            state[k] = f.get_tensor(k)
    return state
