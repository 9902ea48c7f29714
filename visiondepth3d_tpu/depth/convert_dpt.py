"""HF DPTForDepthEstimation checkpoint -> Flax params (classic DPT family)."""

from __future__ import annotations

import numpy as np

from .dpt_classic import DPTClassicConfig


def _t(w):
    return np.asarray(w, dtype=np.float32)


def convert_dpt_classic(state: dict, cfg: DPTClassicConfig) -> dict:
    g = {k: _t(v) for k, v in state.items()}
    p = cfg.backbone.patch_size
    hid = cfg.backbone.hidden_size

    def lin(prefix):
        return {"kernel": g[f"{prefix}.weight"].T, "bias": g[f"{prefix}.bias"]}

    def conv(prefix, bias=True):
        out = {"kernel": g[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = g[f"{prefix}.bias"]
        return out

    def dense_1x1(prefix):
        return {"kernel": g[f"{prefix}.weight"][:, :, 0, 0].T,
                "bias": g[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": g[f"{prefix}.weight"], "bias": g[f"{prefix}.bias"]}

    pe_w = g["dpt.embeddings.patch_embeddings.projection.weight"]
    backbone = {
        "cls_token": g["dpt.embeddings.cls_token"],
        "pos_embed": g["dpt.embeddings.position_embeddings"],
        "patch_embed": {
            "proj": {
                "kernel": pe_w.transpose(2, 3, 1, 0).reshape(p * p * 3, hid),
                "bias": g["dpt.embeddings.patch_embeddings.projection.bias"],
            }
        },
    }
    for i in range(cfg.backbone.num_layers):
        pre = f"dpt.encoder.layer.{i}"
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
        backbone[f"block{i}"] = {
            "norm1": ln(f"{pre}.layernorm_before"),
            "norm2": ln(f"{pre}.layernorm_after"),
            "attn": {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "proj": lin(f"{pre}.attention.output.dense"),
            },
            "mlp": {
                "fc1": lin(f"{pre}.intermediate.dense"),
                "fc2": lin(f"{pre}.output.dense"),
            },
        }

    params: dict = {"backbone": backbone}
    for i, factor in enumerate(cfg.reassemble_factors):
        params[f"readout{i}"] = lin(
            f"neck.reassemble_stage.readout_projects.{i}.0"
        )
        pre = f"neck.reassemble_stage.layers.{i}"
        layer = {"projection": dense_1x1(f"{pre}.projection")}
        if factor > 1:
            w = g[f"{pre}.resize.weight"]  # ConvTranspose2d (I, O, f, f)
            layer["resize"] = {"kernel": w.transpose(0, 2, 3, 1),
                               "bias": g[f"{pre}.resize.bias"]}
        elif factor < 1:
            layer["resize"] = conv(f"{pre}.resize")
        params[f"reassemble{i}"] = layer
    for i in range(len(cfg.neck_hidden_sizes)):
        params[f"scratch{i}"] = conv(f"neck.convs.{i}", bias=False)
    for i in range(len(cfg.neck_hidden_sizes)):
        pre = f"neck.fusion_stage.layers.{i}"
        params[f"fusion{i}_proj"] = dense_1x1(f"{pre}.projection")
        params[f"fusion{i}_res1"] = {
            "conv1": conv(f"{pre}.residual_layer1.convolution1"),
            "conv2": conv(f"{pre}.residual_layer1.convolution2"),
        }
        params[f"fusion{i}_res2"] = {
            "conv1": conv(f"{pre}.residual_layer2.convolution1"),
            "conv2": conv(f"{pre}.residual_layer2.convolution2"),
        }
    params["head_conv1"] = conv("head.head.0")
    params["head_conv2"] = conv("head.head.2")
    params["head_conv3"] = dense_1x1("head.head.4")
    return params
