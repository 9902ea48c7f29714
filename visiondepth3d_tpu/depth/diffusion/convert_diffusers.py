"""Diffusers checkpoint -> Flax params converters for the diffusion stack.

Name mappings for: AutoencoderKL (SD VAE / sd-vae-ft-mse), the SD2 UNet
(Marigold) and the SVD spatio-temporal UNet (DepthCrafter, whose safetensors
the reference loads in depthcrafter_adapter.py:22-24). Pure numpy; callers
load safetensors via depth.convert.load_safetensors_state.

The temporal modules of our ST-UNet are a clean-room design (alpha-blended
temporal resnet/attention twins); ``convert_unet_st`` maps the spatial
sublayers 1:1 from SVD checkpoints and the temporal sublayers from SVD's
temporal blocks where shapes line up, documenting any remainder — exact
checkpoint fidelity is validated once real weights are mountable.
"""

from __future__ import annotations

import numpy as np


def _t(w):
    return np.asarray(w, dtype=np.float32)


def _conv(g, prefix, bias=True):
    out = {"kernel": g[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = g[f"{prefix}.bias"]
    return out


def _lin(g, prefix, bias=True):
    out = {"kernel": g[f"{prefix}.weight"].T}
    if bias:
        out["bias"] = g[f"{prefix}.bias"]
    return out


def _gn(g, prefix):
    return {"scale": g[f"{prefix}.weight"], "bias": g[f"{prefix}.bias"]}


def _resnet(g, prefix):
    out = {
        "norm1": _gn(g, f"{prefix}.norm1"),
        "conv1": _conv(g, f"{prefix}.conv1"),
        "norm2": _gn(g, f"{prefix}.norm2"),
        "conv2": _conv(g, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_shortcut.weight" in g:
        # 1x1 conv stored OIHW -> our nn.Conv HWIO
        out["shortcut"] = {
            "kernel": g[f"{prefix}.conv_shortcut.weight"].transpose(2, 3, 1, 0),
            "bias": g[f"{prefix}.conv_shortcut.bias"],
        }
    if f"{prefix}.time_emb_proj.weight" in g:
        out["time_emb"] = _lin(g, f"{prefix}.time_emb_proj")
    return out


def convert_vae(state: dict, layers_per_block: int = 2,
                n_blocks: int = 4) -> dict:
    """diffusers AutoencoderKL state dict -> depth.diffusion.vae params.

    Note: diffusers wraps the latent moments in quant_conv/post_quant_conv
    1x1 convs; our VAE folds those into conv_out/conv_in equivalents — they
    are identity-initialized in SD checkpoints' successors but present in
    SD1/2: we compose them into the adjacent convs when they exist.
    """
    g = {k: _t(v) for k, v in state.items()}
    enc: dict = {"conv_in": _conv(g, "encoder.conv_in")}
    for i in range(n_blocks):
        for j in range(layers_per_block):
            enc[f"down{i}_res{j}"] = _resnet(g, f"encoder.down_blocks.{i}.resnets.{j}")
        key = f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"
        if key in g:
            enc[f"down{i}_downsample"] = _conv(
                g, f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
    enc["mid_res1"] = _resnet(g, "encoder.mid_block.resnets.0")
    enc["mid_res2"] = _resnet(g, "encoder.mid_block.resnets.1")
    enc["mid_attn"] = _vae_attn(g, "encoder.mid_block.attentions.0")
    enc["norm_out"] = _gn(g, "encoder.conv_norm_out")
    enc["conv_out"] = _compose_1x1_after_conv(
        g, "encoder.conv_out", "quant_conv"
    )

    dec: dict = {"conv_in": _compose_1x1_before_conv(
        g, "decoder.conv_in", "post_quant_conv"
    )}
    dec["mid_res1"] = _resnet(g, "decoder.mid_block.resnets.0")
    dec["mid_res2"] = _resnet(g, "decoder.mid_block.resnets.1")
    dec["mid_attn"] = _vae_attn(g, "decoder.mid_block.attentions.0")
    for i in range(n_blocks):
        for j in range(layers_per_block + 1):
            dec[f"up{i}_res{j}"] = _resnet(g, f"decoder.up_blocks.{i}.resnets.{j}")
        key = f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"
        if key in g:
            dec[f"up{i}_upsample"] = _conv(g, f"decoder.up_blocks.{i}.upsamplers.0.conv")
    dec["norm_out"] = _gn(g, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(g, "decoder.conv_out")
    return {"encoder": enc, "decoder": dec}


def _vae_attn(g, prefix):
    def d(name):
        w = g[f"{prefix}.{name}.weight"]
        if w.ndim == 4:  # old checkpoints store 1x1 convs
            w = w[:, :, 0, 0]
        return {"kernel": w.T, "bias": g[f"{prefix}.{name}.bias"]}

    return {
        "norm": _gn(g, f"{prefix}.group_norm"),
        "q": d("to_q"),
        "k": d("to_k"),
        "v": d("to_v"),
        "proj": d("to_out.0"),
    }


def _compose_1x1_after_conv(g, conv_prefix, quant_prefix):
    """conv (3x3) followed by a 1x1 quant conv -> single 3x3 conv."""
    base = _conv(g, conv_prefix)
    if f"{quant_prefix}.weight" not in g:
        return base
    qw = g[f"{quant_prefix}.weight"][:, :, 0, 0]  # (O, I)
    qb = g[f"{quant_prefix}.bias"]
    k = base["kernel"]  # (kh, kw, I, O_mid)
    base["kernel"] = np.einsum("hwio,po->hwip", k, qw)
    base["bias"] = qw @ base["bias"] + qb
    return base


def _compose_1x1_before_conv(g, conv_prefix, quant_prefix):
    """1x1 post-quant conv followed by a 3x3 conv -> single 3x3 conv.

    y = conv_k(qw x + qb): kernel'[h,w,p,o] = sum_i k[h,w,i,o] qw[i,p];
    qb is spatially constant, so its contribution folds into the bias as
    sum_{h,w,i} k[h,w,i,o] * qb[i].
    """
    base = _conv(g, conv_prefix)
    if f"{quant_prefix}.weight" not in g:
        return base
    qw = g[f"{quant_prefix}.weight"][:, :, 0, 0]  # (O_q, I_q); square here
    qb = g[f"{quant_prefix}.bias"]
    k = base["kernel"]  # (kh, kw, I_mid, O) where I_mid == O_q
    base["kernel"] = np.einsum("hwio,ip->hwpo", k, qw)
    base["bias"] = g[f"{conv_prefix}.bias"] + np.einsum("hwio,i->o", k, qb)
    return base


def convert_unet2d(state: dict, cfg) -> dict:
    """diffusers UNet2DConditionModel -> depth.diffusion.unet2d params."""
    g = {k: _t(v) for k, v in state.items()}
    p: dict = {
        "conv_in": _conv(g, "conv_in"),
        "time_fc1": _lin(g, "time_embedding.linear_1"),
        "time_fc2": _lin(g, "time_embedding.linear_2"),
        "norm_out": _gn(g, "conv_norm_out"),
        "conv_out": _conv(g, "conv_out"),
    }

    def xattn(prefix):
        return {
            "to_q": _lin(g, f"{prefix}.to_q", bias=False),
            "to_k": _lin(g, f"{prefix}.to_k", bias=False),
            "to_v": _lin(g, f"{prefix}.to_v", bias=False),
            "to_out": _lin(g, f"{prefix}.to_out.0"),
        }

    def sblock(prefix):
        return {
            "norm": _gn(g, f"{prefix}.norm"),
            "proj_in": _lin(g, f"{prefix}.proj_in"),
            "proj_out": _lin(g, f"{prefix}.proj_out"),
            "block": {
                "norm1": _ln(g, f"{prefix}.transformer_blocks.0.norm1"),
                "norm2": _ln(g, f"{prefix}.transformer_blocks.0.norm2"),
                "norm3": _ln(g, f"{prefix}.transformer_blocks.0.norm3"),
                "attn1": xattn(f"{prefix}.transformer_blocks.0.attn1"),
                "attn2": xattn(f"{prefix}.transformer_blocks.0.attn2"),
                "ff_geglu": {"proj": _lin(g, f"{prefix}.transformer_blocks.0.ff.net.0.proj")},
                "ff_out": _lin(g, f"{prefix}.transformer_blocks.0.ff.net.2"),
            },
        }

    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            p[f"down{i}_res{j}"] = _resnet(g, f"down_blocks.{i}.resnets.{j}")
            if cfg.with_attn[i]:
                p[f"down{i}_attn{j}"] = sblock(f"down_blocks.{i}.attentions.{j}")
        key = f"down_blocks.{i}.downsamplers.0.conv.weight"
        if key in g:
            p[f"down{i}_downsample"] = _conv(g, f"down_blocks.{i}.downsamplers.0.conv")
    p["mid_res1"] = _resnet(g, "mid_block.resnets.0")
    p["mid_res2"] = _resnet(g, "mid_block.resnets.1")
    p["mid_attn"] = sblock("mid_block.attentions.0")
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            p[f"up{i}_res{j}"] = _resnet(g, f"up_blocks.{i}.resnets.{j}")
            bi = n - 1 - i
            if cfg.with_attn[bi]:
                p[f"up{i}_attn{j}"] = sblock(f"up_blocks.{i}.attentions.{j}")
        key = f"up_blocks.{i}.upsamplers.0.conv.weight"
        if key in g:
            p[f"up{i}_upsample"] = _conv(g, f"up_blocks.{i}.upsamplers.0.conv")
    return p


def _ln(g, prefix):
    return {"scale": g[f"{prefix}.weight"], "bias": g[f"{prefix}.bias"]}


def _scalar(v):
    return np.asarray(v, np.float32).reshape(())


def _temporal_resnet(g, prefix):
    """diffusers TemporalResnetBlock (Conv3d k=(3,1,1)) -> our (3,) convs."""

    def tconv(p):
        w = g[f"{p}.weight"]  # [O, I, 3, 1, 1]
        return {"kernel": w[:, :, :, 0, 0].transpose(2, 1, 0),
                "bias": g[f"{p}.bias"]}

    out = {
        "norm1": _gn(g, f"{prefix}.norm1"),
        "conv1": tconv(f"{prefix}.conv1"),
        "norm2": _gn(g, f"{prefix}.norm2"),
        "conv2": tconv(f"{prefix}.conv2"),
    }
    if f"{prefix}.time_emb_proj.weight" in g:
        out["time_emb"] = _lin(g, f"{prefix}.time_emb_proj")
    if f"{prefix}.conv_shortcut.weight" in g:
        w = g[f"{prefix}.conv_shortcut.weight"]
        out["shortcut"] = {"kernel": w.reshape(w.shape[0], w.shape[1]).T,
                           "bias": g[f"{prefix}.conv_shortcut.bias"]}
    return out


def _st_resnet(g, prefix):
    """SVD SpatioTemporalResBlock -> our STResnet (spatial/temporal/mix)."""
    return {
        "spatial": _resnet(g, f"{prefix}.spatial_res_block"),
        "temporal": _temporal_resnet(g, f"{prefix}.temporal_res_block"),
        "mix": {"mix_factor": _scalar(g[f"{prefix}.time_mixer.mix_factor"])},
    }


def _tlayer(g, prefix):
    """One diffusers BasicTransformerBlock -> our TransformerLayer."""

    def xattn(p):
        return {
            "to_q": _lin(g, f"{p}.to_q", bias=False),
            "to_k": _lin(g, f"{p}.to_k", bias=False),
            "to_v": _lin(g, f"{p}.to_v", bias=False),
            "to_out": _lin(g, f"{p}.to_out.0"),
        }

    return {
        "norm1": _ln(g, f"{prefix}.norm1"),
        "norm2": _ln(g, f"{prefix}.norm2"),
        "norm3": _ln(g, f"{prefix}.norm3"),
        "attn1": xattn(f"{prefix}.attn1"),
        "attn2": xattn(f"{prefix}.attn2"),
        "ff_geglu": {"proj": _lin(g, f"{prefix}.ff.net.0.proj")},
        "ff_out": _lin(g, f"{prefix}.ff.net.2"),
    }


def _st_transformer(g, prefix):
    """SVD TransformerSpatioTemporalModel -> our STTransformer.

    Mapped 1:1: norm, proj_in/out, the spatial transformer block, the
    temporal block's shared sublayers, and the alpha mixer. Dropped (no
    counterpart in our temporal design, see unet_st.py docstring): the
    temporal block's norm_in/ff_in pre-mix and time_pos_embed.
    """
    return {
        "norm": _gn(g, f"{prefix}.norm"),
        "proj_in": _lin(g, f"{prefix}.proj_in"),
        "spatial": _tlayer(g, f"{prefix}.transformer_blocks.0"),
        "temporal": _tlayer(g, f"{prefix}.temporal_transformer_blocks.0"),
        "mix": {"mix_factor": _scalar(g[f"{prefix}.time_mixer.mix_factor"])},
        "proj_out": _lin(g, f"{prefix}.proj_out"),
    }


def convert_unet_st(state: dict, cfg) -> dict:
    """diffusers UNetSpatioTemporalConditionModel (SVD / DepthCrafter,
    the safetensors the reference loads in depthcrafter_adapter.py:22-24)
    -> depth.diffusion.unet_st params.

    Dropped from the checkpoint (documented remainder): add_embedding /
    add_time_proj (fps+motion conditioning — DepthCrafter's custom forward
    passes zeros, core/unet.py), and the temporal blocks' norm_in/ff_in.
    """
    g = {k: _t(v) for k, v in state.items()}
    p: dict = {
        "conv_in": _conv(g, "conv_in"),
        "time_fc1": _lin(g, "time_embedding.linear_1"),
        "time_fc2": _lin(g, "time_embedding.linear_2"),
        "norm_out": _gn(g, "conv_norm_out"),
        "conv_out": _conv(g, "conv_out"),
    }
    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            p[f"down{i}_res{j}"] = _st_resnet(g, f"down_blocks.{i}.resnets.{j}")
            if cfg.with_attn[i]:
                p[f"down{i}_attn{j}"] = _st_transformer(
                    g, f"down_blocks.{i}.attentions.{j}"
                )
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in g:
            p[f"down{i}_downsample"] = _conv(
                g, f"down_blocks.{i}.downsamplers.0.conv"
            )
    p["mid_res1"] = _st_resnet(g, "mid_block.resnets.0")
    p["mid_res2"] = _st_resnet(g, "mid_block.resnets.1")
    p["mid_attn"] = _st_transformer(g, "mid_block.attentions.0")
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            p[f"up{i}_res{j}"] = _st_resnet(g, f"up_blocks.{i}.resnets.{j}")
            bi = n - 1 - i
            if cfg.with_attn[bi]:
                p[f"up{i}_attn{j}"] = _st_transformer(
                    g, f"up_blocks.{i}.attentions.{j}"
                )
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in g:
            p[f"up{i}_upsample"] = _conv(g, f"up_blocks.{i}.upsamplers.0.conv")
    return p


def convert_clip_vision(state: dict, cfg) -> dict:
    """transformers CLIPVisionModelWithProjection (the laion ViT-H image
    encoder, depthcrafter_adapter.py:33-36) -> depth.diffusion.clip_vision
    params. ("pre_layrnorm" is the actual HF key.)"""
    g = {k: _t(v) for k, v in state.items()}
    emb = "vision_model.embeddings"
    pe = g[f"{emb}.patch_embedding.weight"]  # [C, 3, p, p], no bias
    patch = pe.shape[-1]
    hid = pe.shape[0]
    p: dict = {
        "class_embed": g[f"{emb}.class_embedding"].reshape(1, 1, hid),
        "pos_embed": g[f"{emb}.position_embedding.weight"][None],
        "patch_embed": {
            "kernel": pe.transpose(2, 3, 1, 0).reshape(patch * patch * 3, hid)
        },
        "pre_ln": _ln(g, "vision_model.pre_layrnorm"),
        "post_ln": _ln(g, "vision_model.post_layernorm"),
        "proj": {"kernel": g["visual_projection.weight"].T},
    }
    for i in range(cfg.num_layers):
        pre = f"vision_model.encoder.layers.{i}"
        qkv_w = np.concatenate(
            [g[f"{pre}.self_attn.{x}_proj.weight"].T for x in ("q", "k", "v")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [g[f"{pre}.self_attn.{x}_proj.bias"] for x in ("q", "k", "v")]
        )
        p[f"block{i}"] = {
            "norm1": _ln(g, f"{pre}.layer_norm1"),
            "norm2": _ln(g, f"{pre}.layer_norm2"),
            "attn": {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "proj": _lin(g, f"{pre}.self_attn.out_proj"),
            },
            "mlp": {"fc1": _lin(g, f"{pre}.mlp.fc1"),
                    "fc2": _lin(g, f"{pre}.mlp.fc2")},
        }
    return p
