"""Apple DepthPro in Flax: multi-scale patched DINOv2 encoder + DPT-style
fusion + sharp depth head + optional FOV estimation head.

Per HF ``modeling_depth_pro.py``: the image is rescaled to several ratios,
split into overlapping fixed-size patches, every patch runs through ONE
shared DINOv2 ("patch encoder") as a batch — a TPU-friendly design already
(one big MXU batch instead of pyramid loops) — then patch grids are merged
back (overlap trimmed by ``merge_padding``), upsampled by transposed convs,
fused DPT-style low-res-first with 2x deconvs, and decoded to an inverse
depth map; a second DINOv2 ("image encoder") provides the global context
and a third one the field-of-view scalar.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .configs import ViTConfig
from .dinov2 import Block, PatchEmbed, interpolate_pos_embed
from .dpt import PreActResidual, UpsampleConv


@dataclasses.dataclass(frozen=True)
class DepthProConfig:
    patch_model: ViTConfig = ViTConfig(image_size=384)
    image_model: ViTConfig = ViTConfig(image_size=384)
    fov_model: ViTConfig = ViTConfig(image_size=384)
    patch_size: int = 384  # splitting window over the scaled images
    scaled_images_ratios: tuple = (0.25, 0.5, 1.0)
    scaled_images_overlap_ratios: tuple = (0.0, 0.5, 0.25)
    scaled_images_feature_dims: tuple = (1024, 1024, 512)
    intermediate_hook_ids: tuple = (11, 5)
    intermediate_feature_dims: tuple = (256, 256)
    fusion_hidden_size: int = 256
    merge_padding_value: int = 3
    num_fov_head_layers: int = 2
    use_fov_model: bool = True


_VIT_TINY = ViTConfig(hidden_size=32, num_layers=4, num_heads=2, patch_size=16,
                      image_size=32, layerscale=True)
DEPTH_PRO_TINY = DepthProConfig(
    patch_model=_VIT_TINY,
    image_model=_VIT_TINY,
    fov_model=_VIT_TINY,
    patch_size=32,
    scaled_images_ratios=(0.5, 1.0),
    scaled_images_overlap_ratios=(0.0, 0.25),
    scaled_images_feature_dims=(16, 16),
    intermediate_hook_ids=(1,),
    intermediate_feature_dims=(16,),
    fusion_hidden_size=16,
    merge_padding_value=1,
    num_fov_head_layers=1,
)


class Dinov2Trunk(nn.Module):
    """DINOv2 returning (last_hidden_state with final LN, raw block outputs).

    DepthPro taps raw (pre-final-LN) intermediates via hooks while consuming
    the LN'd last hidden state — different from the Backbone used by
    DepthAnything, hence this thin variant sharing the same submodules
    (weights convert 1:1 from Dinov2Model checkpoints).
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg
        b, h, w, _ = pixels.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        x = PatchEmbed(cfg, name="patch_embed")(pixels)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), x], 1)
        side = cfg.image_size // cfg.patch_size
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, side * side + 1, cfg.hidden_size))
        x = x + interpolate_pos_embed(pos, (gh, gw))
        hiddens = []
        for i in range(cfg.num_layers):
            x = Block(cfg, name=f"block{i}")(x)
            hiddens.append(x)
        last = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x)
        return last, hiddens


def split_to_patches(x: jnp.ndarray, patch: int, overlap_ratio: float):
    """[B, H, W, C] -> [N*B, patch, patch, C] (F.unfold order: patches vary
    fastest over the batch dim after the permute in HF)."""
    b, h, w, c = x.shape
    if h == patch and w == patch:
        return x, 1
    stride = int(patch * (1 - overlap_ratio))
    ys = list(range(0, h - patch + 1, stride))
    xs = list(range(0, w - patch + 1, stride))
    tiles = [x[:, y : y + patch, xx : xx + patch] for y in ys for xx in xs]
    return jnp.concatenate(tiles, axis=0), len(tiles)


def reshape_features(tokens: jnp.ndarray) -> jnp.ndarray:
    """Drop special tokens, reshape to [N, s, s, C]."""
    n, seq, c = tokens.shape
    s = int(math.isqrt(seq))
    return tokens[:, -(s * s) :, :].reshape(n, s, s, c)


def merge_patches(patches: jnp.ndarray, batch_size: int, padding: int):
    """[N*B, s, s, C] -> [B, S, S, C] with overlap trimming (HF parity)."""
    nb, s, _, c = patches.shape
    n_per = nb // batch_size
    if nb == batch_size:
        return patches
    k = int(math.isqrt(n_per))
    if n_per < 4:
        padding = 0
    padding = min(s // 4, padding)
    rows = []
    i = 0
    for hh in range(k):
        row = []
        for ww in range(k):
            box = patches[batch_size * i : batch_size * (i + 1)]
            top = padding if hh != 0 else 0
            bottom = padding if hh != k - 1 else 0
            left = padding if ww != 0 else 0
            right = padding if ww != k - 1 else 0
            row.append(box[:, top : s - bottom, left : s - right])
            i += 1
        rows.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(rows, axis=1)


def reconstruct(tokens, batch_size, padding, out_hw):
    f = reshape_features(tokens)
    f = merge_patches(f, batch_size, padding)
    return resize_bilinear(f, out_hw, align_corners=False, channel_last=True)


class UpsampleBlock(nn.Module):
    intermediate: int
    out: int
    n_layers: int
    use_proj: bool = True
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        if self.use_proj:
            x = nn.Dense(self.intermediate, use_bias=self.bias, name="proj")(x)
        for i in range(self.n_layers):
            x = UpsampleConv(self.out, 2, use_bias=self.bias, name=f"up{i}")(x)
        return x


class FusionLayer(nn.Module):
    features: int
    use_deconv: bool = True

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is not None:
            x = x + PreActResidual(self.features, name="res1")(residual)
        x = PreActResidual(self.features, name="res2")(x)
        if self.use_deconv:
            x = UpsampleConv(self.features, 2, use_bias=False, name="deconv")(x)
        return nn.Dense(self.features, name="projection")(x)


class DepthPro(nn.Module):
    cfg: DepthProConfig = DepthProConfig()

    @nn.compact
    def __call__(self, pixels):  # [B, H, W, 3] normalized, H == W
        cfg = self.cfg
        b, h, w, _ = pixels.shape
        out_size = cfg.image_model.image_size // cfg.image_model.patch_size
        exp = int(math.log2(w / out_size))
        base_h, base_w = h // 2**exp, w // 2**exp
        n_scaled = len(cfg.scaled_images_ratios)

        # ---- patch encoder over all scales in one shared-ViT batch ----
        patch_trunk = Dinov2Trunk(cfg.patch_model, name="patch_encoder")
        scaled, counts = [], []
        for r in cfg.scaled_images_ratios:
            img = resize_bilinear(
                pixels, (int(h * r), int(w * r)), channel_last=True
            )
            tiles, n = split_to_patches(img, cfg.patch_size,
                                        cfg.scaled_images_overlap_ratios[
                                            cfg.scaled_images_ratios.index(r)])
            scaled.append(tiles)
            counts.append(n * b)
        patches = jnp.concatenate(scaled[::-1], axis=0)  # high res first
        last, hiddens = patch_trunk(patches)
        splits = np.cumsum(counts[::-1])[:-1]
        per_scale_last = jnp.split(last, splits, axis=0)[::-1]

        feats = []
        for i in range(n_scaled):
            pad = int(cfg.merge_padding_value * (1 / cfg.scaled_images_ratios[i]))
            feats.append(
                reconstruct(per_scale_last[i], b, pad,
                            (base_h * 2**i, base_w * 2**i))
            )
        for j, hook in enumerate(cfg.intermediate_hook_ids):
            # raw block output of the highest-res scale's patches
            hs = jnp.split(hiddens[hook], splits, axis=0)[::-1][n_scaled - 1]
            pad = int(cfg.merge_padding_value * (1 / cfg.scaled_images_ratios[-1]))
            feats.append(
                reconstruct(hs, b, pad,
                            (base_h * 2 ** (n_scaled - 1),
                             base_w * 2 ** (n_scaled - 1)))
            )

        # ---- image encoder (global context) ----
        img_small = resize_bilinear(
            pixels, (cfg.image_model.image_size,) * 2, channel_last=True
        )
        image_last, _ = Dinov2Trunk(cfg.image_model, name="image_encoder")(img_small)
        image_features = reconstruct(image_last, b, 0, (base_h, base_w))

        features = [image_features, *feats]

        # ---- neck: upsample + fuse image with low res + project ----
        features[0] = UpsampleBlock(
            cfg.image_model.hidden_size, cfg.scaled_images_feature_dims[0], 1,
            use_proj=False, bias=True, name="up_image",
        )(features[0])
        for i in range(n_scaled):
            features[i + 1] = UpsampleBlock(
                cfg.scaled_images_feature_dims[i],
                cfg.scaled_images_feature_dims[i], 1, name=f"up_scaled{i}",
            )(features[i + 1])
        for i in range(len(cfg.intermediate_hook_ids)):
            inter = (cfg.fusion_hidden_size if i == 0
                     else cfg.intermediate_feature_dims[i])
            features[n_scaled + i + 1] = UpsampleBlock(
                inter, cfg.intermediate_feature_dims[i], 2 + i,
                name=f"up_inter{i}",
            )(features[n_scaled + i + 1])

        global_features = jnp.concatenate([features[1], features[0]], axis=-1)
        global_features = nn.Dense(cfg.scaled_images_feature_dims[0],
                                   name="fuse_low_res")(global_features)
        features = [global_features, *features[2:]]

        dims = cfg.scaled_images_feature_dims + cfg.intermediate_feature_dims
        projected = []
        for i, f in enumerate(features):
            if i == len(features) - 1 and dims[i] == cfg.fusion_hidden_size:
                projected.append(f)
            else:
                projected.append(
                    nn.Conv(cfg.fusion_hidden_size, (3, 3),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            name=f"feat_proj{i}")(f)
                )

        # ---- fusion (low-res first, 2x deconv each step) ----
        fused = None
        for i, hs in enumerate(projected[:-1]):
            layer = FusionLayer(cfg.fusion_hidden_size, name=f"fusion{i}")
            fused = layer(hs) if fused is None else layer(fused, hs)
        fused = FusionLayer(cfg.fusion_hidden_size, use_deconv=False,
                            name="fusion_final")(fused, projected[-1])

        # ---- head ----
        f2 = cfg.fusion_hidden_size // 2
        x = nn.Conv(f2, (3, 3), padding=((1, 1), (1, 1)), name="head_conv1")(fused)
        x = UpsampleConv(f2, 2, name="head_up")(x)
        x = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), name="head_conv2")(x)
        x = jax.nn.relu(x)
        depth = jax.nn.relu(nn.Dense(1, name="head_conv3")(x))[..., 0]

        fov = None
        if cfg.use_fov_model:
            fov_in = resize_bilinear(pixels, (cfg.fov_model.image_size,) * 2,
                                     channel_last=True)
            fov_last, _ = Dinov2Trunk(cfg.fov_model, name="fov_encoder")(fov_in)
            fov_tokens = nn.Dense(cfg.fusion_hidden_size // 2,
                                  name="fov_neck")(fov_last)
            fov_feat = reconstruct(fov_tokens, b, 0, (base_h, base_w))
            # HF feeds the NECK-PROJECTED global features (features[0] of the
            # model output), not the pre-projection fuse output
            gf = nn.Conv(cfg.fusion_hidden_size // 2, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), name="fov_global_conv")(
                projected[0]
            )
            gf = jax.nn.relu(gf)
            if gf.shape[1:3] != fov_feat.shape[1:3]:
                gf = resize_bilinear(gf, fov_feat.shape[1:3], channel_last=True)
            ff = fov_feat + gf
            ff = resize_bilinear(ff, (out_size, out_size), channel_last=True)
            ch = cfg.fusion_hidden_size
            for i in range(cfg.num_fov_head_layers):
                ff = nn.Conv(math.ceil(ch / 2 ** (i + 2)), (3, 3),
                             strides=(2, 2), padding=((1, 1), (1, 1)),
                             name=f"fov_head{i}")(ff)
                ff = jax.nn.relu(ff)
            k = int((out_size - 1) / 2**cfg.num_fov_head_layers + 1)
            ff = nn.Conv(1, (k, k), padding="VALID", name="fov_final")(ff)
            fov = ff.reshape(b, -1)[:, 0]

        return depth, fov


def convert_depth_pro(state: dict, cfg: DepthProConfig) -> dict:
    """HF DepthProForDepthEstimation state dict -> flax params."""
    g = {k: np.asarray(v, np.float32) for k, v in state.items()}

    def lin(prefix, bias=True):
        out = {"kernel": g[f"{prefix}.weight"].T}
        if bias:
            out["bias"] = g[f"{prefix}.bias"]
        return out

    def conv(prefix, bias=True):
        out = {"kernel": g[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = g[f"{prefix}.bias"]
        return out

    def d1(prefix, bias=True):
        out = {"kernel": g[f"{prefix}.weight"][:, :, 0, 0].T}
        if bias:
            out["bias"] = g[f"{prefix}.bias"]
        return out

    def deconv(prefix, bias=True):  # ConvTranspose2d (I, O, f, f) -> (C,f,f,O)
        out = {"kernel": g[f"{prefix}.weight"].transpose(0, 2, 3, 1)}
        if bias:
            out["bias"] = g[f"{prefix}.bias"]
        return out

    def ln(prefix):
        return {"scale": g[f"{prefix}.weight"], "bias": g[f"{prefix}.bias"]}

    def trunk(prefix, vit: ViTConfig):
        p = vit.patch_size
        hid = vit.hidden_size
        pe = g[f"{prefix}.embeddings.patch_embeddings.projection.weight"]
        out = {
            "cls_token": g[f"{prefix}.embeddings.cls_token"],
            "pos_embed": g[f"{prefix}.embeddings.position_embeddings"],
            "patch_embed": {"proj": {
                "kernel": pe.transpose(2, 3, 1, 0).reshape(p * p * 3, hid),
                "bias": g[f"{prefix}.embeddings.patch_embeddings.projection.bias"],
            }},
            "norm": ln(f"{prefix}.layernorm"),
        }
        for i in range(vit.num_layers):
            pre = f"{prefix}.encoder.layer.{i}"
            qkv_w = np.concatenate([
                g[f"{pre}.attention.attention.query.weight"].T,
                g[f"{pre}.attention.attention.key.weight"].T,
                g[f"{pre}.attention.attention.value.weight"].T,
            ], axis=1)
            qkv_b = np.concatenate([
                g[f"{pre}.attention.attention.query.bias"],
                g[f"{pre}.attention.attention.key.bias"],
                g[f"{pre}.attention.attention.value.bias"],
            ])
            block = {
                "norm1": ln(f"{pre}.norm1"),
                "norm2": ln(f"{pre}.norm2"),
                "attn": {"qkv": {"kernel": qkv_w, "bias": qkv_b},
                         "proj": lin(f"{pre}.attention.output.dense")},
                "mlp": {"fc1": lin(f"{pre}.mlp.fc1"),
                        "fc2": lin(f"{pre}.mlp.fc2")},
            }
            if vit.layerscale:
                block["ls1"] = g[f"{pre}.layer_scale1.lambda1"]
                block["ls2"] = g[f"{pre}.layer_scale2.lambda1"]
            out[f"block{i}"] = block
        return out

    n_scaled = len(cfg.scaled_images_ratios)
    params: dict = {
        "patch_encoder": trunk("depth_pro.encoder.patch_encoder.model",
                               cfg.patch_model),
        "image_encoder": trunk("depth_pro.encoder.image_encoder.model",
                               cfg.image_model),
        "up_image": {"up0": deconv(
            "depth_pro.neck.feature_upsample.image_block.layers.0")},
        "fuse_low_res": d1("depth_pro.neck.fuse_image_with_low_res"),
        "head_conv1": conv("head.layers.0"),
        "head_up": deconv("head.layers.1"),
        "head_conv2": conv("head.layers.2"),
        "head_conv3": d1("head.layers.4"),
    }
    for i in range(n_scaled):
        pre = f"depth_pro.neck.feature_upsample.scaled_images.{i}"
        params[f"up_scaled{i}"] = {
            "proj": {"kernel": g[f"{pre}.layers.0.weight"][:, :, 0, 0].T},
            "up0": deconv(f"{pre}.layers.1", bias=False),
        }
    for i in range(len(cfg.intermediate_hook_ids)):
        pre = f"depth_pro.neck.feature_upsample.intermediate.{i}"
        layer = {"proj": {"kernel": g[f"{pre}.layers.0.weight"][:, :, 0, 0].T}}
        for j in range(2 + i):
            layer[f"up{j}"] = deconv(f"{pre}.layers.{j + 1}", bias=False)
        params[f"up_inter{i}"] = layer
    n_proj = n_scaled + len(cfg.intermediate_hook_ids) - 1
    for i in range(n_proj + 1):
        key = f"depth_pro.neck.feature_projection.projections.{i}.weight"
        if key in g:
            params[f"feat_proj{i}"] = conv(
                f"depth_pro.neck.feature_projection.projections.{i}", bias=False
            )
    n_fusion = n_scaled + len(cfg.intermediate_hook_ids)
    for i in range(n_fusion - 1):
        pre = f"fusion_stage.intermediate.{i}"
        params[f"fusion{i}"] = {
            "res1": {"conv1": conv(f"{pre}.residual_layer1.convolution1"),
                     "conv2": conv(f"{pre}.residual_layer1.convolution2")},
            "res2": {"conv1": conv(f"{pre}.residual_layer2.convolution1"),
                     "conv2": conv(f"{pre}.residual_layer2.convolution2")},
            "deconv": deconv(f"{pre}.deconv", bias=False),
            "projection": d1(f"{pre}.projection"),
        }
    params["fusion_final"] = {
        "res1": {"conv1": conv("fusion_stage.final.residual_layer1.convolution1"),
                 "conv2": conv("fusion_stage.final.residual_layer1.convolution2")},
        "res2": {"conv1": conv("fusion_stage.final.residual_layer2.convolution1"),
                 "conv2": conv("fusion_stage.final.residual_layer2.convolution2")},
        "projection": d1("fusion_stage.final.projection"),
    }
    if cfg.use_fov_model:
        params["fov_encoder"] = trunk("fov_model.fov_encoder.model", cfg.fov_model)
        params["fov_neck"] = lin("fov_model.fov_encoder.neck")
        params["fov_global_conv"] = conv("fov_model.conv")
        for i in range(cfg.num_fov_head_layers):
            params[f"fov_head{i}"] = conv(f"fov_model.head.layers.{2 * i}")
        params["fov_final"] = conv(
            f"fov_model.head.layers.{2 * cfg.num_fov_head_layers}"
        )
    return params
