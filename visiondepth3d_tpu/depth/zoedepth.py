"""ZoeDepth: metric depth via adaptive bins on a BEiT+DPT trunk, in Flax.

Covers the reference catalog's "ZoeDepth" entry (Intel/zoedepth-nyu family).
Architecture per HF ``modeling_zoedepth.py``: BEiT backbone -> DPT neck
(project readout) -> relative-depth DPT head (whose features condition the
metric head) -> metric head: seed bin regressor, 4 attractor refinement
rounds over the fusion features, conditional log-binomial softmax over the
bins, depth = sum(p_i * bin_center_i).

Implements BOTH heads: the single-domain head (bin_centers_type=
"softplus", ZoeDepthMetricDepthEstimationHead) and the two-domain
NYU+KITTI router (patch transformer + MLP domain classifier routing
between two such heads — ``ZoeDepthNK`` below, dispatched as the
"zoedepth-nyu-kitti" catalog entry, registry.py). Numerics verified
against transformers-torch offline (tests/test_zoedepth.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .beit import BEIT_TINY, BEiTBackbone, BEiTConfig
from .dpt import PreActResidual, ReassembleLayer


@dataclasses.dataclass(frozen=True)
class ZoeDepthConfig:
    backbone: BEiTConfig = BEiTConfig()
    out_indices: tuple = (6, 12, 18, 24)
    reassemble_factors: tuple = (4, 2, 1, 0.5)
    neck_hidden_sizes: tuple = (256, 512, 1024, 1024)
    fusion_hidden_size: int = 256
    bottleneck_features: int = 256
    num_relative_features: int = 32
    bin_embedding_dim: int = 128
    n_bins: int = 64
    num_attractors: tuple = (16, 8, 4, 1)
    min_depth: float = 1e-3
    max_depth: float = 10.0
    attractor_alpha: float = 1000.0
    attractor_kind: str = "mean"
    min_temp: float = 0.0212
    max_temp: float = 50.0


ZOE_TINY = ZoeDepthConfig(
    backbone=BEIT_TINY,
    out_indices=(1, 2, 3, 4),
    neck_hidden_sizes=(16, 24, 32, 40),
    fusion_hidden_size=16,
    bottleneck_features=16,
    num_relative_features=8,
    bin_embedding_dim=8,
    n_bins=8,
    num_attractors=(4, 2, 2, 1),
)


def _conv1x1(out, name):
    return nn.Dense(out, name=name)


def log_binom(n, k, eps=1e-7):
    n = n + eps
    k = k + eps
    return n * jnp.log(n) - k * jnp.log(k) - (n - k) * jnp.log(n - k + eps)


class SeedBinRegressor(nn.Module):
    cfg: ZoeDepthConfig

    @nn.compact
    def __call__(self, x):  # [B, h, w, C] -> bin centers [B, h, w, n_bins]
        h = jax.nn.relu(_conv1x1(256, "conv1")(x))  # HF fixed mlp_dim=256
        h = _conv1x1(self.cfg.n_bins, "conv2")(h)
        return jax.nn.softplus(h)  # "softplus" (unnormed) bin centers


class Projector(nn.Module):
    out_features: int
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(_conv1x1(self.mlp_dim, "conv1")(x))
        return _conv1x1(self.out_features, "conv2")(h)


def inv_attractor(dx, alpha=1000.0, gamma=2):
    return dx / (1.0 + alpha * dx**gamma)


class AttractorLayerUnnormed(nn.Module):
    cfg: ZoeDepthConfig
    n_attractors: int

    @nn.compact
    def __call__(self, x, prev_bin, prev_bin_embedding=None):
        cfg = self.cfg
        if prev_bin_embedding is not None:
            if prev_bin_embedding.shape[1:3] != x.shape[1:3]:
                prev_bin_embedding = resize_bilinear(
                    prev_bin_embedding, x.shape[1:3], align_corners=True,
                    channel_last=True,
                )
            x = x + prev_bin_embedding
        h = jax.nn.relu(_conv1x1(cfg.bin_embedding_dim, "conv1")(x))
        attractors = jax.nn.softplus(_conv1x1(self.n_attractors, "conv2")(h))
        bin_centers = resize_bilinear(prev_bin, x.shape[1:3],
                                      align_corners=True, channel_last=True)
        # [B, h, w, A, 1] - [B, h, w, 1, n_bins]
        dx = attractors[..., :, None] - bin_centers[..., None, :]
        delta = inv_attractor(dx, cfg.attractor_alpha)
        delta = (jnp.mean if cfg.attractor_kind == "mean" else jnp.sum)(
            delta, axis=-2
        )
        new_centers = bin_centers + delta
        return new_centers, new_centers


class ConditionalLogBinomial(nn.Module):
    cfg: ZoeDepthConfig
    in_features: int
    bottleneck_factor: int = 2

    @nn.compact
    def __call__(self, main, condition):
        cfg = self.cfg
        bottleneck = (self.in_features + cfg.bin_embedding_dim) // self.bottleneck_factor
        h = jnp.concatenate([main, condition], axis=-1)
        h = jax.nn.gelu(_conv1x1(bottleneck, "mlp1")(h), approximate=False)
        h = jax.nn.softplus(_conv1x1(4, "mlp2")(h))
        prob = h[..., 0:2] + 1e-4
        p = prob[..., 0] / (prob[..., 0] + prob[..., 1])
        temp = h[..., 2:4] + 1e-4
        t = temp[..., 0] / (temp[..., 0] + temp[..., 1])
        t = (cfg.max_temp - cfg.min_temp) * t + cfg.min_temp
        # log-binomial over n_bins classes
        k = cfg.n_bins
        k_idx = jnp.arange(k, dtype=jnp.float32)
        k_m1 = jnp.asarray(float(k - 1))
        p = jnp.clip(p, 1e-4, 1.0)[..., None]
        omp = jnp.clip(1.0 - p, 1e-4, 1.0)
        y = (log_binom(k_m1, k_idx) + k_idx * jnp.log(p)
             + (k_m1 - k_idx) * jnp.log(omp))
        return jax.nn.softmax(y / t[..., None], axis=-1)


class ZoeDepth(nn.Module):
    cfg: ZoeDepthConfig = ZoeDepthConfig()

    @nn.compact
    def __call__(self, pixels):  # [B, H, W, 3] normalized -> metric depth
        cfg = self.cfg
        feats, (gh, gw) = BEiTBackbone(
            cfg.backbone, cfg.out_indices, name="backbone"
        )(pixels)

        # neck: project readout + reassemble + scratch + fusion
        maps = []
        for i, (feat, ch, factor) in enumerate(
            zip(feats, cfg.neck_hidden_sizes, cfg.reassemble_factors)
        ):
            cls_tok, tokens = feat[:, 0], feat[:, 1:]
            readout = jnp.broadcast_to(cls_tok[:, None, :], tokens.shape)
            t = jnp.concatenate([tokens, readout], axis=-1)
            t = nn.Dense(cfg.backbone.hidden_size, name=f"readout{i}")(t)
            t = jax.nn.gelu(t, approximate=False)
            fm = t.reshape(t.shape[0], gh, gw, t.shape[-1])
            maps.append(ReassembleLayer(ch, factor, name=f"reassemble{i}")(fm))
        scratch = [
            nn.Conv(cfg.fusion_hidden_size, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name=f"scratch{i}")(m)
            for i, m in enumerate(maps)
        ]
        bottleneck = scratch[-1]
        rev = scratch[::-1]
        fused = None
        fused_all = []
        for idx, stage in enumerate(rev):
            name = f"fusion{idx}"
            if fused is None:
                fused = stage
            else:
                res = stage
                if res.shape[1:3] != fused.shape[1:3]:
                    res = resize_bilinear(res, fused.shape[1:3],
                                          align_corners=False, channel_last=True)
                fused = fused + PreActResidual(cfg.fusion_hidden_size,
                                               name=f"{name}_res1")(res)
            fused = PreActResidual(cfg.fusion_hidden_size,
                                   name=f"{name}_res2")(fused)
            fused = resize_bilinear(fused,
                                    (fused.shape[1] * 2, fused.shape[2] * 2),
                                    align_corners=True, channel_last=True)
            fused = nn.Dense(cfg.fusion_hidden_size, name=f"{name}_proj")(fused)
            fused_all.append(fused)

        # relative-depth head (keeps its post-conv2 features)
        x = nn.Conv(cfg.fusion_hidden_size // 2, (3, 3),
                    padding=((1, 1), (1, 1)), name="rel_conv1")(fused_all[-1])
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                            align_corners=True, channel_last=True)
        x = nn.Conv(cfg.num_relative_features, (3, 3),
                    padding=((1, 1), (1, 1)), name="rel_conv2")(x)
        x = jax.nn.relu(x)
        rel_features = x
        relative_depth = jax.nn.relu(nn.Dense(1, name="rel_conv3")(x))[..., 0]

        # metric head
        b = _conv1x1(cfg.bottleneck_features, "metric_conv2")(bottleneck)
        seed_centers = SeedBinRegressor(cfg, name="seed_bin")(b)
        prev_bin = seed_centers  # softplus type: unnormed
        prev_emb = Projector(cfg.bin_embedding_dim, name="seed_proj")(b)
        bin_centers = prev_bin
        for i, feature in enumerate(fused_all):
            emb = Projector(cfg.bin_embedding_dim, name=f"proj{i}")(feature)
            prev_bin, bin_centers = AttractorLayerUnnormed(
                cfg, cfg.num_attractors[i], name=f"attractor{i}"
            )(emb, prev_bin, prev_emb)
            prev_emb = emb

        rel_cond = resize_bilinear(relative_depth[..., None],
                                   rel_features.shape[1:3],
                                   align_corners=True, channel_last=True)
        last = jnp.concatenate([rel_features, rel_cond], axis=-1)
        emb_up = resize_bilinear(prev_emb, last.shape[1:3],
                                 align_corners=True, channel_last=True)
        probs = ConditionalLogBinomial(
            cfg, cfg.num_relative_features + 1, name="clb"
        )(last, emb_up)
        centers_up = resize_bilinear(bin_centers, probs.shape[1:3],
                                     align_corners=True, channel_last=True)
        return jnp.sum(probs * centers_up, axis=-1)  # [B, H', W'] metric depth


def _convert_zoe_trunk(g: dict, cfg: ZoeDepthConfig) -> dict:
    """Shared trunk (backbone + neck + relative head) conversion."""
    p = cfg.backbone.patch_size
    hid = cfg.backbone.hidden_size

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

    def d1(prefix):  # 1x1 conv -> Dense
        return {"kernel": g[f"{prefix}.weight"][:, :, 0, 0].T,
                "bias": g[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": g[f"{prefix}.weight"], "bias": g[f"{prefix}.bias"]}

    pe_w = g["backbone.embeddings.patch_embeddings.projection.weight"]
    backbone = {
        "cls_token": g["backbone.embeddings.cls_token"],
        "patch_embed": {"proj": {
            "kernel": pe_w.transpose(2, 3, 1, 0).reshape(p * p * 3, hid),
            "bias": g["backbone.embeddings.patch_embeddings.projection.bias"],
        }},
    }
    for i in range(cfg.backbone.num_layers):
        pre = f"backbone.encoder.layer.{i}"
        backbone[f"block{i}"] = {
            "norm1": ln(f"{pre}.layernorm_before"),
            "norm2": ln(f"{pre}.layernorm_after"),
            "ls1": g[f"{pre}.lambda_1"],
            "ls2": g[f"{pre}.lambda_2"],
            "attn": {
                "q": lin(f"{pre}.attention.attention.query"),
                "k": lin(f"{pre}.attention.attention.key", bias=False),
                "v": lin(f"{pre}.attention.attention.value"),
                "proj": lin(f"{pre}.attention.output.dense"),
            },
            "rel_bias": {"table": g[
                f"{pre}.attention.attention.relative_position_bias."
                "relative_position_bias_table"
            ]},
            "mlp": {"fc1": lin(f"{pre}.intermediate.dense"),
                    "fc2": lin(f"{pre}.output.dense")},
        }

    params: dict = {"backbone": backbone}
    for i, factor in enumerate(cfg.reassemble_factors):
        params[f"readout{i}"] = lin(f"neck.reassemble_stage.readout_projects.{i}.0")
        pre = f"neck.reassemble_stage.layers.{i}"
        layer = {"projection": d1(f"{pre}.projection")}
        if factor > 1:
            w = g[f"{pre}.resize.weight"]
            layer["resize"] = {"kernel": w.transpose(0, 2, 3, 1),
                               "bias": g[f"{pre}.resize.bias"]}
        elif factor < 1:
            layer["resize"] = conv(f"{pre}.resize")
        params[f"reassemble{i}"] = layer
    for i in range(len(cfg.neck_hidden_sizes)):
        params[f"scratch{i}"] = conv(f"neck.convs.{i}", bias=False)
        pre = f"neck.fusion_stage.layers.{i}"
        params[f"fusion{i}_proj"] = d1(f"{pre}.projection")
        params[f"fusion{i}_res1"] = {
            "conv1": conv(f"{pre}.residual_layer1.convolution1"),
            "conv2": conv(f"{pre}.residual_layer1.convolution2"),
        }
        params[f"fusion{i}_res2"] = {
            "conv1": conv(f"{pre}.residual_layer2.convolution1"),
            "conv2": conv(f"{pre}.residual_layer2.convolution2"),
        }
    params["rel_conv1"] = conv("relative_head.conv1")
    params["rel_conv2"] = conv("relative_head.conv2")
    params["rel_conv3"] = d1("relative_head.conv3")
    return params


def convert_zoedepth(state: dict, cfg: ZoeDepthConfig) -> dict:
    """HF ZoeDepthForDepthEstimation (single-head) state dict -> flax params."""
    g = {k: np.asarray(v, np.float32) for k, v in state.items()}

    def d1(prefix):
        return {"kernel": g[f"{prefix}.weight"][:, :, 0, 0].T,
                "bias": g[f"{prefix}.bias"]}

    params = _convert_zoe_trunk(g, cfg)
    params["metric_conv2"] = d1("metric_head.conv2")
    params["seed_bin"] = {
        "conv1": d1("metric_head.seed_bin_regressor.conv1"),
        "conv2": d1("metric_head.seed_bin_regressor.conv2"),
    }
    params["seed_proj"] = {
        "conv1": d1("metric_head.seed_projector.conv1"),
        "conv2": d1("metric_head.seed_projector.conv2"),
    }
    for i in range(4):
        params[f"proj{i}"] = {
            "conv1": d1(f"metric_head.projectors.{i}.conv1"),
            "conv2": d1(f"metric_head.projectors.{i}.conv2"),
        }
        params[f"attractor{i}"] = {
            "conv1": d1(f"metric_head.attractors.{i}.conv1"),
            "conv2": d1(f"metric_head.attractors.{i}.conv2"),
        }
    params["clb"] = {
        "mlp1": d1("metric_head.conditional_log_binomial.mlp.0"),
        "mlp2": d1("metric_head.conditional_log_binomial.mlp.2"),
    }
    return params


# ---------------- two-domain (NYU+KITTI) router variant ----------------


@dataclasses.dataclass(frozen=True)
class ZoeDomain:
    name: str = "nyu"
    n_bins: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0


@dataclasses.dataclass(frozen=True)
class ZoeDepthNKConfig:
    base: ZoeDepthConfig = ZoeDepthConfig()
    domains: tuple = (ZoeDomain("nyu", 64, 1e-3, 10.0),
                      ZoeDomain("kitti", 64, 1e-3, 80.0))
    patch_transformer_hidden_size: int = 128
    patch_transformer_intermediate_size: int = 1024
    patch_transformer_heads: int = 4
    num_patch_transformer_layers: int = 4
    # HF's two-head constructor passes num_attractors[i] as n_bins, leaving
    # every attractor at its default of 16 points — preserved for checkpoint
    # compatibility (modeling_zoedepth.py:1026-1037)
    router_attractors: int = 16


ZOE_NK_TINY = ZoeDepthNKConfig(
    base=ZOE_TINY,
    domains=(ZoeDomain("nyu", 8, 1e-3, 10.0), ZoeDomain("kitti", 8, 1e-3, 80.0)),
    # HF hardcodes the classifier input at 128 and range(4) layers
    patch_transformer_hidden_size=128,
    patch_transformer_intermediate_size=32,
    patch_transformer_heads=2,
    num_patch_transformer_layers=4,
)


def _sinusoid_1d(seq: int, dim: int) -> jnp.ndarray:
    pos = jnp.arange(seq, dtype=jnp.float32)[:, None]
    idx = jnp.arange(0, dim, 2, dtype=jnp.float32)[None, :]
    div = jnp.exp(idx * (-jnp.log(10000.0) / dim))
    pe = pos * div
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=1)


class PatchTransformerLayer(nn.Module):
    cfg: ZoeDepthNKConfig

    @nn.compact
    def __call__(self, x):  # post-LN torch TransformerEncoderLayer style
        c = self.cfg.patch_transformer_hidden_size
        nh = self.cfg.patch_transformer_heads
        hd = c // nh
        q = nn.Dense(c, name="q")(x)
        k = nn.Dense(c, name="k")(x)
        v = nn.Dense(c, name="v")(x)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], nh, hd)

        att = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
        att = nn.Dense(c, name="out")(att.reshape(x.shape[0], x.shape[1], c))
        x = nn.LayerNorm(name="norm1")(x + att)
        h = nn.Dense(self.cfg.patch_transformer_intermediate_size,
                     name="linear1")(x)
        h = nn.Dense(c, name="linear2")(jax.nn.relu(h))
        return nn.LayerNorm(name="norm2")(x + h)


class ZoeDepthNK(nn.Module):
    """ZoeDepth with the two-domain router: a patch-transformer classifier
    on the bottleneck votes NYU vs KITTI per batch; the selected domain's
    bin machinery produces metric depth. Returns (depth, domain_logits)."""

    cfg: ZoeDepthNKConfig = ZoeDepthNKConfig()

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg.base
        nk = self.cfg
        trunk = _ZoeTrunk(cfg, name="trunk")
        bottleneck, fused_all, rel_features, relative_depth = trunk(pixels)

        x = _conv1x1(cfg.bottleneck_features, "metric_conv2")(bottleneck)

        # classifier: 1x1 embed, CLS pad, sinusoidal pos, 4 encoder layers
        emb = _conv1x1(nk.patch_transformer_hidden_size, "pt_embed")(x)
        b, hh, ww, c = emb.shape
        tokens = emb.reshape(b, hh * ww, c)
        tokens = jnp.pad(tokens, [(0, 0), (1, 0), (0, 0)])
        tokens = tokens + _sinusoid_1d(tokens.shape[1], c)[None]
        for i in range(nk.num_patch_transformer_layers):
            tokens = PatchTransformerLayer(nk, name=f"pt{i}")(tokens)
        cls = tokens[:, 0]
        h = jax.nn.relu(nn.Dense(c, name="clf1")(cls))
        domain_logits = nn.Dense(2, name="clf2")(h)
        vote = jax.nn.softmax(jnp.sum(domain_logits, axis=0))
        domain_idx = jnp.argmax(vote)

        seed_emb = Projector(cfg.bin_embedding_dim,
                             mlp_dim=cfg.bin_embedding_dim // 2,
                             name="seed_proj")(x)
        proj_embs = [
            Projector(cfg.bin_embedding_dim, mlp_dim=cfg.bin_embedding_dim // 2,
                      name=f"proj{i}")(f)
            for i, f in enumerate(fused_all)
        ]

        # flax params can't be created under lax.switch; the per-domain bin
        # heads are tiny 1x1-conv stacks, so run both and select by the vote
        def run_domain(dom: ZoeDomain):
            sb = SeedBinRegressorSmall(cfg, dom.n_bins, name=f"seed_{dom.name}")
            prev_bin = sb(x)
            prev_emb = seed_emb
            bin_centers = prev_bin
            for i, emb_i in enumerate(proj_embs):
                prev_bin, bin_centers = AttractorLayerUnnormed(
                    cfg, nk.router_attractors,
                    name=f"attr_{dom.name}_{i}",
                )(emb_i, prev_bin, prev_emb)
                prev_emb = emb_i
            centers_up = resize_bilinear(bin_centers, rel_features.shape[1:3],
                                         align_corners=True, channel_last=True)
            emb_up = resize_bilinear(prev_emb, rel_features.shape[1:3],
                                     align_corners=True, channel_last=True)
            probs = ConditionalLogBinomial(
                dataclasses.replace(cfg, n_bins=dom.n_bins),
                cfg.num_relative_features, bottleneck_factor=4,
                name=f"clb_{dom.name}",
            )(rel_features, emb_up)
            return jnp.sum(probs * centers_up, axis=-1)

        depths = [run_domain(d) for d in nk.domains]
        depth = jnp.where(domain_idx == 0, depths[0], depths[1])
        return depth, domain_logits


class SeedBinRegressorSmall(nn.Module):
    """Multi-head variant seed regressor (mlp_dim = bin_embedding_dim // 2)."""

    cfg: ZoeDepthConfig
    n_bins: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(
            _conv1x1(self.cfg.bin_embedding_dim // 2, "conv1")(x)
        )
        return jax.nn.softplus(_conv1x1(self.n_bins, "conv2")(h))


class _ZoeTrunk(nn.Module):
    """Backbone + neck + relative head shared by the single/multi variants."""

    cfg: ZoeDepthConfig

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg
        feats, (gh, gw) = BEiTBackbone(
            cfg.backbone, cfg.out_indices, name="backbone"
        )(pixels)
        maps = []
        for i, (feat, ch, factor) in enumerate(
            zip(feats, cfg.neck_hidden_sizes, cfg.reassemble_factors)
        ):
            cls_tok, tokens = feat[:, 0], feat[:, 1:]
            readout = jnp.broadcast_to(cls_tok[:, None, :], tokens.shape)
            t = jnp.concatenate([tokens, readout], axis=-1)
            t = nn.Dense(cfg.backbone.hidden_size, name=f"readout{i}")(t)
            t = jax.nn.gelu(t, approximate=False)
            fm = t.reshape(t.shape[0], gh, gw, t.shape[-1])
            maps.append(ReassembleLayer(ch, factor, name=f"reassemble{i}")(fm))
        scratch = [
            nn.Conv(cfg.fusion_hidden_size, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name=f"scratch{i}")(m)
            for i, m in enumerate(maps)
        ]
        bottleneck = scratch[-1]
        rev = scratch[::-1]
        fused = None
        fused_all = []
        for idx, stage in enumerate(rev):
            name = f"fusion{idx}"
            if fused is None:
                fused = stage
            else:
                res = stage
                if res.shape[1:3] != fused.shape[1:3]:
                    res = resize_bilinear(res, fused.shape[1:3],
                                          align_corners=False, channel_last=True)
                fused = fused + PreActResidual(cfg.fusion_hidden_size,
                                               name=f"{name}_res1")(res)
            fused = PreActResidual(cfg.fusion_hidden_size,
                                   name=f"{name}_res2")(fused)
            fused = resize_bilinear(fused,
                                    (fused.shape[1] * 2, fused.shape[2] * 2),
                                    align_corners=True, channel_last=True)
            fused = nn.Dense(cfg.fusion_hidden_size, name=f"{name}_proj")(fused)
            fused_all.append(fused)

        x = nn.Conv(cfg.fusion_hidden_size // 2, (3, 3),
                    padding=((1, 1), (1, 1)), name="rel_conv1")(fused_all[-1])
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                            align_corners=True, channel_last=True)
        x = nn.Conv(cfg.num_relative_features, (3, 3),
                    padding=((1, 1), (1, 1)), name="rel_conv2")(x)
        x = jax.nn.relu(x)
        rel_features = x
        relative_depth = jax.nn.relu(nn.Dense(1, name="rel_conv3")(x))[..., 0]
        return bottleneck, fused_all, rel_features, relative_depth


def convert_zoedepth_nk(state: dict, cfg: ZoeDepthNKConfig) -> dict:
    """HF ZoeDepthForDepthEstimation (two-domain NYU+KITTI) -> flax params."""
    g = {k: np.asarray(v, np.float32) for k, v in state.items()}
    base = cfg.base

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

    def d1(prefix):
        return {"kernel": g[f"{prefix}.weight"][:, :, 0, 0].T,
                "bias": g[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": g[f"{prefix}.weight"], "bias": g[f"{prefix}.bias"]}

    trunk = _convert_zoe_trunk(g, base)
    params: dict = {"trunk": trunk,
                    "metric_conv2": d1("metric_head.conv2"),
                    "pt_embed": d1("metric_head.patch_transformer.embedding_convPxP"),
                    "clf1": lin("metric_head.mlp_classifier.linear1"),
                    "clf2": lin("metric_head.mlp_classifier.linear2"),
                    "seed_proj": {
                        "conv1": d1("metric_head.seed_projector.conv1"),
                        "conv2": d1("metric_head.seed_projector.conv2"),
                    }}
    for i in range(cfg.num_patch_transformer_layers):
        pre = f"metric_head.patch_transformer.transformer_encoder.{i}"
        params[f"pt{i}"] = {
            "q": lin(f"{pre}.self_attn.query"),
            "k": lin(f"{pre}.self_attn.key"),
            "v": lin(f"{pre}.self_attn.value"),
            "out": lin(f"{pre}.self_attn.out_proj"),
            "linear1": lin(f"{pre}.linear1"),
            "linear2": lin(f"{pre}.linear2"),
            "norm1": ln(f"{pre}.norm1"),
            "norm2": ln(f"{pre}.norm2"),
        }
    for i in range(4):
        params[f"proj{i}"] = {
            "conv1": d1(f"metric_head.projectors.{i}.conv1"),
            "conv2": d1(f"metric_head.projectors.{i}.conv2"),
        }
    for dom in cfg.domains:
        params[f"seed_{dom.name}"] = {
            "conv1": d1(f"metric_head.seed_bin_regressors.{dom.name}.conv1"),
            "conv2": d1(f"metric_head.seed_bin_regressors.{dom.name}.conv2"),
        }
        for i in range(4):
            params[f"attr_{dom.name}_{i}"] = {
                "conv1": d1(f"metric_head.attractors.{dom.name}.{i}.conv1"),
                "conv2": d1(f"metric_head.attractors.{dom.name}.{i}.conv2"),
            }
        params[f"clb_{dom.name}"] = {
            "mlp1": d1(f"metric_head.conditional_log_binomial.{dom.name}.mlp.0"),
            "mlp2": d1(f"metric_head.conditional_log_binomial.{dom.name}.mlp.2"),
        }
    return params
