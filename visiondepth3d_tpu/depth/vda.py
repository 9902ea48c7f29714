"""Video Depth Anything (VDA): temporally consistent feed-forward video depth.

The reference runs VDA as an ONNX graph with a fixed [1, T, 3, H, W] window
(render_depth.py:892-900 detects the rank-5 input and pads/truncates to T).
Architecture: a frozen Depth Anything (DINOv2+DPT) backbone whose DPT head
gains temporal attention blocks — attention over the T frames at each
spatial position of the deepest feature maps — so depth flickering is
suppressed across the window.

Native design here: reuse depth/dinov2.py + depth/dpt.py and insert
``TemporalAttentionBlock`` after each reassemble stage. Windows overlap like
DepthCrafter's (stride T - overlap) with linear cross-fade stitching, and a
scale/shift alignment between consecutive windows (VDA's inference recipe)
computed in closed form on the overlap.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .configs import DPTConfig, ViTConfig
from .dinov2 import Dinov2Backbone
from .dpt import DPTNeckHead


@dataclasses.dataclass(frozen=True)
class VDAConfig:
    base: DPTConfig = DPTConfig()
    window: int = 32
    overlap: int = 8
    temporal_heads: int = 4


VDA_TINY = VDAConfig(
    base=DPTConfig(
        backbone=ViTConfig(hidden_size=32, num_layers=4, num_heads=2,
                           patch_size=14, image_size=70),
        out_indices=(1, 2, 3, 4),
        neck_hidden_sizes=(16, 24, 32, 40),
        fusion_hidden_size=16,
        head_hidden_size=8,
    ),
    window=4,
    overlap=2,
    temporal_heads=2,
)


class TemporalAttentionBlock(nn.Module):
    """Self-attention over the T window frames at each token position."""

    heads: int

    @nn.compact
    def __call__(self, x, t: int):  # x: [B*T, N, C]
        bt, n, c = x.shape
        b = bt // t
        y = x.reshape(b, t, n, c).transpose(0, 2, 1, 3).reshape(b * n, t, c)
        h = nn.LayerNorm(name="norm")(y)
        hd = max(c // self.heads, 1)
        q = nn.Dense(self.heads * hd, name="q")(h)
        k = nn.Dense(self.heads * hd, name="k")(h)
        v = nn.Dense(self.heads * hd, name="v")(h)

        def split(z):
            return z.reshape(z.shape[0], t, self.heads, hd)

        att = jax.nn.dot_product_attention(split(q), split(k), split(v))
        att = att.reshape(b * n, t, self.heads * hd)
        y = y + nn.Dense(c, name="proj")(att)
        return y.reshape(b, n, t, c).transpose(0, 2, 1, 3).reshape(bt, n, c)


class VideoDepthAnything(nn.Module):
    cfg: VDAConfig = VDAConfig()

    @nn.compact
    def __call__(self, frames):  # [B, T, H, W, 3] normalized
        cfg = self.cfg
        b, t, h, w, _ = frames.shape
        feats, grid = Dinov2Backbone(
            cfg.base.backbone, cfg.base.out_indices, name="backbone"
        )(frames.reshape(b * t, h, w, 3))
        # temporal mixing on each tapped stage's tokens (cls excluded)
        mixed = []
        for i, f in enumerate(feats):
            cls_tok, tokens = f[:, :1], f[:, 1:]
            tokens = TemporalAttentionBlock(
                cfg.temporal_heads, name=f"temporal{i}"
            )(tokens, t)
            mixed.append(jnp.concatenate([cls_tok, tokens], axis=1))
        depth = DPTNeckHead(cfg.base, name="neck_head")(mixed, grid)
        return depth.reshape(b, t, depth.shape[-2], depth.shape[-1])


@dataclasses.dataclass
class VDAPredictor:
    """Windowed video inference with overlap scale/shift alignment."""

    cfg: VDAConfig
    params: dict

    def __post_init__(self):
        self.model = VideoDepthAnything(self.cfg)
        # device-resident once; host params would re-transfer per window
        self.params = jax.device_put(self.params)

        @jax.jit
        def fwd(params, window):  # [1, T, S, S, 3] normalized
            return self.model.apply({"params": params}, window)

        self._fwd = fwd

    def __call__(self, frames01: np.ndarray) -> np.ndarray:
        """[T, H, W, 3] in [0, 1] -> [T, h, w] raw depth, temporally aligned."""
        from .model import IMAGENET_MEAN, IMAGENET_STD

        x = (jnp.asarray(frames01) - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(
            IMAGENET_STD
        )
        t = x.shape[0]
        win, ov = self.cfg.window, self.cfg.overlap
        if t <= win:
            pad = win - t
            xw = jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)]) if pad else x
            return np.asarray(self._fwd(self.params, xw[None])[0][:t])

        stride = win - ov
        starts = list(range(0, t - win, stride)) + [t - win]
        out = np.zeros((t,) + self._probe_hw(x), np.float32)
        weight = np.zeros((t, 1, 1), np.float32)
        prev = None
        for s in starts:
            d = np.asarray(self._fwd(self.params, x[None, s : s + win])[0])
            if prev is not None:
                # scale/shift-align to the previous window on the overlap
                ov_n = prev[0] + win - s
                ov_n = max(1, min(ov_n, win))
                a, b_ = _align_scale_shift(d[:ov_n], prev[1][-ov_n:])
                d = d * a + b_
            ramp = np.ones(win, np.float32)
            if s > 0:
                k = min(ov, win)
                ramp[:k] = np.linspace(0.0, 1.0, k, endpoint=False) + 1e-3
            out[s : s + win] += d * ramp[:, None, None]
            weight[s : s + win] += ramp[:, None, None]
            prev = (s, d)
        return out / np.maximum(weight, 1e-8)

    def _probe_hw(self, x):
        return (x.shape[1], x.shape[2])


def _align_scale_shift(pred: np.ndarray, ref: np.ndarray):
    """Closed-form least-squares (a, b) with pred*a + b ~= ref."""
    p, r = pred.reshape(-1), ref.reshape(-1)
    n = p.size
    sp, sr = p.sum(), r.sum()
    spp, spr = (p * p).sum(), (p * r).sum()
    det = n * spp - sp * sp
    if abs(det) < 1e-9:
        return 1.0, 0.0
    a = (n * spr - sp * sr) / det
    b = (sr - a * sp) / n
    return float(a), float(b)


def convert_vda(source, cfg: VDAConfig) -> dict:
    """Upstream Video-Depth-Anything checkpoint -> our params tree.

    ``source``: a state dict (torch tensors or numpy), a .pth/.safetensors
    path, or the ONNX export's initializer table (torch exports keep the
    parameter names). Upstream naming (depth-anything/Video-Depth-Anything):
    ``pretrained.*`` = original-DINOv2 backbone (fused qkv), ``head.*`` =
    DPT head (projects/resize_layers/scratch/refinenets) which maps 1:1
    onto our backbone + neck_head trees.

    Temporal modules: upstream places AnimateDiff-style motion modules on
    the head's feature maps; our TPU design attends over backbone tokens
    (vda.py:54). Where an upstream attention block's shapes line up with
    ours it is mapped; otherwise the temporal blocks are initialized to
    IDENTITY (zero output projection), which makes the converted model
    exactly the per-frame Depth Anything defined by the converted spatial
    weights — valid depth, no temporal refinement — rather than noise.
    """
    if isinstance(source, (str,)) or hasattr(source, "__fspath__"):
        p = str(source)
        if p.endswith(".onnx"):
            from ..utils.onnx_reader import read_onnx_initializers

            source = read_onnx_initializers(p)
        elif p.endswith(".safetensors"):
            from .convert import load_safetensors_state

            source = load_safetensors_state(p)
        else:
            import torch

            raw = torch.load(p, map_location="cpu", weights_only=True)
            source = raw.get("model", raw) if isinstance(raw, dict) else raw
    g = {k: np.asarray(v, dtype=np.float32) for k, v in source.items()}

    bb_cfg = cfg.base.backbone
    hid = bb_cfg.hidden_size
    patch = bb_cfg.patch_size

    def lin(prefix):
        return {"kernel": g[f"{prefix}.weight"].T, "bias": g[f"{prefix}.bias"]}

    def conv(prefix, bias=True):
        out = {"kernel": g[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = g[f"{prefix}.bias"]
        return out

    def dense_from_1x1(prefix):
        return {"kernel": g[f"{prefix}.weight"][:, :, 0, 0].T,
                "bias": g[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": g[f"{prefix}.weight"], "bias": g[f"{prefix}.bias"]}

    pe_w = g["pretrained.patch_embed.proj.weight"]  # [C, 3, p, p]
    backbone = {
        "cls_token": g["pretrained.cls_token"],
        "pos_embed": g["pretrained.pos_embed"],
        "patch_embed": {"proj": {
            "kernel": pe_w.transpose(2, 3, 1, 0).reshape(patch * patch * 3, hid),
            "bias": g["pretrained.patch_embed.proj.bias"],
        }},
        "norm": ln("pretrained.norm"),
    }
    for i in range(bb_cfg.num_layers):
        pre = f"pretrained.blocks.{i}"
        block = {
            "norm1": ln(f"{pre}.norm1"),
            "norm2": ln(f"{pre}.norm2"),
            "attn": {
                "qkv": {"kernel": g[f"{pre}.attn.qkv.weight"].T,
                        "bias": g[f"{pre}.attn.qkv.bias"]},
                "proj": lin(f"{pre}.attn.proj"),
            },
            "mlp": {"fc1": lin(f"{pre}.mlp.fc1"), "fc2": lin(f"{pre}.mlp.fc2")},
        }
        if bb_cfg.layerscale:
            block["ls1"] = g[f"{pre}.ls1.gamma"]
            block["ls2"] = g[f"{pre}.ls2.gamma"]
        backbone[f"block{i}"] = block

    dpt = cfg.base
    nh: dict = {}
    for i, factor in enumerate(dpt.reassemble_factors):
        layer = {"projection": dense_from_1x1(f"head.projects.{i}")}
        if factor > 1:
            w = g[f"head.resize_layers.{i}.weight"]  # ConvTranspose (I,O,f,f)
            layer["resize"] = {"kernel": w.transpose(0, 2, 3, 1),
                               "bias": g[f"head.resize_layers.{i}.bias"]}
        elif factor < 1:
            layer["resize"] = conv(f"head.resize_layers.{i}")
        nh[f"reassemble{i}"] = layer
    for i in range(len(dpt.neck_hidden_sizes)):
        nh[f"scratch{i}"] = conv(f"head.scratch.layer{i + 1}_rn", bias=False)
    n_fuse = len(dpt.neck_hidden_sizes)
    for idx in range(n_fuse):  # fusion0 = deepest = refinenet{n}
        pre = f"head.scratch.refinenet{n_fuse - idx}"
        fusion = {
            "projection": dense_from_1x1(f"{pre}.out_conv"),
            "res2": {"conv1": conv(f"{pre}.resConfUnit2.conv1"),
                     "conv2": conv(f"{pre}.resConfUnit2.conv2")},
        }
        if idx > 0:  # the deepest fusion has no skip; its resConfUnit1 is
            # present-but-unused in upstream checkpoints
            fusion["res1"] = {"conv1": conv(f"{pre}.resConfUnit1.conv1"),
                              "conv2": conv(f"{pre}.resConfUnit1.conv2")}
        nh[f"fusion{idx}"] = fusion
    nh["head_conv1"] = conv("head.scratch.output_conv1")
    nh["head_conv2"] = conv("head.scratch.output_conv2.0")
    nh["head_conv3"] = dense_from_1x1("head.scratch.output_conv2.2")

    params = {"backbone": backbone, "neck_head": nh}

    heads = cfg.temporal_heads
    hd = max(hid // heads, 1)
    rng = np.random.default_rng(0)
    for i in range(len(dpt.out_indices)):
        mapped = None
        for cand in (
            f"head.motion_modules.{i}.temporal_transformer.transformer_blocks.0.attention_blocks.0",
            f"head.motion_modules.{i}.attention_blocks.0",
        ):
            if (f"{cand}.to_q.weight" in g
                    and g[f"{cand}.to_q.weight"].shape[1] == hid):
                mapped = {
                    "norm": ln(cand.rsplit(".", 1)[0] + ".norms.0"),
                    "q": lin(f"{cand}.to_q"),
                    "k": lin(f"{cand}.to_k"),
                    "v": lin(f"{cand}.to_v"),
                    "proj": lin(f"{cand}.to_out.0"),
                }
                break
        if mapped is None:  # identity temporal block (see docstring)
            mapped = {
                "norm": {"scale": np.ones(hid, np.float32),
                         "bias": np.zeros(hid, np.float32)},
                "q": {"kernel": rng.normal(0, hid ** -0.5, (hid, heads * hd))
                      .astype(np.float32),
                      "bias": np.zeros(heads * hd, np.float32)},
                "k": {"kernel": rng.normal(0, hid ** -0.5, (hid, heads * hd))
                      .astype(np.float32),
                      "bias": np.zeros(heads * hd, np.float32)},
                "v": {"kernel": rng.normal(0, hid ** -0.5, (hid, heads * hd))
                      .astype(np.float32),
                      "bias": np.zeros(heads * hd, np.float32)},
                "proj": {"kernel": np.zeros((heads * hd, hid), np.float32),
                         "bias": np.zeros(hid, np.float32)},
            }
        params[f"temporal{i}"] = mapped
    return params
