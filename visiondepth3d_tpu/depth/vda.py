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
