"""RIFE-style frame interpolation (IFNet) in Flax.

The reference runs a RIFE ONNX export: input concat(frame1, frame2)/255 as
[1, 6, H, W], output the middle frame (merged_pipeline.py:196-219), batched
for 4x by repeating pairs. This is the same IFNet natively — a
coarse-to-fine pyramid of flow blocks, each refining bidirectional flow +
an occlusion mask at increasing resolution, with backward warping between
levels — jit-compiled NHWC and fused into the render graph instead of a
separate ONNX session.

The block layout mirrors practical-RIFE v4.x so real checkpoints convert
weight-for-weight (see ``convert_rife``):
  block0 input  = [img0, img1, timestep]                      (7 ch)
  blockN input  = [warped0, warped1, timestep, mask, flow/s]  (12 ch)
  per block: conv0 = 2x stride-2 conv+PReLU; convblock = n_res residual
  convs; lastconv = ConvTranspose(4*tail) + PixelShuffle(2) -> 4 flow +
  1 mask (+ ignored feature channels) at the block's input resolution.
Two residual-conv variants exist across v4.x releases; both are supported
and auto-detected by the converter (``res_prelu``):
  False: leaky_relu(conv(x) * beta + x, 0.2)   (v4.6-style raw conv)
  True:  x + prelu(conv(x)) * beta             (conv() helper style)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.flow_warp import flow_warp_batch
from ..ops.resize import resize_bilinear

_DEFAULT_CS = (192, 128, 96, 64)
_DEFAULT_SCALES = (8, 4, 2, 1)


def _resize(x, hw):
    return resize_bilinear(x, hw, align_corners=False, channel_last=True)


class PReLU(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (self.channels,))
        return jnp.where(x >= 0, x, a * x)


class ConvPReLU(nn.Module):
    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        if self.stride == 1:
            # Pallas path for the stride-1 trunk convs (ops/pallas_conv.py;
            # same param tree as nn.Conv, see esrgan.Conv3x3)
            from .esrgan import Conv3x3

            x = Conv3x3(self.out, name="conv")(x)
        else:
            x = nn.Conv(self.out, (3, 3),
                        strides=(self.stride, self.stride),
                        padding=((1, 1), (1, 1)), name="conv")(x)
        return PReLU(self.out, name="prelu")(x)


class ResConv(nn.Module):
    """One residual conv of the IFBlock trunk; both v4.x flavors."""

    c: int
    res_prelu: bool = False

    @nn.compact
    def __call__(self, x):
        beta = self.param("beta", nn.initializers.ones, (self.c,))
        if self.res_prelu:
            h = ConvPReLU(self.c, name="conv")(x)
            return x + h * beta
        from .esrgan import Conv3x3

        h = Conv3x3(self.c, name="conv")(x)
        return nn.leaky_relu(h * beta + x, 0.2)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch PixelShuffle in NHWC: [B,H,W,C*r*r] -> [B,H*r,W*r,C] with the
    torch channel order (c*r*r index = c_out*(r*r) + i*r + j)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


class IFBlock(nn.Module):
    c: int
    n_res: int = 8
    tail_out: int = 5
    res_prelu: bool = False

    @nn.compact
    def __call__(self, x):
        """x: [B, h, w, C_in] -> [B, h, w, tail_out] raw deltas
        (4 unscaled flow + 1 mask logit + any extra feature channels)."""
        y = ConvPReLU(self.c // 2, stride=2, name="down0")(x)
        y = ConvPReLU(self.c, stride=2, name="down1")(y)
        for i in range(self.n_res):
            y = ResConv(self.c, self.res_prelu, name=f"res{i}")(y)
        # torch ConvTranspose2d(k=4, s=2, p=1) == flax padding k-1-p = 2
        y = nn.ConvTranspose(4 * self.tail_out, (4, 4), strides=(2, 2),
                             padding=((2, 2), (2, 2)), transpose_kernel=True,
                             name="lastconv")(y)
        return pixel_shuffle(y, 2)


class IFNet(nn.Module):
    """Coarse-to-fine interpolation network (practical-RIFE v4.x layout).

    ``cs`` gives the per-block trunk width; if omitted it derives from
    ``c`` (legacy: c // (i+1)) or the v4.x defaults truncated to
    ``len(scales)`` finest levels.
    """

    c: int | None = None
    scales: tuple = _DEFAULT_SCALES
    cs: tuple | None = None
    n_res: int = 8
    tail_out: int = 5
    res_prelu: bool = False

    def _widths(self):
        if self.cs is not None:
            return self.cs
        if self.c is not None:
            return tuple(max(16, self.c // (i + 1))
                         for i in range(len(self.scales)))
        return _DEFAULT_CS[-len(self.scales):]

    @nn.compact
    def __call__(self, img0, img1, timestep=0.5):
        """img0/img1: [B, H, W, 3] in [0, 1] -> in-between frame at
        ``timestep`` in (0, 1), [B, H, W, 3]."""
        b, h, w, _ = img0.shape
        cs = self._widths()
        flow = None
        mask = None
        warped0, warped1 = img0, img1

        for i, s in enumerate(self.scales):
            hs, ws = h // s, w // s
            t = jnp.full((b, hs, ws, 1), timestep, img0.dtype)
            if flow is None:
                inp = jnp.concatenate(
                    [_resize(img0, (hs, ws)), _resize(img1, (hs, ws)), t],
                    axis=-1,
                )
            else:
                inp = jnp.concatenate(
                    [
                        _resize(warped0, (hs, ws)),
                        _resize(warped1, (hs, ws)),
                        t,
                        _resize(mask, (hs, ws)),
                        _resize(flow, (hs, ws)) / s,
                    ],
                    axis=-1,
                )
            y = IFBlock(cs[i], self.n_res, self.tail_out, self.res_prelu,
                        name=f"block{i}")(inp)
            y = _resize(y, (h, w))
            dflow = y[..., :4] * float(s)
            flow = dflow if flow is None else flow + dflow
            mask = y[..., 4:5]  # overwritten per level, as upstream
            warped0 = flow_warp_batch(img0, flow[..., 0:2])
            warped1 = flow_warp_batch(img1, flow[..., 2:4])

        m = jax.nn.sigmoid(mask)
        out = warped0 * m + warped1 * (1.0 - m)
        return jnp.clip(out, 0.0, 1.0)


def interpolate_pairs(params, model: IFNet, frames01: jnp.ndarray,
                      multiplier: int = 2) -> jnp.ndarray:
    """[T, H, W, 3] -> [ (T-1)*mult + 1, H, W, 3 ] with mult-1 in-betweens
    per original pair (run_rife batching analog, merged_pipeline.py:204-219)."""
    img0 = frames01[:-1]
    img1 = frames01[1:]
    mids = []
    for k in range(1, multiplier):
        tstep = k / multiplier
        mids.append(model.apply({"params": params}, img0, img1, tstep))
    # interleave: f0, mids(f0,f1)..., f1, mids(f1,f2)..., ..., fT
    t = frames01.shape[0]
    seq = []
    for i in range(t - 1):
        seq.append(frames01[i])
        for m in mids:
            seq.append(m[i])
    seq.append(frames01[-1])
    return jnp.stack(seq)


def rife_apply(params_and_cfg, img0, img1, t: float = 0.5) -> jnp.ndarray:
    """One-shot middle frame between two [H, W, 3] float01 images (smoke
    tests / verify-checkpoints). Accepts the (params, IFNetConfig) pair
    load_rife_weights returns, or a bare params tree (default config)."""
    if isinstance(params_and_cfg, tuple):
        params, cfg = params_and_cfg
        model = cfg.build()
    else:
        params, model = params_and_cfg, IFNet()
    return model.apply({"params": params},
                       jnp.asarray(img0)[None], jnp.asarray(img1)[None], t)[0]


# --------------------------------------------------------------------------
# Weight conversion (torch state dicts and ONNX exports)
# --------------------------------------------------------------------------

def _strip_prefix(state: dict) -> dict:
    out = {}
    for k, v in state.items():
        for pre in ("module.", "flownet."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = np.asarray(v)
    return out


def infer_rife_config(state: dict) -> "IFNetConfig":
    """Derive the IFNet geometry from a practical-RIFE state dict."""
    state = _strip_prefix(state)
    blocks = sorted(
        {int(k.split(".")[0][5:]) for k in state
         if k.startswith("block") and not k.startswith("block_tea")}
    )
    if not blocks or blocks != list(range(len(blocks))):
        raise ValueError(
            f"unrecognized RIFE checkpoint: block keys {blocks!r}"
        )
    n = len(blocks)
    res_prelu = any(".conv.0.weight" in k for k in state)
    cs = []
    n_res = 0
    tail_out = None
    for i in blocks:
        w = state[f"block{i}.conv0.1.0.weight"]  # [c, c/2, 3, 3]
        cs.append(w.shape[0])
        ks = [int(k.split(".")[2]) for k in state
              if k.startswith(f"block{i}.convblock.")]
        n_res = max(ks) + 1
        lw = state[f"block{i}.lastconv.0.weight"]  # [c, 4*tail, 4, 4]
        tail_out = lw.shape[1] // 4
    # 4 blocks -> (8, 4, 2, 1) per v4.x; 3 blocks -> (4, 2, 1)
    scales = ((8, 4, 2, 1) if n == 4
              else tuple(2 ** (n - 1 - j) for j in range(n)))
    return IFNetConfig(cs=tuple(cs), scales=scales, n_res=n_res,
                       tail_out=tail_out, res_prelu=res_prelu)


@dataclasses.dataclass(frozen=True)
class IFNetConfig:
    cs: tuple = _DEFAULT_CS
    scales: tuple = _DEFAULT_SCALES
    n_res: int = 8
    tail_out: int = 5
    res_prelu: bool = False

    def build(self) -> IFNet:
        return IFNet(cs=self.cs, scales=self.scales, n_res=self.n_res,
                     tail_out=self.tail_out, res_prelu=self.res_prelu)


def convert_rife(state: dict) -> tuple[dict, IFNetConfig]:
    """practical-RIFE IFNet state dict (torch tensors or numpy; also the
    name-preserving ONNX export's initializer table) -> (flax params,
    IFNetConfig). Teacher/distillation blocks (block_tea) are ignored."""
    state = _strip_prefix(state)
    cfg = infer_rife_config(state)

    def conv(prefix):
        return {
            "kernel": state[f"{prefix}.weight"].transpose(2, 3, 1, 0)
            .astype(np.float32),
            "bias": state[f"{prefix}.bias"].astype(np.float32),
        }

    def prelu(prefix):
        return {"alpha": state[f"{prefix}.weight"].reshape(-1)
                .astype(np.float32)}

    params: dict = {}
    for i in range(len(cfg.cs)):
        b = f"block{i}"
        blk = {
            "down0": {"conv": conv(f"{b}.conv0.0.0"),
                      "prelu": prelu(f"{b}.conv0.0.1")},
            "down1": {"conv": conv(f"{b}.conv0.1.0"),
                      "prelu": prelu(f"{b}.conv0.1.1")},
        }
        for k in range(cfg.n_res):
            r = f"{b}.convblock.{k}"
            beta = state[f"{r}.beta"].reshape(-1).astype(np.float32)
            if cfg.res_prelu:
                blk[f"res{k}"] = {
                    "conv": {"conv": conv(f"{r}.conv.0"),
                             "prelu": prelu(f"{r}.conv.1")},
                    "beta": beta,
                }
            else:
                blk[f"res{k}"] = {"conv": conv(f"{r}.conv"), "beta": beta}
        # torch ConvTranspose2d weight (in, out, kh, kw) -> flax
        # transpose_kernel=True layout (kh, kw, out, in)
        lw = state[f"{b}.lastconv.0.weight"]
        blk["lastconv"] = {
            "kernel": lw.transpose(2, 3, 1, 0).astype(np.float32),
            "bias": state[f"{b}.lastconv.0.bias"].astype(np.float32),
        }
        params[b] = blk
    return params, cfg


def load_rife_weights(path, scales=None) -> tuple[dict, IFNetConfig]:
    """Load RIFE weights from .pth/.pkl (torch), .safetensors, or .onnx.

    ``scales`` is accepted for API symmetry but the geometry is always
    inferred from the checkpoint itself.
    """
    p = str(path)
    if p.endswith(".onnx"):
        from ..utils.onnx_reader import read_onnx_initializers

        state = read_onnx_initializers(p)
    elif p.endswith(".safetensors"):
        from ..depth.convert import load_safetensors_state

        state = load_safetensors_state(p)
    else:
        import torch

        raw = torch.load(p, map_location="cpu", weights_only=True)
        if hasattr(raw, "state_dict"):
            raw = raw.state_dict()
        state = {k: v.numpy() for k, v in raw.items()}
    return convert_rife(state)
