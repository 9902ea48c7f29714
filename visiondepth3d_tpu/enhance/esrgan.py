"""Real-ESRGAN (RRDBNet) super-resolution in Flax.

The reference runs Real-ESRGAN ONNX sessions with optional pre-downscale,
overlap tiling and output blend modes (merged_pipeline.py:240-284). Same
architecture here, NHWC and jit-compiled: conv_first -> nb x RRDB (3 dense
blocks of 5 convs, residual scaling 0.2) -> trunk conv -> 2x nearest-neighbor
upsample convs -> HR convs. x2 checkpoints pixel-unshuffle the input
(standard Real-ESRGAN trick) so the trunk always runs at 1/scale resolution.

Weight conversion from official Real-ESRGAN checkpoints (state dict names
conv_first / body.N.rdbM.convK / conv_body / conv_up1 / conv_up2 / conv_hr /
conv_last) is in ``convert_rrdbnet``; parity is tested against an
independent torch transcription of RRDBNet in tests/test_enhance.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


class Conv3x3(nn.Module):
    """3x3 SAME conv with optionally fused activation; drop-in for
    nn.Conv(features, (3,3), padding=((1,1),(1,1))) — identical param tree.

    On TPU, stride-1 3x3 convs at RRDBNet's 32-64 channels run far below
    the bf16 MXU peak under XLA's lowering at video-frame shapes: the
    Pallas kernel (ops/pallas_conv.py) measures 1.4x faster at
    [2,1080,1920,64] (4.63 vs 6.48 ms/frame). XLA WINS at batched
    medium-spatial shapes ([32,296,296,*] and below — see
    benchmarks/RESULTS.md), so the Pallas path is gated to the wide-row
    regime where it was measured ahead; XLA otherwise (and always on
    CPU / interpret-mode tests).
    """

    features: int
    act: str | None = None  # None | "relu" | "lrelu" (slope 0.2)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        from ..ops import pallas_conv
        from ..ops.pallas_conv import pick_conv_block_rows

        use_pallas = (
            jax.default_backend() == "tpu"
            and not pallas_conv.FORCE_XLA
            and x.shape[2] >= 768
            and pick_conv_block_rows(x.shape[1], x.shape[2], c,
                                     self.features,
                                     jnp.dtype(x.dtype).itemsize) >= 4
        )
        if use_pallas:
            from ..ops.pallas_conv import conv3x3_pallas

            y = conv3x3_pallas(x, kernel.astype(x.dtype),
                               None if bias is None else bias.astype(x.dtype),
                               act=self.act)
            return y
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        if self.act == "relu":
            y = jax.nn.relu(y)
        elif self.act == "lrelu":
            y = jax.nn.leaky_relu(y, 0.2)
        return y


class ResidualDenseBlock(nn.Module):
    nf: int
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        def conv(n, out, act="lrelu"):
            return Conv3x3(out, act=act, name=n)

        x1 = conv("conv1", self.gc)(x)
        x2 = conv("conv2", self.gc)(jnp.concatenate([x, x1], -1))
        x3 = conv("conv3", self.gc)(jnp.concatenate([x, x1, x2], -1))
        x4 = conv("conv4", self.gc)(jnp.concatenate([x, x1, x2, x3], -1))
        x5 = conv("conv5", self.nf, act=None)(
            jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x + 0.2 * x5


class RRDB(nn.Module):
    nf: int
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        h = ResidualDenseBlock(self.nf, self.gc, name="rdb1")(x)
        h = ResidualDenseBlock(self.nf, self.gc, name="rdb2")(h)
        h = ResidualDenseBlock(self.nf, self.gc, name="rdb3")(h)
        return x + 0.2 * h


def _nearest_up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _pixel_unshuffle(x, r):
    """NHWC pixel-unshuffle with torch/basicsr channel order: output
    channel index = c * r^2 + i * r + j (c-major). Matching the exact
    order matters for CONVERTED x2/x1 checkpoints, whose conv_first was
    trained against torch's ``pixel_unshuffle`` layout."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h', w', c, i, j
    return x.reshape(b, h // r, w // r, c * r * r)


class RRDBNet(nn.Module):
    """RRDB super-resolution net, covering BOTH released lineages:

    - Real-ESRGAN style (``unshuffle=True``, ``n_up=2``): always two
      nearest-up2 convs; scale<4 pixel-unshuffles the input so the trunk
      runs at 1/4 output resolution (RealESRGAN_x4/x2plus, anime-6B).
    - KAIR/BSRGAN style (``unshuffle=False``): no input unshuffle; the
      output scale is 2**n_up (BSRGANx2 -> n_up=1, BSRGANx4 -> n_up=2).

    ``scale`` is always the OUTPUT scale; use ``convert_esrgan`` /
    ``ESRGANConfig`` to derive a consistent (scale, n_up, unshuffle)
    triple from a checkpoint.
    """

    nf: int = 64
    nb: int = 23
    gc: int = 32
    scale: int = 4
    n_up: int = 2
    unshuffle: bool = True

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] in [0, 1] -> [B, H*s, W*s, 3]
        if self.unshuffle:
            if self.scale == 2:
                x = _pixel_unshuffle(x, 2)
            elif self.scale == 1:
                x = _pixel_unshuffle(x, 4)

        def conv(n, out, act=None):
            return Conv3x3(out, act=act, name=n)

        feat = conv("conv_first", self.nf)(x)
        trunk = feat
        for i in range(self.nb):
            trunk = RRDB(self.nf, self.gc, name=f"body{i}")(trunk)
        feat = feat + conv("conv_body", self.nf)(trunk)
        for i in range(self.n_up):
            feat = conv(f"conv_up{i + 1}", self.nf,
                        act="lrelu")(_nearest_up2(feat))
        feat = conv("conv_hr", self.nf, act="lrelu")(feat)
        return conv("conv_last", 3)(feat)


def apply_rrdbnet_staged(
    model: RRDBNet,
    params: dict,
    x: jnp.ndarray,  # [B, H, W, 3]
    tail_tile_hw: tuple[int, int],
    halo: int = 2,
) -> jnp.ndarray:
    """RRDBNet with the x4 upsample tail tiled: trunk runs whole-frame at
    input resolution, then conv_up1/up2/hr/last run per spatial tile with a
    ``halo``-pixel zero context, and the 4x-scaled halo is cropped off.

    EXACT parity with ``model.apply``. Two subtleties make it exact:
    (1) the tail's receptive field is 2 trunk-res px (up1 1px at 2x +
    up2/hr/last 1px each at 4x), so ``halo >= 2`` of real neighbor
    context reproduces every interior pixel; (2) at TRUE image borders a
    zero halo would NOT work — conv_up1(0) = bias != 0 propagates into
    deeper convs where the whole-frame run sees SAME zero padding — so
    tile windows are CLAMPED inside the image (edge tiles carry their
    halo on the inner side only) and the convs' own zero padding lands
    exactly at the real border. What it buys: the 4x tail's activations
    at [B, 4H, 4W, nf] never exist whole — a 1080p -> 4K upscale that
    OOMs as one graph (measured 32.7 GB vs 15.75 HBM, benchmarks/
    esrgan_split.py) fits. Tile sizes must divide the trunk output size
    and satisfy th + 2*halo <= H, tw + 2*halo <= W.

    Reference analog: the ESRGAN overlap-pad tiler
    (merged_pipeline.py:269-284) — the reference tiles the WHOLE network
    per tile (paying the 23-RRDB trunk on every overlap); here only the
    cheap tail is tiled and the trunk overlap cost is zero.
    """
    from jax import lax

    assert model.n_up == 2, "staged tail assumes the 2-up (4x-factor) tail"
    ps = dict(params)
    trunk_p = {k: v for k, v in ps.items()
               if k.startswith(("conv_first", "body", "conv_body"))}
    tail_p = {k: v for k, v in ps.items()
              if k.startswith(("conv_up", "conv_hr", "conv_last"))}

    trunk = _RRDBTrunk(model.nf, model.nb, model.gc, model.scale,
                       model.unshuffle)
    tail = _RRDBTail(model.nf, model.n_up)
    feat = trunk.apply({"params": trunk_p}, x)

    b, h, w, nf = feat.shape
    th, tw = tail_tile_hw
    assert h % th == 0 and w % tw == 0, (h, w, th, tw)
    assert th + 2 * halo <= h and tw + 2 * halo <= w, (h, w, th, tw, halo)

    def win(i, t, size):
        """Clamped window start + in-window crop offset (both static)."""
        s = min(max(i * t - halo, 0), size - t - 2 * halo)
        return s, i * t - s

    spans = [
        (win(ti, th, h), win(tj, tw, w))
        for ti in range(h // th) for tj in range(w // tw)
    ]
    tiles = [
        lax.dynamic_slice(feat, (0, sy, sx, 0),
                          (b, th + 2 * halo, tw + 2 * halo, nf))
        for (sy, _), (sx, _) in spans
    ]
    stack = jnp.stack(tiles)  # [nt, B, th+2h, tw+2h, nf]
    ups = lax.map(lambda t: tail.apply({"params": tail_p}, t), stack)
    crops = [
        ups[i][:, 4 * cy : 4 * (cy + th), 4 * cx : 4 * (cx + tw)]
        for i, ((_, cy), (_, cx)) in enumerate(spans)
    ]
    rows = [
        jnp.concatenate(crops[ti * (w // tw) : (ti + 1) * (w // tw)], axis=2)
        for ti in range(h // th)
    ]
    return jnp.concatenate(rows, axis=1)


class _RRDBTrunk(nn.Module):
    """conv_first -> nb x RRDB -> conv_body (+skip); param names match
    RRDBNet so one converted checkpoint serves both paths."""

    nf: int
    nb: int
    gc: int
    scale: int
    unshuffle: bool = True

    @nn.compact
    def __call__(self, x):
        if self.unshuffle:
            if self.scale == 2:
                x = _pixel_unshuffle(x, 2)
            elif self.scale == 1:
                x = _pixel_unshuffle(x, 4)

        def conv(n, out):
            return Conv3x3(out, name=n)

        feat = conv("conv_first", self.nf)(x)
        trunk = feat
        for i in range(self.nb):
            trunk = RRDB(self.nf, self.gc, name=f"body{i}")(trunk)
        return feat + conv("conv_body", self.nf)(trunk)


class _RRDBTail(nn.Module):
    nf: int
    n_up: int = 2

    @nn.compact
    def __call__(self, feat):
        def conv(n, out, act=None):
            return Conv3x3(out, act=act, name=n)

        for i in range(self.n_up):
            feat = conv(f"conv_up{i + 1}", self.nf,
                        act="lrelu")(_nearest_up2(feat))
        feat = conv("conv_hr", self.nf, act="lrelu")(feat)
        return conv("conv_last", 3)(feat)


@dataclasses.dataclass(frozen=True)
class ESRGANConfig:
    """Inferred RRDBNet geometry; ``scale`` is the OUTPUT scale."""

    nf: int = 64
    nb: int = 23
    gc: int = 32
    scale: int = 4
    n_up: int = 2
    unshuffle: bool = True

    def build(self) -> RRDBNet:
        return RRDBNet(nf=self.nf, nb=self.nb, gc=self.gc, scale=self.scale,
                       n_up=self.n_up, unshuffle=self.unshuffle)


# The reference's shipped upscaler dropdown (VisionDepth3D.py:1094-1100):
# five fp16 ONNX exports under weights/. ``scale`` pins the ambiguity a
# .pth checkpoint can't resolve by names alone (BSRGAN state dicts carry
# an unused upconv2 at sf=2); ONNX exports prune unused initializers so
# inference alone suffices there.
ESRGAN_CATALOG = {
    "RealESR_Gx4": {"file": "RealESR_Gx4_fp16.onnx", "scale": 4},
    "RealESRGAN_x4": {"file": "RealESRGANx4_fp16.onnx", "scale": 4},
    "RealESR_Animex4": {"file": "RealESR_Animex4_fp16.onnx", "scale": 4},
    "BSRGANx2": {"file": "BSRGANx2_fp16.onnx", "scale": 2},
    "BSRGANx4": {"file": "BSRGANx4_fp16.onnx", "scale": 4},
}


def _canon_esrgan_keymap(keys) -> tuple[dict, str]:
    """Map canonical (Real-ESRGAN-scheme) names -> original checkpoint
    names. Returns (keymap, style) with style in {"realesrgan", "kair"}.

    Handles the two naming lineages in the wild (and in the reference's
    shipped ONNX exports, whose initializers keep the torch names):
    - Real-ESRGAN: conv_first / body.N.rdbM.convK / conv_body /
      conv_up1,2 / conv_hr / conv_last
    - KAIR/BSRGAN: conv_first / RRDB_trunk.N.RDBM.convK / trunk_conv /
      upconv1,2 / HRconv / conv_last
    A leading "model." (or "module.") wrapper prefix is stripped. Only a
    key MAP is built (no dict rebuild) so RecordingState-style coverage
    checks in the real-weights harness still see every actual read.
    """
    keys = list(keys)
    strip = 0
    for pre in ("model.", "module."):
        if keys and all(k.startswith(pre) for k in keys):
            strip = len(pre)
            break
    stripped = [(k[strip:], k) for k in keys]
    style = "kair" if any(
        s.startswith(("RRDB_trunk.", "trunk_conv.")) for s, _ in stripped
    ) else "realesrgan"
    keymap = {}
    for s, orig in stripped:
        if style == "kair":
            if s.startswith("RRDB_trunk."):
                parts = s.split(".")
                s = ".".join(["body", parts[1], parts[2].lower(),
                              *parts[3:]])
            elif s.startswith("trunk_conv."):
                s = "conv_body." + s.split(".", 1)[1]
            elif s.startswith("upconv1."):
                s = "conv_up1." + s.split(".", 1)[1]
            elif s.startswith("upconv2."):
                s = "conv_up2." + s.split(".", 1)[1]
            elif s.startswith("HRconv."):
                s = "conv_hr." + s.split(".", 1)[1]
        keymap[s] = orig
    return keymap, style


def infer_esrgan_config(state: dict, keymap: dict, style: str,
                        scale: int | None = None) -> ESRGANConfig:
    """Derive (nf, nb, gc, scale, n_up, unshuffle) from the checkpoint.
    ``scale`` overrides the inference where names alone are ambiguous
    (KAIR .pth files: upconv2 exists but is unused at sf=2)."""
    w_first = np.asarray(state[keymap["conv_first.weight"]])
    nf, in_c = int(w_first.shape[0]), int(w_first.shape[1])
    gc = int(np.asarray(state[keymap["body.0.rdb1.conv1.weight"]]).shape[0])
    nb = 1 + max(int(k.split(".")[1]) for k in keymap
                 if k.startswith("body."))
    if style == "realesrgan":
        inferred = {3: 4, 12: 2, 48: 1}[in_c]
        if scale is not None and scale != inferred:
            raise ValueError(
                f"checkpoint pixel-unshuffles to scale {inferred}, "
                f"but scale={scale} was requested")
        return ESRGANConfig(nf=nf, nb=nb, gc=gc, scale=inferred,
                            n_up=2, unshuffle=True)
    # KAIR/BSRGAN: output scale = 2**n_up, no unshuffle. The x2 network
    # applies only upconv1 (network_rrdbnet.py gates upconv2 on sf==4);
    # ONNX exports prune the unused upconv2 so presence tells the truth.
    if scale is None:
        scale = 4 if "conv_up2.weight" in keymap else 2
    if scale not in (2, 4):
        raise ValueError(f"BSRGAN-style checkpoints are x2/x4, got {scale}")
    return ESRGANConfig(nf=nf, nb=nb, gc=gc, scale=scale,
                        n_up=scale.bit_length() - 1, unshuffle=False)


def convert_esrgan(state: dict,
                   scale: int | None = None) -> tuple[dict, ESRGANConfig]:
    """Any RRDBNet-family checkpoint (torch state dict, safetensors table,
    or the name-preserving ONNX export's initializer table — the format
    the reference actually ships, VisionDepth3D.py:1094-1100) ->
    (flax params, inferred ESRGANConfig). fp16 weights are upcast."""
    keymap, style = _canon_esrgan_keymap(state.keys())
    cfg = infer_esrgan_config(state, keymap, style, scale)

    def conv(prefix):
        return {
            "kernel": np.asarray(state[keymap[f"{prefix}.weight"]],
                                 np.float32).transpose(2, 3, 1, 0),
            "bias": np.asarray(state[keymap[f"{prefix}.bias"]], np.float32),
        }

    params = {
        "conv_first": conv("conv_first"),
        "conv_body": conv("conv_body"),
        "conv_hr": conv("conv_hr"),
        "conv_last": conv("conv_last"),
    }
    for i in range(cfg.n_up):
        params[f"conv_up{i + 1}"] = conv(f"conv_up{i + 1}")
    for i in range(cfg.nb):
        blk = {}
        for r in (1, 2, 3):
            blk[f"rdb{r}"] = {
                f"conv{k}": conv(f"body.{i}.rdb{r}.conv{k}")
                for k in range(1, 6)
            }
        params[f"body{i}"] = blk
    return params, cfg


def load_esrgan_weights(path, scale: int | None = None
                        ) -> tuple[dict, ESRGANConfig]:
    """Load ESRGAN/BSRGAN weights from .pth (torch), .safetensors, or
    .onnx (initializer table — mirrors enhance/rife.py:load_rife_weights,
    the converter the reference's ONNX-only artifacts need)."""
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
        if isinstance(raw, dict):
            for key in ("params_ema", "params", "state_dict"):
                if key in raw and isinstance(raw[key], dict):
                    raw = raw[key]
                    break
        state = {k: v.numpy() for k, v in raw.items()}
    return convert_esrgan(state, scale=scale)


def convert_rrdbnet(state: dict, nb: int = 23) -> dict:
    """Back-compat wrapper: Real-ESRGAN torch state dict -> flax params
    (geometry is inferred; ``nb`` is validated against the checkpoint)."""
    params, cfg = convert_esrgan(state)
    if cfg.nb != nb:
        raise ValueError(f"checkpoint has nb={cfg.nb}, caller expected {nb}")
    return params


def esrgan_apply(params: dict, img, scale: int = 4,
                 cfg: ESRGANConfig | None = None) -> jnp.ndarray:
    """One-shot upscale of a single [H, W, 3] float01 image (smoke tests /
    verify-checkpoints). ``cfg`` defaults to the standard RRDBNet at the
    given scale; pass the config from convert_esrgan for exact geometry."""
    model = (cfg or ESRGANConfig(scale=scale)).build()
    return model.apply({"params": params}, jnp.asarray(img)[None])[0]


def blend_images(original: jnp.ndarray, upscaled: jnp.ndarray,
                 mode: str = "OFF") -> jnp.ndarray:
    """AI-blend modes (merged_pipeline.py:233-238): alpha of the upscaled
    result vs the plain-resized original: OFF/LOW/MEDIUM/HIGH."""
    alpha = {"OFF": 1.0, "LOW": 0.85, "MEDIUM": 0.5, "HIGH": 0.25}[mode]
    return upscaled * alpha + original * (1.0 - alpha)
