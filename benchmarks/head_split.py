"""DPT neck/head internal split (DA-V2-S, bf16, T=32).

depth_split.py: backbone 1.85 ms/frame, full model 3.49 -> neck/head
~1.64 ms despite ~4x fewer FLOPs than the ViT. This probe times the head
cumulatively to find where it goes:

  reassemble — 4x (1x1 proj + per-stage resize conv/upsample)
  +scratch   — 4x 3x3 conv to fusion width (64)
  +fusion    — 4 FeatureFusionLayers (2 PreActResiduals + bilinear x2 + 1x1)
  +head      — conv 64->32 @296^2, resize 518^2, conv 32->32, 1x1 -> depth

Run: nohup python benchmarks/head_split.py > /tmp/head_split.log 2>&1 &
"""

# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from visiondepth3d_tpu.depth import DA_V2_SMALL, init_random
from visiondepth3d_tpu.depth.dpt import DPTNeckHead

T, K = 32, 16
cfg = DA_V2_SMALL
GH = GW = 518 // cfg.backbone.patch_size  # 37
HID = cfg.backbone.hidden_size

head = DPTNeckHead(cfg)
full = init_random(cfg, size=518)
params = jax.device_put(
    jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16), full["neck_head"])
)

rng = np.random.default_rng(0)
feats = [
    jax.device_put(rng.standard_normal((T, GH * GW + 1, HID))
                   .astype(np.float32) * 0.1)
    for _ in cfg.out_indices
]


def run_head(p, fs, stop):
    """Re-drive DPTNeckHead's stages from its param tree, stopping early."""
    from visiondepth3d_tpu.depth.dpt import (
        FeatureFusionLayer, ReassembleLayer,
    )
    from flax import linen as nn
    from visiondepth3d_tpu.ops.resize import resize_bilinear

    maps = []
    for i, (feat, ch, factor) in enumerate(
        zip(fs, cfg.neck_hidden_sizes, cfg.reassemble_factors)
    ):
        tokens = feat[:, 1:]
        fm = tokens.reshape(tokens.shape[0], GH, GW, tokens.shape[-1])
        fm = ReassembleLayer(ch, factor).apply(
            {"params": p[f"reassemble{i}"]}, fm)
        maps.append(fm)
    if stop == "reassemble":
        return maps
    feats2 = [
        nn.Conv(cfg.fusion_hidden_size, (3, 3), padding=((1, 1), (1, 1)),
                use_bias=False).apply({"params": p[f"scratch{i}"]}, m)
        for i, m in enumerate(maps)
    ]
    if stop == "scratch":
        return feats2
    rev = feats2[::-1]
    fused = None
    for idx, hs in enumerate(rev):
        size = rev[idx + 1].shape[1:3] if idx != len(rev) - 1 else None
        layer = FeatureFusionLayer(cfg.fusion_hidden_size)
        fused = (layer.apply({"params": p[f"fusion{idx}"]}, hs, None, size)
                 if fused is None else
                 layer.apply({"params": p[f"fusion{idx}"]}, fused, hs, size))
    if stop == "fusion":
        return [fused]
    x = nn.Conv(cfg.fusion_hidden_size // 2, (3, 3),
                padding=((1, 1), (1, 1))).apply(
        {"params": p["head_conv1"]}, fused)
    ps = cfg.backbone.patch_size
    x = resize_bilinear(x, (GH * ps, GW * ps), align_corners=True,
                        channel_last=True)
    x = nn.Conv(cfg.head_hidden_size, (3, 3),
                padding=((1, 1), (1, 1))).apply({"params": p["head_conv2"]}, x)
    x = jax.nn.relu(x)
    x = nn.Dense(1).apply({"params": p["head_conv3"]}, x)
    return [jax.nn.relu(x)]


def stage_fn(stop):
    @jax.jit
    def fn(carry, p, fs):
        def it(_, acc):
            fsi = [(f + acc * 1e-30).astype(jnp.bfloat16) for f in fs]
            outs = run_head(p, fsi, stop)
            return acc + sum(jnp.sum(o.astype(jnp.float32))
                             for o in outs) * 1e-30
        return lax.fori_loop(0, K, it, carry)
    return fn


def timed(name, fn, args, iters=3):
    carry = fn(jnp.float32(0), *args)
    float(carry)  # host transfer = true sync on axon
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry, *args)
    float(carry)
    dt = (time.perf_counter() - t0) / (iters * K * T)
    print(json.dumps({"stage": name, "ms_per_frame": round(dt * 1e3, 3)}),
          flush=True)


if __name__ == "__main__":
    # sanity: full re-drive == module forward
    ref = head.apply({"params": params},
                     [f.astype(jnp.bfloat16) for f in feats], (GH, GW))
    got = run_head(params, [f.astype(jnp.bfloat16) for f in feats], "full")[0]
    np.testing.assert_allclose(np.asarray(got[..., 0] * cfg.max_depth,
                                          dtype=np.float32),
                               np.asarray(ref, dtype=np.float32),
                               atol=1e-2)
    print(json.dumps({"stage": "sanity", "ok": True}), flush=True)
    for stop in ("reassemble", "scratch", "fusion", "full"):
        timed(stop, stage_fn(stop), (params, feats))
