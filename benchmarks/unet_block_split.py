"""cfg5 per-block UNet attribution (VERDICT r3 item 7, second half).

marigold_split.py established the stage ledger (encode 26.5 / step 406.2 x4
/ decode 606.4 ms) and that the UNet step runs at 13.3% MXU. This probe
answers WHERE inside the step the time goes: it times each block type of
the SD2 UNet (ResnetBlock, SpatialTransformer, down/upsample convs) at its
exact production shape ([5, 96, 96, *] latents, bf16, ensemble folded),
multiplies by the block count in the full net, and cross-checks the sum
against the measured whole-step time.

Block census for UNet2DConfig() (block_out_channels 320/640/1280/1280,
layers_per_block 2, attn on levels 0-2 + mid):
  level 0 (96^2, 320):  res x2 down + x3 up, attn x2 down + x3 up
  level 1 (48^2, 640):  res x2 + x3,          attn x2 + x3
  level 2 (24^2, 1280): res x2 + x3,          attn x2 + x3
  level 3 (12^2, 1280): res x2 + x3 (no attn)
  mid     (12^2, 1280): res x2, attn x1
  down/upsample convs x3 each, conv_in/conv_out
Up-path resnets see concatenated skips (2x channels in).

Run: nohup python benchmarks/unet_block_split.py > /tmp/unet_split.json &
"""

from __future__ import annotations
# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

BF16_PEAK = 197e12


def timed_ms(fn, state, iters=8):
    state, cs = fn(state)
    float(np.asarray(cs).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        state, cs = fn(state)
    float(np.asarray(cs).sum())
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visiondepth3d_tpu.depth.diffusion.unet2d import (
        ResnetBlock, SpatialTransformer, UNet2DConfig, _conv)

    cfg = UNet2DConfig()
    E = 5  # folded ensemble
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    temb = jnp.asarray(rng.standard_normal((E, 1280)), jnp.bfloat16)
    ctx = jnp.zeros((E, 77, cfg.cross_attention_dim), jnp.bfloat16)
    out = {}

    def bench(mod, shape, *extra, label):
        x0 = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        # host-side init: mod.init would compile + run the init graph on
        # the accelerator through the relay (the documented relay-killer
        # for big modules — see verify skill notes)
        from visiondepth3d_tpu.depth.model import init_random_model_args

        specs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in
                      (x0, *extra))
        params = init_random_model_args(mod, specs)
        params = jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16)
                              if p.dtype == np.float32 else p, params)
        params = jax.device_put(params)

        @jax.jit
        def run(carry):
            x, acc = carry
            y = mod.apply({"params": params}, x, *extra)
            acc = acc + jnp.sum(y.astype(jnp.float32))
            # carry-chain: y feeds the checksum, x perturbed so no CSE
            return (x + (acc % 2).astype(x.dtype) * 1e-6, acc), acc

        ms = timed_ms(run, (x0, jnp.float32(0)))
        out[label] = round(ms, 2)
        print(f"  {label:34s} {ms:8.2f} ms", flush=True)
        return ms

    # spatial sizes / channels per level at 96^2 latents
    levels = [(96, 320, 5), (48, 640, 10), (24, 1280, 20), (12, 1280, 20)]

    ledger = 0.0
    for li, (s, ch, heads) in enumerate(levels):
        r = bench(ResnetBlock(ch, cfg.norm_groups), (E, s, s, ch), temb,
                  label=f"res_L{li}_{s}x{s}x{ch}")
        # up-path resnets: concat skip doubles the input channels
        r2 = bench(ResnetBlock(ch, cfg.norm_groups), (E, s, s, 2 * ch), temb,
                   label=f"res_L{li}_concat_{s}x{s}x{2*ch}")
        n_res_plain, n_res_concat = 2, 3
        if li == 3:
            n_res_plain += 2  # mid resnets share the 12^2x1280 shape
        ledger += n_res_plain * r + n_res_concat * r2
        if cfg.with_attn[li] or li == 3:
            a = bench(SpatialTransformer(heads, ch // heads, cfg.norm_groups),
                      (E, s, s, ch), ctx, label=f"attn_L{li}_{s*s}tok_{ch}")
            n_attn = 5 if cfg.with_attn[li] else 1  # mid-only for L3
            ledger += n_attn * a
    # down/upsample convs + conv_in/out (small; lump via one measurement each)
    class _C(nn.Module):
        ch: int
        stride: int = 1
        @nn.compact
        def __call__(self, x):
            return _conv(self.ch, "c", stride=self.stride)(x)

    d0 = bench(_C(320, 2), (E, 96, 96, 320), label="downsample_96->48")
    d1 = bench(_C(640, 2), (E, 48, 48, 640), label="downsample_48->24")
    d2 = bench(_C(1280, 2), (E, 24, 24, 1280), label="downsample_24->12")
    u0 = bench(_C(1280), (E, 24, 24, 1280), label="upsample_conv_24")
    u1 = bench(_C(640), (E, 48, 48, 640), label="upsample_conv_48")
    u2 = bench(_C(320), (E, 96, 96, 320), label="upsample_conv_96")
    ci = bench(_C(320), (E, 96, 96, 8), label="conv_in")
    ledger += d0 + d1 + d2 + u0 + u1 + u2 + ci

    out["sum_blocks_ms"] = round(ledger, 1)
    out["measured_step_ms"] = 406.2  # marigold_split.py, same geometry
    print(json.dumps({"metric": "cfg5 UNet per-block attribution", **out},
                     indent=1), flush=True)


if __name__ == "__main__":
    main()
