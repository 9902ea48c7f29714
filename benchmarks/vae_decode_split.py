"""VAE decode split: where do cfg5's 55.6 ms/image go?

After the flash fix the bandwidth-bound VAE decode is cfg5's largest
slice (~35%). The decoder at 768² runs: mid block at 96² (2 resnets + a
SINGLE-HEAD attention over 9216 tokens whose naive einsum materializes a
[9216, 9216] f32 logits tensor = 340 MB), then 4 up-levels at
96/192/384/768 px. Pieces (bf16, B=1):

  decode_full     — whole Decoder (the shipped graph)
  mid_attn        — AttnBlock as shipped (einsum + full softmax)
  mid_attn_dpa    — jax.nn.dot_product_attention (XLA fused path)
  mid_attn_flash  — multi_head_attention dispatcher (tuned flash,
                    1 head x 512 — exercises d=512 block support)
  up_level_N      — resnet triplet + upsample conv at each resolution

Run: nohup python benchmarks/vae_decode_split.py > /tmp/vae_split.out 2>&1 &
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visiondepth3d_tpu.depth.diffusion.vae import (
        AttnBlock,
        Decoder,
        ResnetBlock,
        VAEConfig,
    )

    cfg = VAEConfig()
    rng = np.random.default_rng(0)

    def host_params(mod, *specs):
        shapes = jax.eval_shape(
            lambda r, *a: mod.init(r, *a), jax.random.PRNGKey(0),
            *specs)["params"]
        h = np.random.default_rng(1)
        return jax.device_put(jax.tree.map(
            lambda s: jnp.asarray(h.normal(0, 0.02, s.shape), jnp.bfloat16),
            shapes))

    def timed(label, mod_apply, args, inner=4, iters=3):
        @jax.jit
        def run(acc0, *a):
            def body(_, acc):
                xin = a[0] + acc.astype(a[0].dtype) * 1e-30
                y = mod_apply(xin, *a[1:])
                return acc + jnp.sum(
                    y.reshape(-1)[:64].astype(jnp.float32)) * 1e-30

            return lax.fori_loop(0, inner, body, acc0)

        acc = run(jnp.float32(0), *args)
        _ = float(acc)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = run(acc, *args)
        _ = float(acc)
        ms = (time.perf_counter() - t0) / (iters * inner) * 1000
        print(json.dumps({"piece": label, "ms": round(ms, 2)}), flush=True)
        return ms

    # full decoder at product latents
    z = jnp.asarray(rng.standard_normal((1, 96, 96, cfg.latent_channels)),
                    jnp.bfloat16)
    dec = Decoder(cfg)
    dp = host_params(dec, jax.ShapeDtypeStruct(z.shape, z.dtype))
    timed("decode_full", lambda zz: dec.apply({"params": dp}, zz), (z,),
          inner=2)

    # mid attention variants at [1, 96, 96, 512]
    c = cfg.block_out_channels[-1]
    x = jnp.asarray(rng.standard_normal((1, 96, 96, c)), jnp.bfloat16)
    attn = AttnBlock(cfg.norm_groups)
    ap = host_params(attn, jax.ShapeDtypeStruct(x.shape, x.dtype))
    timed("mid_attn_shipped", lambda xx: attn.apply({"params": ap}, xx),
          (x,))

    qkv = jnp.asarray(rng.standard_normal((1, 9216, 1, c)), jnp.bfloat16)

    def dpa(q):
        return jax.nn.dot_product_attention(q, q, q)

    timed("mid_attn_dpa_xla", dpa, (qkv,))

    from visiondepth3d_tpu.ops.attention import multi_head_attention

    def flash(q):
        return multi_head_attention(q, q, q)

    try:
        timed("mid_attn_flash_d512", flash, (qkv,))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"piece": "mid_attn_flash_d512",
                          "error": str(e)[:120]}), flush=True)

    # up levels
    chans = list(reversed(cfg.block_out_channels))
    s = 96
    for i, ch in enumerate(chans):
        xin_c = chans[max(i - 1, 0)] if i else chans[0]

        class UpLevel(nn.Module):
            @nn.compact
            def __call__(self, h):
                for j in range(cfg.layers_per_block + 1):
                    h = ResnetBlock(ch, cfg.norm_groups, name=f"r{j}")(h)
                if i < len(chans) - 1:
                    b, hh, ww, cc = h.shape
                    h = jax.image.resize(h, (b, hh * 2, ww * 2, cc),
                                         "nearest")
                    h = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                                name="up")(h)
                return h

        lvl = UpLevel()
        xl = jnp.asarray(rng.standard_normal((1, s, s, xin_c)), jnp.bfloat16)
        lp = host_params(lvl, jax.ShapeDtypeStruct(xl.shape, xl.dtype))
        timed(f"up_level_{i}_{s}px_{xin_c}to{ch}",
              lambda hh, lvl=lvl, lp=lp: lvl.apply({"params": lp}, hh),
              (xl,))
        s *= 2


if __name__ == "__main__":
    main()
