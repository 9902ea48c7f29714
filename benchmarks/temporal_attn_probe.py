"""Tiny-N temporal attention probe (cfg6 follow-up to st_unet_split).

The ST-UNet's temporal attention runs at [pixels~9216, T=24, C] — N=24
tokens, huge batch. st_unet_split measured the full temporal
TransformerLayer at 27.9 ms (L0) — vs a ~0.04 ms MXU floor and ~1.3 ms
HBM floor. Variants at [9216, 24, 5 heads, 64] bf16:

  layer      — full TransformerLayer (2 self-attns + GEGLU FF, current)
  attn_bare  — one multi_head_attention call (the dispatched XLA path)
  attn_einsum— manual einsum + bf16 softmax (no fused-attention call)
  attn_packed— P=4 batch items packed into one 96-token sequence with a
               block-diagonal mask: output tiles fill 96/128 MXU rows
               instead of 24/128, logits cost 4x (they are tiny)
  ff_only    — the GEGLU FF alone (post-r5-fix 4c width)

Run: nohup python benchmarks/temporal_attn_probe.py > /tmp/tattn.out 2>&1 &
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import math
import time

import numpy as np

B, T, H, D = 9216, 24, 5, 64
C = H * D


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
    qkv = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)

    def timed(label, fn, args, inner=8, iters=3):
        @jax.jit
        def run(acc0, *a):
            def body(_, acc):
                xin = a[0] + acc.astype(a[0].dtype) * 1e-30
                y = fn(xin, *a[1:])
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
        print(json.dumps({"variant": label, "ms": round(ms, 2)}), flush=True)
        return ms

    # full layer (the shipped temporal path)
    from visiondepth3d_tpu.depth.diffusion.unet_st import TransformerLayer

    layer = TransformerLayer(H, D)
    lshapes = jax.eval_shape(
        lambda r, a: layer.init(r, a, None), jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, T, C), jnp.bfloat16))["params"]
    hostr = np.random.default_rng(2)
    lp = jax.device_put(jax.tree.map(
        lambda s: jnp.asarray(hostr.normal(0, 0.02, s.shape), jnp.bfloat16),
        lshapes))
    timed("layer_full", lambda xx: layer.apply({"params": lp}, xx, None),
          (x,), inner=4)

    # bare attention through the dispatcher
    from visiondepth3d_tpu.ops.attention import multi_head_attention

    timed("attn_bare_dispatcher",
          lambda qq: multi_head_attention(qq, qq, qq), (qkv,))

    # manual einsum attention, bf16 softmax
    sm = 1.0 / math.sqrt(D)

    def einsum_attn(q):
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, q,
                            preferred_element_type=jnp.float32) * sm
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m).astype(jnp.bfloat16)
        den = jnp.sum(p.astype(jnp.float32), -1, keepdims=True)
        o = jnp.einsum("bhnm,bmhd->bnhd", p, q)
        return (o.astype(jnp.float32) / den.transpose(0, 2, 1, 3)).astype(
            jnp.bfloat16)

    timed("attn_einsum_bf16sm", einsum_attn, (qkv,))

    # packed block-diagonal: P batch items -> one (P*T)-token sequence
    P = 4
    mask_np = np.full((P * T, P * T), -1e9, np.float32)
    for i in range(P):
        mask_np[i * T:(i + 1) * T, i * T:(i + 1) * T] = 0.0
    mask = jnp.asarray(mask_np)

    def packed_attn(q):  # [B, T, H, D]
        qp = q.reshape(B // P, P * T, H, D)
        logits = jnp.einsum("bnhd,bmhd->bhnm", qp, qp,
                            preferred_element_type=jnp.float32) * sm
        logits = logits + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m).astype(jnp.bfloat16)
        den = jnp.sum(p.astype(jnp.float32), -1, keepdims=True)
        o = jnp.einsum("bhnm,bmhd->bnhd", p, qp)
        o = (o.astype(jnp.float32) / den.transpose(0, 2, 1, 3))
        return o.astype(jnp.bfloat16).reshape(B, T, H, D)

    timed("attn_packed_blockdiag_P4", packed_attn, (qkv,))

    # FF alone (post-fix 4c width)
    from visiondepth3d_tpu.depth.diffusion.unet2d import GEGLU

    class FF(nn.Module):
        @nn.compact
        def __call__(self, xx):
            h = GEGLU(C * 4, name="g")(nn.LayerNorm(name="n")(xx))
            return nn.Dense(C, name="o")(h)

    ff = FF()
    fp = jax.eval_shape(lambda r, a: ff.init(r, a), jax.random.PRNGKey(0),
                        jax.ShapeDtypeStruct((1, T, C), jnp.bfloat16))["params"]
    host = np.random.default_rng(1)
    fp = jax.device_put(jax.tree.map(
        lambda s: jnp.asarray(host.normal(0, 0.02, s.shape), jnp.bfloat16),
        fp))
    timed("ff_only_4c", lambda xx: ff.apply({"params": fp}, xx), (x,),
          inner=4)


if __name__ == "__main__":
    main()
