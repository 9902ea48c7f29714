"""Splash-attention probe at the depth model's production shape.

The ViT-S attention ([T=32, H=6, N=1370, D=64] bf16) costs ~2 ms/frame of
the depth stage's 3.7 via the bf16-softmax path, which still materializes
[B, H, N, N] logits in HBM. The splash kernel (newer than the flash_attention
used by the r1/r2 probes) streams K/V through VMEM with a mask pre-compiled
into its grid. Pad 1370 -> 1408 (11 x 128) and mask the 38 pad tokens with a
NumpyMask so parity holds.

Run: nohup python benchmarks/attn_probe2.py > /tmp/attn_probe2.log 2>&1 &
"""

# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json
import math
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from visiondepth3d_tpu.ops.attention import _bf16_softmax_attention

B, H, N, D = 32, 6, 1370, 64
K_ITERS = 24


def timed(name, fn, args, launches=3):
    @jax.jit
    def loop(*a):
        def body(_, acc):
            q = a[0] + (acc * 1e-30).astype(a[0].dtype)
            out = fn(q, *a[1:])
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, K_ITERS, body, jnp.float32(0))

    float(loop(*args))
    t0 = time.perf_counter()
    for _ in range(launches):
        r = loop(*args)
    float(r)
    dt = (time.perf_counter() - t0) / (launches * K_ITERS)
    print(json.dumps({"impl": name, "us_per_call": round(dt * 1e6, 1),
                      "us_per_frame_layer": round(dt * 1e6 / B, 2)}),
          flush=True)


def make_splash(n_pad, block_q, block_kv):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sak,
        splash_attention_mask as sam,
    )

    valid = np.zeros((n_pad, n_pad), dtype=bool)
    valid[:N, :N] = True
    mask = sam.MultiHeadMask([sam.NumpyMask(valid)] * H)
    bs = sak.BlockSizes(
        block_q=block_q, block_kv=block_kv, block_kv_compute=block_kv,
    )
    kernel = sak.make_splash_mha(mask, head_shards=1, q_seq_shards=1,
                                 block_sizes=bs)

    def fn(q, k, v):  # [B, N, H, D] bnhd like production
        scale = 1.0 / math.sqrt(D)
        pad = [(0, 0), (0, n_pad - N), (0, 0), (0, 0)]
        qp = jnp.pad(q * jnp.asarray(scale, q.dtype), pad)
        kp, vp = jnp.pad(k, pad), jnp.pad(v, pad)
        t = lambda x: jnp.swapaxes(x, 1, 2)  # -> [B, H, Np, D]
        out = jax.vmap(kernel)(t(qp), t(kp), t(vp))
        return t(out)[:, :N]

    return fn


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)

    ref = _bf16_softmax_attention(q, k, v)

    timed("bf16_softmax", _bf16_softmax_attention, (q, k, v))
    for n_pad, bq, bkv in ((1408, 704, 704), (1408, 1408, 704),
                           (1408, 352, 1408), (1536, 512, 512)):
        try:
            fn = make_splash(n_pad, bq, bkv)
            out = jax.jit(fn)(q, k, v)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(json.dumps({"impl": f"splash_{n_pad}_{bq}_{bkv}",
                              "max_err": err}), flush=True)
            timed(f"splash_{n_pad}_{bq}_{bkv}", fn, (q, k, v))
        except Exception as e:
            print(json.dumps({"impl": f"splash_{n_pad}_{bq}_{bkv}",
                              "error": str(e)[:200]}), flush=True)
