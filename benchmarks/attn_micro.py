"""Attention microbench at the depth ViT shape [8, 6, 1536, 64] (v5e).

r1 results (us/call): xla f32 softmax 1993, bf16-softmax 1304, pallas
flash default blocks 3592, flash tuned (block_q=seq, block_k=512) 1160.
bf16-softmax wins in production because it runs at the unpadded length
(1370 -> ~1040); see ops/attention.py."""

# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, json, math
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas.ops.tpu.flash_attention import (
    flash_attention, BlockSizes)

B, H, N, D = 8, 6, 1536, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)
sc = 1.0 / math.sqrt(D)

def mk(body):
    @jax.jit
    def fn(q, k, v, seed):
        def it(_, acc):
            o = body(q + (acc * 1e-8).astype(q.dtype), k, v)
            return acc + jnp.sum(o.astype(jnp.float32))
        return lax.fori_loop(0, 50, it, seed)
    return fn

def bf16_softmax(q, k, v):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.bfloat16(sc)
    m = jnp.max(logits.astype(jnp.float32), axis=-1, keepdims=True)
    e = jnp.exp(logits - m.astype(jnp.bfloat16))
    s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    return jnp.einsum("bhqk,bhkd->bhqd", (e / s).astype(jnp.bfloat16), v)

def xla_f32(q, k, v):
    o = jax.nn.dot_product_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2))
    return jnp.swapaxes(o, 1, 2)

def flash_default(q, k, v):
    return flash_attention(q, k, v, sm_scale=sc)

def flash_tuned(q, k, v):
    bs = BlockSizes(block_q=1536, block_k_major=512, block_k=512, block_b=1)
    return flash_attention(q, k, v, sm_scale=sc, block_sizes=bs)

def run(name, body):
    try:
        fn = mk(body)
        float(fn(q, k, v, jnp.float32(0)))
        t0 = time.perf_counter()
        float(fn(q, k, v, jnp.float32(0)))
        dt = time.perf_counter() - t0
        print(json.dumps({"impl": name, "us_per_call": round(dt / 50 * 1e6, 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"impl": name, "error": str(e)[:200]}), flush=True)

run("xla_dpa", xla_f32)
run("bf16_softmax", bf16_softmax)
run("flash_default", flash_default)
run("flash_tuned_q1536_k512", flash_tuned)
print("DONE", flush=True)
