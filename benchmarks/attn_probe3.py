"""vmem_attention (ops/pallas_attention.py) vs bf16-softmax at the depth
model's production shape [B=32, N=1370, H=6, D=64] bf16, plus the BEiT-L
shape [32, 1025, 16, 64].

Run: nohup python benchmarks/attn_probe3.py > /tmp/attn3.log 2>&1 &
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

from visiondepth3d_tpu.ops.attention import _bf16_softmax_attention
from visiondepth3d_tpu.ops.pallas_attention import vmem_attention

K_ITERS = 24


def timed(name, fn, args, b, launches=3):
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
                      "us_per_frame_layer": round(dt * 1e6 / b, 2)}),
          flush=True)


def run_shape(b, n, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    ref = _bf16_softmax_attention(q, k, v)
    print(json.dumps({"shape": [b, n, h, d]}), flush=True)
    timed(f"bf16_softmax_n{n}", _bf16_softmax_attention, (q, k, v), b)
    for bq in (None, 704):
        name = f"vmem_bq{bq or 'auto'}_n{n}"
        try:
            fn = lambda q, k, v, bq=bq: vmem_attention(q, k, v, block_q=bq)
            out = jax.jit(fn)(q, k, v)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(json.dumps({"impl": name, "max_err": err}), flush=True)
            timed(name, fn, (q, k, v), b)
        except Exception as e:
            print(json.dumps({"impl": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    run_shape(32, 1370, 6, 64)   # DA-V2-S @ 518
    run_shape(32, 1025, 16, 64)  # BEiT-L @ 512
    print("DONE", flush=True)
