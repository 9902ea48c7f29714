"""Resolve the trunk-cost mystery: 1170 ms/frame measured vs ~20-45 ms
roofline. Controls at the exact production shape (B=2, 1080p, bf16):

  conv_ctl   — one 3x3 64->64 conv (expect ~0.18 ms/frame from the
               [32,148,148,64] micro scaled by pixel count)
  rdb_ctl    — one ResidualDenseBlock (5 convs + 4 concats)
  rrdb_ctl   — one full RRDB (3 RDBs)
  trunk16    — the nb=6 trunk with inner=16 to amortize dispatch

Run: nohup python benchmarks/esrgan_split2.py > /tmp/esr2.log 2>&1 &
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
from flax import linen as nn
from jax import lax

from visiondepth3d_tpu.enhance.esrgan import RRDB, ResidualDenseBlock, _RRDBTrunk

B, H, W, NF = 2, 1080, 1920, 64
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def timed(name, body, args, inner, iters=3):
    def fn(carry, *a):
        return lax.fori_loop(0, inner, lambda _, acc: body(acc, *a), carry)
    jfn = jax.jit(fn)
    c = jfn(jnp.float32(0), *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = jfn(c, *args)
    float(c)
    dt = (time.perf_counter() - t0) / (iters * inner * B)
    print(json.dumps({"piece": name, "ms_per_frame": round(dt * 1e3, 3)}),
          flush=True)


xf = jnp.asarray(rng.random((B, H, W, NF)), DT)

conv = nn.Conv(NF, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
cp = jax.device_put(jax.tree.map(
    lambda a: a.astype(DT),
    conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, NF), DT))["params"]))

rdb = ResidualDenseBlock(NF, 32)
rdbp = jax.device_put(jax.tree.map(
    lambda a: a.astype(DT),
    rdb.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, NF), DT))["params"]))

rrdb = RRDB(NF, 32)
rrdbp = jax.device_put(jax.tree.map(
    lambda a: a.astype(DT),
    rrdb.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 8, NF), DT))["params"]))

trunk = _RRDBTrunk(NF, 6, 32, 4)
x3 = jnp.asarray(rng.random((B, H, W, 3)), DT)
tp = jax.device_put(jax.tree.map(
    lambda a: a.astype(DT),
    trunk.init(jax.random.PRNGKey(3), jnp.zeros((1, 16, 16, 3), DT))["params"]))


def conv_body(acc, p, x):
    y = conv.apply({"params": p}, x + acc.astype(DT) * 1e-30)
    return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30


def rdb_body(acc, p, x):
    y = rdb.apply({"params": p}, x + acc.astype(DT) * 1e-30)
    return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30


def rrdb_body(acc, p, x):
    y = rrdb.apply({"params": p}, x + acc.astype(DT) * 1e-30)
    return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30


def trunk_body(acc, p, x):
    y = trunk.apply({"params": p}, x + acc.astype(DT) * 1e-30)
    return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30


if __name__ == "__main__":
    timed("conv_ctl", conv_body, (cp, xf), inner=32)
    timed("rdb_ctl", rdb_body, (rdbp, xf), inner=16)
    timed("rrdb_ctl", rrdb_body, (rrdbp, xf), inner=8)
    timed("trunk16", trunk_body, (tp, x3), inner=16)
    print("DONE", flush=True)
