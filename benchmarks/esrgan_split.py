"""Where do cfg4's 311 ms/frame go, and does tiling cost anything?

RRDBNet nb=6 x4 at 1080p is ~23 TFLOP/frame -> 59 ms at bf16 peak, yet
cfg4 measures 311 ms/frame. Pieces (bf16, B=2 frames like cfg4):

  trunk_whole — conv_first + 6 RRDB + conv_body at [2,1080,1920,*]
  trunk_tiled — same via the cfg4 tiling (12 tiles of 360x480, lax.map G=4)
  tail_whole  — up1/up2/hr/last from [2,1080,1920,64] to 4K (HBM risk)
  tail_tiled  — same over 8 tiles of 540x484 (halo 2)
  rife_1080   — one IFNet mid-frame at 1080p

Run: nohup python benchmarks/esrgan_split.py > /tmp/esr.log 2>&1 &
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

from visiondepth3d_tpu.enhance.esrgan import RRDB, _lrelu, _nearest_up2
from visiondepth3d_tpu.enhance.rife import IFNet

B, H, W, NB, NF = 2, 1080, 1920, 6, 64
DT = jnp.bfloat16
rng = np.random.default_rng(0)


class Trunk(nn.Module):
    @nn.compact
    def __call__(self, x):
        conv = lambda n, o: nn.Conv(o, (3, 3), padding=((1, 1), (1, 1)), name=n)
        feat = conv("conv_first", NF)(x)
        t = feat
        for i in range(NB):
            t = RRDB(NF, 32, name=f"body{i}")(t)
        return feat + conv("conv_body", NF)(t)


class Tail(nn.Module):
    @nn.compact
    def __call__(self, f):
        conv = lambda n, o: nn.Conv(o, (3, 3), padding=((1, 1), (1, 1)), name=n)
        f = _lrelu(conv("conv_up1", NF)(_nearest_up2(f)))
        f = _lrelu(conv("conv_up2", NF)(_nearest_up2(f)))
        f = _lrelu(conv("conv_hr", NF)(f))
        return conv("conv_last", 3)(f)


def timed(name, fn, args, iters=3, inner=4):
    jfn = jax.jit(fn)
    c = jfn(jnp.float32(0), *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = jfn(c, *args)
    float(c)
    dt = (time.perf_counter() - t0) / (iters * inner * B)
    print(json.dumps({"piece": name, "ms_per_frame": round(dt * 1e3, 2)}),
          flush=True)


def loop(body):
    def fn(carry, *args):
        return lax.fori_loop(0, 4, lambda _, acc: body(acc, *args), carry)
    return fn


trunk = Trunk()
tail = Tail()
x = jnp.asarray(rng.random((B, H, W, 3)), DT)
tp = jax.device_put(jax.tree.map(
    lambda a: a.astype(DT),
    trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), DT))["params"]))
lp = jax.device_put(jax.tree.map(
    lambda a: a.astype(DT),
    tail.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, NF), DT))["params"]))
feat = jnp.asarray(rng.random((B, H, W, NF)), DT)


def trunk_whole(acc, tp, x):
    y = trunk.apply({"params": tp}, x + acc.astype(DT) * 1e-30)
    return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30


def trunk_tiled(acc, tp, x):
    from visiondepth3d_tpu.ops.tiling import extract_tiles

    def one(frame):
        tiles, _ = extract_tiles(frame, (360, 480), overlap=0)
        grouped = tiles.reshape(3, 4, *tiles.shape[1:])
        def g(batch):
            return jnp.sum(trunk.apply({"params": tp}, batch)
                           .astype(jnp.float32))
        return jnp.sum(lax.map(g, grouped))
    y = lax.map(one, x + acc.astype(DT) * 1e-30)
    return acc + jnp.sum(y) * 1e-30


def tail_whole(acc, lp, f):
    y = tail.apply({"params": lp}, f + acc.astype(DT) * 1e-30)
    return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30


def tail_tiled(acc, lp, f):
    fh = f + acc.astype(DT) * 1e-30
    halo = 2
    fp = jnp.pad(fh, [(0, 0), (halo, halo), (halo, halo), (0, 0)])
    th, tw = 540, 480
    # 2x4 grid of (th+4, tw+4) haloed tiles
    tiles = []
    for ti in range(2):
        for tj in range(4):
            y0, x0 = ti * th, tj * tw
            tiles.append(lax.dynamic_slice(
                fp, (0, y0, x0, 0), (B, th + 2 * halo, tw + 2 * halo, NF)))
    stack = jnp.stack(tiles)  # [8, B, th+4, tw+4, NF]
    def g(t):
        u = tail.apply({"params": lp}, t)  # [B, 4(th+4), 4(tw+4), 3]
        u = u[:, 4 * halo:-4 * halo, 4 * halo:-4 * halo]
        return jnp.sum(u.astype(jnp.float32))
    return acc + jnp.sum(lax.map(g, stack)) * 1e-30


rife = IFNet(scales=(4, 2, 1))
rp = jax.device_put(jax.tree.map(
    lambda a: a.astype(DT),
    rife.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3), DT),
              jnp.zeros((1, 64, 64, 3), DT))["params"]))


def rife_1080(acc, rp, x):
    xi = x + acc.astype(DT) * 1e-30
    mid = rife.apply({"params": rp}, xi[:1], xi[1:], 0.5)
    return acc + jnp.sum(mid.astype(jnp.float32)) * 1e-30


if __name__ == "__main__":
    timed("trunk_tiled", loop(trunk_tiled), (tp, x))
    timed("trunk_whole", loop(trunk_whole), (tp, x))
    timed("tail_tiled", loop(tail_tiled), (lp, feat))
    timed("tail_whole", loop(tail_whole), (lp, feat))
    timed("rife_1080", loop(rife_1080), (rp, x))
    print("DONE", flush=True)
