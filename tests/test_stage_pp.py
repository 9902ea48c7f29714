"""Device-side stage-PP: depth on one mesh slice, stereo on the other,
software-pipelined (parallel/pp.py). Correctness vs the serial composition
and sharding placement on the 8-device virtual mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from visiondepth3d_tpu.depth import DA_TINY, DepthPredictor, init_random
from visiondepth3d_tpu.parallel import TwoStagePipeline, init_trackers_batch
from visiondepth3d_tpu.parallel.dp import render_segments
from visiondepth3d_tpu.stereo import StereoParams
from visiondepth3d_tpu.ops.resize import resize_bilinear


def _build(h, w, g):
    pred = DepthPredictor(DA_TINY, init_random(DA_TINY, size=28),
                          inference_size=28)
    p = StereoParams(blur_ksize=3)

    def depth_fn(frames):  # [G, T, H, W, 3] u8
        gg, t = frames.shape[0], frames.shape[1]
        x = frames.reshape((gg * t,) + frames.shape[2:]).astype(jnp.float32)
        x = x / 255.0
        d = pred._forward(pred.params, x)
        lo = jnp.min(d, axis=(1, 2), keepdims=True)
        hi = jnp.max(d, axis=(1, 2), keepdims=True)
        d = (d - lo) / jnp.maximum(hi - lo, 1e-6)
        d = resize_bilinear(d, (h, w), channel_last=False)
        return d.reshape(gg, t, h, w)

    def stage_b(trackers, frames, depths):
        f01 = frames.astype(jnp.float32) / 255.0
        return render_segments(p, trackers, f01, depths)

    return depth_fn, stage_b


def test_two_stage_pipeline_matches_serial():
    h, w, g, t = 32, 48, 4, 2
    depth_fn, stage_b = _build(h, w, g)
    rng = np.random.default_rng(0)
    chunks = [rng.integers(0, 255, (g, t, h, w, 3)).astype(np.uint8)
              for _ in range(3)]

    devices = jax.devices()[:8]
    pipe = TwoStagePipeline(devices, split=4, depth_fn=depth_fn,
                            stage_b_fn=stage_b)
    carry = jax.device_put(init_trackers_batch(g, h, w), pipe.sh_b)
    outs_pp = [jax.tree.map(np.asarray, o)
               for o in pipe.run(iter(chunks), carry)]
    assert len(outs_pp) == 3

    # serial oracle on the default device (jitted like the pipeline's
    # stages — eager CPU math can flip the subject-histogram argmax)
    depth_j, stage_j = jax.jit(depth_fn), jax.jit(stage_b)
    carry_s = init_trackers_batch(g, h, w)
    for i, c in enumerate(chunks):
        d = depth_j(jnp.asarray(c))
        carry_s, out_s = stage_j(carry_s, jnp.asarray(c), d)
        np.testing.assert_allclose(
            np.asarray(out_s.left), np.asarray(outs_pp[i].left), atol=1e-3
        )

    # placement: depth outputs live on slice A, stage-B outputs on slice B
    d_dev = set(pipe._depth(jax.device_put(chunks[0], pipe.sh_a)).devices())
    assert d_dev == set(devices[:4])
    b_dev = set(outs_pp[-1].left.devices()) if hasattr(
        outs_pp[-1].left, "devices") else None
