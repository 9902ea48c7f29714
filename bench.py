"""Benchmark: end-to-end 1080p 2D -> Full-SBS (depth + warp + heal) fps/chip.

The BASELINE.json headline metric. Depth = Depth Anything V2-S at 518x518
(random-init weights — identical FLOPs to the released checkpoint), stereo =
the full fused DIBR step (pop shaping, subject lock, warp, feather, heal,
grade, floating window, sharpen) scanned over the chunk, packed to Full-SBS
uint8 — ONE jitted graph per chunk, EMA trackers chained across chunks.

Measurement model: sustained per-chip pipeline throughput. Input frames are
device-resident (a production host streams decode into HBM well above this
rig's speed) and the packed u8 output is consumed on-device by a checksum
that every output pixel feeds (so nothing is dead-code-eliminated); one
scalar crosses back per run. Rationale: this rig reaches the chip through
the axon loopback tunnel at ~30-50 MB/s — 2-3 orders of magnitude below a
real TPU host's PCIe — and shipping 143 MB/chunk through it would measure
the tunnel, not the framework. (For reference, the tunnel-bound figure on
this rig is ~2.2 fps; the reference app itself does ~3-12 fps on a consumer
GPU.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = value / 60 fps, the BASELINE.md north-star target.
"""

import json
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: the axon remote-compile of this graph is
    # slow and highly variable cold (1.5-13 min observed); warm runs load
    # from here in seconds.
    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from visiondepth3d_tpu.depth import DA_V2_SMALL, DepthPredictor, init_random
    from visiondepth3d_tpu.state import init_trackers
    from visiondepth3d_tpu.stereo import StereoParams
    from visiondepth3d_tpu.stereo.step import render_chunk

    T = 32  # frames per depth-inference batch / stereo scan chunk
    #        NOTE: the r2 T-sweep (T=8 151.8 .. T=32 214.6) was run before
    #        the loop-invariant-hoisting fix below and measured depth at
    #        1/K of its true cost; honest split at T=32 is depth 3.7 +
    #        stereo 4.2 ms/frame (benchmarks/headline_split.py)
    K = 16  # chunks per device launch (amortizes the relay's ~2 s
    #         per-launch dispatch overhead, another tunnel-only artifact);
    #         fori_loop keeps the compiled graph single-chunk-sized
    H, W = 1080, 1920
    SIZE = 518

    # bf16 inference for the ViT (standard practice; the stereo stage and
    # depth normalization stay f32)
    pred = DepthPredictor(
        DA_V2_SMALL, init_random(DA_V2_SMALL, size=SIZE),
        inference_size=SIZE, dtype="bfloat16",
        fast_head=True,  # product default (DepthConfig.fast_head)
    )
    # bf16 image-plane stereo (stats/trackers stay f32; ~0.7 u8 step mean
    # delta vs f32, see tests/test_stereo_step.py) — measured 5.8 -> 5.0
    # ms/frame on the stereo stage
    params = StereoParams(enable_healing=True, image_dtype="bfloat16"
                          ).with_shift_bound(W)

    from jax import lax

    @jax.jit
    def pipeline(model_params, trackers, frames_u8):  # [T, H, W, 3] u8
        def chunk(_, carry):
            tr, acc = carry
            # chain the chunk's input on the previous chunk's checksum:
            # without this, frames/depths are loop-invariant and XLA hoists
            # the ENTIRE depth stage out of the K-loop (measured: 214 "fps"
            # vs the honest 122 — the pre-r2-fix numbers had this flaw).
            # In production every chunk is new frames; model that.
            perturbed = frames_u8 + (acc % 2).astype(jnp.uint8)
            frames = perturbed.astype(jnp.float32) / 255.0
            depths = pred.predict_01(frames, out_hw=(H, W))
            tr, outs = render_chunk(params, tr, frames, depths)
            packed = jnp.concatenate([outs.left, outs.right], axis=2)
            packed_u8 = (jnp.clip(packed * 255.0 + 0.5, 0, 255)).astype(jnp.uint8)
            # checksum consumes every output pixel -> nothing is DCE'd
            return tr, acc + jnp.sum(packed_u8.astype(jnp.int32))

        trackers, acc = lax.fori_loop(0, K, chunk, (trackers, jnp.int32(0)))
        return trackers, acc

    trackers = init_trackers(H, W)
    rng = np.random.default_rng(0)
    frames = jax.device_put((rng.random((T, H, W, 3)) * 255).astype(np.uint8))
    frames.block_until_ready()

    # warm-up / compile
    trackers, checksum = pipeline(pred.params, trackers, frames)
    _ = int(checksum)

    # second warm launch: the first timed launch after compile occasionally
    # carries residual relay latency (observed 184-190 run spread at 3
    # iters); a second warm-up plus 5 timed iters tightens it
    trackers, checksum = pipeline(pred.params, trackers, frames)
    _ = int(checksum)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        trackers, checksum = pipeline(pred.params, trackers, frames)
    _ = int(checksum)  # trackers chain serializes all iterations
    dt = time.perf_counter() - t0

    fps = (K * T * iters) / dt

    # Quality gate of the SHIPPED stereo configuration (VERDICT r4 #1):
    # the same StereoParams fast path (hist quantiles, bf16 image plane,
    # dispatched warp/postfx backend, healing on, no parity quantization)
    # SSIM'd against the ACTUAL reference chain (render_3d.py:1261-1407,
    # torch CPU) on a synthetic clip. BASELINE.md acceptance: >= 0.99.
    # Runs in a CPU-backend SUBPROCESS: the oracle comparison dispatches
    # the un-jitted per-frame step eagerly, which through the TPU relay
    # would take minutes/frame; the number is backend-independent.
    # Depth inference is excluded by construction (both sides consume the
    # same depth frames, matching the reference's video+depth contract).
    import os
    import subprocess
    import sys

    if not os.path.exists("/root/reference/core/render_3d.py"):
        ssim_vs_ref = None  # no reference tree on this host
    else:
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="")
        out = subprocess.run(
            [sys.executable, "-m", "visiondepth3d_tpu.utils.refloop"],
            capture_output=True, text=True, timeout=1800, env=env,
        )
        try:
            if out.returncode != 0:
                raise RuntimeError(f"refloop rc={out.returncode}")
            ssim_vs_ref = json.loads(
                out.stdout.strip().splitlines()[-1])["ssim_vs_ref"]
        except Exception as e:  # noqa: BLE001
            # A BROKEN oracle must look different from an absent one:
            # surface the failure on stderr, keep the fps line intact.
            print(f"ssim_vs_ref FAILED ({e}); refloop stderr tail:\n"
                  + "\n".join(out.stderr.splitlines()[-8:]),
                  file=sys.stderr)
            ssim_vs_ref = "error"

    print(
        json.dumps(
            {
                "metric": "1080p 2D->Full-SBS e2e (DA-V2-S depth + warp + heal) frames/sec/chip",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 60.0, 4),
                "ssim_vs_ref": ssim_vs_ref,
            }
        )
    )


if __name__ == "__main__":
    main()
