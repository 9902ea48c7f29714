"""cfg4 FLOP-reduction levers (VERDICT r4 #8): reduce the work, not the
kernel time.

cfg4's 0.56 fps/chip is FLOP-bound at the measured ~17% small-channel conv
ceiling (RESULTS.md r4: int8 and channel-pad levers both negative). The
remaining levers cut the FLOPs themselves — all are user-facing quality
knobs the reference also concedes (merged_pipeline.py:240-284 pre-downscale
25-100% + blend modes):

- trunk-at-half-res: pre-downscale the 1080p input to 540p in-graph, x4
  tail -> native 2160p output (FLOPs / 4 end to end);
- nb ablation: 6 vs 23 RRDB trunk blocks (the released catalog itself
  spans nb6 anime / nb23 x4plus — block count IS a quality knob upstream);
- per-eye Half-SBS packing: upscale the PACKED 1920x1080 half-SBS frame
  (one 1080p->4K pass for both eyes) instead of two full-width eyes —
  exact 2x, reported as arithmetic on the measured single-frame rate.

Quality note: speed is measured here; the visual cost of each lever needs
REAL checkpoints (random weights make any SSIM-vs-full comparison
meaningless). The table gives users the fps side of the trade; the day
weights land, `vd3d verify-checkpoints` + a 2-frame SSIM completes it.

Run: nohup python benchmarks/cfg4_levers.py > /tmp/cfg4_levers.out 2>&1 &
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

BF16_PEAK = 197e12


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visiondepth3d_tpu.enhance import EnhanceConfig
    from visiondepth3d_tpu.enhance.esrgan import (
        RRDBNet,
        apply_rrdbnet_staged,
    )
    from visiondepth3d_tpu.ops.resize import resize_area

    T, K, H, W = 2, 4, 1080, 1920
    rng = np.random.default_rng(0)
    frames = jax.device_put((rng.random((T, H, W, 3)) * 255).astype(np.uint8))

    from visiondepth3d_tpu.depth.model import init_random_model

    def run_case(nb: int, half: bool, iters: int = 2):
        cfg = EnhanceConfig(esrgan_nb=nb)
        esrgan = RRDBNet(cfg.esrgan_nf, nb, scale=4)
        # host-side init (on-device init of a 23-block trunk is the
        # documented relay-killer)
        ep = init_random_model(esrgan, (1, 16, 16, 3))
        ep = jax.device_put(jax.tree.map(
            lambda p: jnp.asarray(p, jnp.bfloat16), ep))

        @jax.jit
        def pipe(acc0, ep, fu8):
            def chunk(_, acc):
                x = (fu8 + (acc % 2).astype(jnp.uint8)
                     ).astype(jnp.bfloat16) / jnp.bfloat16(255.0)
                if half:
                    x = resize_area(x, (H // 2, W // 2))
                u = apply_rrdbnet_staged(esrgan, ep, x,
                                         tail_tile_hw=(270, 480), halo=2)
                u8 = (jnp.clip(u * 255 + 0.5, 0, 255)).astype(jnp.uint8)
                return acc + jnp.sum(u8.astype(jnp.int32))

            acc = lax.fori_loop(0, K, chunk, acc0)
            return acc, acc

        acc, cs = pipe(jnp.int32(0), ep, frames)
        _ = int(cs)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc, cs = pipe(acc, ep, frames)
        _ = int(cs)
        dt = time.perf_counter() - t0
        fps = K * T * iters / dt
        return fps

    out = []
    for nb, half, label in [
        (6, False, "nb6 full-res trunk (cfg4 baseline, ESRGAN only)"),
        (6, True, "nb6 trunk@540p -> native 2160p"),
        (23, True, "nb23 trunk@540p -> native 2160p"),
        (23, False, "nb23 full-res trunk"),
    ]:
        fps = run_case(nb, half)
        row = {"case": label, "fps": round(fps, 2),
               "halfsbs_packed_fps": round(fps, 2),
               "fullsbs_two_eye_fps": round(fps / 2, 2)}
        out.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"metric": "cfg4 ESRGAN FLOP-lever table",
                      "rows": out}), flush=True)


if __name__ == "__main__":
    main()
