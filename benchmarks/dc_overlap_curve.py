"""DepthCrafter seam-quality vs overlap curve (VERDICT r4 #5).

The reference GUI ships window 24 / overlap 25 (render_depth.py:1788-1789)
— a negative stride its own pipeline cannot execute past one window; our
pipeline clamps overlap >= window to window-1. This probe records what
overlap actually buys so the default (6) is a measured choice, not a
guess:

- gold = a single whole-clip window (window_size = T: no seams at all);
- per overlap: serial sliding-window run -> (a) L1 distance to gold,
  (b) worst temporal jump |d[t+1]-d[t]| at window-seam frames vs the
  clip's own median jump, (c) cost multiplier = total window-frames
  denoised / T (the per-frame UNet cost scaling, window/(window-stride)).

Tiny random-weight pipeline on a moving synthetic scene: the UNet is not
a trained depth model, but the seam/cross-fade/re-seed MACHINERY under
test is identical at every scale, and cost multipliers are exact.

Run: python benchmarks/dc_overlap_curve.py  (CPU ok)
"""

import json
import time

import numpy as np

import jax


def moving_scene(t=24, h=16, w=16):
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(t):
        f = np.zeros((h, w, 3), np.float32)
        f[..., 0] = 0.5 + 0.4 * np.sin(xx / 3.0 + i * 0.4)
        f[..., 1] = 0.5 + 0.4 * np.cos(yy / 2.5)
        x0 = (2 + i) % (w - 4)
        f[4:10, x0 : x0 + 4] = [0.9, 0.2, 0.1]
        frames.append(f)
    return np.stack(frames)


def main():
    jax.config.update("jax_platforms", "cpu")
    from visiondepth3d_tpu.depth.diffusion.depthcrafter import (
        tiny_depthcrafter,
    )

    T, WINDOW = 24, 8
    frames = moving_scene(T)

    gold_pipe = tiny_depthcrafter(steps=2, window=T, overlap=0)
    gold = np.asarray(gold_pipe(frames))

    rows = []
    for overlap in (0, 2, 4, 6, 7, 9):  # 9 > window: exercises the clamp
        pipe = tiny_depthcrafter(steps=2, window=WINDOW, overlap=overlap)
        eff = pipe.overlap
        starts = pipe._windows(T)
        t0 = time.time()
        d = np.asarray(pipe(frames))
        dt = time.time() - t0
        l1 = float(np.abs(d - gold).mean())
        jumps = np.abs(np.diff(d, axis=0)).mean(axis=(1, 2))
        seams = sorted({s - 1 for s in starts if s > 0}
                       | {s for s in starts if s > 0})
        seam_jump = float(max(jumps[i] for i in seams)) if seams else 0.0
        med_jump = float(np.median(jumps))
        cost = len(starts) * WINDOW / T
        rows.append({
            "overlap": overlap, "effective_overlap": eff,
            "windows": len(starts), "cost_x": round(cost, 2),
            "l1_vs_gold": round(l1, 4),
            "seam_jump": round(seam_jump, 4),
            "median_jump": round(med_jump, 4),
            "seconds": round(dt, 1),
        })
        print(json.dumps(rows[-1]))

    # reference-geometry cost at full scale (window 24): what each overlap
    # would cost per frame on the real model
    print("\nwindow-24 cost multipliers (window/(window-overlap)):")
    for ov in (0, 6, 12, 23):
        print(f"  overlap {ov:2d}: {24 / (24 - ov):.2f}x UNet frames/frame")


if __name__ == "__main__":
    main()
