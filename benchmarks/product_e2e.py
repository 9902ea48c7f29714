"""PRODUCT wall-clock end-to-end benchmark (VERDICT r2 item 3).

Runs the REAL `render_stereo_video` fused single-pass route — live y4m
decode, fused DA-V2-S depth + full stereo graph on chip, device-side
YUV420 emit, live y4m encode — on a ≥1000-frame 1080p clip and reports
the SUSTAINED wall-clock fps (not compute-only, not per-leg).

Context (benchmarks/host_io.py, round 2): decode leg 108 fps, device-YUV
encode leg 63 fps, both on this rig's single host core; bench.py's
compute-only headline is 190 fps/chip. This harness measures what a user
actually gets when all three run together.

Run:  nohup python benchmarks/product_e2e.py > /tmp/e2e.json 2>/tmp/e2e.log &
"""


from __future__ import annotations
# allow `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

import numpy as np


def gen_clip(path: str, frames: int, h: int = 1080, w: int = 1920) -> None:
    from visiondepth3d_tpu.io import Y4MWriter

    yy, xx = np.mgrid[0:h, 0:w]
    base = np.zeros((h, w, 3), np.uint8)
    base[..., 0] = (xx // 8) % 256
    base[..., 1] = (yy // 4) % 256
    base[..., 2] = ((xx + yy) // 16) % 256
    y0, y1 = int(h * 0.28), int(h * 0.65)
    bw = max(w // 10, 16)
    with Y4MWriter(path, w, h, 30.0) as wr:
        f = base.copy()
        for i in range(frames):
            # cheap per-frame variation: roll a stripe (keeps gen fast on
            # the single host core; content realism is irrelevant to the
            # pipeline cost, byte entropy is what the writer sees)
            f[:, :, 0] = np.roll(base[:, :, 0], i * 3, axis=1)
            x0 = (i * 7) % (w - bw)
            f[y0:y1, x0:x0 + bw, :] = (250, 60, 60)
            wr.write(f)
            f[y0:y1, x0:x0 + bw, :] = base[y0:y1, x0:x0 + bw, :]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visiondepth3d_tpu.depth import DA_V2_SMALL, DepthPredictor, init_random
    from visiondepth3d_tpu.pipeline.stereo_pipeline import (
        RenderConfig,
        render_stereo_video,
    )
    from visiondepth3d_tpu.stereo import StereoParams

    n_frames = int(os.environ.get("E2E_FRAMES", "1000"))
    # Geometry knobs (VERDICT r3 item 2): at 640x360 Half-SBS the output
    # is ~0.35 MB/frame, so this rig's ~30 MB/s d2h relay ceiling is
    # ~85 fps — a geometry where sustained decode+compute+encode CAN be
    # demonstrated above the 60 fps north star on this hardware.
    in_w = int(os.environ.get("E2E_W", "1920"))
    in_h = int(os.environ.get("E2E_H", "1080"))
    out_fmt = os.environ.get("E2E_FORMAT", "Full-SBS")
    out_h = int(os.environ.get("E2E_OUT_H", str(in_h)))
    work = os.environ.get("E2E_DIR", "/dev/shm/vd3d_e2e")
    os.makedirs(work, exist_ok=True)
    clip = os.path.join(work, f"clip_{in_w}x{in_h}.y4m")
    out = os.path.join(work, "out_e2e.y4m")

    if (not os.path.exists(clip)
            or os.path.getsize(clip) < n_frames * in_w * in_h * 1.5):
        t0 = time.perf_counter()
        gen_clip(clip, n_frames, h=in_h, w=in_w)
        print(f"# clip gen: {time.perf_counter() - t0:.1f}s",
              flush=True)

    pred = DepthPredictor(DA_V2_SMALL, init_random(DA_V2_SMALL, size=518),
                          inference_size=518, dtype="bfloat16")
    params = StereoParams(enable_healing=True)
    chunk = int(os.environ.get("E2E_CHUNK", "16"))
    cfg = RenderConfig(output_format=out_fmt, output_height=out_h,
                       chunk_size=chunk, checkpoint_every_chunks=0,
                       mesh="off")

    # warm the compile cache on a short window so the measured run is
    # steady-state from chunk 0
    warm_out = os.path.join(work, "warm.y4m")
    stop = _stop_after_frames(64)
    render_stereo_video(clip, None, warm_out, params, cfg,
                        predictor=pred, progress_cb=stop.progress,
                        cancel_check=stop)
    os.remove(warm_out)

    stamps = []

    def progress(p):
        stamps.append((time.perf_counter(), p.frames_done))

    t0 = time.perf_counter()
    prog = render_stereo_video(clip, None, out, params, cfg,
                               progress_cb=progress, predictor=pred)
    wall = time.perf_counter() - t0
    fps_total = prog.frames_done / wall
    # sustained = slope over the second half (excludes first-chunk ramp)
    half = len(stamps) // 2
    (t1, f1), (t2, f2) = stamps[half], stamps[-1]
    fps_sustained = (f2 - f1) / max(t2 - t1, 1e-9)
    out_size = os.path.getsize(out)
    print(json.dumps({
        "metric": f"product e2e {in_w}x{in_h} 2D->{out_fmt}@{out_h}p "
                  "(fused route, live decode+encode) fps",
        "value": round(fps_sustained, 2),
        "unit": "fps",
        "frames": prog.frames_done,
        "wall_s": round(wall, 1),
        "fps_total_incl_ramp": round(fps_total, 2),
        "output_bytes": out_size,
    }), flush=True)


def legs():
    """Attribute the e2e time: decode-only, decode+compute (1-byte
    checksum readback), and the full path with output readback+write.
    The deltas demonstrate which legs overlap and which bound the rig
    (E2E_FRAMES=200 keeps this quick)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visiondepth3d_tpu.depth import DA_V2_SMALL, DepthPredictor, init_random
    from visiondepth3d_tpu.io.y4m import Y4MPlaneReader, Y4MReader
    from visiondepth3d_tpu.pipeline.geometry import resolve_geometry
    from visiondepth3d_tpu.pipeline.stereo_pipeline import (
        RenderConfig,
        make_chunk_fn,
    )
    from visiondepth3d_tpu.state import init_trackers
    from visiondepth3d_tpu.stereo import StereoParams

    n_frames = int(os.environ.get("E2E_FRAMES", "200"))
    in_w = int(os.environ.get("E2E_W", "1920"))
    in_h = int(os.environ.get("E2E_H", "1080"))
    out_fmt = os.environ.get("E2E_FORMAT", "Full-SBS")
    out_h = int(os.environ.get("E2E_OUT_H", str(in_h)))
    work = os.environ.get("E2E_DIR", "/dev/shm/vd3d_e2e")
    clip = os.path.join(work, f"clip_{in_w}x{in_h}.y4m")
    if not os.path.exists(clip):
        os.makedirs(work, exist_ok=True)
        gen_clip(clip, max(n_frames, 1000), h=in_h, w=in_w)

    out = {}

    # -- decode legs --
    for name, opener in (("decode_rgb", Y4MReader),
                         ("decode_planes", Y4MPlaneReader)):
        rd = opener(clip)
        t0 = time.perf_counter()
        for _ in range(n_frames):
            if rd.read() is None:
                break
        out[name + "_fps"] = round(n_frames / (time.perf_counter() - t0), 1)
        rd.close()

    pred = DepthPredictor(DA_V2_SMALL, init_random(DA_V2_SMALL, size=518),
                          inference_size=518, dtype="bfloat16")
    params = StereoParams(enable_healing=True)
    t_chunk = int(os.environ.get("E2E_CHUNK", "16"))
    cfg = RenderConfig(output_format=out_fmt, output_height=out_h,
                       chunk_size=t_chunk, mesh="off")
    geom = resolve_geometry(in_w, in_h, out_fmt, out_h,
                            "Default (16:9)", False, 0, 0)
    fn = make_chunk_fn(params, geom, cfg, predictor=pred, yuv_in=True)

    def read_chunks(k):
        rd = Y4MPlaneReader(clip)
        for _ in range(k):
            fs = [rd.read() for _ in range(t_chunk)]
            yield (np.stack([f[0] for f in fs]),
                   np.stack([f[1] for f in fs]),
                   np.stack([f[2] for f in fs]))
        rd.close()

    k = n_frames // t_chunk
    # -- decode + compute, 4-byte checksum readback (no output fetch) --
    tr = init_trackers(geom.eye_h, geom.eye_w)
    chunks = read_chunks(k)
    first = next(chunks)
    tr, o = fn(tr, first, np.zeros(t_chunk, bool))
    float(jnp.sum(o.astype(jnp.uint32)))  # warm/compile fence
    t0 = time.perf_counter()
    acc = None
    for fb in chunks:
        tr, o = fn(tr, fb, np.zeros(t_chunk, bool))
        acc = jnp.sum(o.astype(jnp.uint32))
    float(acc)
    out["decode_plus_compute_fps"] = round(
        (k - 1) * t_chunk / (time.perf_counter() - t0), 1)

    # -- full: + packed-plane readback + y4m write --
    from visiondepth3d_tpu.ops.convert import rgb_u8_to_yuv420
    from visiondepth3d_tpu.io import Y4MWriter

    @jax.jit
    def pack(frames_u8):
        y, u, v = rgb_u8_to_yuv420(frames_u8)
        t, hh, ww = y.shape
        return jnp.concatenate([y, u.reshape(t, hh // 4, ww),
                                v.reshape(t, hh // 4, ww)], axis=1)

    wr = Y4MWriter(os.path.join(work, "legs_out.y4m"),
                   geom.out_w, geom.out_h, 30.0)
    tr = init_trackers(geom.eye_h, geom.eye_w)
    chunks = read_chunks(k)
    tr, o = fn(tr, next(chunks), np.zeros(t_chunk, bool))
    _ = np.asarray(pack(o))
    t0 = time.perf_counter()
    pend = None
    hh, ww, q = geom.out_h, geom.out_w, geom.out_h // 4
    for fb in chunks:
        tr, o = fn(tr, fb, np.zeros(t_chunk, bool))
        o = pack(o)
        if pend is not None:
            host = np.asarray(pend)
            for i in range(t_chunk):
                wr.write_yuv420(host[i, :hh],
                                host[i, hh:hh + q].reshape(hh // 2, ww // 2),
                                host[i, hh + q:].reshape(hh // 2, ww // 2))
        pend = o
    host = np.asarray(pend)
    out["full_e2e_fps"] = round(
        (k - 1) * t_chunk / (time.perf_counter() - t0), 1)
    wr.close()
    print(json.dumps({"metric": "product e2e leg attribution "
                                f"{in_w}x{in_h} {out_fmt}@{out_h}p", **out}),
          flush=True)


def _stop_after_frames(n):
    seen = {"v": 0}

    def cb():
        return seen["v"] >= n

    def progress(p):
        seen["v"] = p.frames_done

    cb.progress = progress
    return cb


if __name__ == "__main__":
    import sys

    if "--legs" in sys.argv:
        legs()
    else:
        main()
