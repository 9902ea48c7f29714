"""Product stage-pipeline rendering: `vd3d render --mesh pp=2[,dp=N]`.

SURVEY §2.8 "PP across pipeline stages": the device list is split into
two disjoint slices — depth inference (slice A) and the stereo
composition + pack (slice B). While slice B renders chunk i, slice A is
already denoising chunk i+1's depth; JAX's asynchronous dispatch
software-pipelines the two programs, and the only inter-slice traffic is
the [T, eye_h, eye_w] float depth map (ICI on a pod). The reference's
closest analog is a host-side prefetch queue (merged_pipeline.py:85-104);
it has no device pipelining at all.

Semantics: ONE segment, serial tracker state — unlike the dp path's
segmentation, the output is bit-identical to the single-device fused
route (the stage cut moves no math across frames; tested in
tests/test_mesh_product.py).

With ``dp=N`` each slice is N devices wide: slice A shards the chunk's
frames (depth per frame is independent — exact), slice B shards frame
ROWS (the stereo step is a serial scan over frames, so its intra-chunk
axis is spatial; same GSPMD row sharding as `--mesh sp=`).
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..io.video import open_video, open_writer
from ..io import blackdetect
from ..state import init_trackers
from ..stereo import StereoParams
from .geometry import resolve_geometry
from .stereo_pipeline import (
    RenderConfig,
    RenderProgress,
    _detect_black_bars_host,
    make_pp_bodies,
)


def render_stereo_video_pp(
    input_path,
    output_path,
    params: StereoParams | None = None,
    cfg: RenderConfig | None = None,
    progress_cb: Callable[[RenderProgress], None] | None = None,
    cancel_check: Callable[[], bool] | None = None,
    predictor=None,
    mesh_axes: dict[str, int] | None = None,
    devices=None,
) -> RenderProgress:
    """Two-slice pipelined fused 2D->3D render (see module docstring)."""
    params = params or StereoParams()
    cfg = cfg or RenderConfig()
    axes = dict(mesh_axes or {})
    if predictor is None:
        raise ValueError("--mesh pp=2 pipelines depth against stereo and "
                         "needs the fused route (no --depth input)")
    if cfg.resume:
        raise ValueError("--resume is not supported with --mesh; "
                         "re-run without --mesh to continue a checkpoint")
    if axes.get("sp", 1) != 1 or axes.get("tp", 1) != 1:
        raise ValueError("--mesh pp=2 composes with dp only "
                         "(dp=N gives each slice N devices)")
    w = int(axes.get("dp", 1))
    devices = devices if devices is not None else jax.devices()
    if 2 * w > len(devices):
        raise ValueError(f"mesh pp=2,dp={w} needs {2 * w} devices, "
                         f"have {len(devices)}")
    np.dtype(params.image_dtype)  # validate before opening outputs

    mesh_a = Mesh(np.asarray(devices[:w]), ("dp",))
    mesh_b = Mesh(np.asarray(devices[w:2 * w]), ("sp",))
    sh_a_frames = NamedSharding(mesh_a, P("dp"))
    sh_b_rows5 = NamedSharding(mesh_b, P(None, "sp"))
    sh_b_depth = NamedSharding(mesh_b, P(None, "sp"))
    sh_b_rep = NamedSharding(mesh_b, P())

    if w > 1 and params.warp_backend == "auto":
        # row sharding on slice B needs the partitionable XLA warp
        # (same rule as mesh_render.make_chunk_fn_batched)
        params = params.replace(warp_backend="xla")

    rd = open_video(input_path, cfg.start_s, cfg.end_s)
    fps = cfg.fps or rd.fps or 30.0
    first = rd.read()
    if first is None:
        rd.close()
        raise ValueError("empty input video")
    top, bottom = (_detect_black_bars_host(first)
                   if cfg.auto_crop_black_bars else (0, 0))
    geom = resolve_geometry(rd.width, rd.height, cfg.output_format,
                            cfg.output_height, cfg.aspect,
                            cfg.preserve_original_aspect, top, bottom)

    blank_set: set[int] = set()
    if cfg.skip_blank_frames:
        try:
            blank_set = set(
                blackdetect.detect_blank_frames(str(input_path), fps))
        except Exception:
            blank_set = set()

    depth_body, stereo_body = make_pp_bodies(params, geom, cfg, predictor)

    def depth_staged(frames_u8):
        frames_u8 = jax.lax.with_sharding_constraint(frames_u8, sh_a_frames)
        return depth_body(frames_u8)

    def stereo_staged(trackers, frames_u8, depths01, blanks):
        frames_u8 = jax.lax.with_sharding_constraint(frames_u8, sh_b_rows5)
        depths01 = jax.lax.with_sharding_constraint(depths01, sh_b_depth)
        trackers = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, sh_b_rep), trackers)
        return stereo_body(trackers, frames_u8, depths01, blanks)

    depth_jit = jax.jit(depth_staged)
    stereo_jit = jax.jit(stereo_staged, donate_argnums=(0,))

    wr = open_writer(output_path, geom.out_w, geom.out_h, fps, cfg.codec,
                     cfg.crf)
    yuv_fn = None
    if (cfg.device_yuv and hasattr(wr, "write_yuv420")
            and geom.out_w % 2 == 0 and geom.out_h % 4 == 0):
        from ..ops.convert import rgb_u8_to_yuv420

        def pack_planes(frames_u8):
            y, u, v = rgb_u8_to_yuv420(frames_u8)
            t, hh, ww = y.shape
            return jnp.concatenate([y, u.reshape(t, hh // 4, ww),
                                    v.reshape(t, hh // 4, ww)], axis=1)

        yuv_fn = jax.jit(pack_planes)

    trackers = jax.device_put(init_trackers(geom.eye_h, geom.eye_w),
                              sh_b_rep)
    prog = RenderProgress()
    t_chunk = cfg.chunk_size

    def write_out(out, n):
        if yuv_fn is not None:
            host = np.asarray(yuv_fn(out))
            hh, ww, q = geom.out_h, geom.out_w, geom.out_h // 4
            for i in range(n):
                wr.write_yuv420(
                    host[i, :hh],
                    host[i, hh:hh + q].reshape(hh // 2, ww // 2),
                    host[i, hh + q:].reshape(hh // 2, ww // 2))
        else:
            host = np.asarray(out)
            for i in range(n):
                wr.write(host[i])

    def read_chunk():
        nonlocal first
        frames, blanks, idx = [], [], read_chunk.frame_idx
        while len(frames) < t_chunk:
            f = first if first is not None else rd.read()
            first = None
            if f is None:
                break
            frames.append(f)
            blanks.append(idx in blank_set)
            idx += 1
        read_chunk.frame_idx = idx
        if not frames:
            return None
        n = len(frames)
        while len(frames) < t_chunk:
            frames.append(frames[-1])
            blanks.append(False)
        return np.stack(frames), np.asarray(blanks), n

    read_chunk.frame_idx = 0

    # software-pipelined drive: depth(chunk i+1) is dispatched on slice A
    # before stereo(chunk i) is consumed — async dispatch runs both
    pending = None  # (frames_on_b, depths_on_b, blanks, n)
    try:
        while True:
            if cancel_check and cancel_check():
                break
            item = read_chunk()
            if item is None:
                break
            fb, bb, n = item
            fa = jax.device_put(fb, sh_a_frames)
            d = depth_jit(fa)
            if pending is not None:
                pfb, pd, pbb, pn = pending
                trackers, out = stereo_jit(trackers, pfb, pd, pbb)
                write_out(out, pn)
                prog.frames_done += pn
                prog.fps = prog.frames_done / max(
                    time.time() - prog.started, 1e-6)
                if progress_cb:
                    progress_cb(prog)
            # hand-off slice A -> slice B (ICI transfer on a pod),
            # asynchronous: overlaps the next chunk's depth dispatch
            pending = (jax.device_put(fb, sh_b_rows5),
                       jax.device_put(d, sh_b_depth), bb, n)
        if pending is not None:
            pfb, pd, pbb, pn = pending
            trackers, out = stereo_jit(trackers, pfb, pd, pbb)
            write_out(out, pn)
            prog.frames_done += pn
            prog.fps = prog.frames_done / max(
                time.time() - prog.started, 1e-6)
            if progress_cb:
                progress_cb(prog)
    finally:
        rd.close()
        wr.close()
    return prog
