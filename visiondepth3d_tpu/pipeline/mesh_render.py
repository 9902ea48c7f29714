"""Product multi-device rendering: `vd3d render --mesh dp=N[,sp=M]`.

The reference is strictly single-GPU (SURVEY.md §2.8); the TPU build makes
multi-chip execution a product feature. Frame-level DP follows
``parallel/dp.py``: the clip is cut into ``dp`` contiguous segments
(snapped to scene cuts when requested), every mesh device renders its own
segment with freshly warmed trackers — semantically a render started at a
scene boundary, exactly what the reference produces when a user renders a
long movie in manual chunks — and the per-segment outputs are concatenated
in order. The per-chunk compute is the same jitted body as the
single-device path (stereo_pipeline.make_chunk_body) vmapped over the
segment axis with a ``dp`` sharding constraint; with ``sp>1`` frame rows
are additionally sharded spatially (GSPMD inserts the halo exchanges for
the blur/gradient stencils over ICI).

Host I/O scales with the mesh: one seekable reader per segment (native
y4m frame-indexed seek) feeding a [G, T, H, W, 3] batch per step, one
temp y4m writer per segment, and a byte-level concat at the end (y4m
frame records are position-independent).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..io.depth_io import open_depth_reader
from ..io.video import open_video, open_writer
from ..io import blackdetect
from ..parallel.dp import segment_bounds
from ..parallel.mesh import make_mesh
from ..state import init_trackers
from ..stereo import StereoParams
from .geometry import resolve_geometry
from .stereo_pipeline import RenderConfig, RenderProgress, make_chunk_body


def parse_mesh_spec(spec: str | None) -> dict[str, int] | None:
    """'dp=4,sp=2' -> {'dp': 4, 'sp': 2}; 'auto' -> all devices on dp;
    None/'' / 'off' -> None (single-device path).

    Axes (SURVEY §2.8): dp = frame/segment data parallel; sp = spatial
    (frame-row) parallel; tp = tensor parallel over the depth model's
    attention heads / MLP columns (parallel/tp.py); pp = stage pipeline
    parallel (depth slice / stereo slice, parallel/pp.py)."""
    if spec is None:
        return None
    s = str(spec).strip().lower()
    if s in ("", "off", "none", "1"):
        return None
    if s == "auto":
        n = jax.device_count()
        return {"dp": n} if n > 1 else None
    out: dict[str, int] = {}
    for part in s.split(","):
        if "=" not in part:
            raise ValueError(
                f"bad mesh spec {spec!r} (want dp=N[,sp=M][,tp=K][,pp=2])")
        k, v = part.split("=", 1)
        k = k.strip()
        if k not in ("dp", "sp", "tp", "pp"):
            raise ValueError(
                f"unknown mesh axis {k!r} (dp/sp/tp/pp supported)")
        out[k] = int(v)
    if any(out.get(a, 1) < 1 for a in ("dp", "sp", "tp", "pp")):
        raise ValueError(f"bad mesh spec {spec!r}")
    if out.get("pp", 1) not in (1, 2):
        raise ValueError(f"pp={out['pp']}: only pp=2 (depth/stereo "
                         "slices) is supported")
    total = 1
    for a in ("dp", "sp", "tp", "pp"):
        total *= out.get(a, 1)
    if total <= 1:
        return None
    return out


def count_video_frames(path) -> int:
    """Total frames; O(1) for fixed-record y4m/vd16, else one scan pass."""
    p = str(path)
    if p.endswith(".vd16"):
        rd = open_depth_reader(p)
        try:
            n = rd.count()
        finally:
            rd.close()
        if n is not None:
            return int(n)
    rd = open_video(p) if not p.endswith(".vd16") else open_depth_reader(p)
    try:
        n = getattr(rd, "count", lambda: None)()
        if n is not None:
            return int(n)
        total = 0
        while rd.read() is not None:
            total += 1
        return total
    finally:
        rd.close()


def _open_at(path, start_frame: int, fps: float, is_depth: bool):
    """Open a stream positioned at an absolute frame index."""
    rd = open_depth_reader(path) if is_depth else open_video(path)
    if start_frame > 0:
        seek = getattr(rd, "seek", None)
        if seek is None or not seek(start_frame):
            # non-seekable container: fall back to a skip-read (or a
            # time-based ffmpeg seek when the rate is known)
            if not is_depth and fps > 0:
                rd.close()
                rd = open_video(path, start_s=start_frame / fps)
            else:
                for _ in range(start_frame):
                    if rd.read() is None:
                        break
    return rd


def _concat_y4m(seg_paths: list[str], out_path: str) -> None:
    """Byte-level y4m concatenation: header from the first segment, FRAME
    records appended verbatim (all segments share one geometry/rate)."""
    with open(out_path, "wb") as out:
        for i, p in enumerate(seg_paths):
            with open(p, "rb") as f:
                header = f.readline()
                if i == 0:
                    out.write(header)
                shutil.copyfileobj(f, out, 1 << 20)


def make_chunk_fn_batched(params: StereoParams, geom, cfg: RenderConfig,
                          mesh, predictor=None) -> Callable:
    """vmap the single-device chunk body over the segment axis and
    constrain it to the mesh: P('dp') on segments, P('sp') on frame rows."""
    if mesh.shape.get("sp", 1) > 1 and params.warp_backend == "auto":
        # the Pallas warp kernel is device-local; row sharding needs the
        # XLA warp so GSPMD can partition it (parallel/dp.py:75-90)
        params = params.replace(warp_backend="xla")
    body = make_chunk_body(params, geom, cfg, predictor=predictor)

    seg = NamedSharding(mesh, P("dp"))
    rows5 = NamedSharding(mesh, P("dp", None, "sp", None, None))
    rows4 = NamedSharding(mesh, P("dp", None, "sp", None))

    def constrain(trackers, frames_u8, depths=None, blanks=None):
        frames_u8 = jax.lax.with_sharding_constraint(frames_u8, rows5)
        trackers = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, seg), trackers)
        if depths is not None:
            depths = jax.lax.with_sharding_constraint(depths, rows4)
        if blanks is not None:
            blanks = jax.lax.with_sharding_constraint(blanks, seg)
        return trackers, frames_u8, depths, blanks

    if predictor is not None:

        def batched_fused(trackers, frames_u8, blanks):
            trackers, frames_u8, _, blanks = constrain(
                trackers, frames_u8, None, blanks)
            return jax.vmap(body)(trackers, frames_u8, blanks)

        return jax.jit(batched_fused, donate_argnums=(0,))

    def batched(trackers, frames_u8, depths_u16, blanks):
        trackers, frames_u8, depths_u16, blanks = constrain(
            trackers, frames_u8, depths_u16, blanks)
        return jax.vmap(body)(trackers, frames_u8, depths_u16, blanks)

    return jax.jit(batched, donate_argnums=(0,))


def render_stereo_video_mesh(
    input_path,
    depth_path,
    output_path,
    params: StereoParams | None = None,
    cfg: RenderConfig | None = None,
    progress_cb: Callable[[RenderProgress], None] | None = None,
    cancel_check: Callable[[], bool] | None = None,
    predictor=None,
    mesh_axes: dict[str, int] | None = None,
    snap_scenes: bool = False,
    devices=None,
) -> RenderProgress:
    """Segment-parallel render over a dp×sp device mesh.

    Output is identical to rendering each segment separately with the
    single-device path (fresh trackers per segment) and concatenating —
    the documented DP semantics (parallel/dp.py:1-14). Resume is not
    supported here; render segments are already the natural restart unit.
    """
    params = params or StereoParams()
    cfg = cfg or RenderConfig()
    if cfg.resume:
        raise ValueError("--resume is not supported with --mesh; "
                         "re-run without --mesh to continue a checkpoint")
    np.dtype(params.image_dtype)  # validate before opening outputs

    axes = dict(mesh_axes or {})
    if axes.get("pp", 1) != 1:
        raise ValueError("pp meshes route through pp_render."
                         "render_stereo_video_pp (render_stereo_video "
                         "dispatches there)")
    dp = int(axes.get("dp", 1))
    sp = int(axes.get("sp", 1))
    tp = int(axes.get("tp", 1))
    if tp > 1 and predictor is None:
        raise ValueError("--mesh tp=K shards the depth model and needs the "
                         "fused route (no --depth input)")
    devices = devices if devices is not None else jax.devices()
    if dp * sp * tp > len(devices):
        raise ValueError(
            f"mesh dp={dp},sp={sp},tp={tp} needs {dp * sp * tp} devices, "
            f"have {len(devices)}")
    mesh = make_mesh(dp=dp, sp=sp, tp=tp, devices=devices[: dp * sp * tp])
    if predictor is not None and tp > 1:
        # Megatron placement of the ViT params (parallel/tp.py); the
        # chunk body closes over predictor.params, and jit honors the
        # committed shardings of captured arrays — GSPMD inserts one
        # psum per attention/MLP block over the tp axis.
        from ..parallel.tp import shard_params

        predictor.params = shard_params(predictor.params, mesh)

    total = count_video_frames(input_path)
    if depth_path is not None:
        total = min(total, count_video_frames(depth_path))
    if total < dp * 2:  # degenerate: fall back to single-device
        import dataclasses

        from .stereo_pipeline import render_stereo_video

        return render_stereo_video(input_path, depth_path, output_path,
                                   params, dataclasses.replace(cfg,
                                                               mesh="off"),
                                   progress_cb, cancel_check, predictor)

    # probe geometry exactly like the single-device path
    rd0 = open_video(input_path)
    fps = cfg.fps or rd0.fps or 30.0
    first = rd0.read()
    if first is None:
        rd0.close()
        raise ValueError("empty input video")
    in_w, in_h = rd0.width, rd0.height
    rd0.close()
    from .stereo_pipeline import _detect_black_bars_host

    top, bottom = (_detect_black_bars_host(first)
                   if cfg.auto_crop_black_bars else (0, 0))
    geom = resolve_geometry(in_w, in_h, cfg.output_format, cfg.output_height,
                            cfg.aspect, cfg.preserve_original_aspect,
                            top, bottom)

    cuts = None
    if snap_scenes:
        from ..utils import detect_scenes

        with open_video(input_path) as rd:
            cuts = detect_scenes(iter(rd))
    bounds = segment_bounds(total, dp, cuts)

    blank_set: set[int] = set()
    if cfg.skip_blank_frames:
        try:
            blank_set = set(
                blackdetect.detect_blank_frames(str(input_path), fps))
        except Exception:
            blank_set = set()

    chunk_fn = make_chunk_fn_batched(params, geom, cfg, mesh,
                                     predictor=predictor)
    one_tr = init_trackers(geom.eye_h, geom.eye_w)
    trackers = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (dp,) + x.shape), one_tr)

    readers = [_open_at(input_path, b[0], fps, is_depth=False)
               for b in bounds]
    dreaders = ([_open_at(depth_path, b[0], fps, is_depth=True)
                 for b in bounds] if depth_path is not None else None)
    d_h, d_w = ((dreaders[0].height, dreaders[0].width)
                if dreaders is not None else (in_h, in_w))
    remaining = [b[1] - b[0] for b in bounds]
    positions = [b[0] for b in bounds]

    out_is_y4m = str(output_path).endswith(".y4m")
    seg_paths = [f"{output_path}.seg{g}.y4m" for g in range(dp)]
    writers = [open_writer(sp_, geom.out_w, geom.out_h, fps)
               for sp_ in seg_paths]

    yuv_fn = None
    if (cfg.device_yuv and hasattr(writers[0], "write_yuv420")
            and geom.out_w % 2 == 0 and geom.out_h % 2 == 0):
        from ..ops.convert import rgb_u8_to_yuv420

        yuv_fn = jax.jit(jax.vmap(rgb_u8_to_yuv420))

    prog = RenderProgress()
    prog.total_frames = total
    t_chunk = cfg.chunk_size
    last_frame = [None] * dp
    last_depth = [None] * dp
    pending = None  # (out, counts) — encode overlaps compute

    def flush(pending):
        if pending is None:
            return
        out, counts = pending
        if yuv_fn is not None:
            y, u, v = (np.asarray(pl) for pl in out)  # sync point
            for g in range(dp):
                for i in range(counts[g]):
                    writers[g].write_yuv420(y[g, i], u[g, i], v[g, i])
        else:
            host = np.asarray(out)
            for g in range(dp):
                for i in range(counts[g]):
                    writers[g].write(host[g, i])

    try:
        with mesh:
            while any(r > 0 for r in remaining):
                if cancel_check and cancel_check():
                    break
                fb = np.empty((dp, t_chunk, in_h, in_w, 3), np.uint8)
                db = (np.empty((dp, t_chunk, d_h, d_w), np.float32)
                      if dreaders is not None else None)
                bb = np.zeros((dp, t_chunk), bool)
                counts = [0] * dp
                for g in range(dp):
                    n = min(t_chunk, remaining[g])
                    for i in range(t_chunk):
                        if i < n:
                            f = readers[g].read()
                            d = (dreaders[g].read()
                                 if dreaders is not None else None)
                            if f is None or (dreaders is not None
                                             and d is None):
                                n = i  # stream shorter than counted
                                remaining[g] = 0
                                break
                            last_frame[g] = f
                            if dreaders is not None:
                                last_depth[g] = d
                            bb[g, i] = positions[g] in blank_set
                            positions[g] += 1
                        if last_frame[g] is None:  # segment empty: zeros
                            last_frame[g] = np.zeros((in_h, in_w, 3),
                                                     np.uint8)
                            if dreaders is not None:
                                last_depth[g] = np.zeros((d_h, d_w),
                                                         np.float32)
                        fb[g, i] = last_frame[g]
                        if db is not None:
                            db[g, i] = last_depth[g]
                    counts[g] = n
                    remaining[g] = max(0, remaining[g] - n)
                if sum(counts) == 0:
                    break

                if db is None:
                    trackers, out_u8 = chunk_fn(trackers, fb, bb)
                else:
                    db_u16 = np.clip(db * 65535.0 + 0.5, 0,
                                     65535).astype(np.uint16)
                    trackers, out_u8 = chunk_fn(trackers, fb, db_u16, bb)
                if yuv_fn is not None:
                    out_u8 = yuv_fn(out_u8)
                flush(pending)
                pending = (out_u8, counts)

                prog.frames_done += sum(counts)
                elapsed = time.time() - prog.started
                prog.fps = prog.frames_done / max(elapsed, 1e-6)
                if progress_cb:
                    progress_cb(prog)
            flush(pending)
            pending = None
    finally:
        for r in readers:
            r.close()
        if dreaders is not None:
            for r in dreaders:
                r.close()
        for w in writers:
            w.close()

    # stitch segments in order
    if out_is_y4m:
        _concat_y4m(seg_paths, str(output_path))
    else:
        # encoded container: stream the concat through ffmpeg
        from ..io import ffmpeg as ff

        if not ff.have_ffmpeg():
            _concat_y4m(seg_paths, str(output_path) + ".y4m")
        else:
            codec = ff.validate_codec(cfg.codec)
            proc = ff.popen_writer(
                ff.encode_from_y4m_cmd(str(output_path), codec, cfg.crf))
            with proc.stdin as pipe:
                for i, p in enumerate(seg_paths):
                    with open(p, "rb") as f:
                        header = f.readline()
                        if i == 0:
                            pipe.write(header)
                        shutil.copyfileobj(f, pipe, 1 << 20)
            proc.wait()
    for p in seg_paths:
        try:
            os.remove(p)
        except OSError:
            pass
    return prog
