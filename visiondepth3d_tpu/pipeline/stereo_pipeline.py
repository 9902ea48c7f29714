"""End-to-end stereo render: video + depth video -> packed 3D video.

The TPU replacement for ``render_sbs_3d`` (render_3d.py:933-1504). Design
inversion vs the reference (SURVEY.md §7): the host only decodes, batches
and encodes; a single jitted graph does *everything* per chunk of frames —
u8->float conversion, crop/resize, the scanned stereo step, per-eye packing
and the final u8 conversion — so each frame crosses PCIe exactly twice
(u8 in, u8 out) instead of 4-6 float round-trips.

Decode / compute / encode run on three overlapping stages (the native y4m
reader prefetches on a C++ thread; the encoder write happens while the next
chunk computes because device dispatch is async).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..io import blackdetect
from ..io.depth_io import open_depth_reader
from ..io.video import open_video, open_writer
from ..ops import formats as fmt_ops
from ..ops.convert import float_to_u8_round, float_to_u8_trunc, u8_to_float
from ..ops.resize import resize_bilinear
from ..state import init_trackers
from ..stereo import StereoParams
from ..stereo.step import render_chunk
from .geometry import RenderGeometry, resolve_geometry


@dataclasses.dataclass
class RenderConfig:
    output_format: str = "Full-SBS"
    output_height: int = 1080
    aspect: str = "Default (16:9)"
    preserve_original_aspect: bool = False
    codec: str = "libx264"
    crf: int = 23
    fps: float | None = None  # None: inherit input fps
    start_s: float | None = None
    end_s: float | None = None
    chunk_size: int = 16
    skip_blank_frames: bool = False
    auto_crop_black_bars: bool = False
    anaglyph_bgr_convention: bool = False
    resume: bool = False  # continue an interrupted render from its sidecar
    checkpoint_every_chunks: int = 8
    # colorspace conversion on DEVICE + plane write on host: 2x less
    # device->host traffic and the host write leg becomes pure fwrite
    # (benchmarks/host_io.py). Applies when the writer takes planes (y4m).
    device_yuv: bool = True
    # ... and the same on the INPUT side: raw YUV420 planes stream to the
    # device (half the host->device bytes of RGB) and yuv420_to_rgb_u8
    # runs on the VPU, so host decode is a pure fread. Bit-exact vs the
    # host conversion. Applies to plain .y4m inputs without a clip window.
    device_yuv_in: bool = True
    # Multi-device execution (SURVEY §2.8 -> product): "auto" = segment-DP
    # over every device when more than one is visible (single-device
    # behavior is unchanged on a 1-chip host); "dp=N[,sp=M]" pins the mesh;
    # "off" forces single-device. See pipeline/mesh_render.py.
    mesh: str | None = "auto"
    # snap DP segment boundaries to detected scene cuts (extra host decode
    # pass; makes the per-segment tracker warm-up land on cuts)
    mesh_snap_scenes: bool = False


def _detect_black_bars_host(frame_u8: np.ndarray, threshold: float = 10.0):
    """Row-mean scan from top/bottom (render_3d.py:293-316 parity), on the
    first frame only; the crop is static for the whole render."""
    gray = (
        0.299 * frame_u8[..., 0]
        + 0.587 * frame_u8[..., 1]
        + 0.114 * frame_u8[..., 2]
    )
    h = gray.shape[0]
    top = 0
    for i in range(h):
        if gray[i].mean() > threshold:
            top = i
            break
    bottom = 0
    for i in range(h - 1, -1, -1):
        if gray[i].mean() > threshold:
            bottom = h - i - 1
            break
    if top + bottom >= h:
        return 0, 0
    return top, bottom


def _chunk_pieces(
    params: StereoParams, geom: RenderGeometry, cfg: RenderConfig,
    yuv_in: bool = False,
):
    """Shared sub-graphs of the chunk body: ``decode_crop`` (u8/planes in
    -> cropped float frames) and ``finish`` (stereo step + pack + u8 out).
    make_chunk_body composes them into one graph; make_pp_bodies cuts at
    the depth/stereo boundary for stage-PP (parallel/pp.py)."""
    params = params.replace(warp_hw=(geom.warp_h, geom.warp_w))
    try:
        params = params.with_shift_bound(geom.warp_w)
    except TypeError:
        pass  # traced percent (unusual): fall back to the gather warp

    def crop(x):
        return x[
            :,
            geom.crop_y : geom.crop_y + geom.crop_h,
            geom.crop_x : geom.crop_x + geom.crop_w,
        ]

    def decode_in(frames_in):
        """frames_in: RGB u8 [T,H,W,3], or (Y,U,V) planes in yuv mode —
        the device-side inverse of the C++ reader's conversion."""
        if yuv_in:
            from ..ops.convert import yuv420_to_rgb_u8

            yb, ub, vb = frames_in
            return yuv420_to_rgb_u8(yb, ub, vb)
        return frames_in

    def decode(frames_in):
        return u8_to_float(decode_in(frames_in))

    def decode_crop(frames_in):
        return crop(decode(frames_in))

    def finish(trackers, frames, depths, blanks):
        trackers, outs = render_chunk(params, trackers, frames, depths, blanks)

        def pack(eyes):
            left, right = eyes
            l, r = fmt_ops.pack_per_eye(
                left, right, cfg.output_format, geom.per_eye_w, geom.per_eye_h
            )
            packed = fmt_ops.format_3d_output(
                l,
                r,
                cfg.output_format,
                anaglyph_bgr_convention=cfg.anaglyph_bgr_convention,
            )
            return packed

        packed = jax.vmap(lambda L, R: pack((L, R)))(outs.left, outs.right)
        to_u8 = float_to_u8_trunc if params.parity_quantize else float_to_u8_round
        return trackers, to_u8(packed)

    return decode, crop, decode_crop, finish


def make_chunk_body(
    params: StereoParams, geom: RenderGeometry, cfg: RenderConfig,
    predictor=None, yuv_in: bool = False,
) -> Callable:
    """Build the UNJITTED chunk body: u8 in -> packed u8 out.

    With ``predictor`` (a DepthPredictor), depth is inferred INSIDE the
    same graph — the fused single-pass 2D->3D route (what bench.py and
    __graft_entry__.entry measure). The reference has no analog: it
    always round-trips a quantized depth video between its two tabs;
    here the depth map flows to the warp at full float precision without
    ever touching the host. Without ``predictor``, depth arrives as the
    u16-quantized stream of a previous `vd3d depth` pass.

    Callers jit it directly (make_chunk_fn) or vmap it over video
    segments first (pipeline.mesh_render, frame-DP over a device mesh)."""
    decode, crop, decode_crop, finish = _chunk_pieces(params, geom, cfg,
                                                      yuv_in=yuv_in)

    if predictor is not None:

        def chunk_fused(trackers, frames_u8, blanks):
            frames = decode_crop(frames_u8)  # [T, ch, cw, 3]
            # inline inference on the cropped source; the predictor emits
            # per-batch-normalized [0,1] depth directly at eye resolution
            depths = predictor.predict_01(frames,
                                          out_hw=(geom.eye_h, geom.eye_w))
            frames = resize_bilinear(frames, (geom.eye_h, geom.eye_w))
            return finish(trackers, frames, depths, blanks)

        return chunk_fused

    def chunk_fn(trackers, frames_u8, depths_u16, blanks):
        frames = decode(frames_u8)  # [T, H, W, 3]
        # depth ships as lossless uint16 (8-bit k/255 == k*257/65535 exactly)
        depths = depths_u16.astype(jnp.float32) / 65535.0  # [T, Hd, Wd]
        if depths.shape[1:] != frames.shape[1:3]:
            depths = resize_bilinear(depths, frames.shape[1:3])
        frames, depths = crop(frames), crop(depths)
        # per-eye resize (render_3d.py:1262-1263)
        frames = resize_bilinear(frames, (geom.eye_h, geom.eye_w))
        depths = resize_bilinear(depths, (geom.eye_h, geom.eye_w))
        return finish(trackers, frames, depths, blanks)

    return chunk_fn


def make_pp_bodies(
    params: StereoParams, geom: RenderGeometry, cfg: RenderConfig,
    predictor, yuv_in: bool = False,
) -> tuple[Callable, Callable]:
    """The fused chunk body cut at the depth/stereo boundary for
    stage-PP (SURVEY §2.8 "PP across pipeline stages"):

      depth_body(frames_in) -> depths01 [T, eye_h, eye_w]   (slice A)
      stereo_body(trackers, frames_in, depths01, blanks)
          -> (trackers, packed_u8)                          (slice B)

    Both stages re-run the cheap u8 decode + crop locally, so only the
    [T, eye_h, eye_w] float depth crosses between slices (ICI on a pod).
    Composing stereo_body(depth_body) is graph-identical to
    make_chunk_body's fused route."""
    decode, crop, decode_crop, finish = _chunk_pieces(params, geom, cfg,
                                                      yuv_in=yuv_in)
    del decode, crop  # pp stages only need the composed decode_crop

    def depth_body(frames_in):
        frames = decode_crop(frames_in)
        return predictor.predict_01(frames, out_hw=(geom.eye_h, geom.eye_w))

    def stereo_body(trackers, frames_in, depths01, blanks):
        frames = resize_bilinear(decode_crop(frames_in),
                                 (geom.eye_h, geom.eye_w))
        return finish(trackers, frames, depths01, blanks)

    return depth_body, stereo_body


def make_chunk_fn(
    params: StereoParams, geom: RenderGeometry, cfg: RenderConfig,
    predictor=None, yuv_in: bool = False,
) -> Callable:
    """Jitted single-device chunk function (see make_chunk_body)."""
    body = make_chunk_body(params, geom, cfg, predictor=predictor,
                           yuv_in=yuv_in)
    return jax.jit(body, donate_argnums=(0,))


@dataclasses.dataclass
class RenderProgress:
    frames_done: int = 0
    total_frames: int | None = None
    fps: float = 0.0
    started: float = dataclasses.field(default_factory=time.time)

    def eta_seconds(self) -> float | None:
        if not self.total_frames or self.fps <= 0:
            return None
        return (self.total_frames - self.frames_done) / self.fps


def render_stereo_video(
    input_path,
    depth_path,
    output_path,
    params: StereoParams | None = None,
    cfg: RenderConfig | None = None,
    progress_cb: Callable[[RenderProgress], None] | None = None,
    cancel_check: Callable[[], bool] | None = None,
    predictor=None,
) -> RenderProgress:
    """Render a full video. Returns final progress stats.

    ``depth_path=None`` + ``predictor`` = the fused single-pass 2D->3D
    route: depth inference and the stereo step run in one device graph
    per chunk (see make_chunk_fn). ``cancel_check`` is polled between
    chunks (cooperative cancel, the render_3d.py:1195-1220
    suspend/cancel analog — suspension is just the caller not returning
    from the callback)."""
    if depth_path is None and predictor is None:
        raise ValueError("need a depth video or a depth predictor")
    if depth_path is not None and predictor is not None:
        raise ValueError("pass either depth_path or predictor, not both")
    cfg_probe = cfg or RenderConfig()
    if not cfg_probe.resume:
        from .mesh_render import parse_mesh_spec

        axes = parse_mesh_spec(cfg_probe.mesh)
        if axes is not None and axes.get("pp", 1) == 2:
            from .pp_render import render_stereo_video_pp

            return render_stereo_video_pp(
                input_path, output_path, params, cfg_probe,
                progress_cb, cancel_check, predictor, mesh_axes=axes)
        if axes is not None:
            from .mesh_render import render_stereo_video_mesh

            return render_stereo_video_mesh(
                input_path, depth_path, output_path, params, cfg_probe,
                progress_cb, cancel_check, predictor, mesh_axes=axes,
                snap_scenes=cfg_probe.mesh_snap_scenes)
    params = params or StereoParams()
    # fail on malformed params BEFORE the output file is opened — otherwise
    # a typo'd --image_dtype leaves a partial .y4m behind
    import numpy as _np

    _np.dtype(params.image_dtype)
    cfg = cfg or RenderConfig()

    rd = open_video(input_path, cfg.start_s, cfg.end_s)
    dd = open_depth_reader(depth_path) if depth_path is not None else None
    fps = cfg.fps or rd.fps or 30.0

    first = rd.read()
    if first is None:
        raise ValueError("empty input video")
    top, bottom = (
        _detect_black_bars_host(first) if cfg.auto_crop_black_bars else (0, 0)
    )
    geom = resolve_geometry(
        rd.width,
        rd.height,
        cfg.output_format,
        cfg.output_height,
        cfg.aspect,
        cfg.preserve_original_aspect,
        top,
        bottom,
    )

    blank_set: set[int] = set()
    if cfg.skip_blank_frames:
        try:
            blank_set = set(blackdetect.detect_blank_frames(str(input_path), fps))
        except Exception:
            blank_set = set()

    # raw-plane input: reopen the clip as a plane reader — host decode
    # becomes pure fread, the device does yuv420->rgb (bit-exact)
    yuv_in = (
        cfg.device_yuv_in
        and str(input_path).endswith(".y4m")
        and cfg.start_s is None and cfg.end_s is None
        and rd.width % 2 == 0 and rd.height % 2 == 0
    )
    if yuv_in:
        from ..io.y4m import Y4MPlaneReader

        rd.close()
        rd = Y4MPlaneReader(input_path)
        frame = None  # re-read frame 0 as planes
    chunk_fn = make_chunk_fn(params, geom, cfg, predictor=predictor,
                             yuv_in=yuv_in)
    trackers = init_trackers(geom.eye_h, geom.eye_w)

    # resume: restore trackers + skip already-rendered frames (y4m output
    # appends; the EMA state makes the continuation bit-identical)
    skip_n = 0
    if cfg.resume:
        from .resume import load_checkpoint, truncate_y4m_to

        state = load_checkpoint(output_path, trackers)
        if state is not None:
            skip_n, trackers = state
            # the file may be ahead of the checkpoint (flush lags compute by
            # one chunk) — cut it back so the continuation never duplicates
            truncate_y4m_to(output_path, skip_n)

    wr = open_writer(output_path, geom.out_w, geom.out_h, fps, cfg.codec,
                     cfg.crf, append=skip_n > 0)
    prog = RenderProgress()
    prog.frames_done = skip_n
    t_chunk = cfg.chunk_size

    yuv_fn = None
    yuv_packed = False
    if (cfg.device_yuv and hasattr(wr, "write_yuv420")
            and geom.out_w % 2 == 0 and geom.out_h % 2 == 0):
        import jax

        from ..ops.convert import rgb_u8_to_yuv420

        if geom.out_h % 4 == 0:
            # pack Y+U+V into ONE [T, 1.5H, W] array: a single
            # device->host fetch per chunk (each fetch pays ~0.1 s relay
            # latency on this rig; 3 plane fetches were pure overhead)
            yuv_packed = True

            def pack_planes(frames_u8):
                y, u, v = rgb_u8_to_yuv420(frames_u8)
                t, hh, ww = y.shape
                return jnp.concatenate(
                    [y, u.reshape(t, hh // 4, ww),
                     v.reshape(t, hh // 4, ww)], axis=1)

            yuv_fn = jax.jit(pack_planes)
        else:
            yuv_fn = jax.jit(rgb_u8_to_yuv420)

    pending = None  # (out, n, ckpt_or_None) — encode overlaps compute
    chunks_since_ckpt = 0

    def flush(pending):
        if pending is None:
            return
        out, n, ckpt = pending
        if yuv_packed:
            host = np.asarray(out)  # sync point, ONE fetch
            hh, ww = geom.out_h, geom.out_w
            q = hh // 4
            for i in range(n):
                wr.write_yuv420(
                    host[i, :hh],
                    host[i, hh : hh + q].reshape(hh // 2, ww // 2),
                    host[i, hh + q :].reshape(hh // 2, ww // 2))
        elif yuv_fn is not None:
            y, u, v = (np.asarray(p) for p in out)  # sync point
            for i in range(n):
                wr.write_yuv420(y[i], u[i], v[i])
        else:
            host = np.asarray(out)  # sync point
            for i in range(n):
                wr.write(host[i])
        if ckpt is not None:
            from .resume import save_checkpoint

            save_checkpoint(output_path, ckpt[0], ckpt[1])

    frame_idx = 0
    frame = None if yuv_in else first
    eof = False
    try:
        # fast-forward both streams past already-rendered frames
        while frame_idx < skip_n:
            if frame is None:
                frame = rd.read()
            d = dd.read() if dd is not None else frame
            if frame is None or d is None:
                eof = True
                break
            frame = None
            frame_idx += 1

        while not eof:
            if cancel_check and cancel_check():
                break
            frames, depths, blanks = [], [], []
            while len(frames) < t_chunk:
                if frame is None:
                    frame = rd.read()
                if frame is None:
                    eof = True
                    break
                if dd is not None:
                    d = dd.read()
                    if d is None:
                        eof = True
                        break
                    depths.append(d)
                frames.append(frame)
                blanks.append(frame_idx in blank_set)
                frame_idx += 1
                frame = None
            if not frames:
                break
            n = len(frames)
            while len(frames) < t_chunk:  # pad tail chunk to static shape
                frames.append(frames[-1])
                if dd is not None:
                    depths.append(depths[-1])
                blanks.append(False)
            if yuv_in:  # frames are (Y, U, V) plane tuples
                fb = (np.stack([f[0] for f in frames]),
                      np.stack([f[1] for f in frames]),
                      np.stack([f[2] for f in frames]))
            else:
                fb = np.stack(frames)
            bb = np.asarray(blanks)

            if dd is None:
                trackers, out_u8 = chunk_fn(trackers, fb, bb)
            else:
                db = np.stack(depths)
                # depth ships as lossless uint16 (8-bit k/255 == k*257/65535)
                db_u16 = np.clip(db * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
                trackers, out_u8 = chunk_fn(trackers, fb, db_u16, bb)
            if yuv_fn is not None:
                out_u8 = yuv_fn(out_u8)
            flush(pending)
            chunks_since_ckpt += 1
            ckpt = None
            if (
                cfg.checkpoint_every_chunks > 0
                and chunks_since_ckpt >= cfg.checkpoint_every_chunks
            ):
                # snapshot to host NOW: the next chunk_fn call donates these
                # tracker buffers
                import jax

                ckpt = (frame_idx, jax.tree.map(np.asarray, trackers))
                chunks_since_ckpt = 0
            pending = (out_u8, n, ckpt)

            prog.frames_done += n
            elapsed = time.time() - prog.started
            prog.fps = (prog.frames_done - skip_n) / max(elapsed, 1e-6)
            if progress_cb:
                progress_cb(prog)
        flush(pending)
        if eof:
            from .resume import clear_checkpoint

            clear_checkpoint(output_path)
    finally:
        rd.close()
        if dd is not None:
            dd.close()
        wr.close()
    return prog
