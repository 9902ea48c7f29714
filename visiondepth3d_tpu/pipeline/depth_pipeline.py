"""Depth estimation pipeline: 2D video -> grayscale depth video.

The TPU replacement for ``process_video2`` (render_depth.py:1636-1985),
with the reference's three routes:

- feed-forward models (DA/DPT families): batched device inference, one
  jitted graph (resize -> normalize -> model -> per-frame percentile u8);
- diffusion image models (Marigold): per-batch diffusion with 16-bit export
  (the reference's ffmpeg-extract -> folder -> FFV1 gray16le special path,
  :1675-1714, collapses into the same streaming loop here);
- video diffusion (DepthCrafter): whole-clip sliding-window inference with
  frame striding to a target fps (:1830-1890).

Plus the letterbox subsystem: bootstrap detection, per-frame tracker, crop
before inference, neutral-fill bar reinsertion, JSON sidecar.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..depth.registry import load_predictor
from ..io.depth_io import open_depth16_writer
from ..io.video import open_video, open_writer
from ..ops.resize import resize_bilinear


@dataclasses.dataclass
class DepthConfig:
    model: str = "depth-anything-v2-small"
    checkpoint: str | None = None
    # square int, (h, w) rectangle, or None = source resolution (the
    # reference's "Original" / rectangular catalog entries,
    # render_depth.py:631-684); families snap per dimension
    inference_size: int | tuple | None = 518
    batch_size: int = 8
    invert: bool = False
    bits: int = 8  # 8 -> video, 16 -> .vd16
    dtype: str = "float32"  # "bfloat16": bf16 matmuls + bf16-softmax attention
    codec: str = "libx264"
    percentile_lo: float = 1.0
    percentile_hi: float = 99.0
    track_letterbox: bool = False
    # Tiled (Hann) high-resolution inference (render_depth.py:46,102-170):
    # the frame is resized to ``inference_size`` height (aspect kept), cut
    # into overlapping ``tile_size`` model tiles, and raw tile depths are
    # Hann-blended before normalization. One batched model call per chunk.
    tiled: bool = False
    tile_size: int = 518
    tile_overlap: int = 64
    # DA-family head order: True (default) runs the DPT head's last two
    # convs at feature resolution and upsamples the 1-channel depth last —
    # same weights, ~3x fewer head FLOPs, output differs only by the
    # resize/conv commutation (bounded in tests). --exact-head restores
    # the transformers op order.
    fast_head: bool = True
    # DepthCrafter route (render_depth.py:1830-1890 analog)
    target_fps: float = 15.0  # stride long clips down to this rate
    window_size: int = 24
    overlap: int = 6
    steps: int = 2
    max_segment_frames: int = 96  # host-RAM bound for diffusion streaming
    # random weights produce noise; tests/benchmarks opt in explicitly
    allow_random: bool = False
    # Multi-device execution (SURVEY §2.8 -> product): "auto" = frame-DP
    # over the inference batch when more than one device is visible
    # (DepthCrafter: window-CP across devices); "dp=N" pins it; "off"
    # forces single-device. Frames are independent on the feed-forward
    # routes, so sharding the batch axis is exact — no seam semantics.
    mesh: str | None = "auto"


def _size_h(size) -> int:
    """Height of an inference-size spec (int -> itself)."""
    return int(size[0]) if isinstance(size, (tuple, list)) else int(size)


def _resolve_size(cfg: DepthConfig, src_hw: tuple[int, int]) -> "DepthConfig":
    """Materialize inference_size=None ("Original") to the source frame
    geometry; later per-family snapping takes it to a valid shape."""
    if cfg.inference_size is not None:
        return cfg
    return dataclasses.replace(cfg, inference_size=tuple(src_hw))


def _resolve_mesh(cfg: DepthConfig):
    """-> (mesh, dp) or (None, 1).

    The depth route accepts dp (batch frames), sp (frame rows — SURVEY
    §2.8 "spatial SP within a frame": GSPMD shards the resize + model
    graph over rows, inserting the all-gathers global attention needs)
    and tp (Megatron param sharding of the ViT, parallel/tp.py —
    math-identical to single-device, unlike DP segmentation). pp is a
    render-stage axis."""
    from .mesh_render import parse_mesh_spec

    axes = parse_mesh_spec(cfg.mesh)
    if not axes:
        return None, 1
    if axes.get("pp", 1) != 1:
        raise ValueError("vd3d depth does not pipeline stages; pp is a "
                         "vd3d render axis (--mesh pp=2)")
    dp = int(axes.get("dp", 1))
    sp = int(axes.get("sp", 1))
    tp = int(axes.get("tp", 1))
    if dp * sp * tp <= 1:
        return None, 1
    from ..parallel.mesh import make_mesh

    n = dp * sp * tp
    return make_mesh(dp=dp, sp=sp, tp=tp, devices=jax.devices()[:n]), dp


def make_depth_batch_fn(pred, cfg: DepthConfig, out_hw: tuple[int, int],
                        mesh=None):
    """u8 frames in -> u8/u16 normalized depth out, one jitted graph.

    With ``mesh``, the batch axis carries a P('dp') sharding constraint:
    XLA splits the whole graph (resize -> model -> percentile normalize)
    across devices with zero collectives — per-frame normalization keeps
    every frame device-local. An ``sp`` axis additionally shards frame
    ROWS (GSPMD inserts the gathers the global ops need); a ``tp`` axis
    shards the model's attention/MLP params Megatron-style — the caller
    places ``params`` with parallel.tp.shard_params."""
    if cfg.tiled:
        from ..ops.tiling import tiled_apply_batch

        s = pred._size[0]  # model tile resolution (snapped square tile_size)
        hh, ww = out_hw
        wh = max(s, _size_h(cfg.inference_size))  # working height
        wwid = max(s, int(round(wh * ww / max(hh, 1))))
        ov = min(cfg.tile_overlap, s - 1)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rows = "sp" if mesh.shape.get("sp", 1) > 1 else None
        batch_sh = NamedSharding(mesh, P("dp", rows))

    @jax.jit
    def fn(params, frames_u8):
        if mesh is not None:
            frames_u8 = jax.lax.with_sharding_constraint(frames_u8, batch_sh)
        frames = frames_u8.astype(jnp.float32) / 255.0
        if cfg.tiled:
            x = resize_bilinear(frames, (wh, wwid), channel_last=True)
            d = tiled_apply_batch(
                lambda t: pred._forward(params, t), x, (s, s), ov
            )  # [B, wh, wwid] raw, Hann-blended
        else:
            d = pred._forward(params, frames)  # [B, s, s] raw
        d = resize_bilinear(d, out_hw, channel_last=False)
        # per-frame percentile normalization (render_depth.py:173-194)
        lo = jnp.percentile(d, cfg.percentile_lo, axis=(1, 2), keepdims=True)
        hi = jnp.percentile(d, cfg.percentile_hi, axis=(1, 2), keepdims=True)
        d01 = jnp.clip((d - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
        if cfg.invert:
            d01 = 1.0 - d01
        if cfg.bits == 16:
            return jnp.clip(d01 * 65535.0 + 0.5, 0, 65535).astype(jnp.uint16)
        return jnp.clip(d01 * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

    return fn


def render_depth_video_file(
    input_path,
    output_path,
    cfg: DepthConfig | None = None,
    progress_cb: Callable | None = None,
    predictor=None,
    cancel_check: Callable | None = None,
) -> int:
    """``cancel_check`` is polled between inference batches (the
    reference's cancel_requested Event, render_depth.py:37-39,1894):
    True stops cleanly with the frames written so far; a paused control
    file simply blocks the callback (make_control_check semantics)."""
    cfg = cfg or DepthConfig()
    from ..depth.registry import CATALOG

    entry = CATALOG.get(cfg.model)
    if entry is not None and entry.family == "diffusion":
        return _render_depth_diffusion(input_path, output_path, cfg,
                                       progress_cb, predictor,
                                       cancel_check=cancel_check)
    if entry is not None and entry.family == "vda":
        return _render_depth_vda(input_path, output_path, cfg,
                                 progress_cb, predictor,
                                 cancel_check=cancel_check)
    rd = open_video(input_path)
    cfg = _resolve_size(cfg, (rd.height, rd.width))
    if predictor is None and cfg.checkpoint is None:
        import warnings

        warnings.warn(
            f"{cfg.model}: no --checkpoint given, running RANDOM weights — "
            "output is not real depth (compile/shape testing only)"
        )
    pred = predictor or load_predictor(
        cfg.model, cfg.checkpoint,
        cfg.tile_size if cfg.tiled else cfg.inference_size,
        dtype=cfg.dtype, fast_head=cfg.fast_head,
    )

    mesh, dp = _resolve_mesh(cfg)
    if dp > 1 and cfg.batch_size % dp:
        # round the batch up so every device gets equal frames
        cfg = dataclasses.replace(
            cfg, batch_size=((cfg.batch_size + dp - 1) // dp) * dp)
    run_params = pred.params
    if mesh is not None:
        # TP: Megatron column/row placement of the attention/MLP kernels
        # (one psum per block, inserted by GSPMD); with tp=1 this
        # replicates the params across the mesh — either way the params
        # land on the mesh devices instead of defaulting to device 0.
        from ..parallel.tp import shard_params

        run_params = shard_params(run_params, mesh)

    # Letterbox: bootstrap on buffered probe frames (render_depth.py:1730),
    # then the hysteresis tracker runs LIVE on every frame (:1811) — a
    # confirmed mid-video bar change re-keys the jitted graph at the new
    # crop (one recompile per confirmed aspect change, which the tracker's
    # scene-cut gating + cooldown makes rare). Output depth reinserts
    # neutral-fill bars per frame (:1920-1933); the JSON sidecar records
    # the per-segment crops.
    pending: list = []
    tracker = None
    top = bot = 0
    segments: list = []
    if cfg.track_letterbox:
        from ..io import letterbox as lb

        for _ in range(9):
            f = rd.read()
            if f is None:
                break
            pending.append(f)
        tracker = lb.LetterboxTracker(rd.height, rd.fps)
        top, bot, _ = tracker.bootstrap(pending)
        segments = [(0, top, bot)]

    fns: dict = {}

    def get_fn(ch):
        if ch not in fns:
            fns[ch] = make_depth_batch_fn(pred, cfg, (ch, rd.width),
                                          mesh=mesh)
        return fns[ch]

    from ..io.letterbox import reinsert_bars

    if cfg.bits == 16:
        wr = open_depth16_writer(output_path, rd.width, rd.height,
                                 rd.fps)

        def write(d, t, b):
            wr.write(reinsert_bars(np.asarray(d), t, b, fill=32768))
    else:
        wr = open_writer(output_path, rd.width, rd.height, rd.fps, cfg.codec)

        def write(d, t, b):
            g = reinsert_bars(np.asarray(d), t, b, fill=128)
            wr.write(np.repeat(g[..., None], 3, axis=-1))

    def next_frame():
        if pending:
            return pending.pop(0)
        return rd.read()

    n_done = 0
    t0 = time.time()
    frame_idx = 0
    batch: list = []
    batch_bars = (top, bot)

    def flush():
        nonlocal n_done
        if not batch:
            return
        n = len(batch)
        padded = batch + [batch[-1]] * (cfg.batch_size - n)
        out_np = np.asarray(
            get_fn(padded[0].shape[0])(run_params,
                                       jnp.asarray(np.stack(padded)))
        )
        for i in range(n):
            write(out_np[i], *batch_bars)
        batch.clear()
        n_done += n
        if progress_cb:
            progress_cb(n_done, n_done / max(time.time() - t0, 1e-6))

    try:
        while True:
            if cancel_check and not batch and cancel_check():
                break  # poll at batch boundaries (reference :1894 analog)
            f = next_frame()
            if f is None:
                flush()
                break
            if tracker is not None:
                t2, b2 = tracker.update(f, frame_idx)
            else:
                t2, b2 = 0, 0
            if (t2, b2) != batch_bars:
                flush()  # bars changed: close the batch at the old crop
                batch_bars = (t2, b2)
                if segments and (t2, b2) != segments[-1][1:]:
                    segments.append((frame_idx, t2, b2))
            crop = f[t2 : rd.height - b2] if (t2 or b2) else f
            batch.append(crop)
            if len(batch) == cfg.batch_size:
                flush()
            frame_idx += 1
    finally:
        rd.close()
        wr.close()
        if tracker is not None:
            from ..io import letterbox as lb

            lb.save_sidecar(output_path, segments[0][1], segments[0][2],
                            segments=segments)
    return n_done


def _render_depth_vda(input_path, output_path, cfg: DepthConfig,
                      progress_cb=None, predictor=None,
                      cancel_check=None) -> int:
    """Video Depth Anything: windowed video inference (the reference's
    rank-5 ONNX route, render_depth.py:892-900) streamed in window-sized
    chunks. Consecutive chunks share ``overlap`` frames; each chunk is
    scale/shift-aligned to the previous on the overlap (VDA's own
    inference recipe), and normalization uses a running percentile EMA so
    the temporal stability the model buys isn't destroyed by per-frame
    rescaling."""
    import jax.numpy as jnp  # noqa: F811 (module-level import exists)

    from ..depth.model import snap
    from ..depth.vda import _align_scale_shift

    rd = open_video(input_path)
    cfg = _resolve_size(cfg, (rd.height, rd.width))
    size = cfg.inference_size
    if isinstance(size, (tuple, list)):
        if size[0] != size[1]:
            # mirror load_predictor's refusal instead of silently running
            # a square inference the user did not ask for ('original' on a
            # non-square source lands here too)
            raise ValueError(
                "video-depth-anything runs its windowed pipeline at a "
                "square size; pass an int --inference-size")
        size = int(size[0])
    pred = predictor or load_predictor(cfg.model, cfg.checkpoint, size)
    win, ov = pred.cfg.window, max(1, pred.cfg.overlap)
    patch = pred.cfg.base.backbone.patch_size
    s = snap(size, patch)
    pending_probe, top, bot = _bootstrap_letterbox(rd, cfg)
    ch = rd.height - top - bot
    out_hw = (ch, rd.width)
    wr, write = _open_depth_writer(output_path, rd.width, ch,
                                   rd.fps, cfg, bars=(top, bot))
    n = 0
    t0 = time.time()
    ema_lo = ema_hi = None
    prev_tail = None
    carry: list = []

    def emit(depth_raw):
        nonlocal n, ema_lo, ema_hi
        d = jnp.asarray(depth_raw)
        d = resize_bilinear(d, out_hw, channel_last=False)
        d = np.asarray(d)
        lo = np.percentile(d, cfg.percentile_lo)
        hi = np.percentile(d, cfg.percentile_hi)
        ema_lo = lo if ema_lo is None else 0.9 * ema_lo + 0.1 * lo
        ema_hi = hi if ema_hi is None else 0.9 * ema_hi + 0.1 * hi
        d01 = np.clip((d - ema_lo) / max(ema_hi - ema_lo, 1e-9), 0, 1)
        for frame in d01:
            write(1.0 - frame if cfg.invert else frame)
        n += d01.shape[0]
        if progress_cb:
            progress_cb(n, n / max(time.time() - t0, 1e-6))

    def frames_cropped():
        for f in pending_probe:
            yield f[top : rd.height - bot] if (top or bot) else f
        for f in rd:
            yield f[top : rd.height - bot] if (top or bot) else f

    try:
        gen = frames_cropped()
        eof = False
        while not eof:
            if cancel_check and cancel_check():
                break  # window-boundary cancel poll
            chunk = list(carry)
            want = win - len(chunk)
            for f in gen:
                chunk.append(f)
                want -= 1
                if want == 0:
                    break
            eof = want > 0  # generator exhausted before filling the window
            new = len(chunk) - len(carry)
            if new <= 0:
                break
            x = np.stack(chunk).astype(np.float32) / 255.0
            x = np.asarray(
                resize_bilinear(jnp.asarray(x), (s, s), channel_last=True)
            )
            d = np.asarray(pred(x))  # [t, s', s'] raw
            if prev_tail is not None:
                a, b = _align_scale_shift(d[: len(carry)], prev_tail)
                d = d * a + b
                d = d[len(carry):]
            emit(d)
            prev_tail = d[-ov:] if len(d) >= ov else d
            carry = chunk[-ov:]
    finally:
        rd.close()
        wr.close()
        if cfg.track_letterbox:
            from ..io.letterbox import save_sidecar

            save_sidecar(output_path, top, bot)
    return n


def _open_depth_writer(output_path, w, h, fps, cfg: DepthConfig,
                       bars: tuple[int, int] = (0, 0)):
    """Depth writer; with ``bars=(top, bot)`` each written frame gets
    neutral-fill letterbox bars reinserted (render_depth.py:1920-1933)."""
    from ..io.letterbox import reinsert_bars

    top, bot = bars
    if cfg.bits == 16:
        wr = open_depth16_writer(output_path, w, h + top + bot, fps)

        def write(d01):
            d = np.clip(d01 * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
            wr.write(reinsert_bars(d, top, bot, fill=32768))
    else:
        wr = open_writer(output_path, w, h + top + bot, fps, cfg.codec)

        def write(d01):
            g = np.clip(d01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
            g = reinsert_bars(g, top, bot, fill=128)
            wr.write(np.repeat(g[..., None], 3, axis=-1))

    return wr, write


def _bootstrap_letterbox(rd, cfg: DepthConfig):
    """Static letterbox for the diffusion/VDA routes: bootstrap on probe
    frames, ONE crop for the whole clip. These routes carry state across
    the clip (sliding windows, whole-clip normalization), so a mid-video
    bar change cannot re-key them the way the feed-forward route's live
    tracker does (render_depth_video_file) — constant bars (the common
    case) are cropped before inference and reinserted in the output.
    Returns (pending_probe_frames, top, bot)."""
    if not cfg.track_letterbox:
        return [], 0, 0
    from ..io import letterbox as lb

    pending = []
    for _ in range(9):
        f = rd.read()
        if f is None:
            break
        pending.append(f)
    tracker = lb.LetterboxTracker(rd.height, rd.fps)
    top, bot, _ = tracker.bootstrap(pending)
    return pending, top, bot


def _render_depth_diffusion(input_path, output_path, cfg: DepthConfig,
                            progress_cb=None, pipeline=None,
                            cancel_check=None) -> int:
    """Diffusion routes, bounded-memory (the reference reads batches and
    strides windows, render_depth.py:1799-1890; round 1 loaded the whole
    clip into host RAM):

    - Marigold: per-batch image diffusion; outputs are absolute [0, 1] per
      frame, so batches stream straight to the writer.
    - DepthCrafter: segments of a few sliding windows stream through
      ``run_raw``; consecutive segments share ``overlap`` source frames,
      are stitched with least-squares scale/shift alignment + linear
      cross-fade on the overlap, and raw depth spills to a float16 sidecar
      so the final pass can apply the reference's whole-clip min-max
      normalization (save_depthcrafter_outputs, render_depth.py:1161-1184)
      without holding the clip in memory.
    """
    rd = open_video(input_path)
    stride = 1
    if cfg.model == "depthcrafter" and rd.fps and rd.fps > cfg.target_fps:
        stride = max(1, int(round(rd.fps / cfg.target_fps)))
    if pipeline is None:
        pipeline = load_predictor(
            cfg.model, cfg.checkpoint, steps=cfg.steps,
            window=cfg.window_size, overlap=cfg.overlap,
            allow_random=cfg.allow_random,
        )
    out_fps = (rd.fps or 24.0) / stride
    # letterbox: static bootstrap crop (reinserted by the writer); the
    # reference applies letterbox to the whole process_video2
    # (render_depth.py:1730,1811) — VERDICT r2 weak #5
    pending_probe, top, bot = _bootstrap_letterbox(rd, cfg)
    # diffusion latents need stride-8-aligned sizes; crop to align
    h8 = ((rd.height - top - bot) // 8) * 8
    w8 = (rd.width // 8) * 8

    def frames01():
        import itertools

        for i, f in enumerate(itertools.chain(pending_probe, rd)):
            if i % stride == 0:
                f = f[top : top + h8, :w8] if (top or bot) else f[:h8, :w8]
                yield f.astype(np.float32) / 255.0

    t0 = time.time()

    if cfg.model != "depthcrafter":  # Marigold: single-pass streaming
        wr, write = _open_depth_writer(output_path, w8, h8, out_fps, cfg,
                                       bars=(top, bot))
        n = 0
        batch: list = []

        def flush():
            nonlocal n
            if not batch:
                return
            out = np.asarray(pipeline(np.stack(batch)))
            for d in out:
                write(1.0 - d if cfg.invert else d)
            n += len(batch)
            batch.clear()
            if progress_cb:
                progress_cb(n, n / max(time.time() - t0, 1e-6))

        try:
            for f in frames01():
                batch.append(f)
                if len(batch) == cfg.batch_size:
                    flush()
                    if cancel_check and cancel_check():
                        break  # batch-boundary cancel poll
            flush()
        finally:
            rd.close()
            wr.close()
            if cfg.track_letterbox:
                from ..io.letterbox import save_sidecar

                save_sidecar(output_path, top, bot)
        return n

    # --- DepthCrafter: segment streaming + two-pass global normalize ---
    from ..depth.vda import _align_scale_shift

    # temporal context parallelism: with a mesh, each segment's sliding
    # windows denoise CONCURRENTLY across the dp axis (run_raw_parallel;
    # seam quality bound in tests/test_diffusion.py) instead of serially
    mesh, _dp = _resolve_mesh(cfg)

    def seg_raw(seg_np):
        if mesh is not None:
            with mesh:
                return np.asarray(pipeline.run_raw_parallel(seg_np,
                                                            mesh=mesh))
        return np.asarray(pipeline.run_raw(seg_np))

    ov = max(1, min(cfg.overlap, cfg.window_size - 1))
    seg_len = max(cfg.window_size, cfg.max_segment_frames)
    raw_path = str(output_path) + ".raw16.tmp"
    lo, hi = np.inf, -np.inf
    n_raw = 0

    def write_raw(fh, arr):
        nonlocal lo, hi, n_raw
        arr = np.asarray(arr, np.float32)
        lo = min(lo, float(arr.min()))
        hi = max(hi, float(arr.max()))
        fh.write(arr.astype(np.float16).tobytes())
        n_raw += arr.shape[0]
        if progress_cb:
            progress_cb(n_raw, n_raw / max(time.time() - t0, 1e-6))

    gen = frames01()
    pending_tail = None  # raw depth of the held-back overlap frames
    pending_src: list = []
    try:
        with open(raw_path, "wb") as fh:
            while True:
                if cancel_check and cancel_check():
                    break  # segment-boundary cancel poll
                seg = list(pending_src)
                want = seg_len - len(seg)
                for f in gen:
                    seg.append(f)
                    want -= 1
                    if want == 0:
                        break
                new_frames = len(seg) - len(pending_src)
                if new_frames <= 0:
                    break
                d = seg_raw(np.stack(seg))
                if pending_tail is not None:
                    a, b = _align_scale_shift(d[:ov], pending_tail)
                    d = d * a + b
                    r = np.linspace(0.0, 1.0, ov, endpoint=False,
                                    dtype=np.float32)[:, None, None]
                    write_raw(fh, pending_tail * (1.0 - r) + d[:ov] * r)
                    d = d[ov:]
                if len(d) > ov and new_frames == seg_len - len(pending_src):
                    pending_tail, pending_src = d[-ov:], seg[-ov:]
                    write_raw(fh, d[:-ov])
                else:  # final (short) segment: nothing more to align against
                    pending_tail, pending_src = None, []
                    write_raw(fh, d)
                    break
            if pending_tail is not None:
                write_raw(fh, pending_tail)
        rd.close()

        # pass 2: whole-clip min-max normalization, streamed from the spill
        wr, write = _open_depth_writer(output_path, w8, h8, out_fps, cfg,
                                       bars=(top, bot))
        frame_bytes = h8 * w8 * 2
        scale = 1.0 / max(hi - lo, 1e-9)
        try:
            with open(raw_path, "rb") as fh:
                for _ in range(n_raw):
                    d = np.frombuffer(fh.read(frame_bytes), np.float16)
                    d01 = np.clip((d.astype(np.float32) - lo) * scale, 0, 1)
                    d01 = d01.reshape(h8, w8)
                    write(1.0 - d01 if cfg.invert else d01)
        finally:
            wr.close()
    finally:
        import os

        if os.path.exists(raw_path):
            os.remove(raw_path)
        if cfg.track_letterbox:
            from ..io.letterbox import save_sidecar

            save_sidecar(output_path, top, bot)
    return n_raw


def render_depth_video(args) -> int:
    """CLI adapter (vd3d depth)."""
    cfg = DepthConfig(
        model=args.model,
        checkpoint=getattr(args, "checkpoint", None),
        inference_size=args.inference_size,
        batch_size=args.batch_size,
        invert=args.invert,
        bits=args.bits,
        dtype=getattr(args, "dtype", "float32"),
        steps=getattr(args, "steps", 2),
        window_size=getattr(args, "window", 24),
        overlap=getattr(args, "overlap", 6),
        target_fps=getattr(args, "target_fps", 15.0),
        track_letterbox=getattr(args, "track_letterbox", False),
        allow_random=getattr(args, "allow_random_weights", False),
        tiled=getattr(args, "tiled", False),
        tile_size=getattr(args, "tile_size", 518),
        tile_overlap=getattr(args, "tile_overlap", 64),
        fast_head=not getattr(args, "exact_head", False),
        mesh=getattr(args, "mesh", "auto"),
    )
    output = args.output
    if output is None:
        stem = str(args.input).rsplit(".", 1)[0]
        output = f"{stem}_depth." + ("vd16" if args.bits == 16 else "y4m")

    # the fast head commutes a resize with the final head convs (~1.3%
    # mean depth delta, bounded in tests) — surface that like the
    # random-weights warning so parity-checking users know (ADVICE r2)
    from ..depth.registry import CATALOG

    entry = CATALOG.get(cfg.model)
    if cfg.fast_head and entry is not None and entry.family in (
            "dpt_dinov2", "dpt_beit", "dpt_classic", "dpt_hybrid"):
        from ..config.i18n import t as _t

        print(_t("depth.fast_head"))

    def progress(n, fps):
        print(f"\r{n} frames | {fps:.2f} fps", end="", flush=True)

    cancel_check = None
    if getattr(args, "control", None):
        from ..utils.observability import make_control_check

        cancel_check = make_control_check(args.control)

    n = render_depth_video_file(args.input, output, cfg, progress,
                                cancel_check=cancel_check)
    from ..config.i18n import t

    print("\n" + t("depth.done", frames=n, output=output))
    return 0
