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
from ..io.depth_io import Depth16Writer
from ..io.video import open_video, open_writer
from ..ops.resize import resize_bilinear


@dataclasses.dataclass
class DepthConfig:
    model: str = "depth-anything-v2-small"
    checkpoint: str | None = None
    inference_size: int = 518
    batch_size: int = 8
    invert: bool = False
    bits: int = 8  # 8 -> video, 16 -> .vd16
    dtype: str = "float32"  # "bfloat16": bf16 matmuls + bf16-softmax attention
    codec: str = "libx264"
    percentile_lo: float = 1.0
    percentile_hi: float = 99.0
    track_letterbox: bool = False
    # DepthCrafter route (render_depth.py:1830-1890 analog)
    target_fps: float = 15.0  # stride long clips down to this rate
    window_size: int = 24
    overlap: int = 6
    steps: int = 2


def make_depth_batch_fn(pred, cfg: DepthConfig, out_hw: tuple[int, int]):
    """u8 frames in -> u8/u16 normalized depth out, one jitted graph."""

    @jax.jit
    def fn(params, frames_u8):
        frames = frames_u8.astype(jnp.float32) / 255.0
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
) -> int:
    cfg = cfg or DepthConfig()
    from ..depth.registry import CATALOG

    entry = CATALOG.get(cfg.model)
    if entry is not None and entry.family == "diffusion":
        return _render_depth_diffusion(input_path, output_path, cfg,
                                       progress_cb, predictor)
    rd = open_video(input_path)
    pred = predictor or load_predictor(
        cfg.model, cfg.checkpoint, cfg.inference_size, dtype=cfg.dtype
    )

    # letterbox bootstrap on buffered probe frames (render_depth.py:1730);
    # the crop is frozen for the whole render so the inference shapes stay
    # static; the tracker still reports what it sees, and the output depth
    # reinserts neutral-fill bars (:1920-1933) + writes the JSON sidecar.
    pending: list = []
    top = bot = 0
    if cfg.track_letterbox:
        from ..io import letterbox as lb

        for _ in range(9):
            f = rd.read()
            if f is None:
                break
            pending.append(f)
        tracker = lb.LetterboxTracker(rd.height, rd.fps)
        top, bot, _ = tracker.bootstrap(pending)
        lb.save_sidecar(output_path, top, bot)

    crop_h = rd.height - top - bot
    out_hw = (crop_h, rd.width)
    fn = make_depth_batch_fn(pred, cfg, out_hw)

    if cfg.bits == 16:
        wr = Depth16Writer(output_path, rd.width, rd.height, rd.fps)

        def write(d):
            arr = np.asarray(d)
            if top or bot:
                from ..io.letterbox import reinsert_bars

                arr = reinsert_bars(arr, top, bot, fill=32768)
            wr.write(arr)
    else:
        wr = open_writer(output_path, rd.width, rd.height, rd.fps, cfg.codec)

        def write(d):
            g = np.asarray(d)
            if top or bot:
                from ..io.letterbox import reinsert_bars

                g = reinsert_bars(g, top, bot, fill=128)
            wr.write(np.repeat(g[..., None], 3, axis=-1))

    def next_frame():
        if pending:
            return pending.pop(0)
        return rd.read()

    n_done = 0
    t0 = time.time()
    try:
        eof = False
        while not eof:
            batch = []
            while len(batch) < cfg.batch_size:
                f = next_frame()
                if f is None:
                    eof = True
                    break
                if top or bot:
                    f = f[top : rd.height - bot]
                batch.append(f)
            if not batch:
                break
            n = len(batch)
            while len(batch) < cfg.batch_size:
                batch.append(batch[-1])
            out = fn(pred.params, jnp.asarray(np.stack(batch)))
            out_np = np.asarray(out)
            for i in range(n):
                write(out_np[i])
            n_done += n
            if progress_cb:
                progress_cb(n_done, n_done / max(time.time() - t0, 1e-6))
    finally:
        rd.close()
        wr.close()
    return n_done


def _render_depth_diffusion(input_path, output_path, cfg: DepthConfig,
                            progress_cb=None, pipeline=None) -> int:
    """Diffusion routes: Marigold (per-batch image diffusion) and
    DepthCrafter (whole-clip sliding-window video diffusion with frame
    striding to cfg.target_fps, render_depth.py:1830-1890)."""
    rd = open_video(input_path)
    frames = []
    stride = 1
    if cfg.model == "depthcrafter" and rd.fps and rd.fps > cfg.target_fps:
        stride = max(1, int(round(rd.fps / cfg.target_fps)))
    for i, f in enumerate(rd):
        if i % stride == 0:
            frames.append(f)
    rd.close()
    if not frames:
        return 0
    arr = np.stack(frames).astype(np.float32) / 255.0
    # diffusion latents need stride-8-aligned sizes; center-crop to align
    h8, w8 = (arr.shape[1] // 8) * 8, (arr.shape[2] // 8) * 8
    arr = arr[:, :h8, :w8]

    if pipeline is None:
        if cfg.model == "depthcrafter":
            from ..depth.diffusion.depthcrafter import tiny_depthcrafter

            pipeline = tiny_depthcrafter(steps=cfg.steps,
                                         window=cfg.window_size,
                                         overlap=cfg.overlap)
        else:
            from ..depth.diffusion.marigold import tiny_marigold

            pipeline = tiny_marigold(steps=cfg.steps)

    if cfg.model == "depthcrafter":
        depths = pipeline(arr)
    else:
        outs = []
        for i in range(0, arr.shape[0], cfg.batch_size):
            outs.append(np.asarray(pipeline(arr[i : i + cfg.batch_size])))
        depths = np.concatenate(outs, axis=0)
    if cfg.invert:
        depths = 1.0 - depths

    out_fps = (rd.fps or 24.0) / stride
    if cfg.bits == 16:
        wr = Depth16Writer(output_path, depths.shape[2], depths.shape[1], out_fps)
        for d in depths:
            wr.write(np.clip(d * 65535.0 + 0.5, 0, 65535).astype(np.uint16))
    else:
        wr = open_writer(output_path, depths.shape[2], depths.shape[1],
                         out_fps, cfg.codec)
        for d in depths:
            g = np.clip(d * 255.0 + 0.5, 0, 255).astype(np.uint8)
            wr.write(np.repeat(g[..., None], 3, axis=-1))
    wr.close()
    if progress_cb:
        progress_cb(len(depths), 0.0)
    return len(depths)


def render_depth_video(args) -> int:
    """CLI adapter (vd3d depth)."""
    cfg = DepthConfig(
        model=args.model,
        inference_size=args.inference_size,
        batch_size=args.batch_size,
        invert=args.invert,
        bits=args.bits,
        dtype=getattr(args, "dtype", "float32"),
    )
    output = args.output
    if output is None:
        stem = str(args.input).rsplit(".", 1)[0]
        output = f"{stem}_depth." + ("vd16" if args.bits == 16 else "y4m")

    def progress(n, fps):
        print(f"\r{n} frames | {fps:.2f} fps", end="", flush=True)

    n = render_depth_video_file(args.input, output, cfg, progress)
    print(f"\ndone: {n} frames -> {output}")
    return 0
