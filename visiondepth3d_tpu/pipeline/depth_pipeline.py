"""Depth estimation pipeline: 2D video -> grayscale depth video.

The TPU replacement for ``process_video2`` (render_depth.py:1636-1985):
batched device inference (one jitted graph: resize -> normalize -> model ->
per-frame percentile u8 mapping), host-side reader/writer, 8-bit video or
16-bit .vd16 export (the FFV1 gray16le analog), optional inversion.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..depth.registry import load_predictor
from ..io.depth_io import Depth16Writer, depth01_to_u16
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
    codec: str = "libx264"
    percentile_lo: float = 1.0
    percentile_hi: float = 99.0


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
    rd = open_video(input_path)
    pred = predictor or load_predictor(
        cfg.model, cfg.checkpoint, cfg.inference_size
    )
    out_hw = (rd.height, rd.width)
    fn = make_depth_batch_fn(pred, cfg, out_hw)

    if cfg.bits == 16:
        wr = Depth16Writer(output_path, rd.width, rd.height, rd.fps)

        def write(d):
            wr.write(np.asarray(d))
    else:
        wr = open_writer(output_path, rd.width, rd.height, rd.fps, cfg.codec)

        def write(d):
            g = np.asarray(d)
            wr.write(np.repeat(g[..., None], 3, axis=-1))

    n_done = 0
    t0 = time.time()
    try:
        eof = False
        while not eof:
            batch = []
            while len(batch) < cfg.batch_size:
                f = rd.read()
                if f is None:
                    eof = True
                    break
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


def render_depth_video(args) -> int:
    """CLI adapter (vd3d depth)."""
    cfg = DepthConfig(
        model=args.model,
        inference_size=args.inference_size,
        batch_size=args.batch_size,
        invert=args.invert,
        bits=args.bits,
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
